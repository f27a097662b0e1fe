"""kmv_distinct tests (functions/sketches.py [EXT]): exact-small path,
estimator accuracy, NULL semantics, and the bound-before-aggregate plan
gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.functions.sketches import kmv_distinct


def test_small_groups_are_exact(spark):
    rows = [("g1", v) for v in range(10)] * 3 + [("g2", v) for v in range(25)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r.g: r.kmv_distinct for r in kmv_distinct(df, ["g"], "v", k=64).collect()}
    assert got == {"g1": 10.0, "g2": 25.0}


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5_60"])
def test_estimator_accuracy_large_group(spark, hash_fn):
    n = 5000
    df = spark.range(n * 3).select(
        F.lit("g").alias("g"), (F.col("id") % n).alias("v")
    )
    (r,) = kmv_distinct(df, ["g"], "v", k=256, hash_fn=hash_fn).collect()
    # se ~ 1/sqrt(k-2) ≈ 6.3%; 4 sigma is a deterministic-given-hash bound
    assert n * 0.75 <= r.kmv_distinct <= n * 1.25, r.kmv_distinct


def test_nulls_ignored_like_count_distinct(spark):
    df = spark.createDataFrame(
        [("g", "a"), ("g", None), ("g", "b"), ("g", None)], ["g", "v"]
    )
    (r,) = kmv_distinct(df, ["g"], "v", k=8).collect()
    assert r.kmv_distinct == 2.0


def test_sketch_bound_pushed_into_window(spark):
    """row_number() <= k must become a WindowGroupLimit so no executor
    materializes a group's full distinct stream before the cut."""
    df = spark.range(1000).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v")
    )
    plan = (
        kmv_distinct(df, ["g"], "v", k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_k_must_be_at_least_two(spark):
    df = spark.createDataFrame([("g", 1)], ["g", "v"])
    with pytest.raises(ValueError):
        kmv_distinct(df, ["g"], "v", k=1)
