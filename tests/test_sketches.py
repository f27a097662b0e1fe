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


# ------------------------------------------------------------ count-min


def test_cms_never_undercounts_and_is_tight_when_sparse(spark):
    from name_match_ml_spark.functions.sketches import cms_term_counts

    rows = [(0, "a a a b c"), (1, "a b b"), (2, "z z z z")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {"a": 4, "b": 3, "c": 1, "z": 4, "missing": 0}
    got = {
        r.term: r.cms_count
        for r in cms_term_counts(
            df, list(exact), depth=4, width=1024, hash_fn="md5_60"
        ).collect()
    }
    for t, n in exact.items():
        assert got[t] >= n  # CMS never undercounts
    # 5 distinct terms in a 4x1024 grid: collisions are (5/1024)-likely
    # per row and the min over 4 rows makes a wrong estimate ~1e-9 —
    # deterministic given md5_60, and exact here.
    assert got == exact


def test_cms_min_over_rows_beats_single_row(spark):
    """depth=1 estimates can only be >= depth=4 estimates (min over a
    superset of cells)."""
    from name_match_ml_spark.functions.sketches import cms_term_counts

    df = spark.createDataFrame(
        [(i, f"w{i % 50} filler") for i in range(100)], ["doc_id", "text"]
    )
    terms = [f"w{i}" for i in range(10)] + ["absent"]
    deep = {
        r.term: r.cms_count
        for r in cms_term_counts(df, terms, depth=4, width=32).collect()
    }
    shallow = {
        r.term: r.cms_count
        for r in cms_term_counts(df, terms, depth=1, width=32).collect()
    }
    for t in terms:
        assert shallow[t] >= deep[t] >= (2 if t != "absent" else 0)


def test_cms_rejects_bad_args(spark):
    from name_match_ml_spark.functions.sketches import cms_term_counts

    df = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        cms_term_counts(df, [])
    with pytest.raises(ValueError):
        cms_term_counts(df, ["x"], depth=0)


def test_hll_accuracy_and_merge(spark):
    """Raw HLL within ~3 sigma (20%) of truth for n >> m; register
    merge (fine -> coarse) equals building registers directly on the
    coarse grouping; determinism across runs."""
    from pyspark.sql import functions as F

    from name_match_ml_spark.functions.sketches import hll_distinct

    rows = [(f"g{i % 2}", f"p{i % 7}", f"value-{i}") for i in range(8000)]
    df = spark.createDataFrame(rows, "g string, p string, v string")
    est = {
        r["g"]: r["hll_est"]
        for r in hll_distinct(
            df, value_col="v", group_cols=["g"], merge_from=["p"]
        ).collect()
    }
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.count_distinct("v").alias("n")).collect()
    }
    for g, n in exact.items():
        assert abs(est[g] - n) / n < 0.20, (g, est[g], n)
    # merging per-p registers must equal building per-g directly
    direct = {
        r["g"]: r["hll_est"]
        for r in hll_distinct(df, value_col="v", group_cols=["g"]).collect()
    }
    assert est == direct
    again = {
        r["g"]: r["hll_est"]
        for r in hll_distinct(
            df, value_col="v", group_cols=["g"], merge_from=["p"]
        ).collect()
    }
    assert est == again
