"""Salted join / salted aggregation (plans/skew.py [EXT]): result
equivalence with the unsalted plan, and the salt actually spreads."""

from __future__ import annotations

from pyspark.sql import functions as F

from name_match_ml_spark.plans.skew import salted_count, salted_join


def _skewed(spark):
    # 10k rows on one hot key, a handful elsewhere.
    return spark.range(10_500).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") < 10_000, "hot").otherwise(F.concat(F.lit("k"), F.col("id") % 50)).alias("k"),
        (F.col("id") % 7).alias("v"),
    )


def test_salted_join_equals_plain_join(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [("hot", 1), ("k1", 2), ("k3", 3)], ["k", "dim"]
    )
    plain = left.join(right, "k").select("row_id", "dim")
    salted = salted_join(left, right, on="k", salt_src="row_id", salt=8).select("row_id", "dim")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    left = _skewed(spark)
    right = spark.createDataFrame([("hot", 1)], ["k", "dim"])
    out = salted_join(left, right, on="k", salt_src="row_id", salt=4, how="left")
    assert out.count() == 10_500
    assert out.filter(F.col("dim").isNull()).count() == 500


def test_salted_count_equals_plain_count(spark):
    df = _skewed(spark)
    plain = {r["k"]: r["cnt"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {r["k"]: r["cnt"] for r in salted_count(df, key="k", salt_src="row_id", salt=8).collect()}
    assert salted == plain


def test_salt_spreads_hot_key(spark):
    df = _skewed(spark)
    buckets = (
        df.filter(F.col("k") == "hot")
        .withColumn("_salt", F.pmod(F.xxhash64("row_id"), F.lit(8)))
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(buckets) == 8
    # hash salting: every bucket carries a meaningful share (no bucket
    # under 1/4 of the uniform share)
    assert min(r["count"] for r in buckets) > 10_000 / 8 / 4
