"""Sink round-trips (SURVEY.md §2.1 S7/S8)."""

import os

from name_match_ml_spark.sources.sinks import load_model, save_csv, save_model, save_parquet


def test_csv_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("alice", "1", 97.5), ("bob", "2", 55.0)], ["username", "emp_id", "score"]
    )
    out = str(tmp_path / "matches_csv")
    save_csv(df, out, single_file=True)
    back = spark.read.option("header", True).csv(out)
    assert sorted(back.columns) == ["emp_id", "score", "username"]
    assert back.count() == 2
    # single_file writes exactly one part file
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 1


def test_parquet_sink_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "x")], ["k", "v", "p"]
    )
    out = str(tmp_path / "res_parquet")
    save_parquet(df, out, partition_by=("p",))
    assert {"p=x", "p=y"}.issubset(set(os.listdir(out)))
    back = spark.read.parquet(out)
    assert back.count() == 3
    # partition pruning: filter on p reads only one directory
    assert back.filter("p = 'x'").count() == 2


def test_model_sink_roundtrip(spark, tmp_path):
    from name_match_ml_spark.ml.pipeline import train_match_classifier

    pairs = spark.createDataFrame(
        [
            ("john.smith", "John Smith", 1),
            ("jsmith", "John Smith", 1),
            ("maria.garcia", "Maria Garcia", 1),
            ("mgarcia", "Maria Garcia", 1),
            ("quartz99", "John Smith", 0),
            ("zzyzx", "Maria Garcia", 0),
            ("nobody_here", "John Smith", 0),
            ("xjqk", "Maria Garcia", 0),
        ]
        * 4,
        ["username", "employee_name", "label"],
    )
    model, _ = train_match_classifier(pairs, num_trees=5)
    out = str(tmp_path / "model")
    save_model(model, out)
    back = load_model(spark, out)
    scored = back.transform(
        __import__("name_match_ml_spark.ml.pipeline", fromlist=["pair_features"]).pair_features(
            spark.createDataFrame([("john.smith", "John Smith", 1)], ["username", "employee_name", "label"])
        )
    )
    assert "prediction" in scored.columns
    assert scored.count() == 1


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key must join with zero
    exchanges — the co-located-join layout save_bucketed exists for."""
    from pyspark.sql import functions as F

    from name_match_ml_spark.sources.sinks import save_bucketed

    spark.sql("DROP TABLE IF EXISTS bk_orders")
    spark.sql("DROP TABLE IF EXISTS bk_customer")
    o = spark.range(1000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 100).alias("custkey")
    )
    c = spark.range(100).select(
        F.col("id").alias("custkey"), F.concat(F.lit("c"), F.col("id")).alias("name")
    )
    save_bucketed(o, "bk_orders", buckets=8, key="custkey", path=str(tmp_path / "o"))
    save_bucketed(c, "bk_customer", buckets=8, key="custkey", path=str(tmp_path / "c"))

    joined = (
        spark.table("bk_orders")
        .hint("merge")  # force sort-merge so broadcast doesn't mask bucketing
        .join(spark.table("bk_customer"), "custkey")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert joined.count() == 1000
    spark.sql("DROP TABLE IF EXISTS bk_orders")
    spark.sql("DROP TABLE IF EXISTS bk_customer")


def test_jsonl_sink_roundtrip(spark, tmp_path):
    from name_match_ml_spark.sources.sinks import load_jsonl, save_jsonl

    df = spark.createDataFrame(
        [(1, "alpha doc", 0.5), (2, "beta doc", 1.25)], ["doc_id", "text", "q"]
    )
    out = str(tmp_path / "docs_jsonl")
    save_jsonl(df, out)
    back = load_jsonl(spark, out, schema="doc_id long, text string, q double")
    assert sorted((r.doc_id, r.text, r.q) for r in back.collect()) == [
        (1, "alpha doc", 0.5),
        (2, "beta doc", 1.25),
    ]


def test_orc_sink_roundtrip_and_pushdown(spark, tmp_path):
    from name_match_ml_spark.sources.sinks import load_orc, save_orc

    df = spark.createDataFrame(
        [(i, f"d{i}", i % 3) for i in range(30)], ["doc_id", "text", "p"]
    )
    out = str(tmp_path / "docs_orc")
    save_orc(df, out, partition_by=("p",))
    back = load_orc(spark, out).filter("p = 1").select("doc_id")
    assert back.count() == 10
    # partition pruning: the pruned scan must read only the p=1 directory
    scan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(p" in scan, scan


def test_parquet_partition_pruning(spark, tmp_path):
    """partition_by exists FOR pruning — assert the re-read scan actually
    prunes (PartitionFilters carries the predicate, not PushedFilters)."""
    df = spark.createDataFrame(
        [(i, "x" * 5, "odd" if i % 2 else "even") for i in range(20)],
        ["k", "v", "bucket"],
    )
    out = str(tmp_path / "pruned")
    save_parquet(df, out, partition_by=("bucket",))
    rd = spark.read.parquet(out).filter("bucket = 'odd'").select("k")
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters", 1)[1][:120]
    assert rd.count() == 10


def test_sql_entry_point(spark):
    """ANSI-SQL surface over registered corpus views (spark.sql parity
    with the DataFrame API the suite uses)."""
    from name_match_ml_spark.sources.parquet import register_views

    register_views(spark, "/root/testdata/sf0.001")
    out = spark.sql(
        """
        SELECT r.r_name, COUNT(*) AS nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
        """
    ).collect()
    assert len(out) == 5 and all(r.nations == 5 for r in out)
