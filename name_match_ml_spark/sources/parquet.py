"""Parquet corpus loader for the driver's synthetic tables (TESTDATA.md).

Thin wrapper so every query takes ``(spark, sf_dir)`` and reads
``{sf_dir}/{table}.parquet`` — predicate pushdown, column pruning and
partition sizing are Catalyst/DataSource-v2 built-ins as long as we stay
declarative from the scan on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables whose queries do expression-heavy per-row work (similarity
# scoring, shingling, JSON extraction, vector math) before the first
# shuffle — for those, map-side parallelism pays for one extra small
# exchange.  lineitem/orders are deliberately excluded: their queries are
# aggregation/join-shaped, where Catalyst's map-side partial aggregation
# collapses rows BEFORE any exchange, and a pre-shuffle would defeat it
# (measured: repartitioning lineitem made TPC-H-Q1-shape 1.5× slower).
# region/nation/supplier broadcast; fanning 5 rows over 32 tasks only adds
# scheduling overhead.
_EXPRESSION_HEAVY_TABLES = frozenset(
    {"customer", "part", "events", "documents", "embeddings"}
)

__all__ = ["TABLES", "table", "register_views"]


def _ensure_scan_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition when the scan has fewer partitions than the
    session's parallelism.

    The driver corpus ships each table as ONE single-row-group parquet file
    — an unsplittable scan partition — so without this every map-side
    expression/UDF stage (shingling, scoring, feature extraction, partial
    aggregation) runs on one core.  On a real cluster the scan is already
    split by ``spark.sql.files.maxPartitionBytes`` and this guard is a
    no-op (the condition is false), so no extra shuffle is introduced at
    scale."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown corpus table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts has shipped as either INT64 TIMESTAMP(NANOS) (which
        # Spark's parquet reader rejects without nanosAsLong) or a plain
        # timestamp[us]; branch on the landed dtype so both corpora load.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanos as long; rebuild with exact integer division (micros) —
            # double division would lose precision on 1e18-scale nanos.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            # normalize to TIMESTAMP_LTZ (session tz is pinned UTC) so
            # window/watermark semantics match the long-nanos path.
            df = df.withColumn("ts", F.to_timestamp("ts"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in _EXPRESSION_HEAVY_TABLES:
        df = _ensure_scan_parallelism(df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
