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

__all__ = ["TABLES", "table", "register_views"]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown corpus table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is INT64 TIMESTAMP(NANOS), which Spark's parquet reader
        # rejects; read nanos as long and rebuild the timestamp with exact
        # integer division (micros) — double division would lose precision
        # on 1e18-scale nanos.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
