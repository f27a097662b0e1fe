"""Parquet corpus loader for the driver's synthetic tables (TESTDATA.md).

Thin wrapper so every query takes ``(spark, sf_dir)`` and reads
``{sf_dir}/{table}.parquet`` — predicate pushdown, column pruning and
partition sizing are Catalyst/DataSource-v2 built-ins as long as we stay
declarative from the scan on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
