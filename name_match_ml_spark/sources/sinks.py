"""Sinks — the engine's write surfaces (SURVEY.md §2.1 S7-S9).

The reference's sinks are a CSV download of the match table
(``main.py:211-221``), a pickled model (``train_model.py:48``), and the
printed classification report (``train_model.py:46``).  Spark-first
equivalents:

* :func:`save_csv` — distributed header'd CSV directory write (the scale
  path: one file per partition), or a single file with ``single_file=True``
  for a download-style surface (``coalesce(1)`` — driver-light, but the
  write itself is one task; only for result tables, never raw data).
* :func:`save_parquet` — the engine-native result sink for anything that
  feeds further queries (columnar, predicate-pushdown-able on re-read).
* :func:`save_model` / :func:`load_model` — MLlib's Parquet-backed
  persistence replacing the reference's joblib pickle
  (``train_model.py:48``); cluster-readable, version-stable.

All writes are ``mode=overwrite`` to mirror the reference's
fixed-output-path behavior.
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "save_csv",
    "save_parquet",
    "save_jsonl",
    "load_jsonl",
    "save_orc",
    "load_orc",
    "save_bucketed",
    "save_sorted_layout",
    "save_model",
    "load_model",
]


def save_csv(df: DataFrame, path: str, *, single_file: bool = False) -> None:
    """S7: result table → header'd CSV (``main.py:211-221``).

    ``single_file`` uses ``repartition(1)`` rather than ``coalesce(1)``:
    coalesce propagates the 1-partition constraint up the plan and would
    serialize the whole upstream pipeline into one task; repartition
    keeps upstream parallel and only funnels the (small) result through
    one writer."""
    out = df.repartition(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def save_parquet(df: DataFrame, path: str, *, partition_by: tuple[str, ...] = ()) -> None:
    """Engine-native result sink; ``partition_by`` enables partition
    pruning on re-read (the 100-TB default for any reused result)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def save_jsonl(df: DataFrame, path: str) -> None:
    """[EXT] JSON-lines sink — the interchange format of LLM training-data
    pipelines (one document per line; splittable, streamable, appendable).
    Distributed write, one ``.json`` part per partition."""
    df.write.mode("overwrite").json(path)


def load_jsonl(spark: SparkSession, path: str, *, schema=None) -> DataFrame:
    """[EXT] JSON-lines source.  Pass an explicit ``schema`` at scale:
    without one Spark runs a full inference pass over the data before the
    real scan — 2× the I/O on 100 TB — and inferred types can drift
    between runs (a long column becomes double when one value has a
    decimal point)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def save_orc(df: DataFrame, path: str, *, partition_by: tuple[str, ...] = ()) -> None:
    """[EXT] ORC sink — same columnar/pushdown properties as parquet via
    the same writer surface, for warehouses standardized on ORC."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def load_orc(spark: SparkSession, path: str) -> DataFrame:
    """[EXT] ORC source (filter/column pushdown works as with parquet)."""
    return spark.read.orc(path)


def save_bucketed(
    df: DataFrame,
    name: str,
    *,
    buckets: int,
    key: str,
    path: str | None = None,
) -> None:
    """Bucketed + sorted parquet table (``bucketBy``/``sortBy`` →
    ``saveAsTable``): the co-located-join storage layout for keys that
    are joined or aggregated repeatedly.

    Two tables bucketed on the same key with the same bucket count join
    with ZERO exchanges — each task reads matching bucket files from
    both sides (verified by tests/test_sinks.py: no ``Exchange`` node in
    the joined plan).  At 100 TB this converts every recurring fact⋈fact
    join from a full shuffle of both sides into a local merge, which is
    the single largest shuffle saving a warehouse layout can buy; the
    bucket count should be sized so one bucket of the larger table fits
    an executor's memory (e.g. 100 TB / 4096 buckets ≈ 25 GB).

    ``saveAsTable`` is required (bucket metadata lives in the catalog,
    not the files); ``path`` pins an explicit location when given.
    """
    w = df.write.mode("overwrite").format("parquet")
    if path is not None:
        w = w.option("path", path)
    w.bucketBy(buckets, key).sortBy(key).saveAsTable(name)


def save_sorted_layout(
    df: DataFrame,
    path: str,
    *,
    partition_by: tuple[str, ...] = (),
    sort_by: tuple[str, ...] = (),
    max_records_per_file: int = 0,
) -> None:
    """Partition-pruned, zone-map-friendly parquet layout — the write
    side of scan efficiency at 100 TB (:func:`save_bucketed` is the
    join side):

    * ``partition_by`` → one directory per value: readers filtering on
      those columns prune whole directories before any I/O.
    * ``sort_by`` → rows sorted WITHIN each task's files, so parquet
      row-group min/max statistics become selective: a reader filtering
      on a sort column skips most row groups instead of scanning them.
    * ``max_records_per_file`` bounds file sizes (oversized files limit
      read parallelism; a flood of tiny ones drowns the scan planner in
      metadata).

    The ``repartition(partition_by)`` before the write matters: without
    it every one of N upstream tasks opens a file PER partition value —
    N × values small files, the classic layout bug; with it each
    partition value is written by one task as few large sorted files.
    Skew note: one hot partition value = one writer task — for a
    known-hot column, add a derived salt column to ``partition_by``.
    """
    from pyspark.sql import functions as F

    out = df
    if partition_by:
        out = out.repartition(*[F.col(c) for c in partition_by])
    if sort_by:
        out = out.sortWithinPartitions(*[*partition_by, *sort_by])
    w = out.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def save_model(model: PipelineModel, path: str) -> None:
    """S8/M7: persist the trained match-classifier pipeline
    (``train_model.py:48`` → MLlib Parquet persistence)."""
    model.write().overwrite().save(path)


def load_model(spark: SparkSession, path: str) -> PipelineModel:
    """Reload a persisted pipeline for scoring (inverse of
    :func:`save_model`; the reference reloads its pickle inside Flask)."""
    return PipelineModel.load(path)
