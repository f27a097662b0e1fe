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

__all__ = ["save_csv", "save_parquet", "save_model", "load_model"]


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


def save_model(model: PipelineModel, path: str) -> None:
    """S8/M7: persist the trained match-classifier pipeline
    (``train_model.py:48`` → MLlib Parquet persistence)."""
    model.write().overwrite().save(path)


def load_model(spark: SparkSession, path: str) -> PipelineModel:
    """Reload a persisted pipeline for scoring (inverse of
    :func:`save_model`; the reference reloads its pickle inside Flask)."""
    return PipelineModel.load(path)
