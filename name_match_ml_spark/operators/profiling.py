"""Data-quality profiling operators [EXT].

Not present in the reference (its only data validation is the
required-column check on CSV ingest, ``main.py:96-105`` — replicated in
``sources/csv.py``); this generalizes that idea to the standard
warehouse-ingest gate: per-column completeness / cardinality / range
stats computed in ONE pass, the numbers a 100 TB pipeline checks before
promoting a snapshot.

Scale shape: a single aggregate over the scan — no joins, no windows,
no per-column re-scan (the naive loop ``for c in columns:
df.agg(...)`` reads the table once per column; this reads it once,
total).  The column→rows pivot happens AFTER aggregation on a 1-row
DataFrame, so the explode is free.  Exact ``count_distinct`` over many
columns makes Catalyst plan an Expand (input × n_cols) before the
partial aggregate — correct but heavy at 100 TB, so
``distinct="approx"`` (HyperLogLog++, one pass, no Expand) is the scale
default; the declared query pins ``"exact"`` because HLL estimates are
implementation-specific and would not hash-match any oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(
    df: DataFrame,
    columns: list[str],
    *,
    distinct: str = "approx",
) -> DataFrame:
    """Per-column profile: ``(col_name, n_rows, n_null, n_distinct,
    min_value, max_value)``, one row per profiled column, one scan total.

    ``min_value``/``max_value`` are computed on the NATIVE type (so
    numeric columns order numerically, not lexically) and cast to
    string afterwards for the uniform row shape.  Float stringification
    is engine-specific — profile integer/string/date columns when the
    output must be comparable across engines.

    ``distinct="approx"`` (default) uses HyperLogLog++ — the 100 TB
    setting; ``"exact"`` uses ``count_distinct`` and accepts the Expand
    cost for oracle-comparable output.
    """
    if distinct not in ("approx", "exact"):
        raise ValueError("distinct must be 'approx' or 'exact'")
    if not columns:
        raise ValueError("columns must be non-empty")

    nd = F.count_distinct if distinct == "exact" else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("_nr")]
    for c in columns:
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            nd(F.col(c)).alias(f"_nd_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)

    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_nr").alias("n_rows"),
                (F.col("_nr") - F.col(f"_nn_{c}")).alias("n_null"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in columns
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")
