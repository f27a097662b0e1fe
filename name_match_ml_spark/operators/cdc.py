"""Change-data-capture apply (MERGE/upsert) operator [EXT].

Not present in the reference (SURVEY.md §2 has no mutation path — the
reference recomputes from CSV on every request, ``main.py:93-133``);
this is the standard warehouse ingest primitive: apply a batch of keyed
changes (inserts / updates / deletes with a sequence number) onto a
snapshot, keeping the LATEST change per key — i.e. ANSI ``MERGE`` with
last-writer-wins, the operation behind every incremental 100 TB table.

Companion to :func:`..operators.cleaning.corpus_diff` (which derives a
change set between two snapshots; this applies one) and
:func:`..operators.temporal.scd2_intervals` (which keeps history instead
of overwriting).

Scale shape: ONE aggregate shuffle on the key collapses the change
batch to its per-key winner (``max_by`` over the sequence struct —
partial map-side combine, so a hot key's churn collapses before the
wire, NOT a row_number window over the raw batch), then ONE full-outer
join against the snapshot.  With the snapshot stored bucketed on the
key (``sources/sinks.py::save_bucketed``) the join side of the plan is
exchange-free, same as corpus_diff's documented layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_changes", "agg_state_of", "merge_agg_state"]

OPS = ("U", "D")  # upsert, delete — inserts are upserts on absent keys


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    seq_cols: list[str],
    op_col: str = "op",
    payload: list[str] | None = None,
) -> DataFrame:
    """Apply ``changes`` to ``snapshot`` with last-writer-wins per key.

    ``changes`` rows carry ``key``, ``seq_cols`` (a totally-ordered
    version stamp — pass enough columns to be UNIQUE per key, or the
    winner is nondeterministic), ``op_col`` in ``{"U", "D"}``, and the
    ``payload`` columns (default: everything else).  Semantics per key:

    * latest op ``"U"``: payload replaces the snapshot row (insert when
      the key is absent — upsert),
    * latest op ``"D"``: the row is deleted,
    * no change row: the snapshot row passes through.

    Returns the new snapshot with ``snapshot``'s column set
    (``key`` + payload).  Payload columns must exist in both inputs
    with compatible types.
    """
    if payload is None:
        payload = [c for c in changes.columns if c not in (key, op_col, *seq_cols)]
    missing = [c for c in payload if c not in snapshot.columns]
    if missing:
        raise ValueError(f"payload columns absent from snapshot: {missing}")

    winner = F.max_by(
        F.struct(F.col(op_col).alias("_op"), *[F.col(c) for c in payload]),
        F.struct(*[F.col(c) for c in seq_cols]),
    )
    latest = changes.groupBy(key).agg(winner.alias("_w"))

    s = snapshot.select(key, *payload)
    joined = s.join(latest, key, "full_outer")
    applied = joined.filter(
        F.col("_w").isNull() | (F.col("_w._op") != F.lit("D"))
    )
    return applied.select(
        key,
        *[
            F.when(F.col("_w").isNotNull(), F.col(f"_w.{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload
        ],
    )


def merge_agg_state(
    state: DataFrame,
    delta: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Incremental aggregate maintenance: combine a persisted aggregate
    STATE table with the aggregate of a new DELTA batch, producing the
    state the full re-aggregation would have built — without rescanning
    history.

    Both inputs carry the same mergeable-state schema per key:
    ``(n, sum_value, min_value, max_value)``.  Merge rules are the
    standard commutative monoid: counts and decimal sums add, min/max
    take least/greatest — so ``merge(agg(A), agg(B)) == agg(A ∪ B)``
    exactly (decimal addition is associative; a double sum would drift
    between the one-pass and incremental plans).  Derived measures
    (mean = sum/n) are computed at read time, never stored.

    Shape: one partial-combining aggregate over the delta (the only
    scan of new data) + one full-outer equi-join against the state
    table, which at 100 TB is keyed storage (bucketed by
    ``sources/sinks.py::save_bucketed`` → exchange-free).  This is the
    continuous-aggregate / materialized-view maintenance contract,
    sibling of ``analytics.rollup_reaggregate`` (grain fan-in) and
    ``apply_changes`` (row-level upsert).
    """
    merged = state.alias("s").join(
        delta.alias("d"), on=key_cols, how="full_outer"
    )
    z = F.lit(0).cast("decimal(18,2)")
    return merged.select(
        *key_cols,
        (F.coalesce(F.col("s.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))).alias("n"),
        (
            F.coalesce(F.col("s.sum_value"), z) + F.coalesce(F.col("d.sum_value"), z)
        ).alias("sum_value"),
        F.least(
            F.coalesce(F.col("s.min_value"), F.col("d.min_value")),
            F.coalesce(F.col("d.min_value"), F.col("s.min_value")),
        ).alias("min_value"),
        F.greatest(
            F.coalesce(F.col("s.max_value"), F.col("d.max_value")),
            F.coalesce(F.col("d.max_value"), F.col("s.max_value")),
        ).alias("max_value"),
    )


def agg_state_of(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """The mergeable per-key aggregate state of a batch (the input
    format of :func:`merge_agg_state`)."""
    dec = F.col(value_col).cast("decimal(18,2)")
    return df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).alias("sum_value"),
        F.min(dec).alias("min_value"),
        F.max(dec).alias("max_value"),
    )
