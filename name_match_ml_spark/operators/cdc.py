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

__all__ = ["apply_changes"]

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
