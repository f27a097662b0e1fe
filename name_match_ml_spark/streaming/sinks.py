"""Streaming sinks [EXT] (SURVEY.md §2.9).

Parquet has no transactional commit, so a failure between a micro-batch
write and the checkpoint commit would duplicate rows on replay if batches
were appended blindly.  :func:`write_stream_parquet` is the standard
idempotent-``foreachBatch`` pattern for such sinks: each micro-batch
OVERWRITES its own ``batch_id=N`` subdirectory, so a replayed batch lands
in the same place instead of appending twice — end-to-end exactly-once
from a replayable source (file source / Kafka) without a transactional
store.  Readers just scan ``path`` (the ``batch_id=N`` dirs read back as
one partitioned dataset).

At 100 TB scale the same shape holds: per-batch output is bounded by
trigger interval × ingest rate, the write is fully parallel within the
batch, and checkpointing (offsets + state) lives in ``checkpoint`` on
shared storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

__all__ = ["write_stream_parquet"]


def write_stream_parquet(
    df: DataFrame,
    path: str,
    *,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start an idempotent parquet stream sink (see module docstring).

    ``available_now=True`` drains everything currently available and
    stops — the batch-backfill/test mode; ``False`` runs continuously
    with the default trigger."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    w = df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
