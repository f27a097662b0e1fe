"""Global ordering / indexing [EXT] — the curriculum-learning primitive
(order a corpus by a quality signal and assign a stable global sequence
index) done the way it must be done at 100 TB.

The naive Spark spelling — ``row_number().over(Window.orderBy(...))`` —
has an EMPTY partition spec: every row shuffles to ONE task and the
cluster serializes (Spark warns "No Partition Defined for Window
operation").  A per-partition window over range partitions is better but
still pays a SECOND full exchange: ``Window.partitionBy(partition_id)``
needs hash clustering, which range partitioning does not satisfy, so
Catalyst re-shuffles everything.  The shape used here is the classic
two-phase total sort with NO second data shuffle (the DataFrame
equivalent of ``RDD.zipWithIndex``):

1. range-partition + sort on ``(order key, unique tiebreak)`` — one
   shuffle, each partition owns a disjoint ordered key range,
2. ``monotonically_increasing_id()`` evaluated AFTER the sort — its
   documented layout is ``partition_id * 2^33 + in-partition ordinal``,
   so it encodes the local sorted rank for free,
3. per-partition counts → cumulative offsets (an ``n_partitions``-row
   aggregate, the only single-partition window in the plan),
4. broadcast-join offsets back: ``global = ordinal + offset``.

Because the order key is extended with a unique tiebreak, the result is
a TOTAL order: the emitted index is the true global rank, independent of
where the sampled range boundaries fell — which is what makes the
operator exactly oracle-checkable even though ``repartitionByRange``
boundaries come from sampling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ordered_index", "ordered_cumsum"]

_ORD_BITS = 33  # documented monotonically_increasing_id layout


def ordered_index(
    df: DataFrame,
    order_by: list[Column | str],
    *,
    tiebreak: str,
    index_col: str = "global_index",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each row its 0-based global rank under ``order_by`` (ties
    broken by the unique ``tiebreak`` column) with ONE data shuffle.

    ``order_by`` accepts column names or Column expressions including
    ``F.col(...).desc()``.  Rows keep all input columns and gain
    ``index_col``.

    100 TB notes: the range shuffle is the same cost as any global sort
    — there is no cheaper total order — and everything after it is
    map-side: the ordinal comes from ``monotonically_increasing_id``
    (valid for < 2^33 ≈ 8.6e9 rows per partition — any sane partition
    size), the offset table is ``n_partitions`` longs broadcast back,
    and the plan has no wide window and no second exchange of the data
    (pinned in tests/test_round4_ops.py).  Skewed order keys (many rows
    sharing one quality score) stay parallel because the unique
    tiebreak participates in the range key, splitting heavy keys across
    partitions.  Deterministic: range boundaries sample with fixed
    seeds, and regardless of boundaries the output index is the true
    global rank of the total order."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    full_order = [*cols, F.col(tiebreak)]
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    out_cols = df.columns
    # MATERIALIZE the tagged table: two jobs consume it (the offsets
    # aggregate, then the final join), and both monotonically_increasing_id
    # and the range partitioner's sampled boundaries are only stable
    # across jobs if the input is — a shuffled/joined upstream recomputes
    # in a different row order, the two jobs then disagree on _pid/_ord,
    # and the emitted index is silently NOT the global rank (caught by
    # dsir_select's sf0.1 hash mismatch; a plain scan upstream never
    # trips it, which is why curriculum_order stayed green).
    tagged = (
        df.repartitionByRange(num_partitions, *full_order)
        .sortWithinPartitions(*full_order)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftright("_mid", _ORD_BITS))
        .withColumn("_ord", F.col("_mid").bitwiseAND(F.lit((1 << _ORD_BITS) - 1)))
        .localCheckpoint()
    )
    counts = tagged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    wo = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(wo), F.lit(0)).cast("long").alias("_off")
    )
    return (
        tagged.join(F.broadcast(offsets), "_pid")
        .withColumn(index_col, (F.col("_ord") + F.col("_off")).cast("long"))
        .select(*out_cols, index_col)
    )


def ordered_cumsum(
    df: DataFrame,
    order_by: list[Column | str],
    *,
    tiebreak: str,
    value_col: str,
    cumsum_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global INCLUSIVE running sum of ``value_col`` in ``order_by``
    order (ties broken by the unique ``tiebreak``) — the
    budget-selection primitive ("take documents in quality order until
    the token budget is spent"), with the same one-shuffle shape as
    :func:`ordered_index`:

    1. range-partition + sort on the total order (materialized — the
       :func:`ordered_index` lesson: sampled range boundaries are only
       stable across the two consuming jobs if the tagged table is),
    2. per-partition running sums via a window partitioned by the
       range-partition id — Catalyst can't see that the checkpointed
       data is already clustered by ``_pid``, so this costs one more
       exchange, but a BALANCED one (exactly one group per original
       range partition; never the single-task empty-spec window),
    3. per-partition totals → cumulative offsets (an
       ``n_partitions``-row aggregate, the only unpartitioned window),
    4. broadcast offsets back: ``running = local_running + offset``.

    ``value_col`` must be integral (the running sum is exact int64 —
    floats would make the result partition-dependent)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    full_order = [*cols, F.col(tiebreak)]
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    out_cols = df.columns
    tagged = (
        df.repartitionByRange(num_partitions, *full_order)
        .sortWithinPartitions(*full_order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    wloc = (
        Window.partitionBy("_pid")
        .orderBy(*full_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = tagged.withColumn(
        "_run", F.sum(F.col(value_col).cast("long")).over(wloc)
    )
    totals = tagged.groupBy("_pid").agg(
        F.sum(F.col(value_col).cast("long")).alias("_t")
    )
    wo = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_t").over(wo), F.lit(0)).cast("long").alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(cumsum_col, (F.col("_run") + F.col("_off")).cast("long"))
        .select(*out_cols, cumsum_col)
    )
