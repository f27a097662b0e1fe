"""Streaming quantile sketch [EXT] (SURVEY.md §2.9 ∩ §2.10): the
deterministic mergeable sketch (``functions/sketches.py``) maintained
incrementally across micro-batches with ``foreachBatch``.

Why this is the natural streaming twin (VERDICT r9 #5): the sketch's
merge property ``merge(state(A), state(B)) == state(A ∪ B)`` — exact
row equality, pinned in tests/test_sketch_quantiles.py — is precisely
the contract a ``foreachBatch`` accumulator needs: fold each
micro-batch's state into the running state and the result is the state
of everything seen so far, independent of batch boundaries, arrival
order, or restarts replaying whole batches in order.  Stream ≡ batch is
pinned in tests/test_streaming_sketch.py (the ninth stream≡batch twin).

State size: the accumulated sample is ~k rows BY CONSTRUCTION (the
level adapts so the survivor count stays in ``(k/2, k]``), so the
driver-side fold touches ≤ ~2k tuples per batch regardless of stream
length — the same bounded-state discipline as the watermark-dedup and
sessionization twins, with the bound coming from the sketch itself.

Scale shape: each micro-batch runs the map-side codegen hash+filter of
``quantile_sketch_state`` (one count + a ~k-row collect — the sketch IS
small by contract, this is a sketch collect, not a data collect); the
merged estimate reuses the IDENTICAL final arithmetic as the batch path
(``sketch_estimates``), so stream and batch cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.sketches import quantile_sketch_state, sketch_estimates

__all__ = ["StreamingQuantileSketch"]


class StreamingQuantileSketch:
    """foreachBatch accumulator for the deterministic quantile sketch.

    Usage::

        acc = StreamingQuantileSketch(value_col="n_chars", key_col="doc_id")
        q = (stream.writeStream.foreachBatch(acc.update_batch)
             .trigger(availableNow=True).start())
        q.awaitTermination(); q.stop()
        acc.estimates(spark).show()
    """

    def __init__(
        self, *, value_col: str, key_col: str, k: int = 256, salt: str = "qs:"
    ) -> None:
        if k < 2:
            raise ValueError("k must be >= 2")
        self.value_col = value_col
        self.key_col = key_col
        self.k = k
        self.salt = salt
        self.n = 0
        self.level = 0
        self.rows: list[tuple[int, int]] = []  # (val, hh), ~k by construction

    def update_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        """Fold one micro-batch into the running state — the
        merge_quantile_sketch_states arithmetic applied driver-side to
        the ≤ ~k-row samples (hash-coordinated nesting makes the fold
        exact: re-filtering the union at the merged level IS the state
        of the union)."""
        n_b, level_b, _, kept_b = quantile_sketch_state(
            batch_df,
            value_col=self.value_col,
            key_col=self.key_col,
            k=self.k,
            salt=self.salt,
        )
        batch_rows = [(r["val"], r["hh"]) for r in kept_b.collect()]
        self.n += n_b
        level = 0
        while self.n > self.k * (1 << level):
            level += 1
        # n only grows, so the merged level dominates both components —
        # the invariant that makes the re-filter exact
        assert level >= self.level and level >= level_b
        pw = 1 << level
        self.rows = [t for t in self.rows + batch_rows if t[1] % pw == 0]
        self.level = level

    def estimates(
        self, spark: SparkSession, qs: list[int] = (10, 25, 50, 75, 90)
    ) -> DataFrame:
        """Percentile estimates from the accumulated state — the SAME
        ``sketch_estimates`` arithmetic as the batch ``sketch_quantiles``,
        so stream ≡ batch holds as literal row equality."""
        kept = spark.createDataFrame(self.rows or [], "val long, hh long")
        return sketch_estimates(spark, self.n, self.level, kept, qs=qs)
