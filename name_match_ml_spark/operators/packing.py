"""Sequence packing for LLM pre-training batches [EXT] (SURVEY.md §2.10).

Training pipelines concatenate documents into fixed-token-budget
sequences ("packing") so no batch slot is wasted on padding.  Greedy
packing is inherently sequential — pack state (the running token count)
carries row to row — which is exactly the shape Spark distributes by
*bucketing first*: hash documents into ``n_buckets`` independent
streams, run the sequential greedy fill per bucket, and every bucket
packs in parallel with zero coordination.

Scale notes (100 TB): one shuffle (the groupBy on bucket); the greedy
fill is an Arrow ``applyInPandas`` — per-GROUP vectorized state, not a
per-row Python UDF; bucket count is the parallelism knob and each
bucket's state is one integer, so executor memory per task is the
bucket's rows only.  Determinism: bucket = md5-hash of doc_id (stable
under retries, reproducible cross-engine), fill order = doc_id within
bucket, so the pack assignment is a pure function of the corpus — and
therefore oracle-checkable (DuckDB replays the greedy fill with a
recursive CTE).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pack_documents"]


def pack_documents(
    docs: DataFrame,
    *,
    budget: int = 256,
    n_buckets: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each document to a fixed-budget pack: ``(doc_id, bucket,
    pack_seq, n_tokens)``.

    Within a bucket (md5-hash of id, mod ``n_buckets``) documents are
    taken in ``doc_id`` order; a pack closes when adding the next
    document would exceed ``budget`` tokens (whitespace tokens here —
    swap in a real tokenizer count upstream if available).  A document
    longer than the budget gets a pack of its own.  ``pack_seq`` numbers
    packs within the bucket, so ``(bucket, pack_seq)`` is the global
    pack key.
    """
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        % n_buckets
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        bucket.cast("int").alias("bucket"),
        # null text -> null size -> NaN in the Arrow batch; a null doc
        # packs as zero tokens
        F.coalesce(F.size(words), F.lit(0)).cast("long").alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs = []
        seq, cum, first = 0, 0, True
        for n in pdf["n_tokens"]:
            n = int(n)
            # every non-first row sees a non-empty pack (`cum > 0` is NOT
            # a valid emptiness proxy: zero-token docs keep cum at 0), so
            # the close condition is simply "this doc would overflow"
            if not first and cum + n > budget:
                seq += 1
                cum = 0
            cum += n
            first = False
            seqs.append(seq)
        pdf["pack_seq"] = pd.Series(seqs, dtype="int64")
        return pdf

    return base.groupBy("bucket").applyInPandas(
        _pack, "doc_id long, bucket int, n_tokens long, pack_seq long"
    )
