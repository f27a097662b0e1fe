"""Deduplication operators for large-scale training-data pipelines [EXT].

Not present in the reference (SURVEY.md §2.10) — these generalize its one
similarity-join archetype (``main.py:163-170``) to corpus-level dedup, per
the north-star scope in ``BASELINE.json``.  All candidate generation is
blocked/bucketed so no operator materializes the O(N²) pair space:

* :func:`exact_dedup`          — content-hash groupBy (one shuffle).
* :func:`ngram_jaccard_pairs`  — word-set Jaccard ≥ t within cheap blocks.
* :func:`minhash_lsh_pairs`    — MinHash signatures + LSH band buckets,
  verified with exact Jaccard (the classic shingle→minhash→band→bucket-join
  pipeline, all native expressions; only pairs sharing a band collide).
* :func:`simhash_pairs`        — 64-bit SimHash fingerprints, Hamming ≤ r
  via band buckets + native ``bit_count(xor)`` verification.
* :func:`embedding_near_dup`   — cosine ≥ t pairs over an embedding column
  (native ``zip_with``/``aggregate`` dot products).

Scale notes: every operator shuffles by a bucketing key (hash prefix, band
signature, length band) sized so buckets stay small under skew; AQE
skew-join handles hot buckets.  Verification cost is O(candidates), not
O(N²).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_near_dup",
]


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash; keeper = min id.

    One hash-partitioned aggregate — at 100 TB this is the cheapest dedup
    pass and the standard first stage before any near-dup method."""
    return docs.groupBy(F.md5(F.col(text_col)).alias("content_hash")).agg(
        F.min(id_col).alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("copies"),
    )


def _word_set(text_col: str) -> Column:
    return F.array_distinct(
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    length_band: int = 16,
) -> DataFrame:
    """Word-set Jaccard near-dup pairs within (length-band) blocks.

    Jaccard(A,B) = |A∩B| / |A∪B| over distinct word sets.  Blocking: a pair
    with Jaccard ≥ t must have |A| and |B| within a factor (1-t)/1 of each
    other, so comparing only docs whose word-count falls in the same or
    adjacent band of width ``length_band`` loses nothing for reasonable t
    while cutting the pair space by the number of bands.
    """
    # Words are dictionary-encoded to 64-bit hashes up front: the O(pairs)
    # intersections then compare longs, not strings (same sizes —
    # collisions over a real vocabulary are ~2^-64 per pair).
    base = docs.select(
        F.col(id_col).alias("doc_id"), _word_set(text_col).alias("words")
    ).select(
        "doc_id",
        F.array_distinct(F.transform("words", lambda w: F.xxhash64(w))).alias("wh"),
        F.size("words").alias("n_words"),
    )

    banded = base.withColumn(
        "band",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(F.col("n_words") / length_band),
                    F.floor(F.col("n_words") / length_band) + 1,
                )
            )
        ),
    )
    a = banded.select(
        F.col("band"),
        F.col("doc_id").alias("doc_a"),
        F.col("wh").alias("wh_a"),
        F.col("n_words").alias("n_a"),
    )
    b = banded.select(
        F.col("band"),
        F.col("doc_id").alias("doc_b"),
        F.col("wh").alias("wh_b"),
        F.col("n_words").alias("n_b"),
    )
    return (
        a.join(b, ["band"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        # size filter: |A∩B| ≤ min(|A|,|B|) ⇒ J ≤ min/max — prune before
        # the O(|A|+|B|) intersect
        .filter(
            F.least(F.col("n_a"), F.col("n_b"))
            >= threshold * F.greatest(F.col("n_a"), F.col("n_b"))
        )
        # intersect computed once per pair (named column, not inlined)
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_b",
            F.size(F.array_intersect(F.col("wh_a"), F.col("wh_b"))).alias("inter"),
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def _shingles(words: Column, n: int = 2) -> Column:
    """Word n-gram shingles (falls back to single words for short docs)."""
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.get(words, i + j) for j in range(n)]),
    )
    return F.array_distinct(F.when(F.size(words) >= n, grams).otherwise(words))


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    shingle_n: int = 2,
) -> DataFrame:
    """MinHash + LSH near-dup pairs, verified with exact shingle Jaccard.

    Pipeline (all native Catalyst expressions, no Python):
    shingle (word ``shingle_n``-grams) → ``num_perm`` MinHash values
    (``array_min`` over seeded ``xxhash64``) → ``bands`` band signatures →
    explode → self-join per (band, signature) bucket → exact-Jaccard
    verification of the candidates.  With r = num_perm/bands rows per band,
    collision probability is 1-(1-J^r)^bands — the standard S-curve; pairs
    far below ``threshold`` almost never collide, so verification work
    tracks the true duplicate count, not N².
    """
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    rows_per_band = num_perm // bands

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        _shingles(_word_set(text_col), shingle_n).alias("shingles"),
    ).filter(F.size("shingles") > 0)

    def _minhash(p: int):
        return F.array_min(F.transform(F.col("shingles"), lambda s: F.xxhash64(F.lit(p), s)))

    sig = F.array(*[_minhash(p) for p in range(num_perm)])
    with_sig = base.withColumn("sig", sig)

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.get(F.col("sig"), b * rows_per_band + r) for r in range(rows_per_band)]
                ).alias("band_sig"),
            )
            for b in range(bands)
        ]
    )
    exploded = with_sig.select(
        "doc_id", "shingles", F.explode(band_structs).alias("bs")
    ).select("doc_id", "shingles", "bs.band", "bs.band_sig")

    a = exploded.select(
        "band",
        "band_sig",
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
    )
    b = exploded.select(
        "band",
        "band_sig",
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_fingerprint(words: Column, bits: int = 64) -> Column:
    """SimHash as a native expression: bit b of the fingerprint is set iff
    the majority of word hashes have bit b set (equivalently, the sign of
    Σ_words ±1 over bit b of ``xxhash64(word)``).

    One ``filter``+``size`` per bit — stays in whole-stage codegen (the
    repeated ``xxhash64(w)`` subtrees are deduplicated by codegen
    subexpression elimination); no Python."""
    def _bit_filter(b: int):
        return lambda w: F.shiftright(F.xxhash64(w), b).bitwiseAND(F.lit(1)) == 1

    n_words = F.size(words)
    fp = F.lit(0).cast("long")
    for b in range(bits):
        n_set = F.size(F.filter(words, _bit_filter(b)))
        bit_val = (1 << b) if b < bits - 1 else -(1 << (bits - 1))
        fp = fp.bitwiseOR(
            F.when(n_set * 2 > n_words, F.lit(bit_val).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return fp


def simhash_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ ``max_hamming``.

    Candidate generation: split the 64-bit fingerprint into
    ``max_hamming + 1`` 16-bit bands — any pair within Hamming r must agree
    exactly on ≥ 1 band (pigeonhole), so a per-band equi-join finds all of
    them; verification is native ``bit_count(a XOR b)``.
    """
    n_bands = max_hamming + 1
    band_bits = 64 // n_bands
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        simhash_fingerprint(_word_set(text_col)).alias("fp"),
    )
    banded = base.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("fp"), b * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "fp", "bv.band", "bv.band_val")

    a = banded.select("band", "band_val", F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a"))
    b = banded.select("band", "band_val", F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b"))
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns, computed with one
    sequential ``aggregate`` per term so the accumulation order is
    deterministic (oracle-hash-stable)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def embedding_near_dup(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
) -> DataFrame:
    """Cosine near-duplicate pairs over an embedding column.

    Brute-force within-corpus pairs (i < j) with native dot products —
    correct baseline at any scale where one side broadcasts; for larger
    corpora use :func:`simsearch.lsh_cosine_topk`'s bucketing instead."""
    base = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    a = base.select(F.col("vid").alias("id_a"), F.col("v").alias("v_a"))
    b = base.select(F.col("vid").alias("id_b"), F.col("v").alias("v_b"))
    cos = cosine_expr(F.col("v_a"), F.col("v_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
