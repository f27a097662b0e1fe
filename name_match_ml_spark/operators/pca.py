"""Hash-checkable PCA on the integer grid [EXT] — the dominant
principal component of the embedding corpus by power iteration, every
step exact int64 so the DuckDB oracle replays bit-identically.

Why PCA in the curation toolbox: the top principal direction of an
embedding corpus is the workhorse of embedding post-processing —
all-but-the-top / whitening (Mu & Viswanath 2018, "All-but-the-Top"),
the rotation seed of OPQ (Ge et al. 2013), spread-axis partitioning for
ANN sharding, and 1-d curriculum/layout orderings.  MLlib's PCA (SVD on
float sums) cannot be the hash-checked representative for the same
reason float KMeans could not (``grid_kmeans``): float reductions are
summation-order dependent.

Determinism restatements (the grid_kmeans/pq toolbox):

* ONE GLOBAL int8 scale (corpus max |x|, 1-row broadcast), the pq
  convention — ``floor(x/g*127 + 0.5)``;
* centering by truncating integer means ``sum DIV count``;
* the scatter matrix ``S[i][j] = Σ c_i·c_j`` is an EXACT int64 sum
  (|c| ≤ 254, safe for corpora up to ~1.4e14 rows);
* S is rescaled ONCE by ``D = max|S| DIV 2^36 + 1`` (integer, both
  engines identical) so every matrix-vector product stays inside
  int64: |S'| ≤ 2^36, |v| ≤ 2^20, d ≤ 64 → |w| ≤ 2^62;
* each power round renormalizes by pure integer division:
  ``v' = w DIV (max|w| DIV 2^20 + 1)`` — no sqrt, no floats, no norm;
* a FIXED round count (:data:`GRID_PCA_ROUNDS`) shared with the oracle
  generator (suite._grid_pca_oracle_sql) — never a convergence test
  only one side runs;
* the final direction's sign is canonicalized (first nonzero component
  positive) so the projection is orientation-stable.

Scale shape (100 TB): the corpus-sized work is ONE pass building the
d²-element per-row outer product (whole-stage codegen, no UDF) feeding a
map-side-combined ``groupBy(pos)`` — each task forwards at most d²=4096
partial sums regardless of row count.  Everything after (the scatter,
the iteration vectors) is d²/d rows on the driver-side-safe scale of
KILOBYTES; the per-round joins are broadcast by construction.  The
projection pass is one zip_with fold per row against a 1-row broadcast
of the final direction.  Nothing corpus-sized shuffles twice and nothing
corpus-sized is collected.

Reference note: the reference repo (main.py, 227-LoC pandas Flask app)
has no vector surface; this extends the SURVEY §2.10 embedding family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "grid_pca",
    "grid_pca_components",
    "pca_residual",
    "GRID_PCA_ROUNDS",
    "PCA_VSCALE",
    "PCA_SBOUND",
]

# Pinned power-iteration depth, shared with suite._grid_pca_oracle_sql.
GRID_PCA_ROUNDS = 8
# |v| bound (2^20) and |S'| bound (2^36): 64 · 2^36 · 2^20 = 2^62 < int64.
PCA_VSCALE = 1 << 20
PCA_SBOUND = 1 << 36


def _dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two long arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def grid_pca_components(
    embeddings: DataFrame,
    *,
    rounds: int = GRID_PCA_ROUNDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """``(centered, direction)``: the checkpointed centered code table
    ``(vec_id, c)`` and the 1-row sign-canonicalized power-iteration
    direction ``(v)`` — shared by :func:`grid_pca` (projection) and
    :func:`pca_residual` (all-but-the-top removal)."""
    if rounds < 1:
        raise ValueError("rounds >= 1")
    from .pq import _global_codes

    # int64-safety envelope guard: the power-iteration matvec bound is
    # |w| <= d * |S'| * |v| = d * 2^36 * 2^20, which stays under 2^63
    # only for d <= 64.  Beyond that Spark (non-ANSI) silently wraps
    # while DuckDB raises — a caller with e.g. 768-dim embeddings would
    # get silently wrong principal directions.  Guard on the MAX
    # observed dimension — a single-row sample would let mixed-width or
    # null-first data bypass the guard (ADVICE r8); one map-side
    # aggregate is noise next to the d² scatter passes that follow.
    d_max = embeddings.select(F.max(F.size(F.col(vec_col))).alias("d")).first()["d"]
    if d_max is not None and d_max > 64:
        raise ValueError(
            f"grid_pca supports embedding dimension <= 64 (got {d_max}): "
            "the exact-int64 envelope |w| <= d*2^36*2^20 requires d <= 64; "
            "reduce dimension or lower PCA_VSCALE/PCA_SBOUND accordingly"
        )

    codes = _global_codes(embeddings, id_col=id_col, vec_col=vec_col).localCheckpoint()

    # Truncating integer mean per dimension, rebuilt as a 1-row array
    # (bounded-dimension broadcast).
    mu = (
        codes.select(F.posexplode("q").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.expr("sum(x) DIV count(*)").alias("m"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda t: t.getField("m"),
            ).alias("mu")
        )
    )
    centered = codes.crossJoin(F.broadcast(mu)).select(
        "vec_id", F.zip_with("q", "mu", lambda x, m: x - m).alias("c")
    ).localCheckpoint()

    # Scatter matrix: per-row flat outer product (d² longs, pure
    # codegen) → map-side-combined groupBy(pos).  d² rows total.
    scat = (
        centered.select(
            F.posexplode(
                F.flatten(
                    F.transform(
                        "c", lambda x: F.transform("c", lambda y: x * y)
                    )
                )
            ).alias("pos", "val")
        )
        .groupBy("pos")
        .agg(F.sum("val").alias("s"))
    )
    d0 = scat.agg(
        (F.max(F.abs(F.col("s"))).cast("long")).alias("m0")
    ).select((F.expr(f"m0 DIV {PCA_SBOUND}") + F.lit(1)).alias("dd"))
    dim = F.size(F.col("c"))
    ncols = centered.select(dim.alias("d")).limit(1)
    sn = (
        scat.crossJoin(F.broadcast(d0))
        .crossJoin(F.broadcast(ncols))
        .select(
            F.expr("pos DIV d").alias("i"),
            (F.col("pos") % F.col("d")).alias("j"),
            F.expr("s DIV dd").alias("s"),
        )
        .localCheckpoint()
    )

    # Power iteration on d-row tables (kilobytes; broadcast joins).
    v = ncols.select(
        F.explode(F.sequence(F.lit(0), F.col("d") - 1)).alias("j")
    ).select("j", F.lit(PCA_VSCALE).cast("long").alias("val"))
    for _ in range(rounds):
        w = (
            sn.join(F.broadcast(v), "j")
            .groupBy("i")
            .agg(F.sum(F.col("s") * F.col("val")).alias("wv"))
        )
        mx = w.agg(F.max(F.abs(F.col("wv"))).alias("m")).select(
            (F.expr(f"m DIV {PCA_VSCALE}") + F.lit(1)).alias("den")
        )
        v = (
            w.crossJoin(F.broadcast(mx))
            .select(F.col("i").alias("j"), F.expr("wv DIV den").alias("val"))
            .localCheckpoint()
        )

    # Sign canonicalization: first nonzero component positive.
    sgn = v.filter(F.col("val") != 0).agg(
        F.min(F.struct("j", "val")).alias("f")
    ).select(
        F.coalesce(
            F.when(F.col("f.val") < 0, F.lit(-1)).otherwise(F.lit(1)), F.lit(1)
        ).cast("long").alias("sgn")
    )
    varr = (
        v.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "val"))),
                lambda t: t.getField("val"),
            ).alias("v")
        )
        .crossJoin(F.broadcast(sgn))
        .select(F.transform("v", lambda x: x * F.col("sgn")).alias("v"))
    )

    return centered, varr


def grid_pca(
    embeddings: DataFrame,
    *,
    rounds: int = GRID_PCA_ROUNDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project every vector onto the corpus's dominant principal
    direction, entirely on the int64 grid.  Returns ``(vec_id,
    proj_grid)`` — the exact integer dot product of the centered
    quantized vector with the (integer-scaled, sign-canonicalized)
    power-iteration direction.  Downstream uses: 1-d diversity/layout
    orderings, all-but-the-top removal, spread-axis partitioning.
    """
    centered, varr = grid_pca_components(
        embeddings, rounds=rounds, id_col=id_col, vec_col=vec_col
    )
    return centered.crossJoin(F.broadcast(varr)).select(
        "vec_id", _dot(F.col("c"), F.col("v")).alias("proj_grid")
    )


def pca_residual(
    embeddings: DataFrame,
    *,
    rounds: int = GRID_PCA_ROUNDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-but-the-top (Mu & Viswanath 2018): remove the dominant
    principal direction from every centered vector, exactly on the int64
    grid.  Common-mode energy in an embedding corpus (the shared "top"
    direction) washes out cosine contrast; stripping it is the standard
    cheap post-processing before similarity search or clustering.

    The rejection is computed WITHOUT division inside the vector math —
    ``r = c·(v·v) − v·(c·v)`` is the exact integer rejection scaled by
    ``|v|²`` (orthogonal to v by construction, and invariant to the
    direction's sign since v appears an even number of times) — then
    brought back to code magnitude by one exact integer downscale
    ``r DIV (|v|² DIV 2^8 + 1)``.  Bounds: |c| ≤ 2^9, |v|² ≤ 2^46,
    c·v ≤ 2^34 → every term ≤ 2^55 < int64.

    Returns ``(vec_id, resid)`` with ``resid`` an int64 array.  Scale
    shape: one 1-row direction broadcast, one codegen pass per row — no
    shuffle beyond :func:`grid_pca_components`.
    """
    centered, varr = grid_pca_components(
        embeddings, rounds=rounds, id_col=id_col, vec_col=vec_col
    )
    stats = varr.select(
        F.col("v"),
        _dot(F.col("v"), F.col("v")).alias("vv"),
    ).select("v", "vv", (F.expr("vv DIV 256") + F.lit(1)).alias("den"))
    return (
        centered.crossJoin(F.broadcast(stats))
        .withColumn("proj", _dot(F.col("c"), F.col("v")))
        .select(
            "vec_id",
            F.expr(
                "transform(zip_with(c, v, (ci, vi) -> ci * vv - vi * proj),"
                " x -> x DIV den)"
            ).alias("resid"),
        )
    )
