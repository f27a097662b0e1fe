"""Product-quantization ANN on the integer grid [EXT] — the FAISS-class
ADC scan (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
Search") restated so that codebooks, codes, and query distances all
replay bit-exactly in the DuckDB oracle.

Why PQ beside the existing ANN paths: int8 scalar quantization
(``quantized_cosine_topk``) shrinks vectors 4× but still streams every
component of every vector past every query; LSH/IVF prune candidates
but score survivors at full width.  PQ compresses each vector to ``m``
SMALL CODES (here 16 × 4 bits) and scores a candidate with ``m`` table
lookups + adds — at 100 TB the corpus scan reads ~1 byte/vector-subspace
instead of 64 floats, and the per-query work is O(k_codes · dim) table
build + O(N · m) integer adds.  This is the memory-bandwidth shape that
makes billion-vector search tractable.

Determinism restatements (the ``grid_kmeans`` toolbox, per subspace):

* ONE GLOBAL int8 scale (corpus max |x|, a 1-row broadcast) — per-vector
  scales would make sub-distances incomparable across vectors;
  ``floor(x/g*127 + 0.5)`` is the established bit-identical device;
* per-subspace codebooks trained by Gonzalez farthest-point seeding +
  pinned Lloyd rounds, all distances EXACT int64 squared Euclidean,
  centroid updates truncating ``sum DIV count``, empty cells keep their
  centroid — every constant shared with the generated unrolled-CTE
  oracle (suite._pq_topk_oracle_sql);
* asymmetric distance (ADC): the query keeps its full sub-vectors, the
  corpus only its codes; ``dist(q, x) = Σ_s dtab[s][code_s(x)]`` — an
  int64 sum of m exact int64 cell distances, summation-order-free.

Scale shape: codebooks are ``m·k_codes`` rows (broadcast); the
per-round Lloyd aggregate is map-side-combined over corpus × sub-dim
longs; encoding is one broadcast join; the ADC distance table is
``|Q|·m·k_codes`` rows (queries small by contract — the cosine_topk
class) broadcast against the streaming code table; top-k is a per-query
WindowGroupLimit.  Nothing corpus-sized is collected or crossed.

Reference note: the reference repo (227-LoC pandas Flask app,
main.py) has no vector surface; this extends the SURVEY §2.10
similarity-search family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pq_topk", "pq_codebooks", "ivfpq_topk", "PQ_LLOYD_ROUNDS"]

# Pinned Lloyd iteration count per subspace, shared with the oracle
# generator (suite._pq_topk_oracle_sql) — fixed depth on both sides,
# never a convergence test only one side runs.
PQ_LLOYD_ROUNDS = 2


def _sq_dist(a: Column, b: Column) -> Column:
    """Exact int64 squared Euclidean distance between two long arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _corpus_scale(embeddings: DataFrame, *, vec_col: str) -> DataFrame:
    """1-row ``(g)`` corpus-wide quantization scale (max |x|)."""
    v = F.col(vec_col).cast("array<double>")
    return embeddings.select(v.alias("v")).select(
        F.greatest(
            F.max(F.array_max(F.transform(F.col("v"), F.abs))), F.lit(1e-30)
        ).alias("g")
    )


def _global_codes(
    embeddings: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    scale: DataFrame | None = None,
) -> DataFrame:
    """``(vec_id, q)``: GLOBAL-scale int8 codes — one corpus-wide scale
    (a 1-row broadcast) instead of the per-vector scale of
    ``quantize_expr``, because PQ compares SUB-vectors across different
    vectors and per-vector scales would make those distances
    incomparable.  ``scale`` injects a precomputed 1-row scale table so
    an EXTERNAL query set is encoded on the CORPUS's grid (queries must
    share the corpus scale or their ADC distances are meaningless)."""
    v = F.col(vec_col).cast("array<double>")
    base = embeddings.select(F.col(id_col).cast("long").alias("vec_id"), v.alias("v"))
    gs = scale if scale is not None else _corpus_scale(embeddings, vec_col=vec_col)
    q = F.transform(
        F.col("v"), lambda x: F.floor(x / F.col("g") * 127.0 + 0.5).cast("long")
    )
    return base.crossJoin(F.broadcast(gs)).select("vec_id", q.alias("q"))


def _subvectors(codes: DataFrame, *, m: int) -> DataFrame:
    """``(vec_id, s, sq)``: split each code vector into ``m`` contiguous
    sub-vectors — pure per-row codegen."""
    sub = (F.size(F.col("q")) / m).cast("int")
    return codes.select("vec_id", sub.alias("_sub"), "q").select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice(F.col("q"), s * F.col("_sub") + 1, F.col("_sub")),
            )
        ).alias("s", "sq"),
    )


def _assign(subq: DataFrame, centers: DataFrame) -> DataFrame:
    """Nearest codebook entry per (vec_id, s): ties → smallest cid."""
    scored = subq.join(F.broadcast(centers), "s").select(
        "vec_id", "s", "cid", _sq_dist(F.col("sq"), F.col("cv")).alias("dist")
    )
    return (
        scored.groupBy("vec_id", "s")
        .agg(F.min(F.struct(F.col("dist"), F.col("cid"))).alias("_b"))
        .select("vec_id", "s", F.col("_b.cid").alias("cid"), F.col("_b.dist").alias("dist"))
    )


def pq_codebooks(
    embeddings: DataFrame | None = None,
    *,
    m: int = 16,
    k_codes: int = 16,
    rounds: int = PQ_LLOYD_ROUNDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train per-subspace codebooks; returns ``(codes_full, subq,
    centers)`` where ``codes_full = (vec_id, q)`` is the global-scale
    full-width code table, ``subq = (vec_id, s, sq)`` its subspace
    split, and ``centers = (s, cid, cv)`` with ``cid`` in 1..k_codes
    (farthest-point selection order).  ``scale`` injects a precomputed
    1-row quantization-scale table (so a caller encoding an external
    query set on the same grid computes the corpus scale exactly once).
    ``codes`` injects a precomputed ``(vec_id, q)`` long-array code
    table and skips quantization entirely — :func:`ivfpq_topk` trains
    the PQ stage on coarse-cell RESIDUALS, which are already integers.
    All m subspaces train CONCURRENTLY: each seeding/Lloyd round is one
    job over the combined (vec, subspace) table, never a per-subspace
    loop of jobs."""
    if m < 1 or k_codes < 1:
        raise ValueError("m >= 1 and k_codes >= 1")
    if codes is not None:
        codes_full = codes.select(
            F.col("vec_id").cast("long").alias("vec_id"), "q"
        ).localCheckpoint()
    else:
        if embeddings is None:
            raise ValueError("pq_codebooks: pass embeddings or codes")
        codes_full = _global_codes(
            embeddings, id_col=id_col, vec_col=vec_col, scale=scale
        ).localCheckpoint()
    subq = _subvectors(codes_full, m=m).localCheckpoint()

    # Gonzalez farthest-point seeding, all subspaces per round at once:
    # the round's new center per subspace is the per-s argmax of dmin
    # (an m-row broadcast), exactly the grid_kmeans device keyed by s.
    w1 = Window.partitionBy("s").orderBy("vec_id")
    g = (
        subq.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") == 1)
        .select("s", F.col("vec_id").alias("_gvid"), F.col("sq").alias("_gcv"))
        .localCheckpoint()
    )
    centers = g.select("s", F.lit(1).alias("cid"), F.col("_gcv").alias("cv"))
    state = (
        subq.join(F.broadcast(g), "s")
        .filter(F.col("vec_id") != F.col("_gvid"))
        .select("s", "vec_id", "sq", _sq_dist(F.col("sq"), F.col("_gcv")).alias("dmin"))
        .localCheckpoint()
    )
    wn = Window.partitionBy("s").orderBy(F.desc("dmin"), "vec_id")
    for i in range(2, k_codes + 1):
        nxt = (
            state.withColumn("_rn", F.row_number().over(wn))
            .filter(F.col("_rn") == 1)
            .select("s", F.col("vec_id").alias("_gvid"), F.col("sq").alias("_gcv"))
            .localCheckpoint()
        )
        if not nxt.head(1):
            break  # k_codes exceeds corpus size
        centers = centers.unionByName(
            nxt.select("s", F.lit(i).alias("cid"), F.col("_gcv").alias("cv"))
        )
        if i == k_codes:
            break
        state = (
            state.join(F.broadcast(nxt), "s")
            .filter(F.col("vec_id") != F.col("_gvid"))
            .select(
                "s",
                "vec_id",
                "sq",
                F.least(F.col("dmin"), _sq_dist(F.col("sq"), F.col("_gcv"))).alias(
                    "dmin"
                ),
            )
            .localCheckpoint()
        )
    centers = centers.localCheckpoint()

    for _ in range(rounds):
        assign = _assign(subq, centers)
        sums = (
            assign.join(subq, ["vec_id", "s"])
            .select("s", "cid", F.posexplode("sq").alias("pos", "val"))
            .groupBy("s", "cid", "pos")
            .agg(F.sum("val").alias("_sv"), F.count(F.lit(1)).alias("_c"))
        )
        newc = (
            sums.select("s", "cid", "pos", F.expr("_sv DIV _c").alias("x"))
            .groupBy("s", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("x")))),
                    lambda t: t.getField("x"),
                ).alias("cv_new")
            )
        )
        centers = (
            centers.join(newc, ["s", "cid"], "left")
            .select("s", "cid", F.coalesce("cv_new", "cv").alias("cv"))
            .localCheckpoint()
        )
    return codes_full, subq, centers


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    *,
    m: int = 16,
    k_codes: int = 16,
    rounds: int = PQ_LLOYD_ROUNDS,
    k: int = 5,
    rerank: int = 100,
    query_mod: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_row_budget: int | None = None,
) -> DataFrame:
    """Top-``k`` neighbors per query: PQ asymmetric distance (ADC)
    prunes the corpus to the best ``rerank`` candidates per query, an
    EXACT int64 distance over the full-width codes then re-ranks those
    candidates — the FAISS ADC + refine pattern.  The refine stage is
    what makes small code budgets usable: whole clusters can collapse
    onto one PQ cell (identical ``pq_dist``), so rank-k among ties is
    arbitrary without it (measured recall@5 0.07 at the first-cut m=4/k=8
    config vs 0.96 at the shipped m=16/k=16/rerank=100 config on the
    driver corpus).  Self-matches excluded, all ties →
    smallest neighbor_id.

    The query set is an EXPLICIT ``queries`` DataFrame (``id_col``,
    ``vec_col``; encoded on the CORPUS's quantization grid — the scale
    is computed once and shared); when omitted it defaults to the
    in-repo convention ``corpus rows with vec_id % query_mod == 0``.

    Cost shape at 100 TB: the corpus-sized work is the code scan
    (``N·m`` lookup-adds against the per-query distance table).  That
    distance table is ``|Q|·m·k_codes`` rows — it scales with the QUERY
    SET, so its join strategy is auto-selected from plan statistics
    (``plans/probe.py``): small query set → broadcast (the corpus never
    shuffles); corpus-proportional query set → shuffle-hash join
    (VERDICT r7 #2 — the broadcast would OOM the driver).
    ``probe_row_budget`` overrides the broadcast cutoff.  The refine
    touches only ``|Q|·rerank`` rows.

    Returns ``(query_id, neighbor_id, pq_dist, dist_grid, rank)`` —
    ``pq_dist`` the int64 ADC estimate, ``dist_grid`` the exact int64
    squared distance, ``rank`` by ``(dist_grid, neighbor_id)``.
    """
    from ..plans.probe import PROBE_BROADCAST_ROW_BUDGET, probe_side

    budget = PROBE_BROADCAST_ROW_BUDGET if probe_row_budget is None else probe_row_budget
    scale = None
    if queries is not None:
        scale = _corpus_scale(corpus, vec_col=vec_col).localCheckpoint()
    codes_full, subq, centers = pq_codebooks(
        corpus, m=m, k_codes=k_codes, rounds=rounds, id_col=id_col,
        vec_col=vec_col, scale=scale,
    )
    codes = _assign(subq, centers).select("vec_id", "s", "cid")

    if queries is None:
        q_full = codes_full.filter(F.col("vec_id") % query_mod == 0)
        q_sub = subq.filter(F.col("vec_id") % query_mod == 0)
    else:
        q_full = _global_codes(
            queries, id_col=id_col, vec_col=vec_col, scale=scale
        ).localCheckpoint()
        q_sub = _subvectors(q_full, m=m)
    # The probe/distance-table row count is |Q|·m·k_codes.  Byte-derived
    # stats overestimate |Q| ~100× here (code rows are wide arrays, the
    # dtab rows that actually broadcast are 4 longs), so use a
    # LIMIT-bounded exact count instead: the limit short-circuits after
    # budget/(m·k_codes)+1 rows regardless of corpus size, and a capped
    # probe decides "shuffle" — the safe direction.
    q_cap = budget // (m * k_codes)
    n_q = q_full.limit(q_cap + 1).count()
    est_dtab = n_q * m * k_codes
    # When the LIMIT-bounded count saturates, |Q| is unknown (could be
    # corpus-sized) — the saturated value itself (~q_cap+1) is always
    # under the row budget, so feeding it to probe_side for the rerank
    # join would still broadcast the full-width query-code table.
    # Treat saturated as infinite so the rerank join goes shuffle_hash
    # too (ADVICE r8, medium).
    est_q = float("inf") if n_q > q_cap else float(n_q)

    qsub = q_sub.select(
        F.col("vec_id").alias("query_id"), "s", F.col("sq").alias("qsq")
    )
    dtab = qsub.join(F.broadcast(centers), "s").select(
        "query_id", "s", "cid", _sq_dist(F.col("qsq"), F.col("cv")).alias("d")
    )
    scores = (
        codes.join(probe_side(dtab, est_rows=est_dtab, row_budget=budget), ["s", "cid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").cast("long").alias("pq_dist"))
    )
    wc = Window.partitionBy("query_id").orderBy("pq_dist", "neighbor_id")
    cand = scores.withColumn("_crn", F.row_number().over(wc)).filter(
        F.col("_crn") <= rerank
    )

    qfull = q_full.select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("_qq")
    )
    rer = (
        cand.join(
            probe_side(qfull, est_rows=est_q, row_budget=budget),
            "query_id",
        )
        .join(
            codes_full.select(F.col("vec_id").alias("neighbor_id"), F.col("q").alias("_nq")),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            "pq_dist",
            _sq_dist(F.col("_nq"), F.col("_qq")).alias("dist_grid"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("dist_grid", "neighbor_id")
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "pq_dist", "dist_grid", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    *,
    k_cells: int = 8,
    n_probe: int = 4,
    m: int = 8,
    k_codes: int = 16,
    coarse_rounds: int | None = None,
    pq_rounds: int = PQ_LLOYD_ROUNDS,
    k: int = 5,
    rerank: int = 100,
    query_mod: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_row_budget: int | None = None,
) -> DataFrame:
    """IVF + PQ composition — FAISS IVFADC (Jégou et al. 2011 §V), the
    production billion-vector ANN layout, restated on the integer grid
    so every stage hash-checks in DuckDB:

    * coarse quantizer: :func:`..clustering.grid_kmeans_model` over the
      GLOBAL-scale codes (``_global_codes`` — one corpus-wide scale, so
      residuals are comparable across vectors; the per-vector device of
      ``grid_ivf_topk`` cannot feed a shared PQ codebook);
    * residual encoding: ``r = q - cell_centroid`` (exact int64), then
      ONE shared PQ codebook set trained on residuals (:func:`
      pq_codebooks` with ``codes=`` — FAISS's default shared-codebook
      IVFADC, not per-cell codebooks);
    * query: probe the ``n_probe`` nearest cells, build the per-(query,
      cell) ADC distance table from the QUERY'S residual in that cell,
      table-lookup-add over only the codes assigned to probed cells;
    * exact full-width refine of the top ``rerank`` (the ADC estimate
      quantizes hard at small code budgets — same rationale as
      :func:`pq_topk`).

    Why this beats its two halves at 100 TB: ``grid_ivf_topk`` prunes
    to ~``n_probe/k_cells`` of the corpus but scores survivors at full
    width (64 longs/vector); ``pq_topk`` reads ~``m`` bytes/vector but
    scans EVERY vector.  IVFADC does both — the scan touches only
    probed cells AND reads only code bytes, which is why FAISS ships it
    as the default billion-scale index.

    Scale shape: everything corpus-sized is inherited from the halves —
    the coarse assignment is a k_cells-row broadcast against the
    streaming codes, PQ training aggregates are map-side-combined, and
    the inverted code lists NEVER shuffle on the cell key: the ADC
    distance table (``|Q|·n_probe·m·k_codes`` rows) scales with the
    query set, so its join strategy is auto-selected from a
    LIMIT-bounded exact query count (``plans/probe.py``): small query
    set → broadcast, corpus-proportional or saturated count →
    shuffle-hash (the pq_topk saturation rule, ADVICE r8).

    Returns ``(query_id, neighbor_id, pq_dist, dist_grid, rank)`` —
    ``pq_dist`` the int64 ADC estimate on residuals, ``dist_grid`` the
    exact int64 squared grid distance, ``rank`` by ``(dist_grid,
    neighbor_id)``; self-matches excluded, ties → smallest neighbor_id.
    Oracle: suite._ivfpq_oracle_sql replays coarse k-means → residuals
    → PQ → probe → ADC → refine end to end.

    Reference note: the reference repo (main.py, 227 LoC pandas Flask
    app) has no vector surface; this completes the SURVEY §2.10 ANN
    family's production shape.
    """
    from ..plans.probe import PROBE_BROADCAST_ROW_BUDGET, probe_side
    from .clustering import GRID_KMEANS_ROUNDS, _assign_to, grid_kmeans_model

    if coarse_rounds is None:
        coarse_rounds = GRID_KMEANS_ROUNDS
    if n_probe < 1 or k < 1 or rerank < k:
        raise ValueError("n_probe >= 1, k >= 1, rerank >= k")
    n_probe = min(n_probe, k_cells)
    from pyspark.sql import Window

    scale = _corpus_scale(corpus, vec_col=vec_col).localCheckpoint()
    codes_full = _global_codes(
        corpus, id_col=id_col, vec_col=vec_col, scale=scale
    ).localCheckpoint()

    # coarse cells on the global grid; asg = (vec_id, cell)
    _, cells = grid_kmeans_model(codes=codes_full, k=k_cells, rounds=coarse_rounds)
    asg = (
        _assign_to(codes_full, cells)
        .select("vec_id", F.col("cid").alias("cell"))
        .localCheckpoint()
    )
    cellv = cells.select(F.col("cid").alias("cell"), F.col("cv").alias("cellv"))

    # residual codes r = q - cell centroid (exact int64, same grid)
    resid = (
        codes_full.join(asg, "vec_id")
        .join(F.broadcast(cellv), "cell")
        .select("vec_id", F.zip_with("q", "cellv", lambda x, y: x - y).alias("q"))
    )
    _, subq_r, cbooks = pq_codebooks(codes=resid, m=m, k_codes=k_codes, rounds=pq_rounds)
    pcodes = _assign(subq_r, cbooks).select("vec_id", "s", "cid")
    # inverted code lists: (vec_id, cell, s, cid) — the IVFADC index
    codes_cell = pcodes.join(asg, "vec_id")

    if queries is None:
        q_full = codes_full.filter(F.col("vec_id") % query_mod == 0)
    else:
        q_full = _global_codes(
            queries, id_col=id_col, vec_col=vec_col, scale=scale
        ).localCheckpoint()

    # dtab is |Q|·n_probe·m·k_codes rows; LIMIT-bounded exact |Q| count,
    # saturated ⇒ treat as infinite so BOTH query-scaled joins go
    # shuffle-hash (the pq_topk device, ADVICE r8)
    budget = PROBE_BROADCAST_ROW_BUDGET if probe_row_budget is None else probe_row_budget
    q_cap = budget // (n_probe * m * k_codes)
    n_q = q_full.limit(q_cap + 1).count()
    est_q = float("inf") if n_q > q_cap else float(n_q)
    est_dtab = est_q * n_probe * m * k_codes

    # probe the n_probe nearest cells; keep the query residual per cell
    wp = Window.partitionBy("query_id").orderBy("cdist", "cell")
    probe = (
        q_full.select(F.col("vec_id").alias("query_id"), F.col("q").alias("qq"))
        .crossJoin(F.broadcast(cellv))
        .select(
            "query_id",
            "qq",
            "cell",
            "cellv",
            _sq_dist(F.col("qq"), F.col("cellv")).alias("cdist"),
        )
        .withColumn("_pn", F.row_number().over(wp))
        .filter(F.col("_pn") <= n_probe)
        .select(
            "query_id", "cell", F.zip_with("qq", "cellv", lambda x, y: x - y).alias("qr")
        )
    )
    sub = (F.size(F.col("qr")) / m).cast("int")
    qsub = probe.select("query_id", "cell", sub.alias("_sub"), "qr").select(
        "query_id",
        "cell",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice(F.col("qr"), s * F.col("_sub") + 1, F.col("_sub")),
            )
        ).alias("s", "qsq"),
    )
    dtab = qsub.join(F.broadcast(cbooks), "s").select(
        "query_id", "cell", "s", "cid", _sq_dist(F.col("qsq"), F.col("cv")).alias("d")
    )
    scores = (
        codes_cell.join(
            probe_side(dtab, est_rows=est_dtab, row_budget=budget), ["cell", "s", "cid"]
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").cast("long").alias("pq_dist"))
    )
    wc = Window.partitionBy("query_id").orderBy("pq_dist", "neighbor_id")
    cand = scores.withColumn("_crn", F.row_number().over(wc)).filter(
        F.col("_crn") <= rerank
    )
    qfull_t = q_full.select(F.col("vec_id").alias("query_id"), F.col("q").alias("_qq"))
    rer = (
        cand.join(probe_side(qfull_t, est_rows=est_q, row_budget=budget), "query_id")
        .join(
            codes_full.select(
                F.col("vec_id").alias("neighbor_id"), F.col("q").alias("_nq")
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            "pq_dist",
            _sq_dist(F.col("_nq"), F.col("_qq")).alias("dist_grid"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("dist_grid", "neighbor_id")
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "pq_dist", "dist_grid", "rank")
    )
