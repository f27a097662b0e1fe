"""Round-5 operators: Hilbert layout key, sweep-line interval
concurrency, MinHash estimate audit, min-max feature scaling, kNN
confusion metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _xy2d_ref(bits: int, x: int, y: int) -> int:
    """Reference Hilbert xy→d (the classic iterative formulation)."""
    side = 1 << bits
    d = 0
    s = side // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = side - 1 - x
                y = side - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_on_full_grid(spark):
    from name_match_ml_spark.functions.layout import with_hilbert_key

    bits = 4
    side = 1 << bits
    pts = spark.createDataFrame(
        [(x, y) for x in range(side) for y in range(side)], ["x", "y"]
    )
    rows = (
        with_hilbert_key(pts, F.col("x"), F.col("y"), bits=bits)
        .select("x", "y", "hkey")
        .collect()
    )
    assert len(rows) == side * side
    for r in rows:
        assert r.hkey == _xy2d_ref(bits, r.x, r.y), (r.x, r.y)


def test_hilbert_is_a_bijection_with_unit_steps(spark):
    """The defining curve property: d ↦ (x, y) is a bijection onto the
    grid and CONSECUTIVE d are grid-adjacent (Manhattan distance 1) —
    this is exactly why Hilbert ranges beat Morton ranges for layout."""
    from name_match_ml_spark.functions.layout import with_hilbert_key

    bits = 4
    side = 1 << bits
    pts = spark.createDataFrame(
        [(x, y) for x in range(side) for y in range(side)], ["x", "y"]
    )
    rows = (
        with_hilbert_key(pts, F.col("x"), F.col("y"), bits=bits)
        .select("x", "y", "hkey")
        .collect()
    )
    by_d = {r.hkey: (r.x, r.y) for r in rows}
    assert sorted(by_d) == list(range(side * side))
    for d in range(1, side * side):
        (x0, y0), (x1, y1) = by_d[d - 1], by_d[d]
        assert abs(x1 - x0) + abs(y1 - y0) == 1, (d, by_d[d - 1], by_d[d])


def test_interval_concurrency_hand_case(spark):
    from name_match_ml_spark.operators.analytics import interval_concurrency

    # day 1: [0,10), [5,15), [10,20) — the touch at t=10 must NOT
    # overlap (end-exclusive): peak is 2, not 3.
    rows = [
        ("d1", 0, 10),
        ("d1", 5, 10),
        ("d1", 10, 10),
        # day 2: nested [0,100) ⊃ [10,20) ⊃ [12,13): peak 3
        ("d2", 0, 100),
        ("d2", 10, 10),
        ("d2", 12, 1),
    ]
    df = spark.createDataFrame(rows, ["day", "start_s", "dur_s"])
    out = {r.day: r for r in interval_concurrency(df, "day").collect()}
    assert out["d1"].max_concurrent == 2
    # occupancy: conc 1 on [0,5), 2 on [5,10), 2 on [10,15), 1 on [15,20)
    assert out["d1"].busy_s == 1 * 5 + 2 * 5 + 2 * 5 + 1 * 5
    assert out["d1"].span_s == 20
    assert out["d2"].max_concurrent == 3
    assert out["d2"].busy_s == 100 + 10 + 1  # each interval's length once
    assert out["d2"].avg_concurrency == pytest.approx(111 / 100.0)


def test_minhash_audit_identical_docs_and_error_bound(spark):
    from name_match_ml_spark.operators.dedup import minhash_estimate_audit

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
            (3, "alpha beta gamma delta epsilon eta"),  # near dup
        ],
        ["doc_id", "text"],
    )
    out = {(r.doc_a, r.doc_b): r for r in minhash_estimate_audit(docs, num_perm=16).collect()}
    dup = out[(1, 2)]
    assert dup.n_match == 16
    assert dup.est_grid == 1_000_000_000
    assert dup.exact_grid == 1_000_000_000
    assert dup.err_grid == 0
    near = out[(1, 3)]
    assert near.exact_grid < 1_000_000_000
    # 16 perms ⇒ stderr ≈ sqrt(J(1-J)/16) ≤ 0.125; 4 sigma bound
    assert near.err_grid <= 500_000_000


def test_minhash_audit_est_matches_signature_fraction(spark):
    """est_grid is BY CONSTRUCTION n_match/num_perm on the grid — pin
    the arithmetic (integer floor division, no floats)."""
    from name_match_ml_spark.operators.dedup import minhash_estimate_audit

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    for r in minhash_estimate_audit(docs, num_perm=16, threshold=0.3).collect():
        assert r.est_grid == (r.n_match * 1_000_000_000) // 16
        assert r.exact_grid == (r.inter * 1_000_000_000) // r.uni
        assert r.err_grid == abs(r.est_grid - r.exact_grid)


def test_feature_minmax_range_and_extremes(spark):
    from name_match_ml_spark.suite import q_feature_minmax

    out = q_feature_minmax(spark, SF_DIR)
    agg = out.groupBy("dim").agg(
        F.min("scaled_grid").alias("lo"),
        F.max("scaled_grid").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    for r in agg.collect():
        assert r.lo == 0  # the min element maps to exactly 0
        assert r.hi == 1_000_000  # the max element maps to exactly 1e6
        assert r.n > 0


def test_ml_confusion_sums_consistent(spark):
    from name_match_ml_spark.suite import q_knn_label, q_ml_confusion

    preds = q_knn_label(spark, SF_DIR).collect()
    m = {r.label: r for r in q_ml_confusion(spark, SF_DIR).collect()}
    n_correct = sum(1 for p in preds if p.correct)
    assert sum(r.tp for r in m.values()) == n_correct
    assert sum(r.tp + r.fn for r in m.values()) == len(preds)
    assert sum(r.tp + r.fp for r in m.values()) == len(preds)
    for r in m.values():
        if r.prec_grid is not None:
            assert 0 <= r.prec_grid <= 1_000_000_000
        if r.f1_grid is not None:
            assert r.f1_grid <= max(r.prec_grid, r.rec_grid)


def test_cusum_finds_planted_level_shift(spark):
    """Plant a mean shift at a known day: CUSUM's |S| argmax must land
    on the boundary of the two regimes."""
    from pyspark.sql import Window

    # 30 days at level 10, then 30 days at level 30
    rows = [(f"2024-01-{d:02d}" if d <= 31 else f"2024-02-{d-31:02d}",
             10 if d <= 30 else 30) for d in range(1, 61)]
    df = spark.createDataFrame(rows, ["day_s", "x"]).select(
        F.to_date("day_s").alias("day"), "x"
    )
    w = Window.orderBy("day")
    wall = Window.partitionBy()
    cum = df.select(
        "day", "x",
        F.row_number().over(w).cast("long").alias("i"),
        F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("c"),
        F.sum("x").over(wall).alias("t"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).select("day", "x", (F.col("n") * F.col("c") - F.col("i") * F.col("t")).alias("s"))
    rows_out = cum.collect()
    peak = max(rows_out, key=lambda r: (abs(r.s), ))
    # regime boundary: last day of the low regime (2024-01-30)
    assert str(peak.day) == "2024-01-30"


def test_graph_modularity_bounds_and_identity(spark):
    from name_match_ml_spark.suite import q_graph_modularity

    r = q_graph_modularity(spark, SF_DIR).first()
    assert r.q_den == 4 * r.m_edges * r.m_edges
    assert r.q_num <= r.q_den
    # Newman modularity of any partition lies in [-0.5, 1]
    assert -0.5 <= r.modularity <= 1.0
    # CC communities contain ALL their edges: Q = 1 - sum(d_c^2)/4m^2 < 1
    assert r.modularity < 1.0


def test_market_share_within_unit_interval(spark):
    from name_match_ml_spark.suite import q_market_share

    for r in q_market_share(spark, SF_DIR).collect():
        assert 0.0 <= r.mkt_share <= 1.0


def test_robust_outliers_resists_one_extreme(spark):
    """The reason median/MAD exists: ONE extreme value must not move
    the fence (a z-score monitor's mean/std both move)."""
    from name_match_ml_spark.suite import q_robust_outliers

    rows = [("a", float(v)) for v in [10, 11, 12, 10, 11, 12, 10, 11, 12, 1000000]]
    df = spark.createDataFrame(rows, ["event_type", "value"])
    import name_match_ml_spark.suite as suite_mod

    # drive the same logic through a temp table shim
    e = df.select("event_type", F.floor(F.col("value") * 1000000).cast("long").alias("v"))
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("v")
    wt = Window.partitionBy("event_type")
    med = (
        e.select("event_type", "v", F.row_number().over(w).alias("rn"),
                 F.count(F.lit(1)).over(wt).alias("n"))
        .filter(F.col("rn") == ((F.col("n") + 1) / 2).cast("long"))
        .select("event_type", F.col("v").alias("med"))
    ).first()
    assert med.med == 11_000_000  # the median ignores the 1e6 spike
    out = q_robust_outliers(spark, "/root/testdata/sf0.001").collect()
    for r in out:
        assert 0 <= r.n_outliers <= r.n
        assert r.mad_fp >= 0


def test_copurchase_lift_identities(spark):
    from name_match_ml_spark.suite import q_copurchase_lift

    rows = q_copurchase_lift(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows:
        # support can never exceed either item's support
        assert r.support <= min(r.supp_a, r.supp_b)
        assert r.lift_grid >= 0


def test_kmv_overlap_exact_when_small(spark):
    """With both domains smaller than k the sketch IS the exact sets:
    jaccard and intersection estimates must equal the true values."""
    from name_match_ml_spark.functions.sketches import kmv_overlap

    a = spark.createDataFrame([(i,) for i in range(30)], ["k"])
    b = spark.createDataFrame([(i,) for i in range(20, 50)], ["k"])
    r = kmv_overlap(a, "k", b, "k", k=256).first()
    # |A|=30, |B|=30, inter=10, union=50
    assert r.m == 50
    assert r.y == 10
    assert r.est_union == 50
    assert r.est_inter == 10
    assert r.jaccard_grid == (10 * 1_000_000_000) // 50


def test_kmv_overlap_estimator_within_error(spark):
    """Estimator path (union > k): within ~5 standard errors of truth."""
    from name_match_ml_spark.functions.sketches import kmv_overlap

    a = spark.createDataFrame([(i,) for i in range(2000)], ["k"])
    b = spark.createDataFrame([(i,) for i in range(1000, 3000)], ["k"])
    r = kmv_overlap(a, "k", b, "k", k=256).first()
    assert r.m == 256
    # true union 3000, inter 1000; stderr ~ union/sqrt(k-2) ~ 188
    assert abs(r.est_union - 3000) < 5 * 200
    assert abs(r.est_inter - 1000) < 5 * 300


# ---------------------------------------------------------------- k-core


def test_k_core_clique_survives_chain_peels(spark):
    """A triangle+pendant and a 5-chain: the triangle is the whole
    2-core (pendant and chain peel away); core degrees are the degrees
    INSIDE the core, not in the input graph."""
    edges = [
        (1, 2), (2, 3), (1, 3),   # triangle: the 2-core
        (3, 9),                    # pendant off the triangle
        (10, 11), (11, 12), (12, 13), (13, 14),  # chain: peels entirely
    ]
    from name_match_ml_spark.operators.graph import k_core

    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    out = {(r.id, r.core_deg) for r in k_core(df, k=2).collect()}
    assert out == {(1, 2), (2, 2), (3, 2)}  # node 3's pendant edge gone


def test_k_core_k3_and_empty(spark):
    """k=3 on a 4-clique minus one edge is empty (every peel cascades);
    on the full 4-clique it is the clique itself."""
    from name_match_ml_spark.operators.graph import k_core

    full = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df_full = spark.createDataFrame(full, ["doc_a", "doc_b"])
    assert {(r.id, r.core_deg) for r in k_core(df_full, k=3).collect()} == {
        (0, 3), (1, 3), (2, 3), (3, 3)
    }
    df_miss = spark.createDataFrame([e for e in full if e != (2, 3)], ["doc_a", "doc_b"])
    assert k_core(df_miss, k=3).count() == 0


def test_k_core_rounds_bounded_on_long_chain(spark):
    """Peeling a 2k-long chain burns one round per two endpoints — the
    round counter exposes it; the near-dup default (shallow graphs)
    converges in ≤ 3 rounds, which is what the 24-round oracle unroll
    relies on."""
    from name_match_ml_spark.operators import graph

    chain = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(chain, ["doc_a", "doc_b"])
    assert graph.k_core(df, k=2).count() == 0
    assert graph.last_rounds <= 8  # ceil(12/2) peels + the fixpoint probe

    tri = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["doc_a", "doc_b"])
    graph.k_core(tri, k=2)
    assert graph.last_rounds <= 2


# ------------------------------------------------- multi-touch attribution


def test_attribution_linear_splits_credit_exactly(spark):
    """Two touches before one purchase split 1e6 as 500000 each; a
    touch AFTER the last purchase earns nothing; a touch outside the
    lookback earns nothing."""
    import datetime as dt

    from name_match_ml_spark.operators.analytics import attribution_linear

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)

    def ev(eid, ts_off_s, user, ty):
        return (eid, t0 + dt.timedelta(seconds=ts_off_s), user, ty, 0.0, "{}")

    rows = [
        ev(1, -3600, 7, "click"),
        ev(2, -1800, 7, "view"),
        ev(3, 0, 7, "purchase"),
        ev(4, 100, 7, "click"),              # after the only purchase
        ev(5, -8 * 86400, 9, "view"),        # outside 7-day lookback
        ev(6, 0, 9, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {r.channel: (r.touches, r.credit_micro) for r in attribution_linear(df).collect()}
    assert out == {"click": (1, 500000), "view": (1, 500000)}


def test_attribution_linear_same_ts_and_next_conversion(spark):
    """A touch AT the conversion timestamp attributes to it (min conv id
    on ties), and a touch between two purchases credits only the next
    one — the three-way split floors to 333333 micro each."""
    import datetime as dt

    from name_match_ml_spark.operators.analytics import attribution_linear

    t0 = dt.datetime(2024, 3, 1)

    def ev(eid, ts_off_s, user, ty):
        return (eid, t0 + dt.timedelta(seconds=ts_off_s), user, ty, 0.0, "{}")

    rows = [
        ev(1, 0, 5, "click"),      # at conv ts -> attributes to conv 2
        ev(2, 0, 5, "purchase"),
        ev(3, 10, 5, "view"),      # between conv 2 and conv 6 -> conv 6
        ev(4, 20, 5, "click"),
        ev(5, 30, 5, "view"),
        ev(6, 40, 5, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {r.channel: (r.touches, r.credit_micro) for r in attribution_linear(df).collect()}
    # conv 2: {click 1} alone -> 1000000; conv 6: {view 3, click 4, view 5}
    # -> 333333 each (floor)
    assert out == {
        "click": (2, 1000000 + 333333),
        "view": (2, 2 * 333333),
    }


def test_clustering_coeff_triangle_vs_hub(spark):
    """A closed triangle scores 1e6 (every wedge closed); a 4-star hub
    scores 0 with deg 4 (no wedge closed); leaves score 0 by the
    deg<2 convention.  Exercises the suite query's exact grid."""
    import pyspark.sql.functions as SF

    from name_match_ml_spark.operators.graph import triangles

    edges = [(1, 2), (2, 3), (1, 3), (10, 20), (10, 21), (10, 22), (10, 23)]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    tri = triangles(pairs)
    tn = (
        tri.select(SF.explode(SF.array("node_a", "node_b", "node_c")).alias("id"))
        .groupBy("id")
        .agg(SF.count(SF.lit(1)).alias("tri_n"))
    )
    e = pairs.select(
        SF.least("doc_a", "doc_b").alias("u"), SF.greatest("doc_a", "doc_b").alias("v")
    ).dropDuplicates(["u", "v"])
    deg = (
        e.select(SF.col("u").alias("id"))
        .unionAll(e.select(SF.col("v").alias("id")))
        .groupBy("id")
        .agg(SF.count(SF.lit(1)).alias("deg"))
    )
    out = {
        r.id: (r.deg, r.coeff)
        for r in deg.join(tn, "id", "left")
        .select(
            "id",
            "deg",
            SF.when(
                SF.col("deg") >= 2,
                SF.expr("(2000000 * COALESCE(tri_n, 0)) div (deg * (deg - 1))"),
            )
            .otherwise(SF.lit(0).cast("long"))
            .alias("coeff"),
        )
        .collect()
    }
    assert out[1] == (2, 1000000) and out[2] == (2, 1000000) and out[3] == (2, 1000000)
    assert out[10] == (4, 0)
    assert out[20] == (1, 0)


def test_rrf_fuse_integer_semantics(spark):
    """RRF with k=60: an item ranked 1+2 beats an item ranked 2+1? No —
    they tie exactly (1/61+1/62 both ways); the tie breaks to the
    smaller id.  An item present in only one list gets exactly its own
    contribution; all arithmetic is integer-exact."""
    from name_match_ml_spark.functions.text import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], ["doc_id", "rank"])
    b = spark.createDataFrame([(20, 1), (10, 2), (99, 3)], ["doc_id", "rank"])
    out = {r.doc_id: r.rrf_grid for r in rrf_fuse([a, b], k=60, top_n=10).collect()}
    g = 1_000_000_000
    assert out[10] == g // 61 + g // 62
    assert out[20] == g // 62 + g // 61
    assert out[30] == g // 63          # single-list item
    assert out[99] == g // 63
    rows = rrf_fuse([a, b], k=60, top_n=10).collect()
    assert [r.doc_id for r in rows[:2]] == [10, 20]  # exact tie -> smaller id first
