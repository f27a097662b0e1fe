"""Round-4d operator tests: Bloom runtime-filter join reduction,
equi-width histogram, expectation gate, incremental aggregate-state
merge, last-touch attribution, and bounded-depth BFS."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from name_match_ml_spark.operators.cdc import agg_state_of, merge_agg_state
from name_match_ml_spark.operators.graph import bfs_hops
from name_match_ml_spark.operators.profiling import (
    apply_expectations,
    equi_width_histogram,
)
from name_match_ml_spark.operators.analytics import attribution_last_touch
from name_match_ml_spark.plans.runtime_filter import bloom_reduce_join


# ------------------------------------------------------------- bloom reduce


@pytest.mark.slow
def test_bloom_join_equals_plain_join_even_tiny_filter(spark):
    fact = spark.range(0, 2000).select(F.col("id").alias("fk"))
    dim = spark.range(0, 2000, 37).select(F.col("id").alias("dk"))
    expect = sorted(
        r.fk for r in fact.join(dim, fact.fk == dim.dk).select("fk").collect()
    )
    # 64-bit filter: false-positive rate near 1 — result must STILL be exact
    for m_bits in (64, 1 << 16):
        got = sorted(
            r.fk
            for r in bloom_reduce_join(fact, dim, "fk", "dk", m_bits=m_bits)
            .select("fk")
            .collect()
        )
        assert got == expect, f"m_bits={m_bits}"


@pytest.mark.slow
def test_bloom_probe_filters_before_join_and_stays_codegen(spark):
    fact = spark.range(0, 10_000).select(F.col("id").alias("fk"))
    dim = spark.range(0, 10).select(F.col("id").alias("dk"))
    out = bloom_reduce_join(fact, dim, "fk", "dk")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the probe is a Filter on the fact side (shiftright bit test)
    assert "shiftright" in plan
    # with a 10-key dim the probe keeps almost nothing of the fact side
    kept = fact.filter(
        __import__(
            "name_match_ml_spark.plans.runtime_filter", fromlist=["bloom_probe_column"]
        ).bloom_probe_column(dim, "dk", "fk")
    ).count()
    assert kept < 200  # 10 true keys + false positives at ~2e-7


def test_bloom_m_bits_must_be_word_aligned(spark):
    dim = spark.range(3).select(F.col("id").alias("dk"))
    with pytest.raises(ValueError):
        bloom_reduce_join(dim, dim, "dk", "dk", m_bits=100)


# ---------------------------------------------------------------- histogram


def test_histogram_bins_cover_all_rows_and_edges(spark):
    df = spark.createDataFrame([(float(v),) for v in range(0, 101)], ["v"])
    out = {r.bin: r for r in equi_width_histogram(df, "v", n_bins=10).collect()}
    assert sum(r.n for r in out.values()) == 101
    # max value closes into the last bin
    assert out[9].n == 11  # 90..100
    assert out[0].lo == 0.0 and abs(out[9].hi - 100.0) < 1e-9


def test_histogram_degenerate_single_value(spark):
    df = spark.createDataFrame([(5.0,), (5.0,), (5.0,)], ["v"])
    rows = equi_width_histogram(df, "v", n_bins=4).collect()
    assert len(rows) == 1 and rows[0].bin == 0 and rows[0].n == 3
    with pytest.raises(ValueError):
        equi_width_histogram(df, "v", n_bins=0)


# -------------------------------------------------------------- expectations


def test_expectations_split_and_null_is_violation(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, -1.0, "O"), (3, 10.0, "X"), (4, None, "O")],
        ["id", "price", "status"],
    )
    rules = {
        "price_pos": F.col("price") > 0,
        "status_ok": F.col("status").isin("O", "F"),
    }
    clean, quar = apply_expectations(df, rules)
    assert sorted(r.id for r in clean.collect()) == [1]
    got = {r.id: list(r.violations) for r in quar.collect()}
    assert got == {2: ["price_pos"], 3: ["status_ok"], 4: ["price_pos"]}
    with pytest.raises(ValueError):
        apply_expectations(df, {})


# ----------------------------------------------------------- agg state merge


def test_agg_state_merge_equals_full_reaggregation(spark):
    rows = [(i % 7, float(i) / 3) for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "value"])
    a = df.filter(F.col("value") < 50)
    b = df.filter(F.col("value") >= 50)
    merged = merge_agg_state(
        agg_state_of(a, ["k"], "value"), agg_state_of(b, ["k"], "value"), ["k"]
    )
    direct = agg_state_of(df, ["k"], "value")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_agg_state_merge_disjoint_keys_pass_through(spark):
    a = spark.createDataFrame([(1, 2.0)], ["k", "value"])
    b = spark.createDataFrame([(2, 5.0)], ["k", "value"])
    m = merge_agg_state(
        agg_state_of(a, ["k"], "value"), agg_state_of(b, ["k"], "value"), ["k"]
    )
    got = {r.k: (r.n, float(r.sum_value)) for r in m.collect()}
    assert got == {1: (1, 2.0), 2: (1, 5.0)}


# -------------------------------------------------------------- attribution


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_attribution_window_and_ties(spark):
    events = spark.createDataFrame(
        [
            # user 1: click then purchase within window
            (10, 1, _ts(100), "click"),
            (11, 1, _ts(200), "purchase"),
            # user 2: click too old (outside 1000 s window)
            (20, 2, _ts(0), "click"),
            (21, 2, _ts(2000), "purchase"),
            # user 3: two clicks at the SAME ts — max event_id wins
            (30, 3, _ts(50), "click"),
            (31, 3, _ts(50), "click"),
            (32, 3, _ts(60), "purchase"),
            # user 4: click exactly AT purchase ts is visible
            (40, 4, _ts(70), "click"),
            (41, 4, _ts(70), "purchase"),
        ],
        ["event_id", "user_id", "ts", "event_type"],
    )
    out = {
        r.conv_id: r.touch_id
        for r in attribution_last_touch(events, window_s=1000).collect()
    }
    assert out == {11: 10, 21: None, 32: 31, 41: 40}


# ---------------------------------------------------------------------- BFS


def test_bfs_chain_distances_and_depth_bound(spark):
    # chain 0-1-2-3-4-5, seed at 0
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], ["doc_a", "doc_b"]
    )
    seeds = spark.createDataFrame([(0,)], ["id"])
    got = {
        r.id: r.hops
        for r in bfs_hops(
            pairs, seeds, max_hops=3, src_col="doc_a", dst_col="doc_b"
        ).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # 4,5 beyond depth -> absent


def test_bfs_min_hops_on_cycle_and_multi_seed(spark):
    # square 0-1-2-3-0 plus spur 2-9; seeds {0, 9}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (2, 9)], ["doc_a", "doc_b"]
    )
    seeds = spark.createDataFrame([(0,), (9,)], ["id"])
    got = {
        r.id: r.hops
        for r in bfs_hops(
            pairs, seeds, max_hops=3, src_col="doc_a", dst_col="doc_b"
        ).collect()
    }
    assert got == {0: 0, 9: 0, 1: 1, 3: 1, 2: 1}


# --------------------------------------------------------------- chi-square


def test_chi_square_matches_scipy_free_reference(spark):
    from name_match_ml_spark.operators.profiling import chi_square_independence

    rows = (
        [("a", "x")] * 30 + [("a", "y")] * 10
        + [("b", "x")] * 15 + [("b", "y")] * 45
    )
    df = spark.createDataFrame(rows, ["r", "c"])
    out = chi_square_independence(df, "r", "c").collect()
    # pure-Python chi2 over the same table
    from collections import Counter

    obs = Counter(rows)
    n = len(rows)
    rt = Counter(r for r, _ in rows)
    ct = Counter(c for _, c in rows)
    expect = 0.0
    for (r, c), o in obs.items():
        e = rt[r] * ct[c] / n
        expect += (o - e) ** 2 / e
    got = out[0].chi2
    assert abs(got - expect) < 1e-6
    assert out[0].dof == 1
    assert all(r.chi2_grid == out[0].chi2_grid for r in out)


def test_chi_square_independent_columns_near_zero(spark):
    rows = [(str(i % 2), str(i % 3)) for i in range(600)]
    from name_match_ml_spark.operators.profiling import chi_square_independence

    df = spark.createDataFrame(rows, ["r", "c"])
    out = chi_square_independence(df, "r", "c").collect()
    assert out[0].chi2 < 1e-6 and out[0].dof == 2


# ------------------------------------------------------------- skew profile


def test_key_skew_profile_ranks_and_shares(spark):
    from name_match_ml_spark.plans.skew import key_skew_profile

    rows = [(1,)] * 50 + [(2,)] * 30 + [(3,)] * 15 + [(4,)] * 5
    df = spark.createDataFrame(rows, ["k"])
    out = {r.rank: r for r in key_skew_profile(df, "k", top_n=3).collect()}
    assert [out[i].k for i in (1, 2, 3)] == [1, 2, 3]
    assert out[1].cnt == 50 and abs(out[1].share - 0.5) < 1e-12
    assert len(out) == 3  # key 4 cut by top_n


# ------------------------------------------------------- batch-13 semantics


def test_rolling_active_users_synthetic(spark):
    # hand-checkable: user A at hours 0 and 30, user B at hour 1
    import datetime as _dt

    def hts(h):
        return _dt.datetime(2024, 1, 1) + _dt.timedelta(hours=h)

    events = spark.createDataFrame(
        [(1, "A", hts(0)), (2, "A", hts(30)), (3, "B", hts(1))],
        ["event_id", "user_id", "ts"],
    )
    uh = events.select(
        "user_id",
        F.unix_timestamp(F.date_trunc("hour", "ts")).cast("long").alias("h_s"),
    ).distinct()
    hours = uh.select("h_s").distinct()
    cover = uh.select(
        "user_id", "h_s", F.explode(F.sequence(F.lit(0), F.lit(23))).alias("k")
    ).select("user_id", (F.col("h_s") + F.col("k") * 3600).alias("hour_s"))
    out = {
        r.hour_s: r.active_users
        for r in cover.join(hours, cover.hour_s == hours.h_s, "left_semi")
        .groupBy("hour_s")
        .agg(F.count_distinct("user_id").alias("active_users"))
        .collect()
    }
    base = int(hts(0).timestamp())
    # hour 0: only A; hour 1: A (from hour 0) + B; hour 30: only A
    # (hour-0 and hour-1 visits are >24h old)
    assert out[base] == 1
    assert out[base + 3600] == 2
    assert out[base + 30 * 3600] == 1
    assert len(out) == 3  # only observed hours reported


def test_scd2_lookup_same_ts_tie_uses_superseding_version(spark):
    import datetime as _dt

    from name_match_ml_spark.operators.temporal import asof_join, scd2_intervals

    t0 = _dt.datetime(2024, 1, 1)

    # user 1: type A at t0; B and C both at t1 (order by event_id);
    # lookup at t1 must resolve to the C run (higher version)
    t1 = t0 + _dt.timedelta(seconds=10)
    e = spark.createDataFrame(
        [(1, t0, 1, "A"), (1, t1, 2, "B"), (1, t1, 3, "C")],
        ["user_id", "ts", "event_id", "event_type"],
    )
    iv = scd2_intervals(e, key="user_id", order_by=["ts", "event_id"], attrs=["event_type"])
    dim = iv.groupBy("user_id", F.col("valid_from").alias("vf")).agg(
        F.max_by("event_type", "version").alias("regime"),
        F.max("version").alias("version"),
    )
    probe = spark.createDataFrame([(1, t1)], ["user_id", "ts"])
    (row,) = asof_join(
        probe, dim, on="user_id", left_ts="ts", right_ts="vf",
        right_payload=["regime", "version"],
    ).collect()
    assert row.regime_asof == "C" and row.version_asof == 3


# ------------------------------------------------------- batch-14 operators


def test_twap_weights_by_duration(spark):
    import datetime as _dt

    t0 = _dt.datetime(2024, 1, 1)
    from name_match_ml_spark.operators.analytics import twap

    rows = [
        # 10.00 held 30 s, then 20.00 held 10 s, last obs no weight
        (1, t0, 1, 10.0),
        (1, t0 + _dt.timedelta(seconds=30), 2, 20.0),
        (1, t0 + _dt.timedelta(seconds=40), 3, 99.0),
        # single observation -> NULL twap
        (2, t0, 4, 5.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {r.user_id: r for r in twap(df, ["user_id"]).collect()}
    assert out[1].twap_num == 1000 * 30 + 2000 * 10
    assert out[1].twap_den == 40
    assert abs(out[1].twap - (10.0 * 30 + 20.0 * 10) / 40) < 1e-9
    assert out[2].twap is None and out[2].twap_den == 0


def test_survivorship_field_rules_and_ties(spark):
    from name_match_ml_spark.operators.linkage import survivorship_merge

    rows = [
        (1, "bb", 5.0, "S1"),
        (1, "aaa", 9.0, "S2"),
        (1, "ccc", 1.0, "S2"),
        (2, "x", 2.0, "S9"),
    ]
    df = spark.createDataFrame(rows, ["grp", "name", "bal", "seg"])
    out = {
        r.grp: r
        for r in survivorship_merge(
            df, "grp",
            {"name": "longest_then_min", "bal": "max", "seg": "mode_min"},
        ).collect()
    }
    # longest names are aaa/ccc (len 3); tie -> lexicographically smallest
    assert out[1].name == "aaa"
    assert out[1].bal == 9.0
    assert out[1].seg == "S2"  # most frequent
    assert out[1].n_members == 3
    assert out[2].name == "x" and out[2].n_members == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        survivorship_merge(df, "grp", {"name": "nope"})


def test_survivorship_mode_tie_breaks_to_smallest(spark):
    from name_match_ml_spark.operators.linkage import survivorship_merge

    df = spark.createDataFrame(
        [(1, "B"), (1, "A"), (1, "C"), (1, "C"), (1, "A")], ["grp", "seg"]
    )
    (row,) = survivorship_merge(df, "grp", {"seg": "mode_min"}).collect()
    assert row.seg == "A"  # A and C both count 2 -> smallest wins


# ---------------------------------------------------- batch-15 operators


def test_random_projection_matches_python_and_partition_free(spark):
    import hashlib

    from name_match_ml_spark.operators.simsearch import (
        projection_signs,
        random_projection,
    )

    import random as _random

    rng = _random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r.vec_id: [r[f"proj_{j}"] for j in range(4)]
        for r in random_projection(
            df.repartition(7), n_planes=4, dim=8
        ).collect()
    }
    signs = projection_signs(4, 8)
    import math

    for vid, vec in rows:
        # createDataFrame infers array<double>, so quantization sees the
        # exact double (the parquet FLOAT[] path upcasts exactly too)
        q = [math.floor(x * 1e6) for x in vec]
        expect = [sum(s * qq for s, qq in zip(signs[j], q)) for j in range(4)]
        assert out[vid] == expect, vid


def test_random_projection_sql_renders_same_signs(spark):
    from name_match_ml_spark.operators.simsearch import (
        projection_signs,
        random_projection_sql,
    )

    exprs = random_projection_sql(n_planes=2, dim=4)
    signs = projection_signs(2, 4)
    for e, row in zip(exprs, signs):
        lits = "[" + ", ".join(str(s) for s in row) + "]"
        assert lits in e


def test_knn_label_perfect_on_separated_clusters(spark):
    from pyspark.sql import functions as _F

    from name_match_ml_spark.operators.simsearch import cosine_topk_exact

    # two well-separated clusters in 4-d
    rows = []
    for i in range(12):
        base = [10.0, 0.0, 0.0, 1.0] if i % 2 == 0 else [0.0, 10.0, 1.0, 0.0]
        rows.append((i, [b + (i % 5) * 0.01 for b in base], i % 2))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    queries = emb.filter(_F.col("vec_id") < 4)
    knn = cosine_topk_exact(emb, queries, k=3)
    labels = emb.select("vec_id", "label")
    votes = (
        knn.join(labels, knn.neighbor_id == labels.vec_id)
        .groupBy("query_id", "label")
        .agg(_F.count(_F.lit(1)).alias("cnt"))
    )
    pred = votes.groupBy("query_id").agg(
        _F.min_by(
            _F.col("label"), _F.struct((-_F.col("cnt")).alias("nc"), _F.col("label"))
        ).alias("pred_label")
    )
    got = {r.query_id: r.pred_label for r in pred.collect()}
    assert got == {0: 0, 1: 1, 2: 0, 3: 1}


# ---------------------------------------------------- batch-16 operators


def test_bm25_ranks_more_relevant_doc_higher(spark):
    from name_match_ml_spark.functions.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark other words here"),
            (2, "spark other words here and more"),
            (3, "nothing relevant at all in this one"),
            (4, "spark join join window window window"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in bm25_topk(docs, ["spark", "join", "window"]).collect()}
    # doc 4 matches all three terms -> highest; doc 3 matches none -> absent
    assert out[4].rank == 1
    assert 3 not in out
    assert out[1].score_grid > out[2].score_grid  # tf saturation still orders
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bm25_topk(docs, [])


def test_trend_slope_recovers_linear_signal(spark):
    import datetime as _dt

    from name_match_ml_spark.operators.analytics import trend_slope

    t0 = _dt.datetime(2024, 1, 1)
    rows = []
    # user 1: value rises exactly 2.00 per hour; user 2: constant
    for h in range(10):
        rows.append((1, t0 + _dt.timedelta(hours=h), 10.0 + 2.0 * h))
        rows.append((2, t0 + _dt.timedelta(hours=h), 7.0))
    # user 3: single observation -> NULL slope
    rows.append((3, t0, 1.0))
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {r.user_id: r.slope_grid for r in trend_slope(df, ["user_id"]).collect()}
    assert out[1] == 200 * 10**9  # 200 cents/hour on the 1e-9 grid
    assert out[2] == 0
    assert out[3] is None


def test_dp_counts_deterministic_and_noise_bounded(spark):
    from name_match_ml_spark.operators.profiling import dp_noisy_counts

    df = spark.createDataFrame(
        [(chr(97 + i % 5), j) for i in range(5) for j in range(20)], ["g", "x"]
    )
    a = sorted(map(tuple, dp_noisy_counts(df, ["g"], epsilon=1.0).collect()))
    b = sorted(map(tuple, dp_noisy_counts(df, ["g"], epsilon=1.0).collect()))
    assert a == b  # seeded determinism
    c = sorted(map(tuple, dp_noisy_counts(df, ["g"], seed="other").collect()))
    assert a != c  # seed rotation changes the release
    for _, n, noisy_grid in a:
        assert n == 20
        # Laplace(1) noise beyond 40 would be astronomically unlikely,
        # and the clamp bounds the worst case at |ln(1e-18)| ~ 41.4
        assert abs(noisy_grid / 1e6 - n) < 45


# ---------------------------------------------------- batch-17 operators


def test_bellman_ford_weighted_vs_hop_paths(spark):
    from name_match_ml_spark.operators.graph import bellman_ford_k

    # 0-1-2 cheap chain (1+1=2) vs direct 0-2 edge costing 10: the
    # 2-edge path must win; node 9 only reachable in 3 edges
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (0, 2, 10), (2, 9, 5)], ["s", "d", "w"]
    )
    seeds = spark.createDataFrame([(0,)], ["id"])
    got = {r.id: r.dist for r in bellman_ford_k(edges, seeds, k=4).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 9: 7}


def test_bellman_ford_k_bounds_path_length(spark):
    from name_match_ml_spark.operators.graph import bellman_ford_k

    edges = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(6)], ["s", "d", "w"]
    )
    seeds = spark.createDataFrame([(0,)], ["id"])
    got = {r.id: r.dist for r in bellman_ford_k(edges, seeds, k=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}  # nodes >2 edges away absent


def test_rfm_ntile_deterministic_quintiles(spark):
    # 10 users with strictly ordered metrics -> ntile(5) = 2 per bucket
    rows = [(u, float(u), u, float(u * 100)) for u in range(1, 11)]
    df = spark.createDataFrame(rows, ["user_id", "recency_s", "frequency", "monetary_cents"])
    w = Window.orderBy(F.col("recency_s").asc(), F.col("user_id").asc())
    out = df.select("user_id", F.ntile(5).over(w).alias("q")).collect()
    got = {r.user_id: r.q for r in out}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4, 8: 4, 9: 5, 10: 5}


# ---------------------------------------------------- batch-18 operators


def test_cms_join_size_upper_bound_and_exact_when_sparse(spark):
    from name_match_ml_spark.functions.sketches import cms_join_size_estimate

    a = spark.createDataFrame([(k,) for k in [1, 1, 1, 2, 3]], ["k"])
    b = spark.createDataFrame([(k,) for k in [1, 2, 2, 4]], ["k"])
    # exact: 3*1 (k=1) + 1*2 (k=2) = 5
    (row,) = cms_join_size_estimate(a, "k", b, "k").collect()
    assert row.exact_size == 5
    # CMS estimate never undercounts, and with 4 distinct keys in a
    # 1024-wide grid collisions are absent -> exact
    assert row.est_size == 5


def test_cms_join_size_narrow_grid_overcounts_only(spark):
    from name_match_ml_spark.functions.sketches import cms_join_size_estimate

    a = spark.range(0, 200).selectExpr("id AS k")
    b = spark.range(100, 300).selectExpr("id AS k")
    (row,) = cms_join_size_estimate(a, "k", b, "k", width=16).collect()
    assert row.exact_size == 100
    assert row.est_size >= 100  # collisions only ever add


def test_waiting_suppliers_plan_decorrelates_to_semi_and_anti(spark):
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()["waiting_suppliers"]
    plan = q(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


# --------------------------------------------------------------- digest


def test_table_digest_order_free_and_incremental(spark):
    from name_match_ml_spark.operators.profiling import table_digest

    df = spark.createDataFrame(
        [(i, f"s{i % 13}") for i in range(997)], ["k", "s"]
    )
    (full,) = table_digest(df, ["k", "s"]).collect()
    (shuffled,) = table_digest(df.repartition(17).orderBy(F.rand(7)), ["k", "s"]).collect()
    assert (full.n_rows, full.digest) == (shuffled.n_rows, shuffled.digest)
    # incremental: shard digests fold (mod 2^64) into the table digest
    (a,) = table_digest(df.filter(F.col("k") < 500), ["k", "s"]).collect()
    (b,) = table_digest(df.filter(F.col("k") >= 500), ["k", "s"]).collect()
    two64 = 1 << 64
    fold = (a.digest % two64 + b.digest % two64) % two64
    if fold >= 1 << 63:
        fold -= two64
    assert fold == full.digest and a.n_rows + b.n_rows == full.n_rows
    # sensitivity: one changed row changes the digest
    df2 = spark.createDataFrame(
        [(i, f"s{i % 13}" if i != 42 else "CHANGED") for i in range(997)], ["k", "s"]
    )
    (d2,) = table_digest(df2, ["k", "s"]).collect()
    assert d2.digest != full.digest
