"""Event-analytics operator tests (operators/analytics.py): funnel
step chaining, cohort retention offsets, path transitions, fixed-point
gap-fill/LOCF/interpolation, and hierarchical rollup reaggregation.
Small synthetic streams with hand-computed expectations; DuckDB
hash-parity for each declared query is covered by
tools/verify_queries.py."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.operators.analytics import (
    cohort_retention,
    funnel_steps,
    gapfill_locf,
    path_transitions,
    rollup_reaggregate,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), u, t, float(v)) for i, (s, u, t, v) in enumerate(rows)],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE",
    )


# ------------------------------------------------------------------- funnel


@pytest.fixture(scope="module")
def funnel_events(spark):
    rows = [
        # user 1: full ordered funnel
        (0, 1, "view", 1), (60, 1, "click", 1), (120, 1, "purchase", 1),
        # user 2: click BEFORE view -> stops after view
        (0, 2, "click", 1), (60, 2, "view", 1), (30, 2, "purchase", 1),
        # user 3: view then click, no purchase
        (0, 3, "view", 1), (10, 3, "click", 1),
        # user 4: never views
        (0, 4, "click", 1), (10, 4, "purchase", 1),
        # user 5: full funnel but click arrives too late for within_s=100
        (0, 5, "view", 1), (200, 5, "click", 1), (250, 5, "purchase", 1),
    ]
    return _ev(spark, rows)


def test_funnel_strict_ordering(funnel_events):
    out = {r.step: r.users_reached for r in funnel_steps(
        funnel_events, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 4, "click": 3, "purchase": 2}


def test_funnel_within_bound(funnel_events):
    out = {r.step: r.users_reached for r in funnel_steps(
        funnel_events, ["view", "click", "purchase"], within_s=100).collect()}
    # user 5's click at +200s misses the 100s conversion window
    assert out == {"view": 4, "click": 2, "purchase": 1}


def test_funnel_monotone_counts(funnel_events):
    rows = sorted(
        funnel_steps(funnel_events, ["view", "click", "purchase"]).collect(),
        key=lambda r: r.step_idx,
    )
    counts = [r.users_reached for r in rows]
    assert counts == sorted(counts, reverse=True)


# ------------------------------------------------------------------- cohort


def test_cohort_retention_offsets(spark):
    week = 7 * 86400
    rows = [
        (0, 10, "view", 1),            # cohort week 0
        (week + 60, 10, "view", 1),    # active week 1
        (3 * week, 10, "view", 1),     # active week 3 (skips week 2)
        (week, 11, "view", 1),         # cohort week 1 only
    ]
    out = {(str(r.cohort_week), r.week_offset): r.n_users
           for r in cohort_retention(_ev(spark, rows)).collect()}
    # 2024-01-01 is a Monday, so week truncation lands exactly on T0
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1,
    }


def test_cohort_multiple_events_one_week_count_once(spark):
    rows = [(0, 1, "view", 1), (60, 1, "click", 1), (120, 1, "view", 1)]
    out = cohort_retention(_ev(spark, rows)).collect()
    assert len(out) == 1 and out[0].n_users == 1 and out[0].week_offset == 0


# -------------------------------------------------------------- transitions


def test_path_transitions_gap_and_order(spark):
    rows = [
        (0, 1, "view", 1), (10, 1, "click", 1),        # view->click (gap 10)
        (5000, 1, "purchase", 1),                       # gap too large, dropped
        (0, 2, "view", 1), (20, 2, "click", 1),        # view->click again
    ]
    out = {(r.prev_type, r.next_type): r.n_transitions
           for r in path_transitions(_ev(spark, rows), max_gap_s=1800).collect()}
    assert out == {("view", "click"): 2}


def test_path_transitions_topn_deterministic(spark):
    rows = [(i, 1, t, 1) for i, t in enumerate(["a", "b", "a", "c"])]
    # transitions: a->b, b->a, a->c (all count 1) — tie broken by pair
    out = path_transitions(_ev(spark, rows), max_gap_s=10, top_n=2).collect()
    assert [(r.prev_type, r.next_type) for r in out] == [("a", "b"), ("a", "c")]


# ----------------------------------------------------------------- gap-fill


def test_gapfill_exact_interpolation(spark):
    # user 1: v=1.0 at hour 0, v=4.0 at hour 3 -> interp 2.0, 3.0 between
    rows = [(0, 1, "view", 1.0), (3 * 3600, 1, "view", 4.0)]
    out = {r.hour_ts.hour: r for r in gapfill_locf(_ev(spark, rows)).collect()}
    assert out[0].fill_kind == "observed" and out[0].filled_fp == 1_000_000
    assert out[1].fill_kind == "interpolated" and out[1].filled_fp == 2_000_000
    assert out[2].fill_kind == "interpolated" and out[2].filled_fp == 3_000_000
    assert out[3].fill_kind == "observed" and out[3].filled_fp == 4_000_000
    # LOCF column always carries the previous observation
    assert out[2].locf_fp == 1_000_000


def test_gapfill_last_in_hour_wins_and_locf_tail(spark):
    rows = [
        (0, 1, "view", 5.0), (30, 1, "view", 7.0),  # same hour: later wins
        (2 * 3600, 1, "view", 9.0),
    ]
    out = {r.hour_ts.hour: r for r in gapfill_locf(_ev(spark, rows)).collect()}
    assert out[0].value_fp == 7_000_000
    assert out[1].fill_kind == "interpolated" and out[1].filled_fp == 8_000_000


def test_gapfill_no_interpolate_mode(spark):
    rows = [(0, 1, "view", 1.0), (2 * 3600, 1, "view", 3.0)]
    out = {r.hour_ts.hour: r
           for r in gapfill_locf(_ev(spark, rows), interpolate=False).collect()}
    assert out[1].fill_kind == "locf" and out[1].filled_fp == 1_000_000


# ------------------------------------------------------------------- rollup


def test_rollup_reaggregation_matches_direct(spark):
    rows = [(s, u, t, v) for s in (0, 1800, 3600, 90000)
            for u, t, v in [(1, "view", 1.25), (2, "click", 2.5)]]
    ev = _ev(spark, rows)
    hourly, daily = rollup_reaggregate(ev)
    direct = (
        ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"),
                   F.col("event_type"))
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
             F.count(F.lit(1)).alias("n_events"))
    )
    got = {(str(r.day), r.event_type): (r.sum_value, r.n_events)
           for r in daily.collect()}
    want = {(str(r.day), r.event_type): (r.sum_value, r.n_events)
            for r in direct.collect()}
    assert got == want
    assert hourly.count() == 3 * 2  # hours 0, 1, and 25


# ----------------------------------------------------- sampled quantiles


def test_sampled_quantiles_close_to_exact(spark):
    """The deterministic 256-sample quantiles must land near the exact
    percentiles (binomial error at n=256 keeps the quantile RANK within
    ~±3/sqrt(256) ≈ ±0.19 of target with overwhelming probability; on
    lineitem's smooth price distribution that is a loose value band)."""
    from name_match_ml_spark.suite import q_sampled_quantiles

    sf = "/root/testdata/sf0.01"
    got = {r.l_returnflag: r for r in q_sampled_quantiles(spark, sf).collect()}
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    for flag, row in got.items():
        vals = [
            x[0]
            for x in li.filter(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .collect()
        ]
        vals.sort()
        assert row.n_sampled == 256
        for p, v in ((25, row.p25), (50, row.p50), (75, row.p75)):
            lo = vals[max(0, int(len(vals) * (p - 15) / 100))]
            hi = vals[min(len(vals) - 1, int(len(vals) * (p + 15) / 100))]
            assert lo <= v <= hi, (flag, p, v, lo, hi)
        assert row.p25 <= row.p50 <= row.p75
