"""Round-4c operator tests: Fellegi–Sunter linkage scoring, fixed-point
EWMA, and the 2-D skyline.  DuckDB hash-parity for the declared queries
is covered by tools/verify_queries.py; these pin the operator semantics
against driver-side oracles and partition-count invariance."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.operators.analytics import ewma_fixed_point, skyline_2d
from name_match_ml_spark.operators.linkage import FS_WEIGHTS_1E6, fs_score_pairs


# ---------------------------------------------------------------- FS linkage


@pytest.fixture(scope="module")
def name_pairs(spark):
    rows = [
        # same entity number -> all three features agree
        ("Customer#000000025", "Supplier#000000025"),
        # near digits: lev(full) = 5 prefix + 1 digit = 6 <= 8 -> lev only
        ("Customer#000000025", "Supplier#000000085"),
        # nothing in common
        ("Customer#000000025", "Supplier#000911111"),
    ]
    return spark.createDataFrame(rows, ["a", "b"])


def test_fs_three_way_decisions(name_pairs):
    out = fs_score_pairs(
        name_pairs, "a", "b", lev_max=8, upper=5_000_000, lower=-2_500_000
    )
    got = {r.b: (r.score, r.decision) for r in out.collect()}
    wa = FS_WEIGHTS_1E6
    all_agree = wa["same_number"][0] + wa["lev_close"][0] + wa["suffix4"][0]
    lev_only = wa["same_number"][1] + wa["lev_close"][0] + wa["suffix4"][1]
    assert got["Supplier#000000025"] == (all_agree, "match")
    assert got["Supplier#000000085"] == (lev_only, "possible")
    # all-disagree score is below `lower` -> dropped before any shuffle
    assert "Supplier#000911111" not in got


def test_fs_score_is_sum_of_integer_literals(name_pairs):
    out = fs_score_pairs(name_pairs, "a", "b")
    assert dict(out.dtypes)["score"] == "bigint"
    # no Python evaluation anywhere in the plan (codegen features only)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fs_custom_weights_and_bounds(spark):
    pairs = spark.createDataFrame([("x", "x")], ["a", "b"])
    w = {"same_number": (10, -1), "lev_close": (20, -2), "suffix4": (30, -3)}
    (row,) = fs_score_pairs(pairs, "a", "b", weights=w, upper=60, lower=0).collect()
    assert row.score == 60 and row.decision == "match"


# ------------------------------------------------------------ fixed-point EWMA


def _ewma_ref(xs, a=200_000, g=1_000_000):
    out, s = [], 0
    for i, x in enumerate(xs):
        s = x if i == 0 else (a * x + (g - a) * s) // g
        out.append(s)
    return out


def test_ewma_matches_pure_python(spark):
    rng = random.Random(7)
    rows = []
    for k in range(5):
        for i in range(40):
            rows.append((k, i, rng.randrange(0, 500_000_000)))
    df = spark.createDataFrame(rows, ["k", "i", "x"]).repartition(7)
    out = ewma_fixed_point(df, "k", ["i"], "x")
    got = {}
    for r in out.collect():
        got.setdefault(r.k, {})[r.i] = r.ewma_fp
    by_key = {}
    for k, i, x in rows:
        by_key.setdefault(k, []).append(x)
    for k, xs in by_key.items():
        assert [got[k][i] for i in range(len(xs))] == _ewma_ref(xs)


def test_ewma_negative_values_floor_division(spark):
    # the optimization-round native fold must keep Python '//' (FLOOR)
    # semantics, which differ from Spark's 'div' (trunc) on negatives
    rng = random.Random(11)
    rows = []
    for k in range(3):
        for i in range(30):
            rows.append((k, i, rng.randrange(-500_000_000, 500_000_000)))
    df = spark.createDataFrame(rows, ["k", "i", "x"]).repartition(5)
    out = ewma_fixed_point(df, "k", ["i"], "x")
    got = {}
    for r in out.collect():
        got.setdefault(r.k, {})[r.i] = r.ewma_fp
    by_key = {}
    for k, i, x in rows:
        by_key.setdefault(k, []).append(x)
    for k, xs in by_key.items():
        assert [got[k][i] for i in range(len(xs))] == _ewma_ref(xs)


@pytest.mark.slow
def test_ewma_long_history_linear_fold(spark):
    """Long-key guard (VERDICT r10 #8): one 100k-row key must complete
    in seconds (the chunked two-level fold's copies are O(n·C), not the
    single-fold O(n²) ≈ 5e9 element copies) and stay bit-identical to
    the pure-Python recurrence — including negatives (floor division)
    and across the chunk boundary carry."""
    import time

    rng = random.Random(13)
    n = 100_000
    xs = [rng.randrange(-500_000_000, 500_000_000) for _ in range(n)]
    df = spark.createDataFrame(
        [(0, i, x) for i, x in enumerate(xs)], ["k", "i", "x"]
    ).repartition(8)
    t0 = time.perf_counter()
    got = {r.i: r.ewma_fp for r in ewma_fixed_point(df, "k", ["i"], "x").collect()}
    elapsed = time.perf_counter() - t0
    ref = _ewma_ref(xs)
    assert [got[i] for i in range(n)] == ref
    # generous bound: the quadratic fold takes minutes on this input
    assert elapsed < 60, f"long-history EWMA took {elapsed:.1f}s — quadratic fold?"


def test_ewma_chunk_boundary_exact(spark):
    """Histories straddling the fold chunk size (n = C-1, C, C+1, 2C+3)
    match the reference exactly — the carry between chunks is the only
    cross-chunk state and must reproduce the unchunked recurrence."""
    from name_match_ml_spark.operators.analytics import _EWMA_FOLD_CHUNK as C

    rng = random.Random(17)
    rows = []
    sizes = {0: C - 1, 1: C, 2: C + 1, 3: 2 * C + 3, 4: 1}
    for k, n in sizes.items():
        for i in range(n):
            rows.append((k, i, rng.randrange(-10_000_000, 10_000_000)))
    df = spark.createDataFrame(rows, ["k", "i", "x"]).repartition(5)
    got = {}
    for r in ewma_fixed_point(df, "k", ["i"], "x").collect():
        got.setdefault(r.k, {})[r.i] = r.ewma_fp
    by_key = {}
    for k, i, x in rows:
        by_key.setdefault(k, []).append(x)
    for k, xs in by_key.items():
        assert [got[k][i] for i in range(len(xs))] == _ewma_ref(xs), f"key {k}"


def test_ewma_alpha_one_is_identity_and_bounds_checked(spark):
    df = spark.createDataFrame([(0, 0, 5), (0, 1, 9)], ["k", "i", "x"])
    out = ewma_fixed_point(df, "k", ["i"], "x", alpha_1e6=1_000_000)
    assert {r.i: r.ewma_fp for r in out.collect()} == {0: 5, 1: 9}
    with pytest.raises(ValueError):
        ewma_fixed_point(df, "k", ["i"], "x", alpha_1e6=0)


# ------------------------------------------------------------------ skyline


def _skyline_ref(pts):
    keep = []
    for px, py in pts:
        if not any(qx > px and qy < py for qx, qy in pts):
            keep.append((px, py))
    return sorted(keep)


@pytest.fixture(scope="module")
def sky_points():
    rng = random.Random(13)
    pts = [(rng.randrange(0, 100), rng.randrange(0, 100)) for _ in range(300)]
    pts += [(50, 50), (50, 50), (99, 0)]  # duplicates + an extreme corner
    return pts


def test_skyline_matches_bruteforce(spark, sky_points):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(sky_points)], ["id", "x", "y"]
    )
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    assert got == _skyline_ref(sky_points)


def test_skyline_partition_and_prune_invariant(spark, sky_points):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(sky_points)], ["id", "x", "y"]
    )
    expect = sorted(
        (r.id, r.x, r.y) for r in skyline_2d(df, "x", "y", local_prune=False).collect()
    )
    for n in (1, 3, 16):
        got = sorted(
            (r.id, r.x, r.y)
            for r in skyline_2d(df.repartition(n), "x", "y").collect()
        )
        assert got == expect, f"partition count {n} changed the skyline"
