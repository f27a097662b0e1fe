"""Theta-sketch set algebra tests (functions/sketches.py): the
bottom-(k+1) merge property (the agg_state_merge discipline), estimator
accuracy against exact set cardinalities on constructed domains, the
exact degenerate regime, and validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.functions.sketches import (
    merge_theta_states,
    theta_set_algebra,
    theta_sketch_states,
    THETA_MAX,
)


def _vals(spark, rows):
    return spark.createDataFrame(rows, "src string, v long")


def _mk(spark, spec):
    """spec: {source: iterable of ints} -> DataFrame(src, v)."""
    rows = [(s, int(v)) for s, vs in spec.items() for v in vs]
    return _vals(spark, rows)


def test_merge_equals_direct_state(spark):
    """state(A ∪ B) == merge(state(A), state(B)) as literal row
    equality — the bottom-(k+1) of a union is the bottom-(k+1) of the
    per-part bottom-(k+1)s."""
    df = _mk(spark, {"x": range(2000), "y": range(1000, 2500)})
    a = df.filter(F.col("v") % 2 == 0)
    b = df.filter(F.col("v") % 2 == 1)
    k = 64
    sa = theta_sketch_states(a, value_col="v", source_col="src", k=k)
    sb = theta_sketch_states(b, value_col="v", source_col="src", k=k)
    merged = merge_theta_states([sa, sb], k=k)
    direct = theta_sketch_states(df, value_col="v", source_col="src", k=k)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_exact_regime_small_domains(spark):
    """Unsaturated sketches (|domain| <= k) → theta = 2^60 and every
    count/estimate is EXACT."""
    df = _mk(spark, {"a": range(100), "b": range(50, 150)})
    st = theta_sketch_states(df, value_col="v", source_col="src", k=256)
    row = theta_set_algebra(st, k=256).collect()[0]
    assert row.theta == THETA_MAX
    assert (row.est_union, row.est_inter, row.est_diff_ab, row.est_diff_ba) == (
        150, 50, 50, 50,
    )
    assert (row.w_union, row.w_inter, row.w_diff_ab, row.w_diff_ba) == (
        150, 50, 50, 50,
    )


def test_estimation_regime_accuracy(spark):
    """Saturated sketches: estimates within the ~1/sqrt(k) relative
    band of the true cardinalities (deterministic given the md5 grid —
    the margin guards parameter drift, not randomness)."""
    n = 5000
    overlap = 3000
    df = _mk(spark, {"a": range(n), "b": range(n - overlap, 2 * n - overlap)})
    st = theta_sketch_states(df, value_col="v", source_col="src", k=256)
    row = theta_set_algebra(st, k=256).collect()[0]
    assert row.theta < THETA_MAX
    true = {"est_union": 2 * n - overlap, "est_inter": overlap,
            "est_diff_ab": n - overlap, "est_diff_ba": n - overlap}
    for col, t in true.items():
        est = getattr(row, col)
        assert abs(est - t) / t < 0.35, (col, est, t)
    # algebraic consistency of the retained-sample counts
    assert row.w_union == row.w_inter + row.w_diff_ab + row.w_diff_ba


def test_three_sources_pairwise(spark):
    df = _mk(spark, {"a": range(10), "b": range(5, 15), "c": range(100, 110)})
    st = theta_sketch_states(df, value_col="v", source_col="src", k=64)
    rows = {(r.source_a, r.source_b): r for r in theta_set_algebra(st, k=64).collect()}
    assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert rows[("a", "b")].w_inter == 5
    assert rows[("a", "c")].w_inter == 0 and rows[("a", "c")].w_union == 20


def test_validation(spark):
    df = _mk(spark, {"a": range(10)})
    with pytest.raises(ValueError):
        theta_sketch_states(df, value_col="v", source_col="src", k=1)
    with pytest.raises(ValueError):
        merge_theta_states([])


def test_multiway_exact_and_estimation(spark):
    from name_match_ml_spark.functions.sketches import theta_multiway

    # exact regime: 3 small sources, intersection = {5..9}
    df = _mk(spark, {"a": range(10), "b": range(5, 15), "c": range(5, 10)})
    row = theta_multiway(
        theta_sketch_states(df, value_col="v", source_col="src", k=256), k=256
    ).collect()[0]
    assert (row.n_sources, row.theta) == (3, THETA_MAX)
    assert (row.w_union, row.w_inter) == (15, 5)
    assert (row.est_union, row.est_inter) == (15, 5)
    # estimation regime: big overlapping domains
    n = 5000
    big = _mk(spark, {"a": range(n), "b": range(1000, n + 1000), "c": range(2000, n + 2000)})
    r2 = theta_multiway(
        theta_sketch_states(big, value_col="v", source_col="src", k=256), k=256
    ).collect()[0]
    assert r2.theta < THETA_MAX
    assert abs(r2.est_union - (n + 2000)) / (n + 2000) < 0.35
    assert abs(r2.est_inter - (n - 2000)) / (n - 2000) < 0.5
