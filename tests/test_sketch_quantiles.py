"""Deterministic quantile sketch tests (functions/sketches.py):
merge-exactness (the agg_state_merge discipline), estimate accuracy
against exact percentiles, and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.functions.sketches import (
    merge_quantile_sketch_states,
    quantile_sketch_state,
    sketch_quantiles,
)

SF_DIR = "/root/testdata/sf0.001"


def _lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")).alias("rk"),
    )


def test_merge_equals_direct_state(spark):
    """state(A) ⊎ state(B) == state(A ∪ B) as literal row equality —
    the hash-coordinated nesting makes merge exact, not approximate."""
    li = _lineitem(spark)
    a = li.filter(F.crc32(F.col("rk")) % 2 == 0)
    b = li.filter(F.crc32(F.col("rk")) % 2 == 1)
    sa = quantile_sketch_state(a, value_col="cents", key_col="rk", k=64)
    sb = quantile_sketch_state(b, value_col="cents", key_col="rk", k=64)
    n_m, lvl_m, k_m, kept_m = merge_quantile_sketch_states([sa, sb], k=64)
    n_d, lvl_d, k_d, kept_d = quantile_sketch_state(li, value_col="cents", key_col="rk", k=64)
    assert (n_m, lvl_m, k_m) == (n_d, lvl_d, k_d)
    assert sorted(map(tuple, kept_m.collect())) == sorted(map(tuple, kept_d.collect()))


def test_merge_rejects_mismatched_k(spark):
    """Components built with different k cannot merge exactly (the
    smaller-k component already dropped rows); must raise, not silently
    lose rows (ADVICE r9)."""
    li = _lineitem(spark)
    a = li.filter(F.crc32(F.col("rk")) % 2 == 0)
    b = li.filter(F.crc32(F.col("rk")) % 2 == 1)
    sa = quantile_sketch_state(a, value_col="cents", key_col="rk", k=64)
    sb = quantile_sketch_state(b, value_col="cents", key_col="rk", k=32)
    with pytest.raises(ValueError, match="mixed sketch sizes"):
        merge_quantile_sketch_states([sa, sb])
    with pytest.raises(ValueError, match="caller k"):
        merge_quantile_sketch_states([sa], k=32)


def test_estimates_near_exact_percentiles(spark):
    li = _lineitem(spark)
    est = {r.q_pct: r.est for r in
           sketch_quantiles(li, value_col="cents", key_col="rk", k=256).collect()}
    vals = sorted(r.cents for r in li.collect())
    n = len(vals)
    for q, e in est.items():
        # rank error bound: the estimate's true rank should be within
        # ~3/sqrt(k) of the target quantile (coordinated-sample bound,
        # generous to stay host-independent)
        import bisect
        rank = bisect.bisect_right(vals, e) / n
        assert abs(rank - q / 100) < 0.2, (q, e, rank)


def test_monotone_and_deterministic(spark):
    li = _lineitem(spark)
    r1 = sketch_quantiles(li, value_col="cents", key_col="rk").collect()
    r2 = sketch_quantiles(li, value_col="cents", key_col="rk").collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    by_q = {r.q_pct: r.est for r in r1}
    qs = sorted(by_q)
    assert all(by_q[a] <= by_q[b] for a, b in zip(qs, qs[1:]))


def test_empty_input(spark):
    li = _lineitem(spark).filter(F.lit(False))
    assert sketch_quantiles(li, value_col="cents", key_col="rk").count() == 0


def test_small_input_is_exact_level_zero(spark):
    """n ≤ k → level 0, every row kept, estimates are EXACT order
    statistics (smallest value with rank ≥ ceil(q·n/100))."""
    rows = [(v, str(v)) for v in [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]]
    df = spark.createDataFrame(rows, "cents long, rk string")
    out = {r.q_pct: (r.est, r.level, r.kept_rows) for r in
           sketch_quantiles(df, value_col="cents", key_col="rk", k=256).collect()}
    assert out[50] == (50, 0, 10)
    assert out[90] == (90, 0, 10)
    assert out[10] == (10, 0, 10)
