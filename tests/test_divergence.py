"""source_kl_divergence (functions/text.py) and the rolling-median
query: distribution-drift math on the fixed-point grid and exact
lower-median window semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.functions.text import source_kl_divergence


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")


def test_identical_distribution_zero_kl(spark):
    rows = [(0, "a b c", "s1"), (1, "a b c", "s2")]
    out = {r.source: r for r in source_kl_divergence(_docs(spark, rows)).collect()}
    # both sources match the corpus distribution exactly; grid flooring
    # can leave at most n_terms ulps of 1e-9
    for s in ("s1", "s2"):
        assert abs(out[s].kl_divergence) <= 1e-8
        assert out[s].n_terms == 3 and out[s].n_tokens == 3


def test_skewed_source_positive_kl_matches_hand_calc(spark):
    # corpus: s1 = 4x"a", s2 = 2x"a" 2x"b" -> q(a)=6/8, q(b)=2/8
    rows = [(0, "a a a a", "s1"), (1, "a a b b", "s2")]
    out = {r.source: r for r in source_kl_divergence(_docs(spark, rows)).collect()}
    q_a, q_b = 6 / 8, 2 / 8
    kl_s1 = 1.0 * math.log(1.0 / q_a)
    kl_s2 = 0.5 * math.log(0.5 / q_a) + 0.5 * math.log(0.5 / q_b)
    assert out["s1"].kl_divergence == pytest.approx(kl_s1, abs=1e-6)
    assert out["s2"].kl_divergence == pytest.approx(kl_s2, abs=1e-6)
    assert out["s1"].kl_divergence > 0


def test_rolling_median_window_semantics(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, float(v))
        for i, v in enumerate([5, 1, 9, 3, 7])
    ]
    e = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE"
    )
    from name_match_ml_spark.suite import q_rolling_median

    # route through the declared query by writing a temp parquet dir
    import tempfile, os

    d = tempfile.mkdtemp()
    e.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r.event_id: r for r in q_rolling_median(spark, d).collect()}
    # lower medians of prefixes [5],[1 5],[1 5 9],[1 3 5 9],[1 3 5 7 9]
    expect = [5, 1, 5, 3, 5]
    for i, m in enumerate(expect):
        assert out[i].rolling_med_fp == m * 1_000_000
        assert out[i].n_in_frame == i + 1
