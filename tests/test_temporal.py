"""As-of join + range join tests (operators/temporal.py [EXT]):
brute-force oracles on constructed data, plan-shape gates (one shuffle,
no cartesian) for the scale story."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from name_match_ml_spark.operators.temporal import asof_join, range_join_buckets
from name_match_ml_spark.sources.parquet import table


def _ts(m: int) -> datetime:
    return datetime(2024, 1, 1, 0, m)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_join_basic(spark):
    quotes = spark.createDataFrame(
        [("a", _ts(1), 10.0), ("a", _ts(5), 50.0), ("b", _ts(3), 30.0)],
        ["sym", "ts", "px"],
    )
    trades = spark.createDataFrame(
        [
            ("a", _ts(0), 1),  # before any quote -> NULL
            ("a", _ts(1), 2),  # equal ts -> visible
            ("a", _ts(4), 3),  # latest prior is ts(1)
            ("a", _ts(9), 4),  # latest prior is ts(5)
            ("b", _ts(3), 5),
            ("c", _ts(7), 6),  # key with no right rows
        ],
        ["sym", "ts", "qty"],
    )
    out = {
        r["qty"]: r["px_asof"]
        for r in asof_join(trades, quotes, on="sym", right_payload=["px"]).collect()
    }
    assert out == {1: None, 2: 10.0, 3: 10.0, 4: 50.0, 5: 30.0, 6: None}


def test_asof_join_strict(spark):
    quotes = spark.createDataFrame([("a", _ts(1), 10.0)], ["sym", "ts", "px"])
    trades = spark.createDataFrame([("a", _ts(1), 1)], ["sym", "ts", "qty"])
    loose = asof_join(trades, quotes, on="sym", right_payload=["px"]).collect()
    strict = asof_join(trades, quotes, on="sym", right_payload=["px"], strict=True).collect()
    assert loose[0]["px_asof"] == 10.0
    assert strict[0]["px_asof"] is None


def test_asof_join_matches_bruteforce_on_events(spark):
    e = table(spark, "/root/testdata/sf0.001", "events")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "ts", "user_id")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    got = {
        r["event_id"]: (r["ts_asof"], r["value_asof"])
        for r in asof_join(errors, clicks, on="user_id", right_payload=["ts", "value"]).collect()
    }
    click_rows = clicks.collect()
    by_user: dict = {}
    for r in click_rows:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["value"]))
    for r in errors.collect():
        prior = [p for p in by_user.get(r["user_id"], []) if p[0] <= r["ts"]]
        want = max(prior) if prior else (None, None)
        assert got[r["event_id"]] == want, r["event_id"]


def test_asof_join_plan_single_shuffle_no_cartesian(spark):
    e = table(spark, "/root/testdata/sf0.001", "events")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "ts", "user_id")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    plan = _plan(asof_join(errors, clicks, on="user_id", right_payload=["value"]))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # union + window: exactly one exchange (the window's partitionBy)
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_matches_bruteforce(spark):
    pts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 5.0, 19.99, 20.0, 30.0, 499.0, 510.0])],
        ["pid", "v"],
    )
    rng = spark.createDataFrame(
        [(b, b * 20.0, b * 20.0 + 30.0) for b in range(25)], ["band_id", "lo", "hi"]
    )
    got = {
        (r["pid"], r["band_id"])
        for r in range_join_buckets(
            pts, rng, point_col="v", lo_col="lo", hi_col="hi", bucket_width=20.0
        ).collect()
    }
    want = {
        (p["pid"], b["band_id"])
        for p in pts.collect()
        for b in rng.collect()
        if b["lo"] <= p["v"] < b["hi"]
    }
    assert got == want
    # boundary semantics spot checks: hi exclusive, lo inclusive
    assert (3, 1) in got and (3, 0) in got  # 20.0 in [20,50) and [0,30)
    assert (4, 0) not in got and (4, 1) in got  # 30.0 excluded from [0,30)
    assert (6, 24) not in got  # 510.0 == hi of last band [480,510)


def test_range_join_plan_no_nested_loop(spark):
    pts = spark.range(1000).select(F.col("id").alias("pid"), (F.col("id") % 500).cast("double").alias("v"))
    rng = spark.range(25).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 20.0).alias("lo"),
        (F.col("id") * 20.0 + 30.0).alias("hi"),
    )
    plan = _plan(
        range_join_buckets(pts, rng, point_col="v", lo_col="lo", hi_col="hi", bucket_width=20.0)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ----------------------------------------------------------- SCD2 intervals


def test_scd2_collapses_runs_and_tiles_timeline(spark):
    from name_match_ml_spark.operators.temporal import scd2_intervals

    rows = [
        ("u1", _ts(0), 0, "A"),
        ("u1", _ts(1), 1, "A"),  # same run
        ("u1", _ts(2), 2, "B"),  # change
        ("u1", _ts(3), 3, "B"),
        ("u1", _ts(4), 4, "A"),  # back to A -> NEW run, not merged
        ("u2", _ts(0), 5, "X"),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "seq", "attr"])
    out = scd2_intervals(df, key="k", order_by=["ts", "seq"], attrs=["attr"]).collect()
    by_key = {}
    for r in sorted(out, key=lambda r: (r.k, r.version)):
        by_key.setdefault(r.k, []).append(r)
    u1 = by_key["u1"]
    assert [(r.attr, r.valid_from, r.valid_to) for r in u1] == [
        ("A", _ts(0), _ts(2)),
        ("B", _ts(2), _ts(4)),
        ("A", _ts(4), None),
    ]
    assert [r.version for r in u1] == [1, 2, 3]
    assert [r.is_current for r in u1] == [False, False, True]
    # intervals tile: each valid_to equals the next valid_from
    for a, b in zip(u1, u1[1:]):
        assert a.valid_to == b.valid_from
    u2 = by_key["u2"]
    assert len(u2) == 1 and u2[0].is_current and u2[0].valid_to is None


def test_scd2_null_safe_change_detection(spark):
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )
    from name_match_ml_spark.operators.temporal import scd2_intervals

    schema = StructType(
        [
            StructField("k", StringType()),
            StructField("ts", TimestampType()),
            StructField("seq", IntegerType()),
            StructField("attr", StringType()),
        ]
    )
    rows = [
        ("u", _ts(0), 0, None),  # first run: NULL attr must still open a run
        ("u", _ts(1), 1, None),
        ("u", _ts(2), 2, "A"),  # NULL -> A is a change
        ("u", _ts(3), 3, None),  # A -> NULL is a change
    ]
    df = spark.createDataFrame(rows, schema)
    out = sorted(
        scd2_intervals(df, key="k", order_by=["ts", "seq"], attrs=["attr"]).collect(),
        key=lambda r: r.version,
    )
    assert [(r.attr, r.valid_from) for r in out] == [
        (None, _ts(0)),
        ("A", _ts(2)),
        (None, _ts(3)),
    ]


def test_scd2_multi_attr_any_change_starts_run(spark):
    from name_match_ml_spark.operators.temporal import scd2_intervals

    rows = [
        ("u", _ts(0), 0, "A", 1),
        ("u", _ts(1), 1, "A", 2),  # second attr changes -> new run
        ("u", _ts(2), 2, "A", 2),  # no change
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "seq", "a1", "a2"])
    out = scd2_intervals(df, key="k", order_by=["ts", "seq"], attrs=["a1", "a2"])
    assert [(r.a1, r.a2) for r in sorted(out.collect(), key=lambda r: r.version)] == [
        ("A", 1),
        ("A", 2),
    ]


def test_scd2_single_shuffle_plan(spark):
    """Both window passes must share one Exchange on the key — a second
    shuffle would double the operator's cost at 100 TB for nothing."""
    from name_match_ml_spark.operators.temporal import scd2_intervals

    df = spark.createDataFrame(
        [("u", _ts(0), 0, "A"), ("u", _ts(1), 1, "B")], ["k", "ts", "seq", "attr"]
    )
    plan = _plan(scd2_intervals(df, key="k", order_by=["ts", "seq"], attrs=["attr"]))
    assert plan.count("Exchange") == 1, plan
