"""apply_changes tests (operators/cdc.py [EXT]): merge semantics on
constructed batches — upsert/insert/delete, last-writer-wins, delete
resurrection."""

from __future__ import annotations

import pytest

from name_match_ml_spark.operators.cdc import apply_changes


def _apply(spark, snapshot_rows, change_rows):
    snap = spark.createDataFrame(snapshot_rows, ["k", "val"])
    ch = spark.createDataFrame(change_rows, ["k", "seq", "op", "val"])
    out = apply_changes(snap, ch, key="k", seq_cols=["seq"], op_col="op")
    return {r.k: r.val for r in out.collect()}


def test_upsert_insert_delete_passthrough(spark):
    got = _apply(
        spark,
        [(1, "a"), (2, "b"), (3, "c")],
        [
            (1, 10, "U", "a2"),  # update existing
            (3, 10, "D", None),  # delete existing
            (9, 10, "U", "new"),  # insert absent key
        ],
    )
    assert got == {1: "a2", 2: "b", 9: "new"}


def test_last_writer_wins_per_key(spark):
    got = _apply(
        spark,
        [(1, "a")],
        [(1, 1, "U", "first"), (1, 3, "U", "third"), (1, 2, "U", "second")],
    )
    assert got == {1: "third"}


def test_delete_then_update_resurrects(spark):
    got = _apply(spark, [(1, "a")], [(1, 1, "D", None), (1, 2, "U", "back")])
    assert got == {1: "back"}


def test_update_then_delete_removes(spark):
    got = _apply(spark, [(1, "a")], [(1, 1, "U", "x"), (1, 2, "D", None)])
    assert got == {}


def test_delete_absent_key_is_noop(spark):
    snap = spark.createDataFrame([(1, "a")], ["k", "val"])
    ch = spark.createDataFrame(
        [(7, 1, "D", None)], "k: bigint, seq: bigint, op: string, val: string"
    )
    out = apply_changes(snap, ch, key="k", seq_cols=["seq"], op_col="op")
    assert {r.k: r.val for r in out.collect()} == {1: "a"}


def test_payload_must_exist_in_snapshot(spark):
    snap = spark.createDataFrame([(1, "a")], ["k", "val"])
    ch = spark.createDataFrame([(1, 1, "U", "x", "extra")], ["k", "seq", "op", "val", "other"])
    with pytest.raises(ValueError, match="other"):
        apply_changes(snap, ch, key="k", seq_cols=["seq"], op_col="op")


def test_multi_column_seq_orders_lexicographically(spark):
    snap = spark.createDataFrame([(1, "a")], ["k", "val"])
    ch = spark.createDataFrame(
        [(1, 1, 9, "U", "early-batch"), (1, 2, 0, "U", "late-batch")],
        ["k", "batch", "offset", "op", "val"],
    )
    out = apply_changes(snap, ch, key="k", seq_cols=["batch", "offset"], op_col="op")
    assert {r.k: r.val for r in out.collect()} == {1: "late-batch"}
