"""zorder_key tests (functions/layout.py [EXT]): interleaving
correctness vs a Python Morton reference, the locality property that
makes zone-map pruning work, and argument guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.functions.layout import zorder_key, zorder_sql


def _morton_ref(x: int, y: int, bits: int) -> int:
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_zorder_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 127, 255) for y in (0, 3, 64, 255)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key(["x", "y"], bits=8).alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton_ref(x, y, 8), (x, y)


def test_zorder_chunks_have_square_bounding_boxes(spark):
    """Why Z-order beats a single-column sort for layout: 64 consecutive
    Morton codes of a full 32x32 grid form an aligned 8x8 block (max
    side 8), while an x-major sort's 64-row chunk spans a 2x32 slab —
    a y-range predicate prunes almost nothing there."""
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, ["x", "y"])
    data = sorted(
        df.select("x", "y", zorder_key(["x", "y"], bits=5).alias("z")).collect(),
        key=lambda r: r.z,
    )
    for i in range(0, len(data), 64):
        chunk = data[i : i + 64]
        dx = max(r.x for r in chunk) - min(r.x for r in chunk)
        dy = max(r.y for r in chunk) - min(r.y for r in chunk)
        assert dx <= 7 and dy <= 7, (i, dx, dy)


def test_zorder_sql_mirror_is_identical(spark):
    """zorder_sql must generate the same key Spark computes — it's the
    oracle's (and any external engine's) pushdown form."""
    df = spark.createDataFrame([(x, x * 3 % 16) for x in range(16)], ["a", "b"])
    df.createOrReplaceTempView("zt")
    via_sql = spark.sql(
        f"SELECT a, b, {zorder_sql(['a', 'b'], bits=4)} AS z FROM zt"
    ).collect()
    via_col = df.select("a", "b", zorder_key(["a", "b"], bits=4).alias("z")).collect()
    assert sorted(map(tuple, via_sql)) == sorted(map(tuple, via_col))


def test_zorder_rejects_bad_shapes(spark):
    with pytest.raises(ValueError):
        zorder_key(["x"], bits=8)
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)  # 64 bits > 63
