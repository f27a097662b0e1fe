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


def test_zorder_layout_prunes_row_groups_on_both_dims(spark, tmp_path):
    """End-to-end layout proof: the same 128x128 grid written via
    save_sorted_layout sorted by zkey vs sorted by x, row-group stats
    inspected with pyarrow.  For a small box predicate on BOTH dims the
    Z-order layout leaves row groups whose [min,max] envelopes intersect
    the box on each dimension only near the box itself, so MOST row
    groups are prunable on the y dimension too — while the x-sorted
    layout's y stats span the full range in every row group (zero y
    pruning)."""
    import glob

    import pyarrow.parquet as pq

    from name_match_ml_spark.sources.sinks import save_sorted_layout

    grid = spark.createDataFrame(
        [(x, y) for x in range(128) for y in range(128)], ["x", "y"]
    ).select("x", "y", zorder_key(["x", "y"], bits=7).alias("zkey"))

    def prunable_fraction(path, lo, hi, dim):
        total = kept = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[dim]).statistics
                total += 1
                if st.max < lo or st.min > hi:
                    kept += 1
        assert total >= 8, f"need multiple row groups, got {total}"
        return kept / total

    zpath, xpath = str(tmp_path / "z"), str(tmp_path / "x")
    save_sorted_layout(
        grid.repartition(1), zpath, sort_by=("zkey",), max_records_per_file=2048
    )
    save_sorted_layout(
        grid.repartition(1), xpath, sort_by=("x", "y"), max_records_per_file=2048
    )

    # box query: y BETWEEN 8 AND 15 — pruning on the SECOND dimension
    z_prune = prunable_fraction(zpath, 8, 15, "y")
    x_prune = prunable_fraction(xpath, 8, 15, "y")
    assert x_prune == 0.0  # x-sort: every row group spans all y
    assert z_prune >= 0.5, z_prune  # z-order: most row groups skip the box
