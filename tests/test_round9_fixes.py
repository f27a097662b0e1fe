"""Round-9 regression tests for the ADVICE r8 items: the dimension
guards in grid_pca / hd_rotate must validate the MAX observed width
(a single-row sample lets mixed-width or null-first data bypass them),
and the pq rerank join must shuffle when the LIMIT-bounded query count
saturates (covered in tests/test_ann_query_contract.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_grid_pca_rejects_mixed_width_over_64(spark):
    """ADVICE r8 (low): data whose FIRST row is narrow but which carries
    a >64-dim row elsewhere must still trip the int64-envelope guard —
    the old limit(1) sample only saw the first row."""
    from name_match_ml_spark.operators.pca import grid_pca

    mixed = spark.createDataFrame(
        [(1, [0.1] * 8), (2, [0.2] * 8), (3, [0.3] * 80)],
        "vec_id long, embedding array<double>",
    ).coalesce(1).sortWithinPartitions("vec_id")
    with pytest.raises(ValueError, match="dimension <= 64"):
        grid_pca(mixed)


def test_grid_pca_rejects_null_first_over_64(spark):
    from name_match_ml_spark.operators.pca import grid_pca

    rows = [(1, None), (2, [0.2] * 80), (3, [0.3] * 80)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1).sortWithinPartitions("vec_id")
    with pytest.raises(ValueError, match="dimension <= 64"):
        grid_pca(df)


def test_hd_rotate_rejects_mixed_width(spark):
    """ADVICE r8 (low): a row of the wrong width anywhere in the data
    must fail the hd_rotate width check, not just a mismatched first
    row (which would silently produce garbage rotations)."""
    from name_match_ml_spark.operators.opq import hd_rotate

    mixed = spark.createDataFrame(
        [(1, [0.1] * 4), (2, [0.2] * 4), (3, [0.3] * 8)],
        "vec_id long, embedding array<double>",
    ).coalesce(1).sortWithinPartitions("vec_id")
    with pytest.raises(ValueError, match="does not match the data"):
        hd_rotate(mixed, dim=4)


def test_hd_rotate_accepts_uniform_width(spark):
    from name_match_ml_spark.operators.opq import hd_rotate

    ok = spark.createDataFrame(
        [(i, [float(i + j) for j in range(4)]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    assert hd_rotate(ok, dim=4).count() == 5
