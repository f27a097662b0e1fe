"""Skew mitigation: salted join / salted two-phase aggregation [EXT].

Hot keys break the shuffle contract — one reducer gets the whole key.
AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) fixes the
sort-merge case at runtime, and that is the first line of defense; the
manual salting here covers what AQE cannot re-plan:

* joins where the skewed side must ALSO be aggregated per key later
  (salting carries through both),
* high-fan-in non-algebraic aggregates (``collect_list``/exact distinct
  per hot key) where map-side partial aggregation cannot collapse rows,
* stateful streaming shuffles (AQE does not apply to streams).

Shapes (both deterministic — salt comes from hashing a caller-named
unique column, never ``rand()``, so retried/recomputed tasks place rows
identically; a lost executor replays to the same result):

``salted_join``: left gets ``_salt = pmod(xxhash64(salt_src), salt)``;
the (smaller, hot-key-carrying) right side is exploded ``salt``-fold so
every (key, salt) bucket finds its match; the equi-join runs on
``(key, _salt)`` spreading each hot key over ``salt`` reducers.  Right
explosion costs |right|×salt rows — use for dimension-sized rights.

``salted_count``: phase 1 aggregates ``(key, _salt)`` (splitting a hot
key's rows across reducers), phase 2 merges the ≤``salt`` partials per
key — the classic two-round skew aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_count", "key_skew_profile"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    salt_src: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side's hot keys spread over
    ``salt`` shuffle buckets.  ``salt_src``: a left column whose values
    distribute uniformly within a key (a row id, an event id) — the
    salt is its hash, keeping the operator deterministic under retries.
    Returns left columns + right's non-key columns (like a plain
    ``join(on=...)``).
    """
    l_salted = left.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(salt)))
    r_salted = right.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt")
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return l_salted.join(r_salted, [on, "_salt"], how).drop("_salt")


def salted_count(
    df: DataFrame,
    *,
    key: str,
    salt_src: str,
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe ``groupBy(key).count()`` returning
    ``(key, cnt)``.  Phase 1 shuffles on (key, salt) — a hot key's rows
    split across ``salt`` reducers; phase 2 shuffles only the ≤``salt``
    partial rows per key."""
    phase1 = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(salt)))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return phase1.groupBy(key).agg(F.sum("_partial").alias("cnt"))


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    *,
    top_n: int = 10,
) -> DataFrame:
    """Join-key skew diagnosis: the ``top_n`` heaviest keys with their
    row count, share of all rows, and rank — the numbers that decide
    whether a join needs :func:`salted_join` / AQE skew handling, and
    the heavy-key analogue of the blocking df-cap in
    ``plans/blocking.py``.

    Shape: one partial-combining count per key, a 1-row total attached
    by a second aggregate carried through ``sum() over ()`` on the
    ALREADY-AGGREGATED top slice, and a per-task top-k
    (``TakeOrderedAndProject`` — no global sort shuffle).  The share
    denominator is the sum over ALL keys, computed before the top-k cut
    via one extra scalar aggregate on the key counts (small: one row
    per distinct key entering a partial-combining sum).
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("_total"))
    top = counts.orderBy(F.col("cnt").desc(), F.col(key_col).asc()).limit(top_n)
    w = Window.orderBy(F.col("cnt").desc(), F.col(key_col).asc())
    return (
        top.join(F.broadcast(total))
        .select(
            key_col,
            "cnt",
            (F.col("cnt").cast("double") / F.col("_total").cast("double")).alias(
                "share"
            ),
            F.row_number().over(w).alias("rank"),
        )
    )
