"""Temporal / interval operators [EXT]: as-of join, range join, and SCD2
history building.

The reference has no temporal joins (SURVEY.md §2.3 J2 — its only join
is the similarity cross join, ``main.py:163-167``); these are the two
join shapes every time-series / training-data pipeline needs and that
Spark has no built-in operator for.  Both are implemented as
compositions of existing DataFrame ops — no Python in the row path, no
cartesian products — so Catalyst/AQE keep optimizing them.

**As-of join** (``asof_join``): for each left row, the latest right row
with ``right.ts <= left.ts`` on the same key.  Implemented with the
union + running ``last_value(ignorenulls)`` window trick:

    union(left tagged 1, right tagged 0)
      → window partitionBy(key) orderBy(ts, tag) rows unbounded→current
      → last(right payload, ignorenulls=True)
      → keep left rows

One shuffle on the join key, no range explosion, no per-row search: the
sort within each key partition interleaves both streams in time order,
so the running ``last`` carries exactly the as-of match.  This is the
standard distributed as-of shape (a sort-merge as-of without a custom
physical operator); at 100 TB the shuffle carries key+ts+payload once,
identical to a regular sort-merge join's cost, and skewed keys are
AQE-splittable.

**Range join** (``range_join_buckets``): ``points.p BETWEEN ranges.lo
AND ranges.hi`` equi-joined through fixed-width buckets: every range is
exploded onto the buckets it overlaps (⌈span/width⌉ rows — bounded by
construction), every point lands in one bucket, the join is a plain
shuffle/broadcast equi-join on ``bucket`` followed by the exact
predicate.  Work scales with true selectivity × bucket granularity
instead of |points| × |ranges| (what Spark's BroadcastNestedLoopJoin
does for a bare BETWEEN join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_buckets", "scd2_intervals"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    strict: bool = False,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: latest right row with ``ts <= left.ts``
    (``< left.ts`` when ``strict``) per ``on`` key; left rows with no
    prior right row keep NULL payload (left-join semantics).

    Equal timestamps: the right row at exactly ``left.ts`` IS visible
    to that left row (tag ordering puts right rows first within a tie),
    matching SQL ``ASOF JOIN ... ON l.ts >= r.ts``.  Multiple right
    rows sharing (key, ts) resolve to the one latest in input order of
    the window sort — supply a deduplicated right side when that
    matters.
    """
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, right_ts)]

    # Tag so that, within a timestamp tie, right rows sort before left
    # rows (visible) — or after, for strict inequality.
    right_tag = 1 if strict else 0
    left_tag = 1 - right_tag

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(left_tag).alias("_tag"),
        F.struct(*left.columns).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_payload],
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(right_tag).alias("_tag"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
    )

    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "_l",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_payload
        ],
    )
    return carried.filter(F.col("_l").isNotNull()).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[f"{c}{suffix}" for c in right_payload],
    )


def range_join_buckets(
    points: DataFrame,
    ranges: DataFrame,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner join on ``lo <= point < hi`` via fixed-width bucket
    equi-join (see module docstring).  Returns all columns of both
    inputs.  ``bucket_width`` trades explode factor (ranges spanning
    many buckets) against join fan-in (many ranges per bucket); size it
    near the median range span.
    """
    p_bucket = F.floor(F.col(point_col) / bucket_width).alias("_bucket")
    pts = points.select(*points.columns, p_bucket)

    # Each range covers buckets floor(lo/w) .. floor(hi/w) — hi is
    # exclusive, but emitting its bucket unconditionally only adds one
    # candidate row that the exact predicate removes.
    rng = ranges.select(
        *ranges.columns,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                F.floor(F.col(hi_col) / bucket_width),
            )
        ).alias("_bucket"),
    )
    return (
        pts.join(rng, "_bucket")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("_bucket")
    )


def scd2_intervals(
    df: DataFrame,
    *,
    key: str,
    order_by: list[str],
    attrs: list[str],
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history: collapse an ordered
    change stream into validity intervals per entity.

    For each ``key``, rows are ordered by ``order_by`` (pass enough
    columns for a UNIQUE total order — a bare timestamp with ties makes
    the interval boundaries nondeterministic) and consecutive runs of
    identical ``attrs`` values collapse to one row::

        (key, attrs..., valid_from, valid_to, is_current, version)

    ``valid_from`` is the first ``order_by[0]`` value of the run,
    ``valid_to`` the next run's ``valid_from`` (NULL on the latest run —
    the half-open interval convention, so a dimension lookup is
    ``valid_from <= ts AND (ts < valid_to OR valid_to IS NULL)``, which
    :func:`asof_join` or :func:`range_join_buckets` can then serve).
    ``version`` numbers runs 1..n per key.

    Change detection is null-safe (``eqNullSafe`` per attribute, any
    difference starts a new run) and total: the first row of a key is
    always a run start, even with all-NULL attributes.

    Scale shape: ONE shuffle on ``key``; both window passes (the lag
    change-detector and the lead interval-closer) share the same
    partitioning and sort order, and the filter between them preserves
    both, so Catalyst plans a single Exchange+Sort with two Window
    nodes over it.  State per row is the attribute tuple — no
    aggregation, no join.  NULLs in ``order_by`` columns sort FIRST in
    Spark but LAST in most SQL engines — keep ordering columns
    non-null.
    """
    if not order_by or not attrs:
        raise ValueError("order_by and attrs must be non-empty")
    w = Window.partitionBy(key).orderBy(*order_by)

    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.lag(a).over(w).eqNullSafe(F.col(a))
    runs = (
        df.select(
            key,
            *order_by,
            *attrs,
            ((F.row_number().over(w) == 1) | changed).alias("_chg"),
        )
        .filter(F.col("_chg"))
        .drop("_chg")
    )

    return runs.select(
        key,
        *attrs,
        F.col(order_by[0]).alias("valid_from"),
        F.lead(order_by[0]).over(w).alias("valid_to"),
        F.lead(order_by[0]).over(w).isNull().alias("is_current"),
        F.row_number().over(w).alias("version"),
    )
