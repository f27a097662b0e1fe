"""Multi-dimensional storage-layout keys [EXT]: Z-order (Morton)
interleaving.

Companion to ``sources/sinks.py::save_sorted_layout``: sorting a table
by ONE column gives tight parquet row-group min/max stats (zone maps)
for that column only; sorting by the Z-ORDER key of several columns
gives useful stats on ALL of them at once — the technique behind
"OPTIMIZE ZORDER BY" in lakehouse table formats (Morton 1966).  A range
predicate on any interleaved dimension then prunes most row groups of a
100 TB table instead of exactly one dimension's worth.

The key is pure 64-bit arithmetic (shift/and/or per bit), fully inside
whole-stage codegen, and — like everything in this engine — replayable
in any SQL dialect, so the declared query hash-checks the exact
interleaving, not a property of it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_sql", "with_hilbert_key", "hilbert_sql_2d"]


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into one Morton
    key: bit ``b`` of column ``i`` lands at output bit ``b·n + i``.

    Inputs must already be NON-NEGATIVE integers in ``[0, 2^bits)`` —
    bucketize/rank-normalize first (values outside the range silently
    alias, the standard Morton contract).  ``n·bits`` must fit in a
    signed 64-bit key, so ``n·bits <= 63``.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns (one column is just a sort)")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a 63-bit key")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        cc = (F.col(c) if isinstance(c, str) else c).cast("long")
        for b in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(cc, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return out


def zorder_sql(col_exprs: list[str], bits: int = 16) -> str:
    """The identical interleaving as a portable SQL expression (bits are
    disjoint, so ``+`` composes them) — used by the DuckDB oracle so the
    declared query checks the exact key, and usable to push the same
    layout key into any external engine."""
    n = len(col_exprs)
    terms = [
        f"((({e} >> {b}) & 1) << {b * n + i})"
        for i, e in enumerate(col_exprs)
        for b in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def with_hilbert_key(df, x: Column, y: Column, bits: int = 6):
    """Add a 2-D Hilbert-curve index of ``(x, y)`` on a ``2^bits`` grid
    as columns ``hx, hy, hkey`` — the strictly-better layout key for
    2-dim clustering: unlike Morton order, the Hilbert curve never
    jumps, so every key range maps to a few compact rectangles and
    parquet zone maps prune range predicates on either dimension with
    fewer false row groups (Hilbert 1891; the curve behind
    "OPTIMIZE ... hilbert" clustering in lakehouse engines).

    Iterative quadrant walk (the classic xy2d formulation): at each
    level the quadrant id ``(3·rx) XOR ry`` contributes
    ``quad << 2·level`` to the key, then the frame is flipped/swapped so
    the next level walks its sub-square in curve order.  Each level's
    ``x``/``y``/``d`` is written as a NAMED column via ``withColumns``
    (one projection per level, which CollapseProject keeps because the
    aliases are multiply-referenced and non-trivial), so the plan stays
    linear in ``bits`` instead of inlining ``~4^bits`` expression nodes
    — and everything is pure 64-bit arithmetic inside whole-stage
    codegen.  Inputs must be integers in ``[0, 2^bits)``.

    ``hx``/``hy`` are the fully-rotated coordinates; they ride along
    because the SQL oracle (:func:`hilbert_sql_2d`) replays the
    identical walk level by level.
    """
    side = 1 << bits
    cur = df.withColumns(
        {
            "hx": x.cast("long"),
            "hy": y.cast("long"),
            "hkey": F.lit(0).cast("long"),
        }
    )
    for level in range(bits - 1, -1, -1):
        rx = F.shiftright(F.col("hx"), level).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("hy"), level).bitwiseAND(F.lit(1))
        flipped_x = F.when(rx == 1, F.lit(side - 1) - F.col("hx")).otherwise(F.col("hx"))
        flipped_y = F.when(rx == 1, F.lit(side - 1) - F.col("hy")).otherwise(F.col("hy"))
        cur = cur.withColumns(
            {
                "hkey": F.col("hkey")
                + F.shiftleft((F.lit(3) * rx).bitwiseXOR(ry), 2 * level),
                "hx": F.when(ry == 0, flipped_y).otherwise(F.col("hx")),
                "hy": F.when(ry == 0, flipped_x).otherwise(F.col("hy")),
            }
        )
    return cur


def hilbert_sql_2d(
    x_expr: str, y_expr: str, source: str, bits: int = 6, carry: str = "event_id"
) -> str:
    """The identical Hilbert walk as a portable chained-CTE SQL query
    (one CTE per level, mirroring the named-projection chain of
    :func:`with_hilbert_key`), generated from the same loop so the
    declared query hash-checks the exact key.  ``carry`` columns ride
    along unchanged; the final SELECT exposes ``(carry, hx, hy, hkey)``
    where hx/hy are the fully-rotated coordinates."""
    side = 1 << bits
    ctes = [
        f"h{bits} AS (SELECT {carry}, CAST({x_expr} AS BIGINT) AS x,"
        f" CAST({y_expr} AS BIGINT) AS y, CAST(0 AS BIGINT) AS d FROM {source})"
    ]
    for level in range(bits - 1, -1, -1):
        rx = f"((x >> {level}) & 1)"
        ry = f"((y >> {level}) & 1)"
        ctes.append(
            f"h{level} AS (SELECT {carry},\n"
            f"  CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {side - 1} - y ELSE y END) ELSE x END AS x,\n"
            f"  CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {side - 1} - x ELSE x END) ELSE y END AS y,\n"
            f"  d + (xor(3 * {rx}, {ry}) << {2 * level}) AS d\n"
            f"  FROM h{level + 1})"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT {carry}, x AS hx, y AS hy, d AS hkey"
        f" FROM h0"
    )
