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

__all__ = ["zorder_key", "zorder_sql"]


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
