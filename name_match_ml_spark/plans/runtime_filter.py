"""Runtime semi-join reduction: probe a dimension-side Bloom filter on
the fact side BEFORE the shuffle (the "runtime filter" / bloom-join
optimization of every warehouse engine, expressed with public Spark
primitives).

Why it exists at 100 TB: a selective dimension predicate (say 0.1% of
customers) still forces the full fact table through the join Exchange —
Spark's own InjectRuntimeFilter covers some shapes, but an explicit
filter is plan-stable and works under any join strategy.  The Bloom
filter built from the filtered dimension keys drops ~99.9% of fact rows
MAP-SIDE, so the Exchange carries only (near-)matching rows.

Correctness contract: Bloom false positives pass the probe but are
removed by the real equi-join that still follows — the result is
EXACTLY the plain join, which is what the declared query's oracle
checks (a plain SQL join).  False negatives are impossible, so no
matching row is ever lost.

Engineering notes:

* The bitset rides the plan as a LITERAL array of ``m_bits/64`` longs;
  the probe is pure codegen bit arithmetic (``shiftright``/bitwise-AND
  on ``element_at``) — no Python, no broadcast variable, no closure.
  At the default 2^16 bits that is 1024 longs (8 KiB) in the plan.
* Building the bitset runs an EAGER dimension-side job at
  DataFrame-construction time (distinct bit positions → collect),
  bounded by ``m_bits`` — the same documented pattern as
  ``operators/cleaning.py::bloom_decontaminate`` and the plan-stats
  probes in ``operators/matching.py``: eager, but bounded by the SMALL
  side, never the fact table.
* Hashing is ``xxhash64(key, salt)`` (JVM codegen).  The oracle never
  replays the filter — join equivalence is the contract — so the hash
  needs no cross-engine twin here, unlike ``bloom_decontaminate``
  whose *output* is the flagged set itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_probe_column", "bloom_reduce_join"]


def _bit_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    return [F.pmod(F.xxhash64(key, F.lit(j)), F.lit(m_bits)) for j in range(k)]


def bloom_probe_column(
    dim: DataFrame,
    dim_key: str,
    fact_key: Column | str,
    *,
    m_bits: int = 1 << 16,
    k: int = 2,
) -> Column:
    """Boolean probe column: True iff all ``k`` Bloom bits of
    ``fact_key`` are set in the filter built from ``dim[dim_key]``."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    fact_key = F.col(fact_key) if isinstance(fact_key, str) else fact_key
    bits = (
        dim.select(
            F.explode(F.array(*_bit_positions(F.col(dim_key), m_bits, k))).alias("b")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in bits:
        words[r["b"] // 64] |= 1 << (r["b"] % 64)
    # two's-complement fold into int64 literals
    words_lit = F.array(
        *[F.lit(w - (1 << 64) if w >= 1 << 63 else w).cast("long") for w in words]
    )
    probe = None
    for pos in _bit_positions(fact_key, m_bits, k):
        word = F.element_at(words_lit, (pos / F.lit(64)).cast("int") + F.lit(1))
        # F.shiftright's Python wrapper only takes a literal shift; the
        # SQL function itself accepts a column — call it directly.
        hit = F.call_function(
            "shiftright", word, F.pmod(pos, F.lit(64)).cast("int")
        ).bitwiseAND(F.lit(1)) == F.lit(1)
        probe = hit if probe is None else probe & hit
    return probe


def bloom_reduce_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    *,
    m_bits: int = 1 << 16,
    k: int = 2,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` with a dimension-built Bloom probe
    applied to the fact side BEFORE the join shuffle.  Result is
    row-for-row the plain join (false positives die in the join)."""
    probe = bloom_probe_column(dim, dim_key, fact_key, m_bits=m_bits, k=k)
    return fact.filter(probe).join(dim, F.col(fact_key) == F.col(dim_key))
