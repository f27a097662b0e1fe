"""Probabilistic record linkage (Fellegi–Sunter) over blocked pairs.

The reference's entire product is deterministic fuzzy name matching with
hand-tuned weights (``main.py:25-90``: composite of thefuzz ratios
weighted 0.4/0.3/0.3, +10/-exit bonuses, threshold 50).  This operator
is the principled superset every production linkage system grows into:
the Fellegi–Sunter (JASA 1969) log-likelihood-ratio framework, where
each comparison feature k contributes ``log(m_k/u_k)`` on agreement and
``log((1-m_k)/(1-u_k))`` on disagreement, and the summed weight is
thresholded into match / possible / non-match decisions.

Determinism contract (the hash-check device used across this repo, cf.
``operators/graph.py::pagerank``): the per-feature log-odds are
pre-computed ONCE as integer literals on a 1e6 fixed-point grid, so the
pair score is a sum of int64 constants — bit-identical in any engine and
independent of summation order.  Estimating m/u by EM on the comparison
vectors is the production path (documented, not implemented here — EM's
float iterations are engine-specific); the operator takes the weights as
input so an offline EM fit plugs straight in.

Scale notes (100 TB):

* Pairs come from equi-join blocking, never a cross product — the same
  recall-for-cost trade as ``plans/blocking.py`` (which also caps hot
  blocks).  Features are evaluated per BLOCKED pair only.
* Every feature here is a codegen expression (``levenshtein``,
  ``substring`` equality, ``regexp_extract``) — no Python in the hot
  path; the score is a sum of integer CASE literals folded by Catalyst.
* The decision filter pushes below the window-free projection, so
  non-matches are dropped before any shuffle of scored pairs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["FS_WEIGHTS_1E6", "fs_score_pairs", "survivorship_merge"]

# log(m/u) / log((1-m)/(1-u)) on a 1e6 grid for (m, u):
#   same_number (0.95, 0.001), lev_close (0.90, 0.05), suffix4 (0.85, 0.01)
# Recompute with: round(math.log(m/u)*1e6), round(math.log((1-m)/(1-u))*1e6)
FS_WEIGHTS_1E6: dict[str, tuple[int, int]] = {
    "same_number": (6856462, -2994732),
    "lev_close": (2890372, -2251292),
    "suffix4": (4442651, -1887070),
}


def _feature_weight(agree: Column, w_agree: int, w_disagree: int) -> Column:
    return F.when(agree, F.lit(w_agree)).otherwise(F.lit(w_disagree))


def fs_score_pairs(
    pairs: DataFrame,
    left_col: str,
    right_col: str,
    *,
    weights: dict[str, tuple[int, int]] | None = None,
    lev_max: int = 5,
    upper: int = 5_000_000,
    lower: int = 0,
) -> DataFrame:
    """Score blocked (left, right) name pairs with integer FS weights.

    Features (all codegen, all exact in any engine):

    * ``same_number`` — trailing digit runs equal (``regexp_extract``),
      the strongest identity signal on entity-numbered names;
    * ``lev_close``   — unit-cost Levenshtein ≤ ``lev_max``;
    * ``suffix4``     — last-4-characters equality.

    Adds ``score`` (int64, 1e6 log-odds grid) and ``decision``
    (``match`` ≥ upper / ``possible`` ≥ lower / dropped otherwise —
    the Fellegi–Sunter three-way rule with the non-match region
    filtered out before any downstream shuffle).
    """
    w = weights or FS_WEIGHTS_1E6
    a, b = F.col(left_col), F.col(right_col)
    feats = {
        "same_number": F.regexp_extract(a, r"([0-9]+)$", 1)
        == F.regexp_extract(b, r"([0-9]+)$", 1),
        "lev_close": F.levenshtein(a, b) <= F.lit(lev_max),
        "suffix4": F.substring(a, -4, 4) == F.substring(b, -4, 4),
    }
    score = None
    for name, agree in feats.items():
        wa, wd = w[name]
        term = _feature_weight(agree, wa, wd)
        score = term if score is None else score + term
    scored = pairs.withColumn("score", score.cast("long"))
    return (
        scored.filter(F.col("score") >= F.lit(lower))
        .withColumn(
            "decision",
            F.when(F.col("score") >= F.lit(upper), F.lit("match")).otherwise(
                F.lit("possible")
            ),
        )
    )


def survivorship_merge(
    df: DataFrame,
    group_col: str,
    rules: dict[str, str],
) -> DataFrame:
    """Golden-record survivorship: collapse each linked entity group to
    ONE record, choosing every field independently by its own rule —
    the master-data-management step that follows record linkage (after
    :func:`fs_score_pairs` + clustering decide WHICH records co-refer,
    survivorship decides what the merged record SAYS).

    Rules per field:

    * ``"max"`` / ``"min"``        — extreme value (any ordered type);
    * ``"longest_then_min"``       — longest string, ties to the
      lexicographically smallest (fully deterministic);
    * ``"mode_min"``               — most frequent value, ties to the
      smallest (the ``mode_stats`` tie convention).

    Every rule is expressed as an aggregate over ONE ``group_col``
    Exchange — ``max_by`` over an order struct for the positional
    rules; ``mode_min`` pre-counts per (group, value) with a
    partial-combining aggregate and finishes with ``max_by`` over
    ``(cnt, neg-rank)`` via a second small aggregate — never a window
    over raw rows.  Adds ``n_members`` per group.
    """
    aggs = [F.count(F.lit(1)).alias("n_members")]
    mode_fields = [f for f, r in rules.items() if r == "mode_min"]
    for field, rule in rules.items():
        c = F.col(field)
        if rule == "max":
            aggs.append(F.max(c).alias(field))
        elif rule == "min":
            aggs.append(F.min(c).alias(field))
        elif rule == "longest_then_min":
            # max over (len asc would invert ties) — order struct:
            # longest first, then lexicographically SMALLEST: max_by on
            # (length, reversed-rank) is not expressible for strings, so
            # use min_by over (neg length, value).
            aggs.append(
                F.min_by(c, F.struct((-F.length(c)).alias("nl"), c.alias("v"))).alias(
                    field
                )
            )
        elif rule == "mode_min":
            continue  # second pass below
        else:
            raise ValueError(f"unknown survivorship rule {rule!r} for {field!r}")
    golden = df.groupBy(group_col).agg(*aggs)
    for field in mode_fields:
        counts = (
            df.groupBy(group_col, field)
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        # most frequent, smallest value on ties: min_by over
        # (-cnt, value) — one aggregate on the tiny counts table.
        mode = counts.groupBy(group_col).agg(
            F.min_by(
                F.col(field), F.struct((-F.col("_cnt")).alias("nc"), F.col(field))
            ).alias(field)
        )
        golden = golden.join(mode, group_col)
    return golden
