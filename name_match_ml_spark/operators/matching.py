"""Flagship operator: fuzzy/phonetic similarity join with per-key top-k.

Reference semantics (``main.py:136-221``): for every username, score every
employee with ``compute_match_score`` (``main.py:25-90``), keep the top 4 by
score (``main.py:169``), drop scores < 50 (``main.py:170``), assign
dense-rank confidence labels where ties share a label (``main.py:181-198``),
and emit a ``USER NOT FOUND`` sentinel when nothing clears the threshold
(``main.py:172-179``).

Spark-first plan (vs the reference's O(U×E) row-at-a-time Python loop):

1. **Per-side preparation** — normalization, username splitting, and
   phonetic codes are computed *before* the join: O(U+E) Python (one Arrow
   batch pass per side) instead of O(U×E).
2. **Candidate generation** — ``crossJoin(broadcast(employees))`` (a
   BroadcastNestedLoopJoin: every executor streams its username partition
   against the broadcast roster — no shuffle) or, for rosters too large to
   broadcast, a *blocked* union of equi-joins (``plans/blocking.py``).
3. **Scoring** — pattern short-circuit, split/initial bonuses, phonetic
   equalities, the weighted composite and the 100-cap are native Catalyst
   expressions; only the five per-pair ratios run in one Arrow pandas UDF.
4. **Top-k** — one window (`row_number <= k`) per username partition; in
   Spark ≥3.5 the rank filter is pushed into the shuffle via
   WindowGroupLimit, so each partition keeps ≤ k rows per key.
5. **Labels + NOT-FOUND** — ``dense_rank`` + a ``when`` chain; usernames
   with no surviving match re-enter via left-anti join + sentinel union.

Tie handling: the reference's pandas sort is unstable, so top-4 membership
under ties is unspecified there; this engine defines the deterministic
tiebreak ``(score DESC, emp_id ASC)`` and documents the divergence
(SURVEY.md §7 "What's hard" #3).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scoring import (
    SCORE_THRESHOLD,
    TOTAL_MATCHES_TO_DISPLAY,
    pair_ratios_udf,
    phonetic_codes_udf,
)
from ..plans.staging import stage

__all__ = [
    "prepare_employees",
    "prepare_usernames",
    "score_candidates",
    "match_usernames",
    "format_output",
]

_SPLIT_PATTERN = r"[\._\-\s]"  # main.py:32

# Re-spread blocked candidates before the Arrow scoring stage (see
# match_usernames); module-level so benchmarks can A/B it.
_REPARTITION_PAIRS = True

# Checkpoint the per-row prepared sides (u/e).  Kept ON: same-session
# A/B (optimization round 11, 4 reps alternating) measured unstaging
# them a clear LOSS (flagship min 8.6 s vs 6.5 s) — each side feeds two
# consumers (the distinct-text derivation and the final fan-out /
# employee re-attach joins), and without the cut the scan + normalize +
# dropDuplicates lineage re-executes per consumer.  Module-level so
# benchmarks can A/B it.
_STAGE_SIDES = True

# Checkpoint the DISTINCT-text frames (u_texts/e_texts) in addition to
# the per-row prepared sides; module-level so benchmarks can A/B it.
# The distinct frames are consumed 2-3× (blocking key aggregates + the
# candidate join + the dummy branch), but they are vocabulary-sized
# (hundreds to low thousands of rows), so re-deriving them per consumer
# is cheap while each stage() adds a repartition exchange plus a
# scheduled checkpoint materialization — a net LOSS at bench scale
# (VERDICT r10 #1: flagship slid 5.8 → 6.8-7.6 s when these two landed;
# round-11 same-session A/B: OFF 6.49 s vs ON 6.77 s min-of-4, rows
# identical).  At corpus scale the frames stay vocabulary-bounded while
# the checkpoint costs scale with cluster round-trips, so OFF holds.
_STAGE_DISTINCT_TEXTS = False

# blocking=None auto-select: exact cross-scoring is allowed only when the
# estimated (usernames × roster) pair count stays under this budget AND the
# roster fits the session's broadcast threshold; anything bigger gets
# blocked candidates.  ~4M Arrow-scored pairs is seconds of work on one
# executor core-set; beyond that the cross product is the 100 TB
# scale-killer VERDICT r2 flagged.
_CROSS_PAIR_BUDGET = 4_000_000
# Conservative bytes/row for turning Catalyst sizeInBytes stats into row
# estimates: underestimating row width OVERestimates rows, which can only
# push auto-select toward the safe (blocking) path.
_EST_BYTES_PER_ROW = 32


# Catalyst reports ~Long.MaxValue sizeInBytes for plans with no stats
# (e.g. ``createDataFrame``-backed LogicalRDD); treat anything this large
# as "unknown" rather than "huge".
_UNKNOWN_STATS_BYTES = 1 << 62
# Row cap for the bounded probe on unknown-stats sides.  Above this many
# rows even a ~60-row other side blows _CROSS_PAIR_BUDGET, so there is
# never a reason to count further.
_PROBE_ROW_CAP = 65_536


def _estimated_rows(df: DataFrame) -> float:
    """Row-count estimate for auto-selecting the candidate join strategy.

    Normally free: uses the optimized logical plan's statistics
    (``rowCount`` under CBO, else ``sizeInBytes`` — exact file size for
    parquet/csv leaves).  When stats are unknown (LogicalRDD from
    ``createDataFrame``), runs one LIMIT-bounded count: LIMIT
    short-circuits the scan, so the probe touches at most ~``_PROBE_ROW_CAP``
    rows regardless of source size, and a capped probe reports +inf →
    the caller picks blocking.
    """
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        row_count = stats.rowCount()
        if row_count.isDefined():
            return float(str(row_count.get()))
        size = float(str(stats.sizeInBytes()))
        if size < _UNKNOWN_STATS_BYTES:
            return size / _EST_BYTES_PER_ROW
        n = df.limit(_PROBE_ROW_CAP + 1).count()
        return float("inf") if n > _PROBE_ROW_CAP else float(n)
    except Exception:  # py4j / analysis edge: be safe, block
        return float("inf")


_SIZE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
}


def _parse_byte_size(s: str | None) -> int | None:
    """Spark byte-size conf value → bytes, or None when unparseable.

    Spark reports ``spark.sql.autoBroadcastJoinThreshold`` with a size
    suffix even for the default (``'10485760b'``), and users set values
    like ``'100MB'`` — a bare ``int()`` raises on every one of those and
    would silently pin the auto-select to the hard-coded default.
    """
    if s is None:
        return None
    m = re.fullmatch(r"\s*(-?\d+)\s*([a-zA-Z]*)\s*", s)
    if not m:
        return None
    mult = _SIZE_SUFFIX.get(m.group(2).lower())
    return None if mult is None else int(m.group(1)) * mult


def _norm(c: Column) -> Column:
    return F.trim(F.lower(F.coalesce(c.cast("string"), F.lit(""))))


def _attach_employee_codes(df: DataFrame) -> DataFrame:
    """Attach ``f_sdx/f_mp/l_sdx/l_mp`` (soundex/metaphone of
    ``e_first``/``e_last``, ``main.py:63-66``) to any frame carrying the
    normalized name columns."""
    f_codes = phonetic_codes_udf(F.col("e_first"))
    l_codes = phonetic_codes_udf(F.col("e_last"))
    return df.select(
        "*",
        f_codes.getField("sdx").alias("f_sdx"),
        f_codes.getField("mp").alias("f_mp"),
        l_codes.getField("sdx").alias("l_sdx"),
        l_codes.getField("mp").alias("l_mp"),
    )


def _attach_username_codes(df: DataFrame) -> DataFrame:
    """Attach ``u_sdx/u_mp`` (``main.py:63-66``) to any frame carrying
    ``u_norm``."""
    codes = phonetic_codes_udf(F.col("u_norm"))
    return df.select(
        "*",
        codes.getField("sdx").alias("u_sdx"),
        codes.getField("mp").alias("u_mp"),
    )


def prepare_employees(employees: DataFrame, *, codes: bool = True) -> DataFrame:
    """Normalize the roster for scoring and attach per-side phonetic codes.

    Adds: ``e_name/e_first/e_last`` (lowercased+trimmed scorer inputs,
    ``main.py:27-29``), and with ``codes=True`` also ``f_sdx/f_mp/l_sdx/
    l_mp`` (soundex/metaphone of first/last, ``main.py:63-66``).
    ``codes=False`` skips the Python phonetic UDF so a caller that
    dedups to distinct texts first (``match_usernames``) can attach the
    codes per DISTINCT text instead of per row — the codes are pure
    functions of the normalized names, so the values are identical
    (optimization round 10, guide §4: the roster repeats names heavily —
    37× fewer UDF rows on the sf0.1 corpus).
    """
    df = employees.select(
        "*",
        _norm(F.col("employee_name")).alias("e_name"),
        _norm(F.col("first_name")).alias("e_first"),
        _norm(F.col("last_name")).alias("e_last"),
    )
    return _attach_employee_codes(df) if codes else df


def prepare_usernames(usernames: DataFrame, *, codes: bool = True) -> DataFrame:
    """Normalize usernames and attach split parts + phonetic codes.

    Adds: ``u_norm`` (``main.py:26``), ``u_part1/u_part2`` (regex split on
    ``[._-\\s]``, ``main.py:32-34``), and with ``codes=True`` also
    ``u_sdx/u_mp`` (``main.py:63-66``; see :func:`prepare_employees` for
    the ``codes=False`` contract).
    """
    df = usernames.withColumn("u_norm", _norm(F.col("username")))
    parts = F.split(F.col("u_norm"), _SPLIT_PATTERN)
    df = df.select(
        "*",
        F.coalesce(F.get(parts, 0), F.lit("")).alias("u_part1"),
        F.coalesce(F.get(parts, 1), F.lit("")).alias("u_part2"),
    )
    return _attach_username_codes(df) if codes else df


def _pattern_hit() -> Column:
    """The 8 exact username patterns that short-circuit to 100
    (``main.py:36-47``)."""
    f, l = F.col("e_first"), F.col("e_last")
    u = F.col("u_norm")
    hit = F.lit(False)
    for sep in (".", "_", "", " "):
        hit = hit | (u == F.concat(f, F.lit(sep), l)) | (u == F.concat(l, F.lit(sep), f))
    return hit


def _initial_bonus() -> Column:
    """+5 first-initial match, +5 second-dot-segment initial match
    (``main.py:68-74``), guarded where the reference raises IndexError on
    empty/trailing-dot usernames (``main.py:69,73``)."""
    u, f = F.col("u_norm"), F.col("e_first")
    first_char = F.substring(u, 1, 1)
    f_char = F.substring(f, 1, 1)
    b1 = F.when((u != "") & (f != "") & (first_char == f_char), F.lit(5)).otherwise(F.lit(0))
    second = F.coalesce(F.get(F.split(u, r"\."), 1), F.lit(""))
    b2 = F.when(
        u.contains(".") & (second != "") & (f != "") & (F.substring(second, 1, 1) == f_char),
        F.lit(5),
    ).otherwise(F.lit(0))
    return b1 + b2


def score_candidates(pairs: DataFrame) -> DataFrame:
    """Attach the composite ``score`` column to prepared (username ×
    employee) candidate pairs — ``compute_match_score`` (``main.py:25-90``)
    re-expressed as one Arrow UDF (ratios) + native expressions
    (everything else)."""
    ratios = pair_ratios_udf(
        F.col("u_norm"), F.col("e_name"), F.col("e_first"), F.col("e_last")
    )
    df = pairs.withColumn("_r", ratios)

    split_bonus = F.when(
        ((F.col("u_part1") == F.col("e_first")) & (F.col("u_part2") == F.col("e_last")))
        | ((F.col("u_part2") == F.col("e_first")) & (F.col("u_part1") == F.col("e_last"))),
        F.lit(10),
    ).otherwise(F.lit(0))  # main.py:49-52

    # main.py:54 is dead code (always 0) — replicated as a literal for
    # score parity; documented in SURVEY.md §2.6 F9.
    number_match_bonus = F.lit(0)

    phonetic = (
        F.when(F.col("u_sdx") == F.col("l_sdx"), 6).otherwise(0)
        + F.when(F.col("u_mp") == F.col("l_mp"), 7).otherwise(0)
        + F.when(F.col("u_sdx") == F.col("f_sdx"), 3).otherwise(0)
        + F.when(F.col("u_mp") == F.col("f_mp"), 3).otherwise(0)
    )  # main.py:63-66,82-85

    composite = (
        F.col("_r.lev_full") * 0.2
        + F.col("_r.partial_full") * 0.2
        + F.col("_r.token_set_full") * 0.2
        + F.col("_r.token_set_last") * 0.3
        + F.col("_r.token_set_first") * 0.2
        + phonetic
        + split_bonus
        + _initial_bonus()
        + number_match_bonus
    )  # main.py:76-89

    score = F.when(_pattern_hit(), F.lit(100.0)).otherwise(
        F.least(composite, F.lit(100.0))
    )  # main.py:46-47, 90
    return df.withColumn("score", score.cast("double")).drop("_r")


_U_TEXT = ["u_norm", "u_part1", "u_part2", "u_sdx", "u_mp"]
_E_TEXT = ["e_name", "e_first", "e_last"]
_E_TEXT_FULL = _E_TEXT + ["f_sdx", "f_mp", "l_sdx", "l_mp"]


def match_usernames(
    usernames: DataFrame,
    employees: DataFrame,
    *,
    top_k: int = TOTAL_MATCHES_TO_DISPLAY,
    threshold: float = float(SCORE_THRESHOLD),
    include_not_found: bool = True,
    broadcast_employees: bool = True,
    blocking: bool | None = None,
    materialize: bool = True,
) -> DataFrame:
    """End-to-end flagship pipeline.

    ``usernames`` needs a ``username`` column (plus optional ``input_id``
    carried through); ``employees`` needs the canonical four columns
    (``sources/csv.py``).  Returns one row per surviving match with
    ``username, emp_id, emp_name, score, match_rank, match_type``.

    Scale design — the expensive Python scoring runs once per **distinct
    text pair**, never per (username × employee) row:

    1. Both sides are reduced to distinct text rows (``u_norm`` /
       ``(e_name, e_first, e_last)``): real corpora repeat names heavily,
       and the score is a pure function of the normalized texts.
    2. Candidates come from a cross join of the distinct texts (broadcast
       when the roster side fits) or via blocked equi-joins
       (``plans/blocking.py``), trading bounded recall loss for O(U·B̄)
       work.  ``blocking=None`` (default) auto-selects from Catalyst plan
       statistics: exact cross-scoring when the estimated pair product is
       ≤ ``_CROSS_PAIR_BUDGET`` and the roster is broadcastable, blocked
       candidates otherwise — a default caller can never hit an unbounded
       cross join.  Pass ``True``/``False`` to force a path.
    3. Top-k pruning happens *before* re-expansion: ``rank() <= k`` over
       texts (rank keeps score ties — a text with k rows strictly ahead
       can never reach the final top-k since every text carries ≥1
       employee), and per employee-text only the k first employees by the
       final tiebreak (``emp_id`` asc) can survive, so the expanded
       candidate set is O(distinct_usernames · k²), not O(U·E).
    4. The per-``u_norm`` result fans back out to the original username
       rows with one narrow join.
    """
    # The prepared sides each feed 2 consumers (distinct-text derivation
    # and the final fan-out / employee re-attach join); staging runs the
    # scan + normalization + split once per side instead of once per
    # consumer (see plans/staging.py and the _STAGE_* notes above — the
    # phonetic UDFs attach after the distinct pass and are NOT staged).
    if blocking is None:
        # Auto-select from plan statistics (no job): exact cross-scoring
        # only when the pair product is affordable AND the roster side is
        # broadcastable; default callers on an unbounded roster get the
        # blocked path instead of an O(U·E) cross join (VERDICT r2 #3).
        spark = usernames.sparkSession
        bcast_threshold = _parse_byte_size(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
        )
        if bcast_threshold is None:
            bcast_threshold = 10 * 1024 * 1024
        e_rows = _estimated_rows(employees)
        u_rows = _estimated_rows(usernames)
        # threshold <= 0 disables broadcast → auto falls back to blocking
        e_broadcastable = e_rows * _EST_BYTES_PER_ROW <= max(bcast_threshold, 0)
        blocking = not (e_broadcastable and u_rows * e_rows <= _CROSS_PAIR_BUDGET)

    # Phonetic codes attach AFTER the distinct pass (optimization round
    # 10, guide §4 — same rationale as scoring once per distinct pair):
    # the per-row staged sides carry only native normalizations, and the
    # Arrow phonetic UDF runs once per DISTINCT text (sf0.1: 400 rows
    # instead of 30k UDF calls on the roster side, 1.7k instead of 15k
    # on the username side).  The codes are pure functions of the
    # normalized names, so every scored value is identical.
    u = stage(
        prepare_usernames(usernames, codes=False),
        "u_norm",
        enabled=materialize and _STAGE_SIDES,
    )
    e = stage(
        prepare_employees(employees, codes=False),
        "e_name",
        enabled=materialize and _STAGE_SIDES,
    )

    u_texts = stage(
        _attach_username_codes(
            u.select("u_norm", "u_part1", "u_part2").dropDuplicates(["u_norm"])
        ),
        "u_norm",
        enabled=materialize and _STAGE_DISTINCT_TEXTS,
    )
    e_texts = stage(
        _attach_employee_codes(e.select(*_E_TEXT).dropDuplicates(_E_TEXT)),
        "e_name",
        enabled=materialize and _STAGE_DISTINCT_TEXTS,
    )

    if blocking:
        from ..plans.blocking import blocked_candidates

        pairs = blocked_candidates(u_texts, e_texts, broadcast_employees=broadcast_employees)
        if _REPARTITION_PAIRS:
            # The scoring stage's cost is per-ROW Python (Arrow UDF), not
            # per-byte, but AQE coalesces the candidate dedup's output by
            # bytes — a few MB of candidate pairs collapse to ~1 partition
            # and the UDF serializes.  Re-spread explicitly; the narrow
            # text pairs make this exchange trivial next to the scoring
            # it parallelizes.
            pairs = pairs.repartition(usernames.sparkSession.sparkContext.defaultParallelism)
    else:
        pairs = u_texts.crossJoin(F.broadcast(e_texts) if broadcast_employees else e_texts)

    scored = score_candidates(pairs).select("u_norm", *_E_TEXT, "score")

    # Texts that can still reach the final top-k: rank() (not row_number)
    # keeps score ties, so every text whose score could compete under the
    # emp_id tiebreak survives pruning.
    w_text = Window.partitionBy("u_norm").orderBy(F.col("score").desc())
    top_texts = (
        scored.withColumn("_tr", F.rank().over(w_text)).filter(F.col("_tr") <= top_k).drop("_tr")
    )

    # Within one employee text all employees score equally, so only the k
    # first by the final tiebreak (emp_id asc, string order as the
    # reference casts ids to str at main.py:124) can appear in any top-k.
    w_emp = Window.partitionBy(*_E_TEXT).orderBy(F.col("emp_id").asc())
    e_short = (
        e.withColumn("_er", F.row_number().over(w_emp))
        .filter(F.col("_er") <= top_k)
        .select(*_E_TEXT, "emp_id", "employee_name")
    )

    slim = top_texts.join(e_short, _E_TEXT).select(
        "u_norm", "emp_id", F.col("employee_name").alias("emp_name"), "score"
    )

    if include_not_found:
        # One dummy candidate per distinct username text (score -1, sorts
        # last).  It wins rank 1 only when a username has no real candidate
        # at all (possible under blocking), which funnels every username
        # through the single window pass below — no anti-join, no second
        # evaluation of the scored lineage (main.py:172-179 semantics).
        dummy = u_texts.select(
            "u_norm",
            F.lit("").alias("emp_id"),
            F.lit("").alias("emp_name"),
            F.lit(-1.0).alias("score"),
        )
        slim = slim.unionByName(dummy)

    key = ["input_id", "username"] if "input_id" in u.columns else ["username"]
    w_top = Window.partitionBy("u_norm").orderBy(F.col("score").desc(), F.col("emp_id").asc())
    w_rank = Window.partitionBy("u_norm").orderBy(F.col("score").desc())
    w_all = Window.partitionBy("u_norm")

    top = (
        slim.withColumn("_rn", F.row_number().over(w_top))
        .filter(F.col("_rn") <= top_k)  # main.py:169 head(k)
        .withColumn("_dr", F.dense_rank().over(w_rank))
        .withColumn("_max_score", F.max("score").over(w_all))
    )

    labels = (
        F.when(F.col("_dr") == 1, "HIGH CONFIDENCE")
        .when(F.col("_dr") == 2, "2nd HIGH CONFIDENCE")
        .when(F.col("_dr") == 3, "3rd HIGH CONFIDENCE")
        .when(F.col("_dr") == 4, "NOT SURE")
        .otherwise("")
    )  # main.py:181-186; ties share a label via dense_rank (main.py:188-198)

    if not include_not_found:
        per_text = top.filter(F.col("score") >= threshold).select(  # main.py:170
            "u_norm",
            "emp_id",
            "emp_name",
            "score",
            F.col("_dr").alias("match_rank"),
            labels.alias("match_type"),
        )
    else:
        # A username "has matches" iff its best (non-dummy) score clears
        # the threshold; otherwise its rank-1 row morphs into the
        # NOT-FOUND sentinel (main.py:172-179).  Dense ranks are
        # unaffected by dropping the sub-threshold tail, since that tail
        # always ranks below the kept rows.
        is_not_found = F.col("_max_score") < threshold
        per_text = top.filter(
            (F.col("score") >= threshold) | (is_not_found & (F.col("_rn") == 1))
        ).select(
            "u_norm",
            F.when(is_not_found, F.lit("N/A")).otherwise(F.col("emp_id")).alias("emp_id"),
            F.when(is_not_found, F.lit("USER NOT FOUND"))
            .otherwise(F.col("emp_name"))
            .alias("emp_name"),
            F.when(is_not_found, F.lit(0.0)).otherwise(F.col("score")).alias("score"),
            F.when(is_not_found, F.lit(None).cast("int"))
            .otherwise(F.col("_dr"))
            .alias("match_rank"),
            F.when(is_not_found, F.lit("USER NOT FOUND"))
            .otherwise(labels)
            .alias("match_type"),
        )

    # Fan the per-distinct-text result back out to every original username
    # row (≤ k rows per u_norm on the right side; AQE broadcasts when
    # small).
    return u.select(*key, "u_norm").join(per_text, "u_norm").drop("u_norm")


def format_output(matches: DataFrame) -> DataFrame:
    """Presentation projection mirroring the reference's download CSV
    (``main.py:200-207``): percent-formatted score, input order preserved
    when ``input_id`` is present.  (The reference's blank separator rows,
    ``main.py:209``, are a sink concern and intentionally not emitted.)"""
    order = (
        ["input_id", F.col("match_rank").asc_nulls_last()]
        if "input_id" in matches.columns
        else ["username", F.col("match_rank").asc_nulls_last()]
    )
    return matches.orderBy(*order).select(
        "username",
        "emp_id",
        "emp_name",
        F.format_string("%.2f%%", F.col("score")).alias("confidence_score"),
        "match_type",
    )
