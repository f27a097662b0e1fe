"""Differential + property tests for the pure-Python similarity primitives.

Vectors derived from the published algorithm semantics (thefuzz/rapidfuzz
indel ratios, jellyfish soundex/metaphone) and from the reference's golden
output (``assets/example.png``, rows tabulated in ``FIXTURES.md §E``).
"""

from __future__ import annotations

import csv

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from name_match_ml_spark.functions.scoring import compute_match_score
from name_match_ml_spark.functions.similarity import (
    full_process,
    metaphone,
    partial_ratio,
    ratio,
    soundex,
    token_set_ratio,
)

REF_EMPLOYEES = "/root/reference/employee.csv"
REF_USERNAMES = "/root/reference/usernames.csv"


# -- ratio -----------------------------------------------------------------


@pytest.mark.parametrize(
    "s1,s2,expected",
    [
        ("", "", 100),
        ("abc", "", 0),
        ("", "abc", 0),
        ("abc", "abc", 100),
        # indel semantics: dist("kitten","sitting") with sub-cost 2 = 5
        # → (13-5)/13 = 0.6153... → 62
        ("kitten", "sitting", 62),
        # 2*LCS/(len1+len2): LCS("swati.patel","tanvi patel")=7 → 14/22 → 64
        ("swati.patel", "tanvi patel", 64),
        ("new york mets", "new york meats", 96),
        ("harshm37", "harsh sharma", 60),
    ],
)
def test_ratio(s1, s2, expected):
    assert ratio(s1, s2) == expected


@given(st.text(max_size=20), st.text(max_size=20))
@settings(max_examples=200, deadline=None)
def test_ratio_properties(s1, s2):
    r = ratio(s1, s2)
    assert 0 <= r <= 100
    assert r == ratio(s2, s1)  # symmetric
    assert ratio(s1, s1) == 100


# -- partial_ratio ---------------------------------------------------------


@pytest.mark.parametrize(
    "s1,s2,expected",
    [
        ("abc", "abc", 100),
        ("abc", "xxabcxx", 100),  # exact substring
        # equal-length both-direction case (example.png: swati.patel vs
        # Tanvi Patel needs partial=74 via substring "ti.patel")
        ("swati.patel", "tanvi patel", 74),
        ("harshm37", "harsh sharma", 77),  # substring "harsh"
        ("harshm37", "harsh nadar", 77),
        ("n.tripathi25", "neha tripathi", 80),  # substring "tripathi"
        ("", "", 100),
        ("a", "", 0),
    ],
)
def test_partial_ratio(s1, s2, expected):
    assert partial_ratio(s1, s2) == expected


@given(st.text(max_size=16), st.text(max_size=16))
@settings(max_examples=200, deadline=None)
def test_partial_ratio_properties(s1, s2):
    p = partial_ratio(s1, s2)
    assert 0 <= p <= 100
    assert p >= ratio(s1, s2) or (len(s1) != len(s2))
    # containment ⇒ 100
    if s1 and s1 in s2:
        assert p == 100


# -- token_set_ratio -------------------------------------------------------


@pytest.mark.parametrize(
    "s1,s2,expected",
    [
        # full_process turns '.' into space → identical token sets
        ("swati.patel", "swati patel", 100),
        # subset token set ⇒ 100 (sect vs sect+diff, sect==one side)
        ("swati.patel", "patel", 100),
        ("swati.patel", "tanvi patel", 73),
        ("harshm37", "harsh", 77),
        ("harshm37", "sharma", 57),
        # underscore is \w → kept inside a single token
        ("john_smith", "john smith", 90),
        ("", "x", 0),
        ("x", "", 0),
    ],
)
def test_token_set_ratio(s1, s2, expected):
    assert token_set_ratio(s1, s2) == expected


def test_full_process():
    assert full_process("Swati.Patel!") == "swati patel"
    assert full_process("john_smith") == "john_smith"
    assert full_process("  A  B  ") == "a  b"


# -- soundex ---------------------------------------------------------------


@pytest.mark.parametrize(
    "s,expected",
    [
        ("Robert", "R163"),
        ("Rupert", "R163"),
        ("Ashcraft", "A261"),  # H transparent: s,c adjacent same code
        ("Ashcroft", "A261"),
        ("Tymczak", "T522"),
        ("Pfister", "P236"),  # first letter's own code suppresses repeats (pf)
        ("Honeyman", "H555"),
        ("harsh", "H620"),
        ("harshm37", "H625"),  # digits reset the last-code state
        ("", ""),
        ("a", "A000"),
    ],
)
def test_soundex(s, expected):
    assert soundex(s) == expected


# -- metaphone -------------------------------------------------------------


@pytest.mark.parametrize(
    "s,expected",
    [
        ("Thompson", "0MPSN"),  # th → 0 (theta)
        ("metaphone", "MTFN"),
        ("Knight", "NT"),  # kn- drops k; -gh- silent before t
        ("harsh", "HRX"),
        ("sharma", "XRM"),
        ("harshm37", "HRXM"),  # digits ignored
        ("swati.patel", "SWTPTL"),
        ("neha", "NH"),
        ("tripathi", "TRP0"),
        ("", ""),
        ("xavier", "SFR"),  # initial x → s
        ("wright", "RT"),  # wr- drops w
    ],
)
def test_metaphone(s, expected):
    assert metaphone(s) == expected


# -- composite score: golden rows from assets/example.png ------------------


def _employees():
    with open(REF_EMPLOYEES) as f:
        return {r["EMP_ID"]: (r["First_Name"], r["Last_Name"]) for r in csv.DictReader(f)}


GOLDEN = [
    ("swati.patel", "7", 100.00),
    ("swati.patel", "60", 79.80),
    ("harshm37", "103", 76.90),
    ("harshm37", "9", 76.90),
    ("harshm37", "14", 66.30),
    ("n.tripathi25", "25", 80.40),
]


@pytest.mark.parametrize("username,emp_id,expected", GOLDEN)
def test_golden_scores(username, emp_id, expected):
    emps = _employees()
    first, last = emps[emp_id]
    got = compute_match_score(username, f"{first} {last}", first, last, emp_id)
    assert got == pytest.approx(expected, abs=0.005)


def test_score_total_on_reference_crash_edges():
    """Reference raises IndexError on these (main.py:69,73); we don't."""
    emps = _employees()
    first, last = emps["7"]
    for u in ["", "john.", ".", "..", "   "]:
        s = compute_match_score(u, f"{first} {last}", first, last, "7")
        assert 0.0 <= s <= 100.0


@given(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789._- ", max_size=24),
)
@settings(max_examples=100, deadline=None)
def test_score_bounds_property(u):
    s = compute_match_score(u, "swati patel", "swati", "patel", "7")
    assert 0.0 <= s <= 100.0


def test_exact_pattern_short_circuits_to_100():
    for u in [
        "swati.patel", "patel.swati", "swati_patel", "patel_swati",
        "swatipatel", "patelswati", "swati patel", "patel swati",
    ]:
        assert compute_match_score(u, "Swati Patel", "Swati", "Patel", "7") == 100.0
