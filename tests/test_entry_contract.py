"""Mirror of the driver's correctness gate: run every declared query in
Spark AND its DuckDB oracle on the same parquet dir, compare row count,
column names, and exact values (column-name-sorted, order-insensitive) —
stricter than the driver's hash so mismatches are debuggable here first.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from name_match_ml_spark.sources.parquet import TABLES

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return repr(value)  # full precision — exactness is the contract
    return value


def _rows_canonical(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # NULLs sort first within a column (None is not orderable against
    # int/str; the driver's pandas canonicalizer handles NaN natively).
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is not None, v) for v in t),
    ), [cols[i] for i in order]


ORACLE_KEYS = sorted(entry_mod.oracle_sql())


def test_every_oracle_key_has_query():
    qs = entry_mod.queries()
    missing = [k for k in ORACLE_KEYS if k not in qs]
    assert not missing


# Heaviest oracle mirrors (≥ ~6 s each measured on this host) — marked
# slow so the default driver-window gate stays fast (VERDICT r10 #3);
# the driver separately oracles a 50-query sample per round, and these
# params still run under `-m slow`.
SLOW_ORACLE_KEYS = {
    "bfs_reach",
    "bpe_merges",
    "bpe_segments",
    "bpe_tokenize_docs",
    "clustering_coeff",
    "containment_sketch",
    "dedup_clusters",
    "doc_triangles",
    "graph_modularity",
    "grid_pca",
    "hilbert_layout",
    "incremental_dedup_clusters",
    "incremental_near_dup",
    "incremental_refresh_pipeline",
    "ivfpq_topk",
    "k_core",
    "label_propagation",
    "leak_safe_split",
    "minhash_est_audit",
    "pipeline_clean_corpus",
    "select_keepers",
    "shortest_path",
    "tokenizer_compression",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(k, marks=pytest.mark.slow) if k in SLOW_ORACLE_KEYS else k
        for k in ORACLE_KEYS
    ],
)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    rel = duck.execute(entry_mod.oracle_sql()[name])
    dcols = [d[0] for d in rel.description]
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"

    s_canon, _ = _rows_canonical(scols, [tuple(r) for r in srows])
    d_canon, _ = _rows_canonical(dcols, drows)
    mismatches = [
        (a, b) for a, b in zip(s_canon, d_canon) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"username", "emp_id", "emp_name", "score", "match_type"} <= set(df.columns)


def test_flagship_namematch_rows_stable(spark):
    """Rows-only query: deterministic row count across runs."""
    q = entry_mod.queries()["flagship_namematch"]
    n1 = q(spark, "/root/testdata/sf0.001").count()
    n2 = q(spark, "/root/testdata/sf0.001").count()
    assert n1 == n2 > 0


def test_approx_count_distinct_within_tolerance(spark):
    """The HLL++ estimate must sit within the declared ±10% envelope of
    the exact cardinality in every group (rsd=0.05 target)."""
    rows = entry_mod.queries()["approx_count_distinct"](spark, SF_DIR).collect()
    assert rows
    assert all(r.approx_within_10pct for r in rows)


def test_dedup_within_watermark_recovers_originals(spark):
    """First-arrival dedup over synthesized redeliveries must return
    exactly the original event set."""
    import duckdb as _dd

    got = entry_mod.queries()["dedup_within_watermark"](spark, SF_DIR).count()
    want = _dd.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()[0]
    assert got == want
