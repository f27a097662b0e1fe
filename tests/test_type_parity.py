"""Spark vs DuckDB column-TYPE parity over every declared oracle.

The round-4 driver lesson: its value-hash is dtype-sensitive, so a
DuckDB HUGEINT (SUM over BIGINT) against a Spark bigint hash-mismatches
even when every value is identical — and the local value-compare mirror
was blind to it.  This test runs the same canonicalization as
tools/audit_types.py over EVERY (query, oracle) pair and fails on any
per-column type divergence.  Plan/prepare only — neither engine
executes the query — so the whole sweep is cheap.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from name_match_ml_spark.sources.parquet import TABLES
from tools.audit_types import canon_duck, canon_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _oracle_names():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    return sorted(n for n in qs if n in oracles)


# Type parity only needs the SCHEMA, but several queries execute work
# at plan-build (iterative rounds, ANN training) — the same heavy set
# as the plan guardrails; marked slow for the default gate.
SLOW_TYPE_KEYS = {
    "bfs_reach",
    "clustering_coeff",
    "doc_triangles",
    "graph_modularity",
    "grid_ivf_topk",
    "grid_kmeans",
    "incremental_dedup_clusters",
    "incremental_near_dup",
    "incremental_refresh_pipeline",
    "ivfpq_topk",
    "k_core",
    "kcenter_select",
    "label_propagation",
    "leak_safe_split",
    "opq_topk",
    "pipeline_clean_corpus",
    "pq_topk",
    "select_keepers",
    "shortest_path",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(k, marks=pytest.mark.slow) if k in SLOW_TYPE_KEYS else k
        for k in _oracle_names()
    ],
)
def test_column_types_match_oracle(spark, duck, name):
    sdf = entry_mod.queries()[name](spark, SF_DIR)
    stypes = {c: canon_spark(t) for c, t in sdf.dtypes}
    rel = duck.sql(entry_mod.oracle_sql()[name])
    dtypes = {c: canon_duck(str(t)) for c, t in zip(rel.columns, rel.types)}
    diffs = [
        (c, stypes.get(c), dtypes.get(c))
        for c in sorted(set(stypes) | set(dtypes))
        if stypes.get(c) != dtypes.get(c)
    ]
    assert not diffs, f"{name}: Spark vs DuckDB column types diverge: {diffs}"
