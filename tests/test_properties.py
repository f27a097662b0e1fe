"""Property-based tests (hypothesis) for operators with algebraic
invariants — the complement to the oracle tests, which only check the
corpus-shaped inputs (SURVEY.md §5)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

words = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=0, max_size=130
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(tokens=words, chunk_size=st.integers(3, 12), stride=st.integers(1, 12))
def test_chunking_invariants(spark, tokens, chunk_size, stride):
    from name_match_ml_spark.functions.text import chunk_documents

    stride = min(stride, chunk_size)
    docs = spark.createDataFrame([(1, " ".join(tokens))], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(
            docs, chunk_size=chunk_size, stride=stride
        ).collect(),
        key=lambda r: r.chunk_id,
    )
    n = len(tokens)
    assert rows, "every doc yields at least one chunk (possibly empty)"
    assert [r.chunk_id for r in rows] == list(range(len(rows)))
    rebuilt = [None] * n
    for r in rows:
        ck = r.chunk_text.split(" ") if r.chunk_text else []
        assert r.n_tokens == len(ck) <= chunk_size
        start = r.chunk_id * stride
        # chunk i holds tokens[start : start+chunk_size]
        assert ck == tokens[start : start + chunk_size]
        for j, t in enumerate(ck):
            rebuilt[start + j] = t
    # coverage: every token appears in >= 1 chunk at its own position
    assert rebuilt == tokens
    # all chunks except the last are full
    for r in rows[:-1]:
        assert r.n_tokens == chunk_size


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_vs_union_find(spark, edges):
    from name_match_ml_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == _uf_components(edges)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_two_phase_components_vs_union_find(spark, edges):
    """Large-star/small-star resolves to the identical unique fixpoint."""
    from name_match_ml_spark.operators import graph

    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r.id: r.cluster_id
        for r in graph.connected_components(pairs, algorithm="star").collect()
    }
    assert got == _uf_components(edges)


def test_long_chain_converges_in_log_rounds(spark):
    """A diameter-2000 path graph — the adversarial case for min-label
    propagation (needs 2000 rounds) — must resolve in O(log n) rounds via
    the auto label→star fallback and match the union-find oracle
    (VERDICT r2 next-round #3)."""
    from name_match_ml_spark.operators import graph

    n = 2001
    edges = [(i, i + 1) for i in range(n - 1)]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r.id: r.cluster_id
        for r in graph.connected_components(pairs, max_iter=40).collect()
    }
    assert got == {i: 0 for i in range(n)}
    # 6 label rounds (auto's budget) + ~log2(2000) star rounds; 30 ≪ 2000
    assert graph.last_rounds <= 30, graph.last_rounds
