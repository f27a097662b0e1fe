"""MLlib LSH variants (operators/mllib_lsh.py): every emitted pair/score
must be exact; recall cross-checked against the custom operators and
brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.operators.mllib_lsh import (
    brp_cosine_neighbors_ml,
    brp_cosine_topk_ml,
    minhash_lsh_pairs_ml,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _word_jaccard(a: str, b: str) -> float:
    sa, sb = set(a.lower().split()), set(b.lower().split())
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


def test_minhash_ml_exact_and_high_recall(spark, docs):
    t = 0.8
    got = {(r.doc_a, r.doc_b): r.jaccard for r in minhash_lsh_pairs_ml(docs, threshold=t).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    # soundness: every emitted pair really clears the threshold, exactly
    for (a, b), j in got.items():
        assert _word_jaccard(texts[a], texts[b]) == pytest.approx(j, abs=1e-9)
        assert j >= t - 1e-9
    # recall vs brute force
    ids = sorted(texts)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _word_jaccard(texts[a], texts[b]) >= t
    }
    assert want, "corpus should contain word-level near-dups at J>=0.8"
    recall = len(want & set(got)) / len(want)
    assert recall >= 0.9, recall


def test_brp_ml_matches_exact_topk(spark, emb):
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()}
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    got = {}
    for r in brp_cosine_topk_ml(emb, queries, k=3).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cosine))
    hits = total = 0
    for qid in (v for v in vecs if v % 50 == 0):
        q = vecs[qid]
        sims = sorted(
            (
                (float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), nid)
                for nid, v in vecs.items()
                if nid != qid
            ),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        want = {nid for _, nid in sims}
        found = {nid for _, nid, _ in got.get(qid, [])}
        hits += len(want & found)
        total += len(want)
        # exactness of emitted cosines
        for rank, nid, cos in got.get(qid, []):
            true = float(
                vecs[qid] @ vecs[nid] / (np.linalg.norm(vecs[qid]) * np.linalg.norm(vecs[nid]))
            )
            assert cos == pytest.approx(true, abs=1e-4)
    assert total and hits / total >= 0.85, (hits, total)


def test_brp_approx_neighbors_probe(spark, emb):
    """approxNearestNeighbors single-probe path: exact cosines, ranked,
    and high recall vs the brute-force top-k for several probe keys."""
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()}
    k = 5
    hits = total = 0
    for qid in sorted(vecs)[:5]:
        q = vecs[qid]
        rows = brp_cosine_neighbors_ml(emb, list(q), k=k + 1).collect()
        # output contract: ranks are 1..n by descending cosine
        ranks = [r.rank for r in sorted(rows, key=lambda r: (-r.cosine, r.neighbor_id))]
        assert ranks == list(range(1, len(rows) + 1))
        got = {r.neighbor_id for r in rows if r.neighbor_id != qid}
        for r in rows:
            true = float(q @ vecs[r.neighbor_id] / (np.linalg.norm(q) * np.linalg.norm(vecs[r.neighbor_id])))
            assert r.cosine == pytest.approx(true, abs=1e-4)
        want = {
            nid
            for _, nid in sorted(
                (
                    (float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), nid)
                    for nid, v in vecs.items()
                    if nid != qid
                ),
                key=lambda t: (-t[0], t[1]),
            )[:k]
        }
        hits += len(want & got)
        total += len(want)
    assert total and hits / total >= 0.8, (hits, total)
