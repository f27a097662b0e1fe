"""Round-4 second-batch operator tests: Bloom decontamination,
stratified sampling, vocabulary/OOV coverage, inverted index, and
shingle-containment pairs.  DuckDB hash-parity for each is covered by
the declared-query harness (tools/verify_queries.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.operators.cleaning import (
    bloom_decontaminate,
    decontaminate_ngrams,
    stratified_sample,
)
from name_match_ml_spark.operators.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)
from name_match_ml_spark.functions.text import inverted_index, vocab_oov_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over a sleeping cat"),
        (2, "completely unrelated text about spark query engines"),
        (3, "the quick brown fox"),  # subset of doc 0's opening
        (4, ""),  # empty
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ------------------------------------------------------- bloom decontaminate


def test_bloom_has_no_false_negatives(docs, spark):
    bench = docs.filter(F.col("doc_id") == 0)
    corpus = docs.filter(F.col("doc_id") != 0)
    exact = {
        r.doc_id: r.contaminated
        for r in decontaminate_ngrams(corpus, bench, n=3, hash_fn="md5_60").collect()
    }
    bloom = {
        r.doc_id: r
        for r in bloom_decontaminate(corpus, bench, n=3, hash_fn="md5_60").collect()
    }
    assert set(bloom) == set(exact)
    for doc_id, contaminated in exact.items():
        if contaminated:  # Bloom may over-flag, never under-flag
            assert bloom[doc_id].contaminated, f"false negative on {doc_id}"
    # docs 1 and 3 share 3-grams with doc 0; doc 2 shares none (modulo
    # false positives, impossible here: 3 bits in a 65536-bit filter
    # loaded with ~21 bits)
    assert bloom[1].contaminated and bloom[3].contaminated
    assert not bloom[2].contaminated
    assert not bloom[4].contaminated  # empty doc has no grams


def test_bloom_counts_bounded_by_gram_count(docs):
    bench = docs.filter(F.col("doc_id") == 0)
    corpus = docs.filter(F.col("doc_id") != 0)
    out = bloom_decontaminate(corpus, bench, n=3, hash_fn="md5_60")
    grams = corpus.select(
        "doc_id",
        F.size(
            F.array_distinct(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
            )
        ).alias("n_words"),
    )
    for r in out.join(grams, "doc_id").collect():
        assert 0 <= r.n_flagged <= max(r.n_words, 0)


def test_bloom_tiny_filter_overflags_but_keeps_negatives_sound(docs):
    """With m_bits=8 nearly every probe collides — n_flagged can only
    grow vs the exact answer, never shrink."""
    bench = docs.filter(F.col("doc_id") == 0)
    corpus = docs.filter(F.col("doc_id") != 0)
    big = {
        r.doc_id: r.n_flagged
        for r in bloom_decontaminate(
            corpus, bench, n=3, m_bits=1 << 16, hash_fn="md5_60"
        ).collect()
    }
    tiny = {
        r.doc_id: r.n_flagged
        for r in bloom_decontaminate(
            corpus, bench, n=3, m_bits=8, hash_fn="md5_60"
        ).collect()
    }
    for doc_id in big:
        assert tiny[doc_id] >= big[doc_id]


# --------------------------------------------------------- stratified sample


def test_stratified_sample_exact_quota(spark):
    rows = [(i, f"s{i % 3}") for i in range(30)] + [(100, "rare")]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = stratified_sample(
        df, strata_col="source", id_col="doc_id", n_per_stratum=4
    ).collect()
    by_stratum = {}
    for r in out:
        by_stratum.setdefault(r.stratum, []).append(r.sample_rank)
    assert sorted(by_stratum) == ["rare", "s0", "s1", "s2"]
    for s in ("s0", "s1", "s2"):
        assert sorted(by_stratum[s]) == [1, 2, 3, 4]
    assert by_stratum["rare"] == [1]  # stratum smaller than the quota


def test_stratified_sample_deterministic_and_seed_sensitive(spark):
    df = spark.createDataFrame([(i, "s") for i in range(200)], ["doc_id", "source"])
    pick = lambda seed: sorted(  # noqa: E731
        r.id
        for r in stratified_sample(
            df, strata_col="source", id_col="doc_id", n_per_stratum=20, seed=seed
        ).collect()
    )
    assert pick("s1") == pick("s1")
    assert pick("s1") != pick("s2")


# ------------------------------------------------------------- vocab / OOV


def test_vocab_oov_rates(spark):
    rows = [
        (0, "a a a b"),  # all in a top-1 vocab of {a}? depends on size
        (1, "a b c d"),
        (2, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in vocab_oov_stats(df, vocab_size=2).collect()}
    # corpus freqs: a=4, b=2, c=1, d=1 -> vocab {a, b}
    assert out[0].n_tokens == 4 and out[0].n_oov == 0 and out[0].oov_rate == 0.0
    assert out[1].n_tokens == 4 and out[1].n_oov == 2 and out[1].oov_rate == 0.5
    assert out[2].n_tokens == 0 and out[2].n_oov == 0 and out[2].oov_rate == 0.0


def test_vocab_tie_broken_lexically(spark):
    df = spark.createDataFrame([(0, "z y z y x")], ["doc_id", "text"])
    out = vocab_oov_stats(df, vocab_size=3).collect()[0]
    assert out.n_oov == 0  # x enters on the lexical tiebreak at cf=1
    out2 = vocab_oov_stats(df, vocab_size=2).collect()[0]
    assert out2.n_oov == 1  # vocab {y, z} (cf=2 each); x is OOV


# ----------------------------------------------------------- inverted index


def test_inverted_index_bounded_sorted_postings(spark):
    rows = [(i, "common " + ("rare" if i == 7 else f"tail{i}")) for i in range(25)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.term: r for r in inverted_index(df, max_postings=10).collect()}
    assert out["common"].df_count == 25
    postings = [int(x) for x in out["common"].postings.split(",")]
    assert postings == list(range(10))  # bounded at 10, ascending
    assert out["rare"].df_count == 1 and out["rare"].postings == "7"


def test_inverted_index_min_df_filter(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "a c")], ["doc_id", "text"]
    )
    terms = {r.term for r in inverted_index(df, min_df=2).collect()}
    assert terms == {"a"}


# ------------------------------------------------------- containment pairs


def test_containment_catches_subset_jaccard_misses(spark):
    long = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15"
    quote = "w0 w1 w2 w3"  # fully contained prefix
    df = spark.createDataFrame([(0, long), (1, quote)], ["doc_id", "text"])
    cont = ngram_containment_pairs(df, threshold=0.9, shingle_n=2).collect()
    assert len(cont) == 1
    assert (cont[0].doc_a, cont[0].doc_b, cont[0].containment) == (0, 1, 1.0)
    jac = ngram_jaccard_pairs(
        df, threshold=0.9, shingle_n=2, strategy="countjoin"
    ).collect()
    assert jac == []  # Jaccard of a 20% subset is ~0.2 — invisible at 0.9


def test_containment_symmetric_output_contract(spark):
    df = spark.createDataFrame(
        [(5, "a b c d"), (2, "a b c d"), (9, "q r s t")], ["doc_id", "text"]
    )
    out = ngram_containment_pairs(df, threshold=0.5, shingle_n=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r.doc_a < r.doc_b and (r.doc_a, r.doc_b) == (2, 5) and r.containment == 1.0


def test_containment_strategies_bit_identical(spark):
    """countjoin and bitmap produce the SAME rounded scores on a corpus
    with subset quotes, disjoint docs, and partial overlaps — the bitmap
    GEMM is exact integer arithmetic (counts ≤ 2^24 in float32), so the
    6-dp boundary filter must agree bit for bit."""
    rows = [
        (i, " ".join(f"w{j}" for j in range(i, i + 12))) for i in range(0, 40, 3)
    ] + [(100 + i, " ".join(f"w{j}" for j in range(i, i + 4))) for i in range(0, 40, 6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {}
    for strat in ("countjoin", "bitmap", "auto"):
        got[strat] = sorted(
            map(
                tuple,
                ngram_containment_pairs(
                    df, threshold=0.4, shingle_n=2, strategy=strat
                ).collect(),
            )
        )
    assert got["countjoin"] == got["bitmap"] == got["auto"]
    assert len(got["countjoin"]) > 0  # the quotes must actually collide


@pytest.mark.slow
def test_max_shingle_df_drops_boilerplate_pairs(spark):
    """The stop-shingle cap (the 100 TB pair-bomb knob): docs that match
    only through ubiquitous boilerplate stop matching once shingles with
    df > cap are dropped; genuine duplicates still match; an
    all-boilerplate doc drops out of the universe entirely."""
    boiler = "this document is provided under standard terms of service"
    rows = [
        (0, f"alpha beta gamma {boiler}"),
        (1, f"alpha beta gamma {boiler}"),  # true duplicate of 0
        (2, f"zeta eta theta {boiler}"),
        (3, boiler),  # boilerplate-only
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    uncapped = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(df, threshold=0.5, shingle_n=2).collect()
    }
    assert (0, 2) in uncapped and (0, 3) in uncapped  # boilerplate smear
    capped = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(
            df, threshold=0.5, shingle_n=2, max_shingle_df=3
        ).collect()
    }
    assert capped == {(0, 1)}  # only the true duplicate survives

    cont_capped = {
        (r.doc_a, r.doc_b)
        for r in ngram_containment_pairs(
            df, threshold=0.5, shingle_n=2, max_shingle_df=3
        ).collect()
    }
    assert cont_capped == {(0, 1)}


# --------------------------------------------- KMV containment sketch


def test_containment_sketch_exact_when_k_covers_all_shingles(spark):
    """With sketch_k >= every doc's distinct-shingle count the KMV
    estimator degenerates to the EXACT containment (M = the full union,
    y = the full intersection, and y*(n_a+n_b)/((m+y)*min) reduces to
    I/min since m+y = n_a+n_b) — so the sketch operator must equal the
    exact baseline pair-for-pair and value-for-value."""
    from name_match_ml_spark.operators.dedup import minhash_containment_pairs

    rows = [
        (0, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15"),
        (1, "w0 w1 w2 w3"),
        (2, "a b c d e f g h"),
        (3, "e f g h i j"),
        (4, "totally different words here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {
        (r.doc_a, r.doc_b): r.containment
        for r in ngram_containment_pairs(df, threshold=0.3, shingle_n=2).collect()
    }
    sk = {
        (r.doc_a, r.doc_b): r.containment_est
        for r in minhash_containment_pairs(
            df, threshold=0.3, shingle_n=2, sketch_k=1000
        ).collect()
    }
    assert sk == exact and len(exact) >= 2


def test_containment_sketch_identical_docs_estimate_one(spark):
    from name_match_ml_spark.operators.dedup import minhash_containment_pairs

    df = spark.createDataFrame(
        [(7, "x y z w v u t s r q p o n m"), (3, "x y z w v u t s r q p o n m")],
        ["doc_id", "text"],
    )
    out = minhash_containment_pairs(df, threshold=0.9, shingle_n=2, sketch_k=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b, r.containment_est) == (3, 7, 1.0)


def test_containment_sketch_disjoint_docs_no_candidates(spark):
    from name_match_ml_spark.operators.dedup import minhash_containment_pairs

    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "e f g h"), (2, "i j k l")], ["doc_id", "text"]
    )
    assert minhash_containment_pairs(df, threshold=0.01, shingle_n=2).collect() == []


def test_containment_sketch_hot_element_cap(spark):
    """max_element_df drops sketch elements above the df cap BEFORE the
    self-join; a pair whose only shared sketch element is hot disappears
    (the documented approximation), while pairs sharing cold elements
    survive."""
    from name_match_ml_spark.operators.dedup import minhash_containment_pairs

    # "hot hot" 2-gram shared by all four docs; docs 0/1 additionally
    # share a cold run.
    rows = [
        (0, "hot hot cold0 cold1 cold2 cold3"),
        (1, "hot hot cold0 cold1 cold2 cold3"),
        (2, "hot hot only2 more2"),
        (3, "hot hot only3 more3"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in minhash_containment_pairs(df, threshold=0.2, shingle_n=2).collect()
    }
    assert (2, 3) in uncapped and (0, 1) in uncapped
    capped = {
        (r.doc_a, r.doc_b)
        for r in minhash_containment_pairs(
            df, threshold=0.2, shingle_n=2, max_element_df=3
        ).collect()
    }
    assert (0, 1) in capped  # cold shared elements keep the real pair
    assert (2, 3) not in capped  # only-hot pair lost by design


# ------------------------------------------------- SQL-surface queries


def test_correlated_subquery_decorrelates(spark):
    from name_match_ml_spark.suite import SPARK_QUERIES

    df = SPARK_QUERIES["correlated_subquery"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Catalyst must rewrite each correlated scalar subquery into an
    # aggregate + join — a surviving per-row subquery node would
    # re-execute the aggregate once per outer row.
    assert "Subquery" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_null_semantics_null_group_row(spark):
    from name_match_ml_spark.suite import SPARK_QUERIES

    rows = {
        r.et_nullable: r
        for r in SPARK_QUERIES["null_semantics"](spark, "/root/testdata/sf0.001").collect()
    }
    assert None in rows  # NULL is its own grouping key
    null_row = rows[None]
    assert null_row.n_nonnull == 0  # count(col) skips NULLs
    # NULL <=> NULL is TRUE for every clicked row in the NULL group
    assert null_row.n_nullsafe_eq == null_row.n_rows
    assert null_row.n_fallback == null_row.n_rows
    for k, r in rows.items():
        if k is not None:
            assert r.n_nullsafe_eq == 0 and r.n_fallback == 0


# ------------------------------------------------------------- triangles


def test_triangles_enumeration(spark):
    from name_match_ml_spark.operators.graph import triangles

    edges = (
        [(1, 2), (2, 3), (1, 3)]  # one triangle
        + [(4, 5), (5, 6)]  # chain: none
        + [(a, b) for a in (7, 8, 9, 10) for b in (7, 8, 9, 10) if a < b]  # K4: 4
        + [(11, x) for x in range(12, 21)]  # star hub: none
        + [(2, 1)]  # duplicate reversed edge must not double-count
    )
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = sorted(
        (r.node_a, r.node_b, r.node_c) for r in triangles(pairs).collect()
    )
    assert got == [
        (1, 2, 3),
        (7, 8, 9),
        (7, 8, 10),
        (7, 9, 10),
        (8, 9, 10),
    ]


def test_triangles_empty_and_self_loops(spark):
    from name_match_ml_spark.operators.graph import triangles

    pairs = spark.createDataFrame([(1, 1), (1, 2)], ["doc_a", "doc_b"])
    assert triangles(pairs).collect() == []


# ----------------------------------------------------------- grouped UDAF


def test_grouped_udaf_mad_matches_numpy(spark):
    import numpy as np
    from name_match_ml_spark.suite import SPARK_QUERIES

    out = {
        r.event_type: r
        for r in SPARK_QUERIES["grouped_udaf"](spark, "/root/testdata/sf0.001").collect()
    }
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for et, vals in (
        e.groupBy("event_type").agg(F.collect_list("value").alias("v")).collect()
    ):
        v = np.asarray(vals, dtype=float)
        expect = round(float(np.median(np.abs(v - np.median(v)))), 6)
        assert out[et].mad_value == expect
        assert out[et].n_events == len(vals)


@pytest.mark.slow
def test_triangles_matches_bruteforce_random_graphs(spark):
    """Randomized cross-check: degree-oriented enumeration vs an
    itertools brute force over all node triples."""
    import itertools
    import random

    rng = random.Random(7)
    for trial in range(6):
        n = rng.randint(3, 11)
        edges = sorted(
            {
                (a, b)
                for a in range(n)
                for b in range(a + 1, n)
                if rng.random() < 0.45
            }
        )
        if not edges:
            continue
        eset = set(edges)
        want = sorted(
            (a, b, c)
            for a, b, c in itertools.combinations(range(n), 3)
            if (a, b) in eset and (b, c) in eset and (a, c) in eset
        )
        from name_match_ml_spark.operators.graph import triangles

        pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
        got = sorted((r.node_a, r.node_b, r.node_c) for r in triangles(pairs).collect())
        assert got == want, f"trial {trial}: {got} != {want} on {edges}"


# ------------------------------------------------- custom Python data source


def test_python_datasource_partitioned_and_deterministic(spark):
    import hashlib

    from name_match_ml_spark.sources.pydatasource import register

    register(spark)
    df = (
        spark.read.format("hashstream")
        .option("n", 100)
        .option("numPartitions", 4)
        .option("buckets", 8)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # partition planning honored
    rows = sorted((r.i, r.bucket, r.payload_hash) for r in df.collect())
    assert len(rows) == 100 and [r[0] for r in rows] == list(range(100))
    h7 = int(hashlib.md5(b"7").hexdigest()[:15], 16)
    assert rows[7] == (7, h7 % 8, h7)
    again = sorted((r.i, r.bucket, r.payload_hash) for r in df.collect())
    assert again == rows  # re-read (= task retry) regenerates identically


def test_python_datasource_uneven_partition_split(spark):
    from name_match_ml_spark.sources.pydatasource import register

    register(spark)
    df = (
        spark.read.format("hashstream")
        .option("n", 10)
        .option("numPartitions", 3)
        .load()
    )
    assert df.count() == 10  # ceil-split ranges cover [0, n) exactly once


def test_lateral_topk_decorrelates_to_window_group_limit(spark):
    from name_match_ml_spark.suite import SPARK_QUERIES

    df = SPARK_QUERIES["lateral_topk_join"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # per-key top-k pushed below the shuffle
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


@pytest.mark.slow
def test_python_datasource_streaming_reader(spark, tmp_path):
    """The streaming side of the custom source: micro-batches follow the
    checkpointed offset, the capped stream terminates under availableNow,
    and the full streamed result equals the batch read."""
    from name_match_ml_spark.sources.pydatasource import register

    register(spark)
    stream = (
        spark.readStream.format("hashstream")
        .option("n", 57)
        .option("rowsPerBatch", 10)
        .option("buckets", 8)
        .load()
    )
    # Python micro-batch sources don't support Trigger.AvailableNow
    # (Spark logs the fallback); drain with a fast processing trigger and
    # poll the sink until the capped stream is exhausted.
    import time as _time

    q = (
        stream.writeStream.format("memory")
        .queryName("hs_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = _time.time() + 120
    while _time.time() < deadline and spark.table("hs_out").count() < 57:
        _time.sleep(1)
    got = sorted(tuple(r) for r in spark.table("hs_out").collect())
    q.stop()
    spark.catalog.dropTempView("hs_out")
    batch = (
        spark.read.format("hashstream").option("n", 57).option("buckets", 8).load()
    )
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want and len(got) == 57


# --------------------------------------------- fixed-point centroids


def test_fixed_point_centroids_match_numpy_mean(spark):
    import numpy as np
    from name_match_ml_spark.operators.simsearch import fixed_point_centroids

    rng = np.random.default_rng(11)
    rows = [
        (int(i), int(i % 3), [float(x) for x in rng.normal(size=8)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    got = {
        (r.label, r.dim): r.centroid
        for r in fixed_point_centroids(df, grid_bits=20).collect()
    }
    by_label = {}
    for _, lbl, v in rows:
        by_label.setdefault(lbl, []).append(v)
    for lbl, vecs in by_label.items():
        mean = np.mean(np.array(vecs, dtype=np.float64), axis=0)
        for d in range(8):
            # grid error <= 2^-21 per component + 6dp output rounding
            assert abs(got[(lbl, d)] - mean[d]) < 1e-5


def test_fixed_point_centroids_partition_invariant(spark):
    """The whole point of the integer grid: the result must be identical
    under any partitioning / summation order."""
    from name_match_ml_spark.operators.simsearch import fixed_point_centroids

    rows = [(i, 0, [0.1 * i, -0.3 * i]) for i in range(50)]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    a = sorted(map(tuple, fixed_point_centroids(df).collect()))
    b = sorted(map(tuple, fixed_point_centroids(df.repartition(13)).collect()))
    assert a == b


def test_fixed_point_centroids_single_shuffle(spark):
    from name_match_ml_spark.operators.simsearch import fixed_point_centroids

    df = spark.createDataFrame([(1, 0, [1.0, 2.0])], ["vec_id", "label", "embedding"])
    plan = (
        fixed_point_centroids(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
