"""Round-7 operator tests: blocklist gate, CCNet perplexity buckets,
and (added later this round) PQ ANN + integer perceptron training."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_blocklist_severe_zero_tolerance(spark):
    """One severe-term hit blocks the doc regardless of density."""
    from name_match_ml_spark.functions.text import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "clean text " * 50 + "dup"),      # 1 severe hit in 101 words
            (2, "clean text " * 50),               # no hits
            (3, "slow slow slow fast"),            # soft 3/4 = 750000 ppm
            (4, "slow " + "fast " * 99),           # soft 1/100 = 10000 ppm
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in blocklist_filter(docs).collect()}
    assert not got[1]["keep"] and not got[1]["ok_severe"] and got[1]["ok_soft"]
    assert got[2]["keep"] and got[2]["soft_hits"] == 0
    assert not got[3]["keep"] and got[3]["soft_ppm"] == 750000
    assert got[4]["keep"] and got[4]["soft_ppm"] == 10000


def test_blocklist_whole_token_not_substring(spark):
    """'duplicate' must NOT match severe term 'dup' (word-boundary rule)."""
    from name_match_ml_spark.functions.text import blocklist_filter

    docs = spark.createDataFrame(
        [(1, "duplicate rows are slowest bigger theory")],
        "doc_id long, text string",
    )
    r = blocklist_filter(docs).collect()[0]
    assert r["severe_hits"] == 0 and r["soft_hits"] == 0 and r["keep"]


def test_perplexity_buckets_match_plain_ntile(spark):
    """The one-shuffle ordered_index + closed-form NTILE arithmetic must
    equal the textbook ntile-window spelling row for row (including the
    n < k languages where some buckets are empty)."""
    from name_match_ml_spark.functions.text import (
        perplexity_buckets,
        unigram_logprob_scores,
    )
    from pyspark.sql import Window

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        # Force an n < k group: keep exactly 2 docs of one language.
        .filter(
            (F.col("lang") != "zh")
            | (F.col("doc_id").isin([r[0] for r in
                spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
                .filter(F.col("lang") == "zh").select("doc_id")
                .orderBy("doc_id").limit(2).collect()]))
        )
    )
    got = perplexity_buckets(docs).orderBy("doc_id").collect()

    scores = unigram_logprob_scores(docs)
    w = Window.partitionBy("lang").orderBy(F.desc("avg_logprob"), "doc_id")
    ref = (
        docs.select("doc_id", "lang")
        .join(scores, "doc_id")
        .withColumn("bucket", F.ntile(3).over(w))
        .orderBy("doc_id")
        .collect()
    )
    assert len(got) == len(ref) > 0
    for g, r in zip(got, ref):
        assert (g["doc_id"], g["bucket"]) == (r["doc_id"], r["bucket"])


def test_perplexity_buckets_sizes_and_order(spark):
    """Per language: bucket sizes differ by <=1, larger buckets first,
    and every head score >= every tail score."""
    from name_match_ml_spark.functions.text import perplexity_buckets

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = perplexity_buckets(docs).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(by_lang) >= 2
    for lang, rs in by_lang.items():
        sizes = {}
        for r in rs:
            sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
        counts = [sizes.get(b, 0) for b in sorted(sizes)]
        assert max(counts) - min(counts) <= 1
        assert counts == sorted(counts, reverse=True)  # larger buckets first
        heads = [r["avg_logprob"] for r in rs if r["bucket_label"] == "head"]
        tails = [r["avg_logprob"] for r in rs if r["bucket_label"] == "tail"]
        if heads and tails:
            assert min(heads) >= max(tails)


def test_pq_topk_recall_vs_exact(spark):
    """ADC + exact refine must recover >=0.9 of the true top-5 (by exact
    int64 distance over the same global-scale codes); measured 0.96 at
    the shipped m=16/k_codes=16/rerank=100 config."""
    from pyspark.sql import Window

    from name_match_ml_spark.operators.pq import pq_topk, _global_codes, _sq_dist

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = pq_topk(emb).collect()
    pq_pairs = {(r["query_id"], r["neighbor_id"]) for r in got}

    cf = _global_codes(emb, id_col="vec_id", vec_col="embedding")
    q = cf.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    pairs = (
        cf.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _sq_dist(F.col("q"), F.col("qq")).alias("d"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("d", "neighbor_id")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in pairs.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 5")
        .collect()
    }
    assert len(pq_pairs) == len(exact) > 0
    assert len(pq_pairs & exact) / len(exact) >= 0.9

    # refine invariant: the exact distance of rank r is <= rank r+1
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rank"])
        dists = [r["dist_grid"] for r in rs]
        assert dists == sorted(dists)
        assert all(r["pq_dist"] >= 0 and r["dist_grid"] >= 0 for r in rs)
        assert all(r["neighbor_id"] != r["query_id"] for r in rs)


def test_pq_codebooks_shape(spark):
    """Codebooks: m*k_codes entries, each sub-vector dim/m wide, codes
    assigned in 1..k_codes."""
    from name_match_ml_spark.operators.pq import pq_codebooks, _assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    codes_full, subq, centers = pq_codebooks(emb, m=4, k_codes=8, rounds=1)
    crows = centers.collect()
    assert len(crows) == 4 * 8
    assert {r["s"] for r in crows} == {0, 1, 2, 3}
    assert all(len(r["cv"]) == 16 for r in crows)  # 64 dims / m=4
    assign = _assign(subq, centers)
    cids = [r["cid"] for r in assign.select("cid").distinct().collect()]
    assert set(cids) <= set(range(1, 9))
