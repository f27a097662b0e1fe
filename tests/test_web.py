"""URL/domain curation operators: normalization contract, dedup keeper
rule, and the int64 prior grid."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_url_normalization_contract(spark):
    from name_match_ml_spark.operators.web import normalized_url_cols

    cases = [
        ("https://WWW.Example.COM/Path/?utm=x#frag", "example.com/path"),
        ("http://example.com", "example.com"),
        ("example.com/a/b/", "example.com/a/b"),
        ("https://sub.example.com/p?q=1", "sub.example.com/p"),
        ("https://www.example.com", "example.com"),
        # only ONE leading www. strips (www.www stays)
        ("https://www.www.example.com", "www.example.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    norm, domain, reg = normalized_url_cols(F.col("url"))
    got = df.select("url", norm.alias("n"), domain.alias("d"), reg.alias("r")).collect()
    want = dict(cases)
    for r in got:
        assert r["n"] == want[r["url"]], (r["url"], r["n"])
    by_url = {r["url"]: r for r in got}
    assert by_url["https://sub.example.com/p?q=1"]["d"] == "sub.example.com"
    assert by_url["https://sub.example.com/p?q=1"]["r"] == "example.com"
    assert by_url["http://example.com"]["r"] == "example.com"


def test_url_dedup_collapses_variants(spark):
    from name_match_ml_spark.operators.web import url_dedup

    docs = spark.createDataFrame(
        [
            (1, "https://www.a.com/x?utm=1"),
            (2, "http://a.com/x/"),
            (3, "https://a.com/x#top"),
            (4, "https://a.com/y"),
        ],
        "doc_id long, url string",
    )
    got = {r["norm_url"]: r for r in url_dedup(docs).collect()}
    assert set(got) == {"a.com/x", "a.com/y"}
    assert got["a.com/x"]["keeper_id"] == 1 and got["a.com/x"]["n_dups"] == 3
    assert got["a.com/y"]["keeper_id"] == 4 and got["a.com/y"]["n_dups"] == 1


def test_domain_priors_grid(spark):
    from name_match_ml_spark.operators.web import domain_quality_priors

    docs = spark.createDataFrame(
        [
            # mirror.com: 2 docs, same text (dup farm), 2 words each
            (1, "https://mirror.com/a", "hello world"),
            (2, "https://www.mirror.com/b", "hello world"),
            # good.com: 2 docs, unique texts, 3 words each
            (3, "https://good.com/a", "one two three"),
            (4, "https://cdn.good.com/b", "four five six"),
        ],
        "doc_id long, url string, text string",
    )
    got = {r["domain"]: r for r in domain_quality_priors(docs).collect()}
    assert set(got) == {"mirror.com", "good.com"}
    m, g = got["mirror.com"], got["good.com"]
    assert m["n_docs"] == 2 and m["uniq_grid"] == 500_000  # 1 distinct / 2
    assert m["words_grid"] == 2_000_000  # 2 words/doc
    assert g["uniq_grid"] == 1_000_000 and g["words_grid"] == 3_000_000
    # prior: (uniq + min(words,100e6)//100) // 2, all exact ints
    assert m["prior_grid"] == (500_000 + 2_000_000 // 100) // 2
    assert g["prior_grid"] == (1_000_000 + 3_000_000 // 100) // 2
    assert g["prior_grid"] > m["prior_grid"]
