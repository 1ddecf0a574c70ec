"""Corpus synthesizer tests: determinism, golden-extraction consistency,
Zipf head-term skew presence (FIXTURES.md §1)."""

import pytest
from pyspark.sql import functions as F

from docs_indexer_spark.extraction.front_matter import get_front_matter
from docs_indexer_spark.extraction.html_text import html2text
from docs_indexer_spark.sources.corpus import generate_corpus


@pytest.fixture(scope="module")
def corpus_df(spark):
    return generate_corpus(spark, 300, seed=42).cache()


def test_schema_and_determinism(spark, corpus_df):
    assert corpus_df.columns == ["url", "warc_ts", "html", "text", "lang"]
    rows1 = {r["url"]: r["text"] for r in corpus_df.collect()}
    rows2 = {
        r["url"]: r["text"] for r in generate_corpus(spark, 300, seed=42).collect()
    }
    assert rows1 == rows2
    assert len(rows1) == 300
    # urls unique, lowercase, trailing slash
    assert all(u == u.lower() and u.endswith("/") for u in rows1)


def test_golden_text_matches_extraction(corpus_df):
    """The stored text column must equal re-extraction of the html column —
    the per-url byte-identity invariant (input_hint)."""
    for r in corpus_df.limit(50).collect():
        payload = bytes(r["html"]).decode("utf-8")
        if payload.startswith("---"):
            _, text = get_front_matter(payload, "")
            text = text or ""
        else:
            text = html2text(payload)
        assert text == r["text"], r["url"]


def test_both_extraction_paths_present(corpus_df):
    md = corpus_df.filter(F.col("html").cast("string").startswith("---")).count()
    assert 0 < md < 300  # markdown minority exists


def test_zipf_head_skew(spark, corpus_df):
    """Top term should dominate: df(head) ≫ median df (exercises C2)."""
    from docs_indexer_spark.operators.postings import token_postings, with_tokens

    toks = with_tokens(corpus_df.withColumn("doc_id", F.xxhash64("url")), "text", "simple")
    dfs = (
        token_postings(toks.select("doc_id", "tokens"))
        .groupBy("term")
        .count()
        .orderBy(F.desc("count"))
        .limit(200)
        .collect()
    )
    head = dfs[0]["count"]
    mid = dfs[len(dfs) // 2]["count"]
    assert head > 5 * mid
