"""Phrase-suggester unit coverage beyond the driver row (which pins the
2-token oracle): candidate generation and the generalized n-token path."""

import pytest
from pyspark.sql import functions as F

from docs_indexer_spark.operators.suggest import (
    bigram_table,
    suggest_correction,
    term_candidates,
    vocabulary,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_term_candidates_levenshtein_bound(spark, docs):
    vocab = vocabulary(docs)
    cands = {r["cand"]: r["dist"] for r in term_candidates(vocab, "tabel").collect()}
    assert cands.get("table") == 2
    assert all(d <= 2 for d in cands.values())
    # exact vocabulary hit → distance 0 candidate present
    exact = {r["cand"]: r["dist"] for r in term_candidates(vocab, "table").collect()}
    assert exact["table"] == 0


def test_suggest_three_token_phrase(spark, docs):
    """The iterative-join path: every position corrected, scored by the
    chained bigram LM."""
    top = suggest_correction(docs, "tabel scann windoq", k=3).collect()
    assert top, "must produce suggestions"
    assert top[0]["suggestion"] == "table scan window"
    assert all(r["score"] <= top[0]["score"] for r in top)


def test_suggest_single_token(spark, docs):
    top = suggest_correction(docs, "windoq", k=3).collect()
    assert top[0]["suggestion"] == "window"


def test_suggest_prefers_frequent_correction(spark, docs):
    """Among equal-distance candidates the LM (unigram head) decides."""
    vocab = {r["term"]: r["cf"] for r in vocabulary(docs).collect()}
    top = suggest_correction(docs, "sorv", k=5).collect()
    cands = [r["suggestion"] for r in top]
    assert "sort" in cands
    # every suggestion is a real vocabulary term
    assert all(s in vocab for s in cands)


def test_bigram_table_counts(spark, docs):
    bt = bigram_table(docs)
    row = bt.orderBy(F.desc("bc")).first()
    assert row["bc"] > 0 and row["w1"] and row["w2"]
