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


def test_deletion_index_candidates_identical_to_scan(spark, docs):
    """SymSpell superset + exact verify ⇒ candidate sets identical to the
    vocabulary scan, for both a misspelling and an exact hit."""
    from docs_indexer_spark.operators.suggest import (
        deletion_index,
        term_candidates_from_index,
    )

    vocab = vocabulary(docs).persist()
    dix = deletion_index(vocab, max_edits=2).persist()
    for tok in ["tabel", "table", "windoq", "sorv"]:
        want = {
            (r["cand"], r["cf"], r["dist"])
            for r in term_candidates(vocab, tok).collect()
        }
        got = {
            (r["cand"], r["cf"], r["dist"])
            for r in term_candidates_from_index(dix, tok).collect()
        }
        assert got == want, tok
    dix.unpersist()
    vocab.unpersist()


def test_suggester_matches_suggest_correction(spark, docs):
    """The precomputed Suggester (deletion-index serving path) returns the
    same ranked suggestions as the self-contained scan path."""
    from docs_indexer_spark.operators.suggest import Suggester

    sg = Suggester(docs)
    try:
        for q in ["tabel scann", "windoq", "tabel scann windoq"]:
            want = [
                (r["suggestion"], r["score"])
                for r in suggest_correction(docs, q, k=5).collect()
            ]
            got = [
                (r["suggestion"], r["score"])
                for r in sg.suggest(q, k=5).collect()
            ]
            assert got == want, q
    finally:
        sg.close()


def test_candidate_cap_bounds_phrase_cardinality(spark, docs):
    """num_candidates caps each per-term set (dist asc, cf desc beam), so
    phrase cardinality is at most num_candidates**n_tokens."""
    from docs_indexer_spark.operators.suggest import _cap_candidates

    vocab = vocabulary(docs)
    capped = _cap_candidates(term_candidates(vocab, "dat"), 3).collect()
    assert len(capped) <= 3
    full = term_candidates(vocab, "dat").collect()
    assert len(full) > 3, "fixture must actually exercise the cap"
    # the beam keeps the lowest-distance, highest-cf candidates
    best = sorted(full, key=lambda r: (r["dist"], -r["cf"], r["cand"]))[:3]
    assert {r["cand"] for r in capped} == {r["cand"] for r in best}
