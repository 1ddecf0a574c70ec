"""Sequence packing + LM-quality operators: distributed prefix-sum
determinism, budget-boundary spanning, and edge cases (empty docs,
single-token docs, reference LM corpus)."""

from pyspark.sql import functions as F


def test_pack_sequences_matches_serial_reference(spark):
    """Two-phase distributed prefix sum must equal the serial
    concat-then-chunk placement for ANY partition count, including
    docs spanning budget boundaries and empty docs."""
    from docs_indexer_spark.operators.packing import pack_sequences

    rows = [
        (0, "a b c"),            # 3 tokens
        (1, " ".join(["w"] * 7)),  # spans the budget of 8 → into seq 1
        (2, ""),                  # empty doc: 0 tokens, placed, no gap
        (3, "x y"),
        (4, " ".join(["z"] * 9)),  # longer than budget
        (5, "q"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for n_parts in (1, 2, 4):
        got = {
            r["doc_id"]: (r["n_tokens"], r["start"], r["seq_id"], r["offset"])
            for r in pack_sequences(docs, budget=8, n_parts=n_parts).collect()
        }
        start = 0
        for doc_id, text in rows:
            n = len([t for t in text.split() if t])
            assert got[doc_id] == (n, start, start // 8, start % 8), (
                n_parts, doc_id)
            start += n


def test_pack_sequences_at_testdata_scale(spark):
    """Monotone starts, no token gaps, budget arithmetic — over the real
    corpus with forced multi-partition execution."""
    from docs_indexer_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 300)
    out = pack_sequences(docs, budget=512, n_parts=8).orderBy(
        "doc_id"
    ).collect()
    assert len(out) == 300
    pos = 0
    for r in out:
        assert r["start"] == pos
        assert r["seq_id"] == pos // 512 and r["offset"] == pos % 512
        pos += r["n_tokens"]


def test_lm_perplexity_edges(spark):
    """<2-token docs are omitted; a separate reference LM corpus scores
    unseen transitions as improbable (higher perplexity than seen
    ones)."""
    from docs_indexer_spark.functions.text_quality import lm_perplexity

    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "one"), (2, ""),
         (3, "the cat sat")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm_perplexity(docs).collect()}
    assert set(out) == {0, 3}          # 1-token and empty docs omitted
    assert out[0]["n_bigrams"] == 5 and out[3]["n_bigrams"] == 2

    ref = spark.createDataFrame(
        [(10, "the cat sat the cat sat")], "doc_id long, text string"
    )
    scored = {
        r["doc_id"]: r["perplexity"]
        for r in lm_perplexity(docs, lm_docs=ref).collect()
    }
    # doc 3 is exactly the reference's chain → far lower perplexity
    # than doc 0, which leaves the reference's support
    assert scored[3] < scored[0]


def test_repetition_stats_edges(spark):
    from docs_indexer_spark.functions.text_quality import repetition_stats

    docs = spark.createDataFrame(
        [(0, "a a a a"),          # fully repetitive
         (1, "w x y z"),          # fully distinct
         (2, ""),                 # empty
         (3, "p q p q p q")],     # repeated bigram chain
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[0]["dup_unigram_frac"] == 0.75      # 4 tokens, 1 distinct
    assert out[0]["dup_bigram_frac"] == 0.666667   # 3 grams, 1 distinct (rounded 6)
    assert out[0]["top_unigram_frac"] == 1.0
    assert out[1]["dup_unigram_frac"] == 0.0
    assert out[1]["top_unigram_frac"] == 0.25
    assert out[2]["n_tokens"] == 0
    assert out[2]["dup_unigram_frac"] == 0.0
    assert out[2]["top_unigram_frac"] == 0.0
    assert out[3]["dup_trigram_frac"] == 0.5       # 4 grams, 2 distinct


def test_dsir_ranks_target_like_docs_higher(spark):
    """A raw doc sharing the target domain's bigrams must out-weigh an
    off-domain doc; docs with <2 tokens emit no features."""
    from docs_indexer_spark.functions.text_quality import dsir_log_weights

    target = spark.createDataFrame(
        [(100, "spark shuffle join spark shuffle join spark shuffle")],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "spark shuffle join spark shuffle partition"),
            (2, "tomato garden rain harvest sunshine soil"),
            (3, "x"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dsir_log_weights(raw, target, n_buckets=64).collect()
    }
    assert set(rows) == {1, 2}  # doc 3 has no bigram features
    assert rows[1]["log_weight"] > rows[2]["log_weight"]
    assert rows[1]["n_features"] == 5 and rows[2]["n_features"] == 5


def test_dsir_plan_broadcasts_ratio(spark):
    from docs_indexer_spark.functions.text_quality import dsir_log_weights
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.filter(F.col("doc_id") % 7 == 0)
    raw = docs.filter(F.col("doc_id") % 7 != 0)
    plan = (
        dsir_log_weights(raw, target)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan


def test_pii_stats_counts_and_redacts(spark):
    from docs_indexer_spark.functions.text_quality import pii_stats

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-site.org and x@y.io, ip 10.0.0.1, "
                "call +44-123-4567 twice +44-123-4567"),
            (2, "clean text with no pii at all"),
            (3, "not-an-email @ nor 999.999 nor +1-12-345"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    r1 = rows[1]
    assert (r1["n_emails"], r1["n_ipv4s"], r1["n_phones"]) == (2, 1, 2)
    red = r1["redacted_text"]
    assert "<EMAIL>" in red and "<IP>" in red and "<PHONE>" in red
    assert "@" not in red and "10.0.0.1" not in red and "+44" not in red
    r2 = rows[2]
    assert (r2["n_emails"], r2["n_ipv4s"], r2["n_phones"]) == (0, 0, 0)
    assert r2["redacted_text"] == "clean text with no pii at all"
    r3 = rows[3]
    assert (r3["n_emails"], r3["n_ipv4s"], r3["n_phones"]) == (0, 0, 0)


def test_c4_clean_rules(spark):
    """Each C4 rule individually: terminal punctuation, min words,
    javascript line, lorem ipsum page, curly-brace page, sentence
    threshold."""
    from docs_indexer_spark.functions.text_quality import c4_clean

    good = ("One full sentence here. Another one follows it. A third "
            "sentence appears. The fourth is here. Fifth one ends it.")
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, good + "\nno terminal punctuation on this line\nThat is fine."),
            (3, good + "\nPlease enable javascript now."),
            (4, good + "\nlorem ipsum dolor sit."),
            (5, good + "\nhas a { brace."),
            (6, "Only two sentences here. Second one ends."),
            (7, "Too short.\nOk ok."),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in c4_clean(docs).collect()}
    assert rows[1]["kept"] and rows[1]["n_sentences"] == 5
    assert rows[1]["clean_text"] == good
    # line without terminal punct dropped, page survives on the rest
    assert rows[2]["kept"] and rows[2]["n_lines_kept"] == 2
    assert "no terminal" not in rows[2]["clean_text"]
    # javascript line dropped at line level; page still kept
    assert rows[3]["kept"] and "javascript" not in rows[3]["clean_text"]
    # page-level drops
    assert not rows[4]["kept"] and rows[4]["clean_text"] is None
    assert not rows[5]["kept"] and rows[5]["clean_text"] is None
    # sentence threshold
    assert not rows[6]["kept"] and rows[6]["n_sentences"] == 2
    # min-words line rule: both lines < 3 words
    assert rows[7]["n_lines_kept"] == 0 and not rows[7]["kept"]
