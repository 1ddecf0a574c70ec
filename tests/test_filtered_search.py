"""Filtered search composed with BM25 scoring — the OpenSearch
``bool: {must: match, filter: [...]}`` request shape (the reference's
keyword ``type``/``breadcrumb_*`` fields and ``date`` exist for exactly
this: /root/reference/mappings/hugo.json:9-53).

The pinned invariant everywhere: filter-then-score.  A filtered top-k
must equal "score the ENTIRE corpus exactly, drop ineligible docs, take
top-k" — post-filtering a top-k would miss eligible hits and is the bug
these tests exist to catch.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from docs_indexer_spark.operators import bm25, wand
from docs_indexer_spark.operators.fused import fused_build_blocks
from docs_indexer_spark.operators.postings import idf_col

from tests.conftest import rank_identical

TERMS = ["spark", "join", "window"]


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )


@pytest.fixture(scope="module")
def fused(corpus):
    fb = fused_build_blocks(
        corpus, analyzer="stop", n_buckets=4, norm_dtype=np.float64
    )
    fb.blocks = fb.blocks.persist()
    return fb


def _idf_map(fb, terms):
    rows = (
        fb.terms.filter(F.col("term").isin(terms))
        .join(fb.df_stats(), "term_id")
        .withColumn("idf", idf_col(F.col("df"), fb.n_docs))
        .collect()
    )
    return {int(r["term_id"]): float(r["idf"]) for r in rows}


def _reference_filtered_topk(fb, idf, allowed_set, k=10):
    """Ground truth: exact unfiltered scoring of the whole corpus, then a
    Python-side filter, then the pinned (score desc, doc_id asc) top-k."""
    full = bm25.score_from_blocks(
        fb.blocks, idf, sorted(idf), k=100_000
    ).collect()
    kept = [
        (r["doc_id"], r["score"]) for r in full if r["doc_id"] in allowed_set
    ]
    kept.sort(key=lambda x: (-x[1], x[0]))
    return kept[:k]


@pytest.fixture(scope="module")
def allowed(corpus):
    rows = (
        corpus.filter((F.col("lang") == "en") & (F.col("n_chars") >= 400))
        .select("doc_id")
        .collect()
    )
    ids = sorted(r["doc_id"] for r in rows)
    assert 0 < len(ids) < corpus.count(), "filter must be non-trivial"
    return ids


def test_filtered_wand_equals_filter_then_score(fused, allowed):
    idf = _idf_map(fused, TERMS)
    expected = _reference_filtered_topk(fused, idf, set(allowed), k=10)
    got = wand.wand_topk(
        fused.blocks, idf, sorted(idf), k=10,
        allowed=np.array(allowed, dtype=np.int64),
    ).collect()
    rank_identical(expected, [(r["doc_id"], r["score"]) for r in got])


def test_filtered_exact_blocks_array_and_df_paths_agree(spark, fused, allowed):
    idf = _idf_map(fused, TERMS)
    expected = _reference_filtered_topk(fused, idf, set(allowed), k=10)
    via_arr = bm25.score_from_blocks(
        fused.blocks, idf, sorted(idf), k=10,
        allowed=np.array(allowed, dtype=np.int64),
    ).collect()
    allowed_df = spark.createDataFrame(
        [(int(d),) for d in allowed], "doc_id long"
    )
    via_df = bm25.score_from_blocks(
        fused.blocks, idf, sorted(idf), k=10, allowed=allowed_df
    ).collect()
    rank_identical(expected, [(r["doc_id"], r["score"]) for r in via_arr])
    rank_identical(expected, [(r["doc_id"], r["score"]) for r in via_df])


def test_filtered_require_all(fused, allowed):
    """AND semantics + filter: every returned doc contains every term AND
    passes the filter; scores match the unfiltered AND run."""
    idf = _idf_map(fused, TERMS)
    unfiltered = {
        r["doc_id"]: r["score"]
        for r in bm25.score_from_blocks(
            fused.blocks, idf, sorted(idf), k=100_000, require_all=True
        ).collect()
    }
    got = bm25.score_from_blocks(
        fused.blocks, idf, sorted(idf), k=10, require_all=True,
        allowed=np.array(allowed, dtype=np.int64),
    ).collect()
    expected = sorted(
        ((d, s) for d, s in unfiltered.items() if d in set(allowed)),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    rank_identical(expected, [(r["doc_id"], r["score"]) for r in got])


def test_empty_filter_returns_empty(fused):
    idf = _idf_map(fused, TERMS)
    assert wand.wand_topk(
        fused.blocks, idf, sorted(idf), k=10,
        allowed=np.array([], dtype=np.int64),
    ).count() == 0
    assert bm25.score_from_blocks(
        fused.blocks, idf, sorted(idf), k=10,
        allowed=np.array([], dtype=np.int64),
    ).count() == 0


def test_block_metadata_pruning_drops_blocks(fused, allowed):
    """A one-doc filter must prune almost every block before decode."""
    one = np.array(allowed[:1], dtype=np.int64)
    idf = _idf_map(fused, TERMS)
    hit = fused.blocks.filter(
        F.col("term_id").isin(sorted(idf))
    ).select("term_id", "first_doc_id", "last_doc_id",
             "doc_ids_bin", "tf_norms_bin")
    total = hit.count()
    kept = wand.prune_blocks_by_allowed(hit, one).count()
    assert kept < total


def test_index_reader_search_where_end_to_end(spark, corpus, tmp_path):
    """Full serving path: build+publish via the catalog, then
    IndexReader.search(where=...) in all three routes (WAND bitset,
    exact bitset, distributed semi-join) against filter-then-score."""
    from docs_indexer_spark.plans.build_index import build_index
    from docs_indexer_spark.plans.query import IndexReader
    from docs_indexer_spark.sources.catalog import SnapshotCatalog

    docs = corpus.filter(F.col("doc_id") % 3 == 0)
    cat = SnapshotCatalog(str(tmp_path / "wh"))
    build_index(spark, docs, cat, fingerprint="f1", n_build_partitions=2,
                analyzer="stop", id_col="doc_id")
    reader = IndexReader(spark, cat)
    where = "lang = 'en' AND n_chars >= 400"
    allowed_set = {
        r["doc_id"] for r in docs.filter(F.expr(where)).select("doc_id").collect()
    }
    q = " ".join(TERMS)
    full = reader.search(q, k=100_000, exact=True).collect()
    expected = sorted(
        ((r["doc_id"], r["score"]) for r in full if r["doc_id"] in allowed_set),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    for kwargs in (
        {},                                   # WAND + bitset
        {"exact": True},                      # exact + bitset
        {"max_driver_filter_docs": 0},        # force distributed semi-join
    ):
        got = reader.search(q, k=10, where=where, **kwargs).collect()
        rank_identical(expected, [(r["doc_id"], r["score"]) for r in got])
    # unindexed-filter sanity: a filter matching nothing yields no hits
    assert reader.search(q, k=10, where="n_chars < 0").count() == 0
    reader.close()


@pytest.mark.parametrize("split", [2, 4, 7])
def test_wand_split_rank_identical(fused, allowed, split):
    """Bucket sub-splitting is a parallelism knob, never a semantics one:
    split-S WAND must equal split-1 WAND exactly, with and without a
    filter bitset."""
    idf = _idf_map(fused, TERMS)
    base = wand.wand_topk(fused.blocks, idf, sorted(idf), k=10).collect()
    got = wand.wand_topk(
        fused.blocks, idf, sorted(idf), k=10, split=split
    ).collect()
    rank_identical(
        [(r["doc_id"], r["score"]) for r in base],
        [(r["doc_id"], r["score"]) for r in got],
    )
    arr = np.array(allowed, dtype=np.int64)
    base_f = wand.wand_topk(
        fused.blocks, idf, sorted(idf), k=10, allowed=arr
    ).collect()
    got_f = wand.wand_topk(
        fused.blocks, idf, sorted(idf), k=10, allowed=arr, split=split
    ).collect()
    rank_identical(
        [(r["doc_id"], r["score"]) for r in base_f],
        [(r["doc_id"], r["score"]) for r in got_f],
    )


def test_filtered_prefix_fuzzy_phrase_end_to_end(spark, corpus, tmp_path):
    """The filter composes with EVERY query type: prefix, fuzzy, and
    phrase results under `where` equal the unfiltered run minus
    ineligible docs."""
    from docs_indexer_spark.plans.build_index import build_index
    from docs_indexer_spark.plans.query import IndexReader
    from docs_indexer_spark.sources.catalog import SnapshotCatalog

    docs = corpus.filter(F.col("doc_id") % 2 == 0)
    cat = SnapshotCatalog(str(tmp_path / "wh"))
    build_index(spark, docs, cat, fingerprint="fpp", n_build_partitions=1,
                analyzer="stop", id_col="doc_id", positions=True)
    reader = IndexReader(spark, cat)
    where = "n_chars >= 400"
    allowed_set = {
        r["doc_id"]
        for r in docs.filter(F.expr(where)).select("doc_id").collect()
    }

    def expect(rows, key):
        kept = [
            tuple(r[c] for c in ("doc_id", key))
            for r in rows if r["doc_id"] in allowed_set
        ]
        kept.sort(key=lambda x: (-x[1], x[0]))
        return kept[:10]

    pfx = reader.search_prefix("sp", k=100_000).collect()
    got = reader.search_prefix("sp", k=10, where=where).collect()
    rank_identical(
        expect(pfx, "score"),
        [(r["doc_id"], r["score"]) for r in got],
    )

    fz = reader.search_fuzzy("spak", k=100_000, fuzziness=1).collect()
    got = reader.search_fuzzy("spak", k=10, fuzziness=1, where=where).collect()
    rank_identical(
        expect(fz, "score"),
        [(r["doc_id"], r["score"]) for r in got],
    )

    ph = reader.search_phrase("merge sort", k=100_000).collect()
    got = reader.search_phrase("merge sort", k=10, where=where).collect()
    exp = sorted(
        ((r["doc_id"], r["n_occurrences"]) for r in ph
         if r["doc_id"] in allowed_set),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert [(r["doc_id"], r["n_occurrences"]) for r in got] == exp
    reader.close()


def test_search_after_pages_partition_the_ranking(fused):
    """Cursor pagination: walking pages via after=(score, doc_id) must
    reproduce the single-query ranking exactly — no gaps, no repeats —
    and compose with a filter."""
    terms = ["merge", "query", "sort"]
    idf = _idf_map(fused, terms)
    full = bm25.score_from_blocks(fused.blocks, idf, sorted(idf), k=30).collect()
    pages, cursor = [], None
    for _ in range(3):
        page = bm25.score_from_blocks(
            fused.blocks, idf, sorted(idf), k=10, after=cursor
        ).collect()
        if not page:
            break
        pages.extend(page)
        cursor = (float(page[-1]["score"]), int(page[-1]["doc_id"]))
    assert [(r["doc_id"], r["score"]) for r in pages] == [
        (r["doc_id"], r["score"]) for r in full
    ]


def test_search_after_composes_with_filter(fused, allowed):
    terms = ["merge", "query", "sort"]
    idf = _idf_map(fused, terms)
    arr = np.asarray(allowed, dtype=np.int64)
    full = bm25.score_from_blocks(
        fused.blocks, idf, sorted(idf), k=20, allowed=arr
    ).collect()
    p1 = full[:10]
    cursor = (float(p1[-1]["score"]), int(p1[-1]["doc_id"]))
    p2 = bm25.score_from_blocks(
        fused.blocks, idf, sorted(idf), k=10, allowed=arr, after=cursor
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in p2] == [
        (r["doc_id"], r["score"]) for r in full[10:20]
    ]


def test_rrf_fuse_known_values(spark):
    """RRF on two hand-built lists: scores are exactly sum 1/(60+rank);
    docs in both lists outrank docs in one."""
    from docs_indexer_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(2, 0.9), (4, 0.8), (1, 0.7)], "doc_id long, score double"
    )
    rows = {r["doc_id"]: r for r in rrf_fuse([a, b], k=10, c=60).collect()}
    assert rows[1]["n_lists"] == 2 and rows[4]["n_lists"] == 1
    assert abs(rows[1]["rrf_score"] - (1 / 61 + 1 / 63)) < 1e-12
    assert abs(rows[2]["rrf_score"] - (1 / 62 + 1 / 61)) < 1e-12
    assert abs(rows[4]["rrf_score"] - 1 / 62) < 1e-12
    order = [r["doc_id"] for r in sorted(
        rows.values(), key=lambda r: (-r["rrf_score"], r["doc_id"])
    )]
    assert order[:2] == [2, 1]  # both-list docs first


def test_search_hybrid_end_to_end(spark, corpus, tmp_path):
    """Hybrid serving: search_hybrid must equal rrf_fuse of the two arms
    computed independently, and `where` must reach BOTH arms."""
    from docs_indexer_spark.operators.similarity import (
        IvfIndex,
        ivf_centroids,
        rrf_fuse,
    )
    from docs_indexer_spark.plans.build_index import build_index
    from docs_indexer_spark.plans.query import IndexReader
    from docs_indexer_spark.sources.catalog import SnapshotCatalog

    docs = corpus.filter(F.col("doc_id") % 3 == 0)
    cat = SnapshotCatalog(str(tmp_path / "wh"))
    build_index(spark, docs, cat, fingerprint="f1", n_build_partitions=2,
                analyzer="stop", id_col="doc_id")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = IvfIndex.build(
        emb, ivf_centroids(64, 8, seed=7), str(tmp_path / "ivf")
    )
    reader = IndexReader(spark, cat)
    q, qv = " ".join(TERMS), [1.0] * 64
    got = [
        (r["doc_id"], r["n_lists"], round(r["rrf_score"], 9))
        for r in reader.search_hybrid(q, qv, idx, k=10, k_arm=15).collect()
    ]
    text = reader.search(q, k=15).select("doc_id", "score")
    vec = idx.topk(qv, k=15).select(
        F.col("vec_id").alias("doc_id"), F.col("cosine").alias("score")
    )
    want = [
        (r["doc_id"], r["n_lists"], round(r["rrf_score"], 9))
        for r in rrf_fuse([text, vec], k=10).collect()
    ]
    assert got == want and got
    # filtered: every fused hit must satisfy the predicate in BOTH id
    # spaces (text hits come from the doc store, vector hits from the
    # allowed semi-join on the same doc_ids)
    where = "n_chars >= 400"
    ok = {
        r["doc_id"]
        for r in docs.filter(F.expr(where)).select("doc_id").collect()
    }
    hits = reader.search_hybrid(q, qv, idx, k=10, where=where).collect()
    assert hits and all(r["doc_id"] in ok for r in hits)
    reader.close()


def test_significant_terms_planted_lift(spark):
    """A term concentrated in the foreground must rank above uniformly
    spread terms; below-min_doc_count terms are excluded."""
    from docs_indexer_spark.operators.aggregations import significant_terms

    rows = []
    for i in range(40):
        words = ["common", "filler"]
        if i < 10:
            words.append("anomaly")      # only in fg docs
        if i in (0, 1):
            words.append("rare")         # fg but below min_doc_count
        rows.append((i, " ".join(words), "en" if i < 10 else "de"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["term"]: r for r in significant_terms(
        docs, "lang = 'en'", min_doc_count=3, k=10
    ).collect()}
    assert "anomaly" in out and out["anomaly"]["fg_df"] == 10
    assert "rare" not in out                      # min_doc_count
    assert "common" not in out and "filler" not in out  # no lift


def test_search_after_wand_equals_exact(fused):
    """Cursor pagination through WAND must produce the identical page
    sequence as the exact scorer, at several depths, with and without a
    filter, and with bucket sub-splitting."""
    from docs_indexer_spark.operators.wand import wand_topk

    terms = ["merge", "query", "sort"]
    idf = _idf_map(fused, terms)
    full = bm25.score_from_blocks(
        fused.blocks, idf, sorted(idf), k=40
    ).collect()
    cursor = None
    got = []
    for _ in range(4):
        page = wand_topk(
            fused.blocks, idf, sorted(idf), k=10, after=cursor
        ).collect()
        if not page:
            break
        got.extend(page)
        cursor = (float(page[-1]["score"]), int(page[-1]["doc_id"]))
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (r["doc_id"], round(r["score"], 9)) for r in full
    ]
    # split composes with the cursor (cursor taken from the WAND path
    # itself, the real serving handoff — bit-identical scores there)
    p1 = wand_topk(fused.blocks, idf, sorted(idf), k=10).collect()
    cur = (float(p1[-1]["score"]), int(p1[-1]["doc_id"]))
    p2_split = wand_topk(
        fused.blocks, idf, sorted(idf), k=10, after=cur, split=3
    ).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in p2_split] == [
        (r["doc_id"], round(r["score"], 9)) for r in full[10:20]
    ]


def test_search_hybrid_accepts_ivfpq_index(spark, corpus, tmp_path):
    """The documented 'IvfPqIndex-or-IvfIndex' contract: hybrid serving
    must work with the PQ-codes index too, filtered and unfiltered."""
    import numpy as np

    from docs_indexer_spark.operators.similarity import (
        IvfPqIndex,
        ivf_centroids,
        pq_train,
    )
    from docs_indexer_spark.plans.build_index import build_index
    from docs_indexer_spark.plans.query import IndexReader
    from docs_indexer_spark.sources.catalog import SnapshotCatalog

    docs = corpus.filter(F.col("doc_id") % 3 == 0)
    cat = SnapshotCatalog(str(tmp_path / "wh"))
    build_index(spark, docs, cat, fingerprint="f1", n_build_partitions=2,
                analyzer="stop", id_col="doc_id")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sample = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").limit(256).collect()],
        dtype=np.float64,
    )
    idx = IvfPqIndex.build(
        emb, ivf_centroids(64, 4, seed=7),
        pq_train(sample, m=8, ks=16, iters=2, seed=5),
        str(tmp_path / "ivfpq"),
    )
    reader = IndexReader(spark, cat)
    q, qv = " ".join(TERMS), [1.0] * 64
    hits = reader.search_hybrid(q, qv, idx, k=10, k_arm=15).collect()
    assert hits and all(r["rrf_score"] > 0 for r in hits)
    where = "n_chars >= 400"
    ok = {
        r["doc_id"]
        for r in docs.filter(F.expr(where)).select("doc_id").collect()
    }
    fhits = reader.search_hybrid(q, qv, idx, k=10, where=where).collect()
    assert fhits and all(r["doc_id"] in ok for r in fhits)
    reader.close()


def test_wand_split_overflow_guard_extreme_doc_ids(spark):
    """A bucket whose doc-id span exceeds what int64 slice math can
    represent (full-range xxhash64-style ids in ONE bucket) must fall
    back to the unsliced plan instead of wrapping slice indices and
    silently dropping blocks' documents from the top-k."""
    imax = (1 << 63) - 1
    rows = [
        (-(1 << 62) * 2 + i, f"spark join window doc {i} alpha beta")
        for i in range(6)
    ] + [
        (imax - 5 + i, f"spark join window doc tail {i} gamma")
        for i in range(5)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fb = fused_build_blocks(
        docs, analyzer="stop", n_buckets=1, norm_dtype=np.float64
    )
    idf = _idf_map(fb, TERMS)
    base = wand.wand_topk(fb.blocks, idf, sorted(idf), k=10).collect()
    for split in (2, 4, "auto"):
        got = wand.wand_topk(
            fb.blocks, idf, sorted(idf), k=10, split=split
        ).collect()
        rank_identical(
            [(r["doc_id"], r["score"]) for r in base],
            [(r["doc_id"], r["score"]) for r in got],
        )
    assert len(base) == 10
