"""Stored-field doc model: the published doc store carries title,
breadcrumbs, and the front-matter map so search results can render
(reference mappings/hugo.json:3-44; VERDICT round-1 missing #5)."""

import pytest
from pyspark.sql import functions as F

from docs_indexer_spark.plans.build_index import build_index
from docs_indexer_spark.plans.query import IndexReader
from docs_indexer_spark.sources.catalog import SnapshotCatalog
from docs_indexer_spark.sources.corpus import generate_corpus


@pytest.fixture(scope="module")
def published(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("render_wh")
    docs = generate_corpus(spark, 250)
    catalog = SnapshotCatalog(str(wh))
    build_index(
        spark, docs, catalog, fingerprint="fp-render",
        use_extraction=True, n_build_partitions=2,
    )
    return catalog


def test_doc_store_has_rendering_fields(spark, published):
    store = published.read(spark, "index", "docs.parquet")
    cols = set(store.columns)
    assert {"title", "breadcrumb_1", "breadcrumb_2", "front_matter"} <= cols
    assert "html" not in cols and "text" not in cols
    # url = https://siteN.example/{lang}/p{i}/ → crumbs [lang, p{i}]
    row = store.filter(F.col("breadcrumb_1").isNotNull()).first()
    assert row["breadcrumb_1"] in ("en", "de", "es", "fr", "pt", "nl")
    assert row["breadcrumb_2"].startswith("p")
    assert row["breadcrumb_3"] is None
    # markdown docs (~25% of the corpus) have parsed front-matter titles
    md = store.filter(F.col("front_matter").isNotNull())
    assert md.count() > 0
    fm_row = md.first()
    assert fm_row["title"] != ""
    assert fm_row["front_matter"]["weight"] == "10"
    # html docs fall back to the <title> tag (fixture uses 't')
    html_doc = store.filter(F.col("front_matter").isNull()).first()
    assert html_doc["title"] == "t"


def test_search_with_snippets(spark, published):
    """Plain-highlighter parity: top-k hits joined to the corpus text,
    query terms wrapped in <em> inside a bounded fragment."""
    from docs_indexer_spark.plans.build_index import prepare_documents

    reader = IndexReader(spark, published)
    # the indexed term is stemmed; query with a raw corpus surface form
    docs = prepare_documents(generate_corpus(spark, 250))
    term_row = reader.df_stats.orderBy(F.desc("df")).first()
    query = term_row["term"]
    hits = reader.search_with_snippets(query, docs, k=5).collect()
    assert hits
    for h in hits:
        assert h["snippet"], "fragment must be non-empty for a hit"
        assert query in h["snippet"].lower()
        assert f"<em>{query}" in h["snippet_html"].lower()
        assert len(h["snippet"]) <= 60 * 2 + len(query) + 2


def test_search_operator_and_and_prefix(spark, tmp_path):
    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta"),
        (2, "alpha only here"),
        (3, "beta appears alone"),
        (4, "alphabet soup"),  # prefix 'alpha' should also match this
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    catalog = SnapshotCatalog(str(tmp_path / "wh"))
    build_index(spark, docs, catalog, fingerprint="fp-op", id_col="doc_id",
                n_build_partitions=1)
    reader = IndexReader(spark, catalog)

    or_hits = {r["doc_id"] for r in reader.search("alpha beta", k=10).collect()}
    and_hits = {
        r["doc_id"]
        for r in reader.search("alpha beta", k=10, operator="and").collect()
    }
    assert and_hits == {0, 1}
    assert and_hits <= or_hits and {2, 3} <= or_hits
    # a query containing an unindexed term AND-matches nothing
    assert reader.search("alpha zzzz", k=10, operator="and").count() == 0
    # AND scores equal the OR scores of the same docs (same BM25 sum)
    or_scores = {
        r["doc_id"]: round(r["score"], 9)
        for r in reader.search("alpha beta", k=10, exact=True).collect()
    }
    for r in reader.search("alpha beta", k=10, operator="and").collect():
        assert round(r["score"], 9) == or_scores[r["doc_id"]]

    prefix_hits = {r["doc_id"] for r in reader.search_prefix("alpha").collect()}
    assert prefix_hits == {0, 1, 2, 4}  # 'alphabet' matches via expansion


def test_snippet_stem_expansion(spark, tmp_path):
    """A query stem highlights every surface form that analyzes to it —
    the published surface dictionary inverts the stemmer, so 'running'
    highlights 'runs' and 'run' too (what stored offsets would buy,
    without per-token offset storage)."""
    rows = [
        (0, "the cat runs fast"),
        (1, "cats were running very fast"),
        (2, "a single run a day"),
        (3, "nothing relevant here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    catalog = SnapshotCatalog(str(tmp_path / "wh"))
    build_index(spark, docs, catalog, fingerprint="fp-stem",
                id_col="doc_id", n_build_partitions=1)
    reader = IndexReader(spark, catalog)
    hits = {
        r["doc_id"]: r
        for r in reader.search_with_snippets("running", docs, k=4).collect()
    }
    assert set(hits) == {0, 1, 2}  # all three morphological variants score
    assert "<em>runs</em>" in hits[0]["snippet_html"]
    assert "<em>running</em>" in hits[1]["snippet_html"]
    assert "<em>run</em>" in hits[2]["snippet_html"]


def test_search_with_docs_renders(spark, published):
    reader = IndexReader(spark, published)
    term = reader.df_stats.orderBy(F.desc("df")).first()["term"]
    hits = reader.search_with_docs(term, k=5).collect()
    assert hits
    for h in hits:
        assert h["title"] is not None
        assert h["breadcrumb_1"] is not None
        assert h["url"] is not None
