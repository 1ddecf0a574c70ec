"""Query entry point — the Spark-native mirror of the reference's search
path (/root/reference/test/integrationtest.sh:19 → OpenSearch `_search`,
SURVEY.md §3.3):

    analyze query string with the index's analyzer
    → per-term idf lookup (filter on df_stats — tiny collect)
    → block-max WAND (or exact scoring) over the published block index
    → top-k (score desc, doc_id asc)
    → join the doc store for rendering fields

Execution boundaries: driver parses/plans, executors scan + score their
buckets, TakeOrderedAndProject merges k rows to the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docs_indexer_spark.config import DEFAULT_TOP_K, BM25Params
from docs_indexer_spark.functions.analysis import analyze_text
from docs_indexer_spark.operators import bm25, wand
from docs_indexer_spark.sources.catalog import SnapshotCatalog


class IndexReader:
    def __init__(self, spark: SparkSession, catalog: SnapshotCatalog):
        self.spark = spark
        self.catalog = catalog
        meta = catalog.current_generation("index")
        if meta is None:
            raise FileNotFoundError("no published index generation")
        self.meta = meta
        self.analyzer = meta["metrics"].get("analyzer", "english")
        self.n_docs = int(meta["metrics"]["n_docs"])
        self.blocks = catalog.read(spark, "index", "blocks.parquet")
        self.df_stats = catalog.read(spark, "index", "df_stats.parquet")

    def _idf(self, terms: list[str]) -> dict[int, float]:
        """term strings → {term_id: idf} via the published df_stats table
        (which carries the string↔id mapping; vocabulary-sized, filtered
        to |query| rows before the collect)."""
        if not terms:
            return {}
        rows = self.df_stats.filter(F.col("term").isin(terms)).collect()
        n = self.n_docs
        return {
            int(r["term_id"]): math.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5))
            for r in rows
        }

    def search(
        self, query: str, k: int = DEFAULT_TOP_K, exact: bool = False
    ) -> DataFrame:
        terms = analyze_text(query, self.analyzer)
        idf = self._idf(sorted(set(terms)))
        ids = sorted(idf)
        if exact:
            return bm25.score_from_blocks(self.blocks, idf, ids, k=k)
        return wand.wand_topk(self.blocks, idf, ids, k=k)

    def search_with_docs(self, query: str, k: int = DEFAULT_TOP_K) -> DataFrame:
        top = self.search(query, k=k)
        docs = self.catalog.read(self.spark, "index", "docs.parquet")
        return top.join(docs, "doc_id", "left").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
