"""Inverted-index construction as a declarative DataFrame plan.

Reference analogue: the index OpenSearch builds when the reference calls
``es.index`` per document (/root/reference/hugo.py:349-355) — term →
postings with term frequencies, document frequencies, document lengths —
re-expressed Spark-first (SURVEY.md §2 B6):

    docs → tokens (native expr or pandas UDF)
         → posexplode → groupBy(term, doc_id).count()        [postings]
         → groupBy(term).count()                             [df_stats]
         → size(tokens) per doc                              [doc_lengths]

Scale notes (100 TB / 10^12 docs):
- the (term, doc_id) groupBy is skew-safe: key cardinality is huge and
  Spark's hash aggregate does map-side partial aggregation, so the Zipf
  head ("the") still distributes across all tasks at this stage;
- df_stats groupBy(term) is a count over already-unique (term, doc_id)
  rows; partial aggregation again absorbs the head before the shuffle;
- nothing here is a UDF except the english-analyzer tokenizer (stemming is
  inherently per-token Python → Arrow-batched pandas UDF; the simple/stop
  chains are 100% native and stay in WholeStageCodegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from docs_indexer_spark.functions.analysis import (
    ANALYZERS,
    stop_filter_col,
    tokens_col,
)


def with_tokens(
    docs: DataFrame,
    text_col: str = "text",
    analyzer: str = "english",
    out_col: str = "tokens",
) -> DataFrame:
    """Add an array<string> token column using the named analysis chain.

    ``simple`` / ``stop`` chains are native Column expressions (JVM-side);
    ``english`` (possessive + stopword + Porter) runs as an Arrow-batched
    pandas UDF — the per-token stemmer is the only Python in the build path.
    """
    if analyzer == "simple":
        return docs.withColumn(out_col, tokens_col(text_col))
    if analyzer == "stop":
        return docs.withColumn(out_col, stop_filter_col(tokens_col(text_col)))

    analyze = ANALYZERS[analyzer]

    @F.pandas_udf(ArrayType(StringType()))
    def _analyze(series):
        return series.map(lambda t: analyze(t) if t is not None else [])

    return docs.withColumn(out_col, _analyze(F.col(text_col)))


def token_postings(tokens_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(term, doc_id, tf) — the uncompressed postings relation."""
    return (
        tokens_df.select(id_col, F.explode("tokens").alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def doc_lengths(tokens_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl) — token count per document (BM25 length norm)."""
    return tokens_df.select(
        id_col, F.size("tokens").cast("int").alias("dl")
    )


def corpus_stats(doclens: DataFrame) -> tuple[int, float]:
    """(N, avgdl) — one tiny driver-side aggregate."""
    row = doclens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"] or 0.0)


def df_stats(postings: DataFrame) -> DataFrame:
    """(term, df) — document frequency per term."""
    return postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def idf_col(df_col, n_docs: int):
    """Lucene ≥8 BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5)) — native."""
    return F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5)
    )
