"""Search-side analytical aggregations.

:func:`significant_terms` — OpenSearch's significant_terms aggregation
(the "what is unusual about this result set" facet): terms whose
document frequency in a FOREGROUND set (the query/filter hits) is
anomalously high against the BACKGROUND (the whole index), scored with
the JLH heuristic the reference engine defaults to:

    jlh = (fg_rate − bg_rate) · (fg_rate / bg_rate)

Reference anchor: the keyword/text fields this engine indexes
(/root/reference/mappings/hugo.json) are exactly what OpenSearch users
point significant_terms at.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def significant_terms(
    docs: DataFrame,
    fg_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_count: int = 3,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` foreground-significant terms:
    ``(term, fg_df, bg_df, jlh)``.

    100-TB shape: ONE corpus pass — the foreground flag is computed
    per document (predicate pushes to the scan), tokens explode
    per-doc-distinct, and a single term-keyed aggregate counts both
    document frequencies at once (``bg_df`` = count, ``fg_df`` =
    conditional sum) with map-side combine.  The two corpus totals are
    scalar aggregates; no second tokenization, no join between fg and
    bg relations.
    """
    from docs_indexer_spark.functions.analysis import tokens_col
    from docs_indexer_spark.session import spread

    pred = F.expr(fg_pred) if isinstance(fg_pred, str) else fg_pred
    flagged = spread(docs).select(
        F.col(id_col),
        pred.cast("int").alias("_fg"),
        tokens_col(text_col).alias("_toks"),
    )
    totals = flagged.agg(
        F.count(F.lit(1)).alias("n"), F.sum("_fg").alias("n_fg")
    ).collect()[0]
    n, n_fg = int(totals["n"]), int(totals["n_fg"])
    if n_fg == 0:
        return docs.sparkSession.createDataFrame(
            [], "term string, fg_df long, bg_df long, jlh double"
        )
    per_doc = flagged.select(
        "_fg", F.explode(F.array_distinct("_toks")).alias("term")
    )
    counts = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("bg_df"),
        F.sum("_fg").alias("fg_df"),
    )
    fg_rate = F.col("fg_df") / F.lit(float(n_fg))
    bg_rate = F.col("bg_df") / F.lit(float(n))
    return (
        counts.filter(
            (F.col("fg_df") >= min_doc_count) & (fg_rate > bg_rate)
        )
        .select(
            "term",
            "fg_df",
            "bg_df",
            ((fg_rate - bg_rate) * (fg_rate / bg_rate)).alias("jlh"),
        )
        .orderBy(F.desc("jlh"), F.asc("term"))
        .limit(k)
    )
