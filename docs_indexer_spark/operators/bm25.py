"""Okapi/Lucene BM25 exact scoring + distributed top-k (SURVEY.md §2 B7/B8).

Two scoring paths, both exact:

- :func:`score_from_tokens` — pure-DataFrame plan over the uncompressed
  (term, doc_id, tf) postings relation.  100% native expressions: filter on
  query terms (pushes down to the postings scan), broadcast the per-term
  idf (query terms only — tiny), native arithmetic, hash-aggregate sum,
  ``orderBy(...).limit(k)`` which Catalyst executes as
  TakeOrderedAndProject (per-partition heap top-k + driver merge — no
  global sort, no full shuffle).
- :func:`score_from_blocks` — decodes the compressed posting blocks
  (operators/spimi.py) with a vectorized mapInPandas and feeds the same
  aggregate.  Used to cross-check the compressed index and as the exact
  fallback for block-max WAND (operators/wand.py).

Tie-break pinned everywhere: score DESC, doc_id ASC.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docs_indexer_spark.config import BM25Params, DEFAULT_TOP_K
from docs_indexer_spark.operators.compression import (
    decode_tf_norms,
    delta_decode_doc_ids,
)
from docs_indexer_spark.operators.postings import idf_col


def score_from_tokens(
    postings: DataFrame,
    doclens: DataFrame,
    n_docs: int,
    avgdl: float,
    query_terms: Iterable[str],
    params: BM25Params = BM25Params(),
    k: int = DEFAULT_TOP_K,
    require_all: bool = False,
) -> DataFrame:
    """Exact BM25 top-k from the uncompressed postings relation.

    Plan shape: postings filtered by `term IN (...)` (partition/row-group
    pruning on a term-sorted store) → join doc lengths on doc_id → per-term
    df over the *filtered* postings (tiny) joined back broadcast → native
    score expression → groupBy(doc_id).sum → TakeOrderedAndProject(k).

    ``require_all=True`` is boolean-AND semantics (OpenSearch
    ``operator: and``): only documents containing EVERY query term score —
    a HAVING on the per-doc distinct-term count, no extra shuffle.
    """
    terms = sorted(set(query_terms))
    if not terms:
        return postings.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    hits = postings.filter(F.col("term").isin(terms))
    dfs = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        hits.join(F.broadcast(dfs), "term")
        .join(doclens, "doc_id")
        .withColumn("idf", idf_col(F.col("df"), n_docs))
        .withColumn(
            "tfn",
            F.col("tf")
            / (
                F.col("tf")
                + params.k1
                * (1.0 - params.b + params.b * F.col("dl") / F.lit(avgdl))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("idf") * F.col("tfn")).alias("score"),
            F.count_distinct(F.col("term")).alias("_nt"),
        )
    )
    if require_all:
        scored = scored.filter(F.col("_nt") == len(terms))
    return (
        scored.drop("_nt")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def decode_blocks_iter(
    block_batches: Iterator[pd.DataFrame],
    idf: Mapping[int, float],
    allowed: np.ndarray | None = None,
    allowed_bc=None,
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: compressed blocks → (doc_id, partial score).
    ``allowed`` (sorted unique int64) masks decoded postings to a
    filter set before they ever leave the kernel; callers with a
    ``sc.broadcast`` handle pass ``allowed_bc`` instead so the array
    ships once per executor, not once per task."""
    from docs_indexer_spark.operators.wand import _in_sorted

    if allowed_bc is not None:
        allowed = allowed_bc.value
    for pdf in block_batches:
        if pdf.empty:
            continue
        out_ids: list[np.ndarray] = []
        out_scores: list[np.ndarray] = []
        for term, ids_bin, norms_bin in zip(
            pdf["term_id"].values, pdf["doc_ids_bin"].values, pdf["tf_norms_bin"].values
        ):
            w = idf.get(int(term))
            if not w:
                continue
            ids = delta_decode_doc_ids(ids_bin)
            norms = decode_tf_norms(norms_bin, len(ids)).astype(np.float64)
            if allowed is not None:
                keep = _in_sorted(ids, allowed)
                ids, norms = ids[keep], norms[keep]
                if not len(ids):
                    continue
            out_ids.append(ids)
            out_scores.append(norms * w)
        if out_ids:
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(out_ids),
                    "partial": np.concatenate(out_scores),
                }
            )


def score_from_blocks(
    blocks: DataFrame,
    idf: Mapping[int, float],
    query_term_ids: Iterable[int],
    k: int = DEFAULT_TOP_K,
    require_all: bool = False,
    allowed: "np.ndarray | DataFrame | None" = None,
    after: "tuple[float, int] | None" = None,
) -> DataFrame:
    """Exact BM25 top-k from the compressed block index.

    ``after=(score, doc_id)`` — cursor pagination (OpenSearch
    ``search_after`` under the ``[_score desc, doc_id asc]`` sort): only
    documents STRICTLY after the cursor in that total order can enter
    the top-k, so page N+1 costs the same one pass as page 1 and the
    driver never re-materializes earlier pages (the from+size shape
    does).  The float equality in the tie-arm is sound because the
    cursor is a score this same deterministic plan produced.

    The `term_id IN (...)` filter prunes row groups before any decode;
    decode is vectorized numpy inside mapInPandas; the final aggregate +
    top-k is native.

    ``require_all=True`` = boolean AND: a document has at most one posting
    per term, so the per-doc partial COUNT equals its distinct matched
    terms — compared against the scoring term count, no extra shuffle.

    ``allowed`` restricts scoring to a document filter set (OpenSearch
    bool-filter semantics), in one of two shapes chosen by the caller's
    filter cardinality:

    - numpy array of doc_ids (SELECTIVE filter): blocks with no eligible
      doc are metadata-pruned before decode and decoded postings are
      masked in-kernel — the filter reaches the scan, no extra shuffle;
    - DataFrame with a doc_id column (LARGE filter): a distributed
      LEFT SEMI join on the partials before the aggregate — low
      selectivity means near-exhaustive scoring anyway, so the doc_id
      shuffle is the scalable plan and nothing driver-sized exists.
    """
    terms = sorted(set(query_term_ids))
    if not terms:
        return blocks.sparkSession.createDataFrame([], "doc_id long, score double")
    allowed_arr = None
    allowed_df = None
    if allowed is not None:
        if isinstance(allowed, DataFrame):
            allowed_df = allowed.select("doc_id")
        else:
            allowed_arr = np.unique(np.asarray(allowed, dtype=np.int64))
            if len(allowed_arr) == 0:
                return blocks.sparkSession.createDataFrame(
                    [], "doc_id long, score double"
                )
    hit = blocks.filter(F.col("term_id").isin(terms))
    allowed_bc = None
    if allowed_arr is not None:
        from docs_indexer_spark.operators.wand import prune_blocks_by_allowed

        # broadcast the bitset once per executor instead of serializing
        # it into every task closure (r5 verdict minor #2)
        allowed_bc = blocks.sparkSession.sparkContext.broadcast(allowed_arr)
        hit_blocks = prune_blocks_by_allowed(
            hit.select("term_id", "first_doc_id", "last_doc_id",
                       "doc_ids_bin", "tf_norms_bin"),
            None,
            allowed_bc=allowed_bc,
        )
    else:
        # unfiltered scan stays 3 columns — range metadata never read
        hit_blocks = hit.select("term_id", "doc_ids_bin", "tf_norms_bin")
    partials = hit_blocks.mapInPandas(
        lambda it: decode_blocks_iter(it, idf, allowed_bc=allowed_bc),
        schema="doc_id long, partial double",
    )
    if allowed_df is not None:
        partials = partials.join(allowed_df, "doc_id", "left_semi")
    scored = partials.groupBy("doc_id").agg(
        F.sum("partial").alias("score"),
        F.count(F.lit(1)).alias("_nt"),
    )
    if require_all:
        n_scoring = len([t for t in terms if idf.get(int(t))])
        scored = scored.filter(F.col("_nt") == n_scoring)
    if after is not None:
        s0, d0 = float(after[0]), int(after[1])
        scored = scored.filter(
            (F.col("score") < s0)
            | ((F.col("score") == s0) & (F.col("doc_id") > d0))
        )
    return (
        scored.drop("_nt").orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    )


def score_most_fields(
    fields,
    query_terms: Iterable[str],
    k: int = DEFAULT_TOP_K,
    params: BM25Params = BM25Params(),
) -> DataFrame:
    """OpenSearch ``multi_match`` type ``most_fields``: every field is
    scored with ITS OWN statistics (per-field df and avgdl — exactly
    what separate per-field indices give), per-doc field scores are
    boost-weighted and summed, and ONE top-k runs over the sum.
    ``fields`` = list of ``(postings, doclens, n_docs, avgdl, boost)``.

    Plan: per field, the same filtered-postings scoring join as
    :func:`score_from_tokens`; the per-field partials are UNIONED
    BEFORE any cut — a per-field top-k first would be the
    dis_max/best_fields shape and can drop a doc that is mediocre in
    every field but best overall — then one doc_id aggregate feeds
    TakeOrderedAndProject(k).  Everything stays term-filtered, so the
    union is O(Σ df(query term)) rows per field — query-sized, never
    corpus-sized."""
    if not fields:
        raise ValueError("score_most_fields: fields must be non-empty")
    terms = sorted(set(query_terms))
    parts = []
    for postings, doclens, n_docs, avgdl, boost in fields:
        if not terms:
            continue
        hits = postings.filter(F.col("term").isin(terms))
        dfs = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        parts.append(
            hits.join(F.broadcast(dfs), "term")
            .join(doclens, "doc_id")
            .withColumn("idf", idf_col(F.col("df"), n_docs))
            .withColumn(
                "tfn",
                F.col("tf")
                / (
                    F.col("tf")
                    + params.k1
                    * (1.0 - params.b + params.b * F.col("dl") / F.lit(avgdl))
                ),
            )
            .select(
                "doc_id",
                (F.col("idf") * F.col("tfn") * F.lit(float(boost))).alias(
                    "partial"
                ),
            )
        )
    if not parts:
        return fields[0][0].sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("doc_id")
        .agg(F.sum("partial").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
