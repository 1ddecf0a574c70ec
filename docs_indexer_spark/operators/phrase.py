"""Positional postings + phrase matching (SURVEY.md §2 B6 positions).

The reference mapping requests ``term_vector: with_positions_offsets`` on
title/body/text (/root/reference/mappings/hugo.json:6,48,60) — OpenSearch
stores token positions so phrase and proximity queries work.  Re-expressed
Spark-first:

    docs → posexplode(tokens)                  [(doc_id, pos, term)]
         → groupBy(term, doc_id)
             .agg(count → tf, sort_array(collect_list(pos)) → positions)

``pos`` is the token's index in the ANALYZED stream before any vocabulary-
level filtering, so under the english chain a dropped stopword still
advances positions — exactly Lucene's position-increment behavior ("big
data" matches in "big the data"-free text but "big ... data" with a
stopword between keeps the gap, as OpenSearch would).

Phrase matching is pure native array algebra, no UDF: the phrase occurs at
position p iff p ∈ P(t0) ∩ (P(t1)−1) ∩ … ∩ (P(tk)−k); the per-term
positional arrays are joined on doc_id (the first term's postings seed the
join; every further term is an inner join that can only shrink the set).
At 10^12 docs each join is a shuffle on doc_id of ONLY the phrase terms'
postings — the term_id filter prunes the block/posting scan first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_positions(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "simple",
) -> DataFrame:
    """(term, doc_id, tf, positions array<int>) — positional postings.

    ``simple`` / ``stop`` chains run as native expressions.  For ``stop``,
    positions index the UNFILTERED token stream (posexplode before the
    stopword filter), matching Lucene's position increments across removed
    stopwords.
    """
    from docs_indexer_spark.functions.analysis import (
        ENGLISH_STOPWORDS,
        tokens_col,
    )
    from docs_indexer_spark.session import spread

    toks = tokens_col(text_col)
    base = spread(docs, key=id_col).select(
        F.col(id_col), F.posexplode(toks).alias("pos", "term")
    )
    if analyzer == "stop":
        stop_arr = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOPWORDS)])
        base = base.filter(~F.array_contains(stop_arr, F.col("term")))
    elif analyzer != "simple":
        raise ValueError(f"unsupported analyzer for positions: {analyzer}")
    return base.groupBy("term", id_col).agg(
        F.count(F.lit(1)).cast("int").alias("tf"),
        F.sort_array(F.collect_list(F.col("pos").cast("int"))).alias("positions"),
    )


def _shift(offset: int):
    """Closure factory: a ``lambda x, o=offset`` default-arg form would be
    dispatched as a TWO-arg (element, index) HOF lambda by PySpark — the
    arity, not the names, selects the overload."""
    return lambda x: x - F.lit(offset)


def phrase_occurrences(
    pos_postings: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    term_col: str = "term",
) -> DataFrame:
    """(doc_id, n_occurrences, first_pos) for documents containing the
    exact phrase ``terms`` (adjacent positions).

    Implementation: intersect position sets shifted by their offset in the
    phrase.  Identical repeated terms are handled naturally (the same
    posting row joins at each offset).
    """
    if not terms:
        raise ValueError("empty phrase")
    # one filtered pass + one doc-keyed conditional aggregate instead of
    # a k−1 join chain: each join side re-evaluated the positional
    # postings aggregate (the per-term filter is on the grouping column,
    # so Catalyst pushes it BELOW the aggregate — once per side), and
    # each join paid its own exchange.  first(when(term = tᵢ, ...)) is
    # deterministic — postings hold one row per (term, doc); docs
    # missing a term aggregate to NULL and drop (inner-join semantics).
    flt = pos_postings.filter(F.col(term_col).isin(sorted(set(terms))))
    aggs = [
        F.first(
            F.when(
                F.col(term_col) == t,
                F.transform("positions", _shift(i)),
            ),
            ignorenulls=True,
        ).alias(f"p{i}")
        for i, t in enumerate(terms)
    ]
    grouped = flt.groupBy(id_col).agg(*aggs)
    present = None
    acc = F.col("p0")
    for i in range(len(terms)):
        c = F.col(f"p{i}").isNotNull()
        present = c if present is None else (present & c)
        if i > 0:
            acc = F.array_intersect(acc, F.col(f"p{i}"))
    return (
        grouped.filter(present)
        .select(F.col(id_col), acc.alias("_hits"))
        .filter(F.size("_hits") > 0)
        .select(
            id_col,
            F.size("_hits").alias("n_occurrences"),
            F.array_min("_hits").alias("first_pos"),
        )
    )


def phrase_match_blocks(
    blocks: DataFrame,
    term_ids: list[int],
    id_col: str = "doc_id",
    offsets: list[int] | None = None,
    term_dfs: dict[int, int] | None = None,
    block_size: int | None = None,
) -> DataFrame:
    """Phrase matching over the COMPRESSED block index (requires blocks
    built with ``positions=True``): decode only the phrase terms' blocks
    (term_id IN (...) prunes the parquet scan), then run the same native
    position-set algebra as :func:`phrase_occurrences`.

    ``term_ids`` are xxhash64(term) of the phrase terms IN ORDER.
    ``offsets`` are each term's position offset within the phrase
    (default 0..k-1 = strict adjacency); a stopword-filtered query keeps
    its original token indices here so "merge the sort" matches documents
    where the terms are two apart — Lucene match_phrase's position
    increments.

    LEAD-WITH-THE-RAREST (Lucene's advance()-driven conjunction,
    re-expressed at block granularity): the result docs are a subset of
    the RAREST term's docs, so the rare term's doc_ids are decoded
    FIRST (O(df_rare) — its doc-id stream, not positions) and every
    other term keeps only the blocks whose [first_doc_id, last_doc_id]
    CONTAINS at least one rare doc — a vectorized searchsorted over the
    sorted rare-doc array inside a mapInPandas filter on block METADATA
    (no decode, no join).  A "the <rare-word>" phrase then decodes
    O(df_rare) of the head term's postings instead of O(df_head).
    Block-RANGE overlap against the rare term's own blocks would NOT
    work: a sparse term's 128-posting blocks span wide doc ranges that
    cover the whole space.

    ``term_dfs`` (term_id → df) lets the caller supply document
    frequencies it already holds (IndexReader's persisted df_stats; the
    fused build's df relation) so NO extra job runs here; without it one
    block-metadata aggregate computes them.  Pruning engages only when
    it can pay: with rare docs uniformly spread, the kept fraction of a
    head term's blocks is ≈ 1 − e^(−λ) for λ = B·df_rare/df_head (B =
    postings per block), so pruning requires df_rare·B ≤ df_head
    (λ ≤ 1 → ≥37% skipped, far more for clustered or very rare terms)
    and df_rare ≤ 200k so the rare-doc array stays driver/closure-sized;
    both-terms-frequent phrases pay O(Σ df) like every positional
    engine.  Joins always run in ascending-df order so intermediate
    results never exceed the rarest relation.

    ``block_size`` is B in that calibration — callers reading a
    PUBLISHED index should pass the generation's recorded block size
    (IndexReader does); the default is this build's config.BLOCK_SIZE.
    """
    from docs_indexer_spark.config import BLOCK_SIZE
    from docs_indexer_spark.operators.spimi import decode_position_blocks

    if block_size is None:
        block_size = BLOCK_SIZE
    if offsets is None:
        offsets = list(range(len(term_ids)))
    tids = [int(t) for t in term_ids]
    cand = blocks.filter(F.col("term_id").isin(tids))
    spark = blocks.sparkSession
    if term_dfs is not None:
        nd = {int(t): int(df) for t, df in term_dfs.items()}
    else:
        nd = {
            int(r["term_id"]): int(r["nd"])
            for r in cand.groupBy("term_id")
            .agg(F.sum("n_docs").alias("nd"))
            .collect()
        }
    if any(t not in nd or nd[t] <= 0 for t in set(tids)):
        # a phrase term absent from the index can never match — answer
        # without touching a single block
        return spark.createDataFrame(
            [], f"{id_col} long, n_occurrences int, first_pos int"
        )
    rare = min(set(tids), key=lambda t: nd[t])
    df_max = max(nd[t] for t in set(tids))
    if (
        len(set(tids)) > 1
        and nd[rare] * block_size <= df_max
        and nd[rare] <= 200_000
    ):
        import numpy as np

        from docs_indexer_spark.operators.compression import (
            delta_decode_doc_ids,
        )

        rare_docs = np.sort(np.concatenate([
            delta_decode_doc_ids(r["doc_ids_bin"])
            for r in cand.filter(F.col("term_id") == rare)
            .select("doc_ids_bin").collect()
        ] or [np.array([], dtype=np.int64)]))

        def _keep_containing(pdfs):
            for pdf in pdfs:
                lo = np.searchsorted(
                    rare_docs, pdf["first_doc_id"].values, side="left"
                )
                hi = np.searchsorted(
                    rare_docs, pdf["last_doc_id"].values, side="right"
                )
                yield pdf[hi > lo]

        others = cand.filter(F.col("term_id") != rare).mapInPandas(
            _keep_containing, schema=cand.schema
        )
        cand = others.unionByName(cand.filter(F.col("term_id") == rare))
    # ONE decode pass + ONE doc-keyed aggregate instead of k−1 joins:
    # the old per-term join chain both re-ran the (Catalyst-opaque)
    # positional decode once per phrase term AND paid an exchange per
    # join side.  Here every candidate block decodes exactly once and a
    # conditional aggregate pivots each doc's per-term position arrays
    # into one row — first(when(term_id = tᵢ, positions − offsetᵢ))
    # is deterministic because decoded postings hold exactly one row per
    # (term, doc).  Docs missing any phrase term aggregate to NULL for
    # that slot and are dropped — inner-join semantics unchanged.
    dec = decode_position_blocks(cand)
    aggs = [
        F.first(
            F.when(
                F.col("term_id") == F.lit(tids[i]),
                F.transform("positions", _shift(offsets[i])),
            ),
            ignorenulls=True,
        ).alias(f"p{i}")
        for i in range(len(tids))
    ]
    grouped = dec.groupBy(id_col).agg(*aggs)
    present = None
    for i in range(len(tids)):
        c = F.col(f"p{i}").isNotNull()
        present = c if present is None else (present & c)
    # ascending-df intersect order (commutative; _hits are phrase-start
    # anchors regardless of order)
    order = sorted(range(len(tids)), key=lambda i: nd[tids[i]])
    acc = F.col(f"p{order[0]}")
    for i in order[1:]:
        acc = F.array_intersect(acc, F.col(f"p{i}"))
    # _hits holds anchor positions shifted down by offsets[0]; add it back
    # so first_pos is the first matched term's ACTUAL stream position even
    # when the phrase starts with a filtered stopword (offsets[0] > 0).
    return (
        grouped.filter(present)
        .select(F.col(id_col), acc.alias("_hits"))
        .filter(F.size("_hits") > 0)
        .select(
            id_col,
            F.size("_hits").alias("n_occurrences"),
            (F.array_min("_hits") + F.lit(int(offsets[0]))).alias("first_pos"),
        )
    )
