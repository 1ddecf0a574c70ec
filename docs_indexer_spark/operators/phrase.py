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
    parts = []
    for i, t in enumerate(terms):
        p = pos_postings.filter(F.col(term_col) == t).select(
            F.col(id_col),
            F.transform("positions", _shift(i)).alias(f"p{i}"),
        )
        parts.append(p)
    joined = parts[0]
    acc = F.col("p0")
    for i in range(1, len(parts)):
        joined = joined.join(parts[i], id_col)
        acc = F.array_intersect(acc, F.col(f"p{i}"))
    return (
        joined.select(F.col(id_col), acc.alias("_hits"))
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
    """
    from docs_indexer_spark.operators.spimi import decode_position_blocks

    if offsets is None:
        offsets = list(range(len(term_ids)))
    decoded = decode_position_blocks(
        blocks.filter(F.col("term_id").isin([int(t) for t in term_ids]))
    )
    parts = []
    for i, tid in enumerate(term_ids):
        p = decoded.filter(F.col("term_id") == int(tid)).select(
            F.col(id_col),
            F.transform("positions", _shift(offsets[i])).alias(f"p{i}"),
        )
        parts.append(p)
    joined = parts[0]
    acc = F.col("p0")
    for i in range(1, len(parts)):
        joined = joined.join(parts[i], id_col)
        acc = F.array_intersect(acc, F.col(f"p{i}"))
    # _hits holds anchor positions shifted down by offsets[0]; add it back
    # so first_pos is the first matched term's ACTUAL stream position even
    # when the phrase starts with a filtered stopword (offsets[0] > 0).
    return (
        joined.select(F.col(id_col), acc.alias("_hits"))
        .filter(F.size("_hits") > 0)
        .select(
            id_col,
            F.size("_hits").alias("n_occurrences"),
            (F.array_min("_hits") + F.lit(int(offsets[0]))).alias("first_pos"),
        )
    )
