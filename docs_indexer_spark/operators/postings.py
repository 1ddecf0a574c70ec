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
    ENGLISH_STOPWORDS,
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
    from docs_indexer_spark.session import spread

    docs = spread(docs)
    if analyzer == "simple":
        return docs.withColumn(out_col, tokens_col(text_col))
    if analyzer == "stop":
        return docs.withColumn(out_col, stop_filter_col(tokens_col(text_col)))

    analyze = ANALYZERS[analyzer]

    @F.pandas_udf(ArrayType(StringType()))
    def _analyze(series):
        return series.map(lambda t: analyze(t) if t is not None else [])

    return docs.withColumn(out_col, _analyze(F.col(text_col)))


class TokenRelations:
    """Result bundle of :func:`token_relations`.

    - ``postings``: (term_id|term, doc_id, tf)
    - ``doclens``:  (doc_id, dl) — post-stopword token count per doc
    - ``terms``:    (term_id, term) dictionary (None in string mode)
    - ``surfaces``: (raw, term_id) surface-form dictionary — every raw
      token form that analyzes to each term (stem inversion); published so
      the highlighter can wrap "running"/"runs" for a query stem "run"

    When built with ``cache=True`` the intermediate counts relation is
    persisted; call :meth:`unpersist` when done with ALL of the outputs,
    or a long-lived session accumulates cached relations per call.
    """

    def __init__(self, postings, doclens, terms=None, cached=None, surfaces=None):
        self.postings = postings
        self.doclens = doclens
        self.terms = terms
        self.surfaces = surfaces
        self._cached = cached

    def unpersist(self) -> None:
        if self._cached is not None:
            self._cached.unpersist()
            self._cached = None

    def __iter__(self):  # backwards-compatible unpacking
        return iter((self.postings, self.doclens))


def term_dictionary(
    docs: DataFrame,
    text_col: str = "text",
    analyzer: str = "english",
) -> DataFrame:
    """(rid, term_id, term, cf) — the vocabulary dictionary.

    ``rid`` is xxhash64 of the raw surface form, ``term_id`` xxhash64 of
    the analyzed term, ``cf`` the raw collection frequency.  The analysis
    chain (possessive strip → stopword filter → Porter stem for
    ``english``) runs on DISTINCT surface forms only — O(|vocab|) Python,
    never O(tokens); stopword surface forms are dropped, so an inner join
    on rid filters occurrences for free.  Σcf over the retained rows is
    the post-stopword corpus token count (stemming is count-preserving),
    which gives avgdl without a doclens aggregation.
    """
    from pyspark.sql.types import StringType

    from docs_indexer_spark.session import spread

    if analyzer == "english":
        toks = _tokenize_col(F.col(text_col))
    else:
        toks = tokens_col(text_col)
        if analyzer == "stop":
            toks = stop_filter_col(toks)

    base = spread(docs).select(F.explode(toks).alias("raw"))
    rdict = base.groupBy("raw").agg(F.count(F.lit(1)).alias("cf"))

    if analyzer == "english":
        stripped = F.regexp_replace(F.col("raw"), "'s$", "")
        stop_arr = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOPWORDS)])
        rdict = rdict.select(
            "raw", F.xxhash64("raw").alias("rid"), stripped.alias("stripped"), "cf"
        ).filter(~F.array_contains(stop_arr, F.col("stripped")))

        @F.pandas_udf(StringType())
        def _stem(series):
            from docs_indexer_spark.functions.porter import porter_stem

            return series.map(porter_stem)

        rdict = rdict.withColumn("term", _stem(F.col("stripped"))).drop("stripped")
    else:
        rdict = rdict.select(
            "raw", F.xxhash64("raw").alias("rid"), F.col("raw").alias("term"), "cf"
        )
    return rdict.select(
        "raw", "rid", F.xxhash64("term").alias("term_id"), "term", "cf"
    )


def token_relations(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "english",
    cache: bool = True,
    term_ids: bool = False,
    positions: bool = False,
) -> TokenRelations:
    """(postings, doclens[, term dictionary]) with BOTH the Python boundary
    and the string traffic minimized.

    The naive formulation stems every token occurrence in a pandas UDF —
    O(total tokens) Python calls (10^14 at the 100 TB target) — and drags
    term STRINGS through every shuffle.  BM25 postings need neither
    positions nor strings, so the chain factors:

      tokenize (native regexp_extract_all, apostrophe-aware — the exact
                oracle regex; possessive/stopword handling moves to the
                vocabulary level so no per-token transform runs at all)
      → explode → (doc_id, xxhash64(raw)) numeric pairs
      → per-doc counts: hash agg over two int64 columns (map-side combine;
        profiled ~25% faster than the string-keyed agg and far lighter GC)
      → vocabulary dictionary: groupBy(raw) — output is vocab-sized, the
        partial agg collapses the Zipf mass early
      → possessive strip + stopword filter + Porter stem on the DICTIONARY
        (O(|vocab|) Python in one tiny pandas UDF)
      → join counts ⨝ dictionary on the int64 raw-hash (AQE picks
        broadcast when the dictionary is small)
      → re-aggregate on (term_id, doc_id) — stem conflation can merge
        counts (batch+batches); still all-numeric

    doclens = Σtf per doc AFTER the stop filter (stemming is
    count-preserving).  Docs with zero tokens are handled downstream
    (dl=0 via the doc-store left join).

    64-bit hash collisions (raw-hash or term_id) merge two terms; at a
    10^8 web vocabulary the expected number of collisions is <1 and the
    effect is a slightly blended posting list — documented trade for
    keeping 10^12-row shuffles string-free.  Set ``term_ids=False`` to
    reattach term strings (vocabulary-sized broadcast join) for
    SQL-parity / debugging planes.
    """
    from docs_indexer_spark.session import spread

    docs = spread(docs)
    if analyzer == "english":
        toks = _tokenize_col(F.col(text_col))
    else:
        # simple split — the SQL-parity tokenizer (DuckDB twin uses the
        # same [^a-z0-9]+ split)
        toks = tokens_col(text_col)
        if analyzer == "stop":
            toks = stop_filter_col(toks)

    if positions:
        # token positions index the ANALYZED stream pre-filter, so
        # vocabulary-level stopword drops keep Lucene position increments;
        # for the stop chain that means exploding the UNFILTERED tokens
        # (the dictionary join drops stopword occurrences anyway)
        if analyzer == "stop":
            toks = tokens_col(text_col)
        base = docs.select(
            F.col(id_col), F.posexplode(toks).alias("pos", "raw")
        )
        counts = base.select(
            F.col(id_col),
            F.col("pos").cast("int").alias("pos"),
            F.xxhash64("raw").alias("rid"),
        ).groupBy(id_col, "rid").agg(
            F.count(F.lit(1)).cast("int").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    else:
        base = docs.select(F.col(id_col), F.explode(toks).alias("raw"))
        counts = base.select(
            F.col(id_col), F.xxhash64("raw").alias("rid")
        ).groupBy(id_col, "rid").agg(F.count(F.lit(1)).cast("int").alias("tf"))
    cached = None
    if cache:
        counts = cached = counts.persist()

    # vocabulary dictionary: second tokenize pass, but its agg output is
    # vocab-sized (cheaper than caching the 10^12-row exploded relation)
    rdict = term_dictionary(docs, text_col, analyzer)

    pos_aggs = (
        [F.array_sort(F.flatten(F.collect_list("positions"))).alias("positions")]
        if positions
        else []
    )
    postings = (
        counts.join(rdict.select("rid", "term_id"), "rid")
        .groupBy("term_id", id_col)
        .agg(F.sum("tf").cast("int").alias("tf"), *pos_aggs)
    )
    # post-stop doclens: stopword rows dropped by the inner dictionary join
    doclens = postings.groupBy(id_col).agg(F.sum("tf").cast("int").alias("dl"))
    terms = rdict.select("term_id", "term").distinct()

    surfaces = rdict.select("raw", "term_id")
    if not term_ids:
        postings = postings.join(F.broadcast(terms), "term_id").drop("term_id")
    return TokenRelations(
        postings, doclens, terms, cached=cached, surfaces=surfaces
    )


def _tokenize_col(text):
    """Standard-ish tokenizer as a native expression — the EXACT pattern
    the oracle's ``tokenize()`` uses (apostrophe-joined latin runs, Hangul
    and Katakana runs, single Han/Hiragana chars; see
    functions/analysis._TOKEN_PATTERN)."""
    from pyspark.sql import functions as F

    from docs_indexer_spark.functions.analysis import _TOKEN_PATTERN

    return F.regexp_extract_all(
        F.lower(F.coalesce(text, F.lit(""))),
        F.lit(_TOKEN_PATTERN),
        0,
    )


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
    """(term|term_id, df) — document frequency per term."""
    key = "term_id" if "term_id" in postings.columns else "term"
    return postings.groupBy(key).agg(F.count(F.lit(1)).alias("df"))


def idf_col(df_col, n_docs: int):
    """Lucene ≥8 BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5)) — native."""
    return F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5)
    )
