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
        # snapshot isolation: resolve CURRENT exactly once and pin the
        # generation PATH — every subsequent read (blocks, df_stats, doc
        # store, per-query manifest pruning) goes through this path, so a
        # writer republishing mid-lifetime can never mix another
        # generation's blocks with this reader's pinned idf/term stats.
        # The path is DERIVED from the meta dict already in hand (one
        # pointer read): re-reading CURRENT here could pair gen A's meta
        # with gen B's path if a republish landed between the two reads.
        self.gen_path = catalog.path_for_generation("index", meta["generation"])
        self.analyzer = meta["metrics"].get("analyzer", "english")
        self.n_docs = int(meta["metrics"]["n_docs"])
        self.blocks = catalog.read_at(spark, self.gen_path, "blocks.parquet")
        # vocabulary-sized and consulted by EVERY query (idf + term-id
        # lookups): cached for the reader's lifetime; close() releases
        self.df_stats = catalog.read_at(
            spark, self.gen_path, "df_stats.parquet"
        ).persist()
        # per-bucket doc-id bounds, lazily cached once per generation —
        # lets wand_topk's auto-split decide and slice with NO per-query
        # block-metadata job (see _bucket_bounds)
        self._bounds_cache: "list[tuple[int, int, int]] | None" = None

    def close(self) -> None:
        self.df_stats.unpersist()

    def _blocks_for(self, term_ids: list[int]) -> DataFrame:
        """Per-query block relation, manifest-pruned to the files whose
        term_id range can contain a query term (Iceberg manifest-level
        pruning against the PINNED generation — see __init__; generations
        published before manifests fall back to the full relation — the
        query's own IN-filter stays correct either way).  A corrupt or
        torn ``_MANIFEST.json`` (json.JSONDecodeError is a ValueError)
        also falls back to the unpruned — still correct — relation
        rather than failing the query."""
        try:
            return self.catalog.read_pruned_at(
                self.spark, self.gen_path, "blocks.parquet", "term_id",
                [int(t) for t in term_ids],
            )
        except (FileNotFoundError, ValueError):
            return self.blocks

    def _idf_df(self, terms: list[str]):
        """term strings → ({term_id: idf}, {term_id: df}) via the
        published df_stats table (which carries the string↔id mapping;
        vocabulary-sized, filtered to |query| rows before the collect).
        The df map rides along so callers can estimate block counts
        without another metadata job."""
        if not terms:
            return {}, {}
        rows = self.df_stats.filter(F.col("term").isin(terms)).collect()
        n = self.n_docs
        idf = {
            int(r["term_id"]): math.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5))
            for r in rows
        }
        dfs = {int(r["term_id"]): int(r["df"]) for r in rows}
        return idf, dfs

    def _idf(self, terms: list[str]) -> dict[int, float]:
        return self._idf_df(terms)[0]

    def _bucket_bounds(self) -> "list[tuple[int, int, int]]":
        """(bucket, min first_doc_id, max last_doc_id) over the WHOLE
        generation, computed once and cached — the auto-split serving
        fast path slices against these instead of aggregating the
        query's hit blocks every request (one block-metadata job per
        reader lifetime instead of per query)."""
        if self._bounds_cache is None:
            rows = (
                self.blocks.groupBy("bucket")
                .agg(
                    F.min("first_doc_id").alias("lo"),
                    F.max("last_doc_id").alias("hi"),
                )
                .collect()
            )
            self._bounds_cache = [
                (int(r["bucket"]), int(r["lo"]), int(r["hi"])) for r in rows
            ]
        return self._bounds_cache

    def docs_store(self) -> DataFrame:
        """The pinned generation's document store (rendering + keyword/
        date fields) — the relation ``where`` filters evaluate against."""
        return self.catalog.read_at(self.spark, self.gen_path, "docs.parquet")

    def _resolve_filter(
        self, where, max_driver_docs: int
    ):
        """Evaluate a search filter against the pinned doc store.

        Returns ``(allowed_array, allowed_df)`` — exactly one non-None —
        or ``(None, None)`` for no filter.  The predicate (a Column or a
        SQL string) is PUSHED DOWN into the doc-store parquet scan
        (keyword/date fields are plain columns, so min/max row-group
        pruning applies).  A selective filter (≤ ``max_driver_docs``
        hits) collects to a sorted doc_id array the scorers use as an
        in-kernel bitset — the OpenSearch filter-context shape; a broad
        filter stays a distributed relation for a semi-join, since low
        selectivity means near-exhaustive scoring anyway."""
        if where is None:
            return None, None
        import numpy as np

        if isinstance(where, DataFrame):
            # pre-resolved doc_id relation (search_hybrid resolves the
            # predicate ONCE and shares it across arms)
            sel = where.select("doc_id")
        else:
            pred = F.expr(where) if isinstance(where, str) else where
            sel = self.docs_store().filter(pred).select("doc_id")
        # ONE scan decides selectivity AND yields the ids: limit(max+1)
        # stops early on broad filters instead of counting the whole
        # qualifying set and then scanning it a second time to collect
        pdf = sel.limit(max_driver_docs + 1).toPandas()
        if len(pdf) <= max_driver_docs:
            return np.sort(pdf["doc_id"].to_numpy(dtype=np.int64)), None
        return None, sel

    def search(
        self,
        query: str,
        k: int = DEFAULT_TOP_K,
        exact: bool = False,
        operator: str = "or",
        where=None,
        max_driver_filter_docs: int = 500_000,
        split: int | str = "auto",
        search_after: "tuple[float, int] | None" = None,
    ) -> DataFrame:
        """``operator="and"`` = OpenSearch operator:and (every query term
        must match) — routed through the exact scorer, whose per-doc
        partial count gives the AND filter for free; WAND's upper-bound
        pruning is an OR-semantics optimization.

        ``where`` composes an exact-match / range filter over the doc
        store's keyword and date fields WITH relevance scoring — the
        OpenSearch ``bool: {must: match, filter: [...]}`` request shape
        (the reference's keyword ``type``/``breadcrumb_*`` and ``date``
        fields exist precisely for this: mappings/hugo.json:9-53).  A
        Column or SQL string, e.g. ``"source = 'web' AND n_chars >= 500"``.
        Filtered docs can never enter the top-k (filter-then-score, not
        post-filter): selective filters become an in-kernel bitset with
        metadata block pruning, broad filters a distributed semi-join —
        see :meth:`_resolve_filter`.

        ``split`` > 1 slices each index bucket's doc range into that
        many independent WAND tasks — serving-side parallelism when the
        build's bucket count is below the cluster's core count (rank-
        identical; see wand_topk).  The default ``"auto"`` sizes the
        slicing from block metadata: 1 on small/selective queries (plan
        unchanged), cores//n_buckets (≤8) on block-heavy ones — at 10M
        docs this took head-term p95 from 5.7 s to 2.7 s on 32 cores.

        ``search_after=(score, doc_id)`` — cursor pagination under the
        ``[_score desc, doc_id asc]`` sort (OpenSearch ``search_after``):
        pass the previous page's last sort key to get the next ``k``.
        Served THROUGH WAND: an at-or-before-cursor doc is simply not
        qualifying at heap insertion, so θ (the k-th qualifying score)
        stays a valid pruning threshold and every page costs one WAND
        pass — a page-1+page-2 pair measured 22.9 s → 4.7 s p50 at 10M
        docs vs the exact route (BENCH/serve_10m_filtered_r5.json).
        Composes with ``where``/``operator``/``exact`` unchanged."""
        terms = analyze_text(query, self.analyzer)
        idf, dfs = self._idf_df(sorted(set(terms)))
        ids = sorted(idf)
        blocks = self._blocks_for(ids)
        allowed_arr, allowed_df = self._resolve_filter(
            where, max_driver_filter_docs
        )
        if operator == "and":
            if len(ids) < len(set(terms)):
                # a term absent from the index can never AND-match
                return self.spark.createDataFrame([], "doc_id long, score double")
            return bm25.score_from_blocks(
                blocks, idf, ids, k=k, require_all=True,
                allowed=allowed_arr if allowed_arr is not None else allowed_df,
                after=search_after,
            )
        if allowed_df is not None:
            # broad filter: exhaustive scoring + semi-join beats WAND
            # (upper-bound pruning buys little when most docs are
            # eligible, and the filter relation must stay distributed)
            return bm25.score_from_blocks(
                blocks, idf, ids, k=k, allowed=allowed_df, after=search_after
            )
        if exact:
            return bm25.score_from_blocks(
                blocks, idf, ids, k=k, allowed=allowed_arr, after=search_after
            )
        # block-count estimate from the dfs already in hand: Σ ceil(df/B)
        # undercounts only when a term's postings spread over many
        # buckets, so pad by one bucket's worth of blocks per term —
        # a perf-only decision either way (split never changes results)
        fast = split == "auto" and allowed_arr is None
        est = None
        if fast:
            bsz = int(self.meta["metrics"].get("block_size") or 128)
            n_buckets = max(1, len(self._bucket_bounds()))
            est = sum(-(-df // bsz) + n_buckets for df in dfs.values())
        return wand.wand_topk(
            blocks, idf, ids, k=k, allowed=allowed_arr, split=split,
            after=search_after,
            est_n_blocks=est,
            bounds_rows=self._bucket_bounds() if fast else None,
        )

    def _filter_arg(self, where, max_driver_docs: int = 500_000):
        """``where`` → the ``allowed`` argument for the block scorers
        (bitset array if selective, doc_id relation otherwise, None if
        unfiltered)."""
        arr, df = self._resolve_filter(where, max_driver_docs)
        return arr if arr is not None else df

    def search_prefix(
        self,
        prefix: str,
        k: int = DEFAULT_TOP_K,
        max_expansions: int = 50,
        where=None,
    ) -> DataFrame:
        """Prefix query (scoring_boolean rewrite): expand over the
        vocabulary, BM25-sum the expansion through the block index.  The
        expansion is capped to ``max_expansions`` terms by descending df
        (Lucene's multi-term rewrite cap, default 50) BEFORE the collect
        — a one-character prefix on a 10⁸-term web vocabulary must never
        flood the driver with millions of vocabulary rows."""
        prefix = prefix.lower().rstrip("*")
        rows = (
            self.df_stats.filter(F.col("term").startswith(prefix))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .collect()
        )
        n = self.n_docs
        idf = {
            int(r["term_id"]): math.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5))
            for r in rows
        }
        ids = sorted(idf)
        return bm25.score_from_blocks(
            self._blocks_for(ids), idf, ids, k=k,
            allowed=self._filter_arg(where),
        )

    def _fuzzy_candidates_df(
        self, terms: list[str], fuzziness: int
    ) -> DataFrame:
        """Plan producing the (term, term_id, df) rows that MAY sit
        within ``fuzziness`` Damerau-OSA of some query term — via the
        published SymSpell deletion index (equi-join on the query's own
        deletion variants; one job for all query terms), falling back
        for pre-deletion-index generations to a df_stats scan bounded by
        threshold-Levenshtein ≤ 2·fuzziness (lev ≤ 2·OSA, so the bound
        is a superset).  Either way the caller OSA-verifies; the result
        is O(neighborhood) rows, never the vocabulary."""
        from docs_indexer_spark.operators.suggest import _deletion_variants

        try:
            dels = self.catalog.read_at(
                self.spark, self.gen_path, "deletions.parquet"
            )
        except FileNotFoundError:
            cond = None
            for t in terms:
                c = (
                    F.abs(F.length("term") - len(t)) <= 2 * fuzziness
                ) & (
                    F.levenshtein(F.col("term"), F.lit(t), 2 * fuzziness) >= 0
                )
                cond = c if cond is None else (cond | c)
            return self.df_stats.filter(cond)
        variants = sorted(
            {v for t in terms for v in _deletion_variants(t, fuzziness)}
        )
        cands = (
            dels.filter(F.col("variant").isin(variants))
            .select("term")
            .distinct()
        )
        return self.df_stats.join(F.broadcast(cands), "term")

    def search_fuzzy(
        self,
        query: str,
        k: int = DEFAULT_TOP_K,
        fuzziness: int = 1,
        max_expansions: int = 50,
        where=None,
    ) -> DataFrame:
        """Fuzzy match (OpenSearch ``fuzziness`` with the default
        ``transpositions: true``, scoring_boolean rewrite): each analyzed
        query term expands to the vocabulary terms within ``fuzziness``
        DAMERAU-OSA edits — a transposition ("spakr" → "spark") counts as
        ONE edit, matching Lucene's FuzzyQuery automaton, where plain
        Levenshtein would miss it.

        Serving shape: query deletion variants equi-join the published
        SymSpell ``deletions.parquet`` (candidate superset, one job, no
        vocabulary scan), exact OSA verifies the collected candidates
        driver-side, the surviving expansion is capped per query term to
        ``max_expansions`` by descending df (Lucene default 50), and the
        union BM25-sums through the block index."""
        from docs_indexer_spark.functions.analysis import analyze_text
        from docs_indexer_spark.functions.fuzzy import osa_distance

        terms = sorted(set(analyze_text(query, self.analyzer)))
        if not terms:
            return self.spark.createDataFrame([], "doc_id long, score double")
        rows = self._fuzzy_candidates_df(terms, fuzziness).collect()
        n = self.n_docs
        idf: dict[int, float] = {}
        for t in terms:
            verified = [
                r for r in rows
                if osa_distance(r["term"], t, cap=fuzziness) <= fuzziness
            ]
            verified.sort(key=lambda r: (-r["df"], r["term"]))
            for r in verified[:max_expansions]:
                idf[int(r["term_id"])] = math.log(
                    1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5)
                )
        ids = sorted(idf)
        return bm25.score_from_blocks(
            self._blocks_for(ids), idf, ids, k=k,
            allowed=self._filter_arg(where),
        )

    def search_phrase(
        self, query: str, k: int = DEFAULT_TOP_K, where=None
    ) -> DataFrame:
        """Exact-phrase search over a POSITIONAL index (built with
        positions=True; the reference mapping's term_vector
        with_positions_offsets makes OpenSearch match_phrase possible —
        this is the Spark-native mirror).

        The query keeps Lucene position increments: a stopword removed by
        the analyzer still advances the expected gap, so "merge the sort"
        matches documents where the surviving terms sit two apart.
        Results carry BM25-independent phrase stats (n_occurrences,
        first_pos), ranked by occurrence count then doc_id.
        """
        from docs_indexer_spark.functions.analysis import analyze_with_positions
        from docs_indexer_spark.operators.phrase import phrase_match_blocks

        if not self.meta["metrics"].get("positions"):
            raise ValueError(
                "index was not built with positions=True; "
                "phrase queries need the positional stream"
            )
        terms_pos = analyze_with_positions(query, self.analyzer)
        if not terms_pos:
            return self.spark.createDataFrame(
                [], "doc_id long, n_occurrences int, first_pos int"
            )
        terms = [t for t, _ in terms_pos]
        offsets = [p for _, p in terms_pos]
        # term_id = xxhash64(term), computed driver-side with the
        # bit-identical pure-Python XXH64 (functions/xxh.py — pinned
        # against Spark) so no per-query hashing job runs; dfs come from
        # the persisted df_stats relation (tiny filter-collect) so
        # phrase_match_blocks runs no metadata job, early-outs on
        # unindexed terms, and can decide rarest-lead pruning from real
        # document frequencies
        from docs_indexer_spark.functions.xxh import spark_xxhash64_str

        term_ids = [spark_xxhash64_str(t) for t in terms]
        term_dfs = {
            int(r["term_id"]): int(r["df"])
            for r in self.df_stats.filter(
                F.col("term_id").isin(term_ids)
            ).collect()
        }
        res = phrase_match_blocks(
            self._blocks_for(term_ids), term_ids, offsets=offsets,
            term_dfs=term_dfs,
            block_size=self.meta["metrics"].get("block_size"),
        )
        if where is not None:
            # filter-then-rank: phrase results are doc-sparse already,
            # so a distributed left-semi on doc_id (never a collected
            # bitset) is the right shape at any filter selectivity
            pred = F.expr(where) if isinstance(where, str) else where
            res = res.join(
                self.docs_store().filter(pred).select("doc_id"),
                "doc_id", "left_semi",
            )
        return res.orderBy(F.desc("n_occurrences"), F.asc("doc_id")).limit(k)

    def highlight_terms(self, query: str) -> list[str]:
        """Surface-form term set the highlighter should mark for ``query``
        — OpenSearch's plain-highlighter semantics with STEM EXPANSION:

        - only raw query tokens that SURVIVE the analyzer count (a
          stopword is never highlighted);
        - the published surface dictionary maps each query stem back to
          every corpus token form that analyzes to it, so highlighting is
          equivalent to what index-time offsets would mark (every indexed
          occurrence of a token whose stem matches a query stem) — the
          equivalence is pinned by tests/test_highlight_offsets.py.
        """
        from docs_indexer_spark.functions.analysis import analyze_text, tokenize

        terms = sorted(
            {t for t in tokenize(query) if analyze_text(t, self.analyzer)}
        )
        stems = sorted(set(analyze_text(query, self.analyzer)))
        try:  # generations published before the surfaces table lack it
            surf = self.catalog.read_at(
                self.spark, self.gen_path, "surfaces.parquet"
            )
        except FileNotFoundError:
            surf = None
        if surf is not None:
            tid_rows = self.df_stats.filter(F.col("term").isin(stems)).select(
                "term_id"
            )
            expanded = [
                r["raw"]
                for r in surf.join(F.broadcast(tid_rows), "term_id").collect()
            ]
            terms = sorted(set(terms) | set(expanded))
        return terms

    def more_like_this(
        self,
        doc_id: int,
        docs: DataFrame,
        k: int = DEFAULT_TOP_K,
        max_query_terms: int = 25,
        min_term_freq: int = 2,
        min_doc_freq: int = 5,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """OpenSearch more_like_this: re-analyze the seed document (the
        plain-highlighter strategy — ``docs`` is the corpus relation
        carrying text; only the ONE seed row is fetched), keep its top
        tf·idf terms, BM25 the block index with them, exclude the seed.

        Term-selection knobs mirror the OpenSearch MLT defaults so
        low-signal terms never enter the query set on real corpora:
        ``max_query_terms`` (25) caps the selected terms,
        ``min_term_freq`` (2) drops terms the SEED mentions fewer times,
        ``min_doc_freq`` (5) drops corpus-rare noise terms."""
        from collections import Counter

        from docs_indexer_spark.functions.analysis import analyze_text

        row = (
            docs.filter(F.col(id_col) == doc_id).select(text_col).first()
        )
        if row is None or not row[0]:
            return self.spark.createDataFrame([], "doc_id long, score double")
        tf = Counter(analyze_text(row[0], self.analyzer))
        tf = Counter(
            {t: c for t, c in tf.items() if c >= min_term_freq}
        )
        if not tf:
            return self.spark.createDataFrame([], "doc_id long, score double")
        n = self.n_docs
        stats = self.df_stats.filter(
            F.col("term").isin(sorted(tf))
            & (F.col("df") >= min_doc_freq)
        ).collect()
        weighted = sorted(
            (
                (
                    -tf[r["term"]]
                    * math.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5)),
                    r["term"],
                    int(r["term_id"]),
                    r["df"],
                )
                for r in stats
            ),
        )[:max_query_terms]
        idf = {
            tid: math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for _, _, tid, df in weighted
        }
        ids = sorted(idf)
        top = bm25.score_from_blocks(
            self._blocks_for(ids), idf, ids, k=k + 1
        )
        return (
            top.filter(F.col("doc_id") != doc_id)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def search_with_docs(
        self, query: str, k: int = DEFAULT_TOP_K, where=None
    ) -> DataFrame:
        top = self.search(query, k=k, where=where)
        docs = self.docs_store()
        return top.join(docs, "doc_id", "left").orderBy(
            F.desc("score"), F.asc("doc_id")
        )

    def search_hybrid(
        self,
        query: str,
        query_vec,
        ivf,
        k: int = DEFAULT_TOP_K,
        k_arm: int = 20,
        c: int = 60,
        nprobe: int = 4,
        where=None,
    ) -> DataFrame:
        """Hybrid text+vector search (the OpenSearch hybrid query with
        the RRF processor): a BM25 arm through this inverted index and
        an ANN arm through a persisted :class:`IvfIndex`, each
        contributing its top ``k_arm``, fused by reciprocal rank —
        Σ 1/(c+rank), c=60 (Cormack et al. 2009).  ``where`` filters
        BOTH arms before their top-k cuts (text: bitset/semi-join as in
        :meth:`search`; vector: left-semi on the probed inverted lists),
        so the fused k are all filter-qualifying.  Fusion itself is
        rank-only math on two k_arm-row relations — nothing corpus-
        sized happens after the arms."""
        from docs_indexer_spark.operators.similarity import rrf_fuse

        allowed = None
        text_where = where
        if where is not None:
            # resolve the predicate ONCE; both arms share the
            # materialized doc_id set (localCheckpoint = no cache leak)
            pred = F.expr(where) if isinstance(where, str) else where
            flt = (
                self.docs_store().filter(pred).select("doc_id")
                .localCheckpoint()
            )
            text_where = flt
            allowed = flt.select(F.col("doc_id").alias("vec_id"))
        text = self.search(query, k=k_arm, where=text_where).select(
            "doc_id", "score"
        )
        vec_top = ivf.topk(query_vec, k=k_arm, nprobe=nprobe, allowed=allowed)
        score_col = vec_top.columns[1]  # "cosine" (IvfIndex) / "adc" (IvfPq)
        vec = vec_top.select(
            F.col("vec_id").alias("doc_id"), F.col(score_col).alias("score")
        )
        return rrf_fuse([text, vec], k=k, c=c)

    def search_with_snippets(
        self,
        query: str,
        docs: DataFrame,
        k: int = DEFAULT_TOP_K,
        text_col: str = "text",
        id_col: str = "doc_id",
        width: int = 60,
        where=None,
    ) -> DataFrame:
        """Top-k + highlighted first fragments — OpenSearch's *plain*
        highlighter semantics (re-analyze the stored text at query time;
        no offsets need to live in the index), upgraded with STEM
        EXPANSION: the published surface-form dictionary maps each query
        stem back to every raw token form that analyzes to it, so a query
        "running" highlights "run"/"runs"/"running" — what index-time
        offsets would give, without per-token offset storage.  ``docs``
        is the corpus relation carrying the text; the join touches only
        the k hits."""
        from docs_indexer_spark.functions.highlight import (
            highlight_col,
            snippet_col,
        )

        terms = self.highlight_terms(query)
        top = self.search(query, k=k, where=where)
        joined = top.join(
            docs.select(F.col(id_col).alias("doc_id"), text_col),
            "doc_id",
            "left",
        )
        return joined.select(
            "doc_id",
            "score",
            snippet_col(text_col, terms, width=width).alias("snippet"),
            highlight_col(
                snippet_col(text_col, terms, width=width), terms
            ).alias("snippet_html"),
        ).orderBy(F.desc("score"), F.asc("doc_id"))

    def search_with_fragments(
        self,
        query: str,
        docs: DataFrame,
        k: int = DEFAULT_TOP_K,
        text_col: str = "text",
        id_col: str = "doc_id",
        fragment_size: int = 100,
        num_fragments: int = 5,
        where=None,
    ) -> DataFrame:
        """Top-k + MULTI-fragment highlighting — the full OpenSearch
        plain-highlighter contract (``number_of_fragments``, default 5,
        ``order: score``): each hit carries up to ``num_fragments``
        highlighted fragments ranked by match density, not just the
        first match window.  Stem expansion as in
        :meth:`search_with_snippets`; composable with a ``where``
        filter."""
        from docs_indexer_spark.functions.highlight import fragments_col

        terms = self.highlight_terms(query)
        top = self.search(query, k=k, where=where)
        joined = top.join(
            docs.select(F.col(id_col).alias("doc_id"), text_col),
            "doc_id",
            "left",
        )
        frs = fragments_col(
            text_col, terms,
            fragment_size=fragment_size, num_fragments=num_fragments,
        )
        pat = None
        if terms:
            from docs_indexer_spark.functions.highlight import _pattern

            pat = _pattern(terms)
        return joined.select(
            "doc_id",
            "score",
            F.transform(
                frs,
                lambda s: F.regexp_replace(
                    s["fragment"], F.lit(pat), "<em>$1</em>"
                ) if pat else s["fragment"],
            ).alias("fragments"),
        ).orderBy(F.desc("score"), F.asc("doc_id"))
