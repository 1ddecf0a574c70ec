#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline queries run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS].  ``value`` is the total wall-clock of the
query set; ``queries`` carries per-query seconds plus two index-build
throughput entries used for the N-vs-4N scaling-efficiency evidence
(BENCH/BASELINE.md):

    index_build_docs_per_sec   at local[$SPARK_GRAFT_CPUS]
    (run BENCH/scaling.py for the two-parallelism comparison)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from docs_indexer_spark.operators import spimi  # noqa: E402
from docs_indexer_spark.operators.postings import (  # noqa: E402
    corpus_stats,
    df_stats,
    token_relations,
)
from docs_indexer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "bm25_topk",
    "bm25_wand_topk",
    "bm25_filtered_topk",
    "bm25_english_topk",
    "fuzzy_search_topk",
    "more_like_this",
    "term_df_topn",
    "bigram_counts",
    "keyword_filter_facet",
    "date_range_agg",
    "upsert_latest",
    "join_default",
    "exact_dedup",
    "decontaminate_overlap",
    "url_canonical_hosts",
    "bm25_search_after",
    "dsir_weights_topn",
    "hybrid_rrf_topk",
    "pii_redaction_stats",
    "bm25_most_fields_topk",
    "c4_page_filter",
    "token_count_topn",
    "lang_id_confusion",
    "lm_perplexity",
    "repetition_stats",
    "pack_sequences",
    "ann_cosine_topk",
    "minhash_lsh_pairs",
    "simhash_near_dups",
    "winnow_fingerprints",
    "substring_dup_spans",
    "dedup_components",
    "phrase_match",
    "phrase_match_blocks",
    "suggest_correction",
    "ann_lsh_neighbors",
    "ann_ivf_topk",
    "ann_ivf_trained",
    "ann_pq_adc_topk",
    "pagerank_topn",
    "significant_terms",
    "term_vectors",
    "percentiles_agg",
    "collapse_top_hits",
    "embedding_near_dups",
    "highlight_snippets",
    "highlight_fragments",
]


def time_index_build(spark, sf_dir: str) -> tuple[float, int]:
    """Full english-chain index build over the documents table via the
    FUSED single-shuffle path (operators/fused.py — the production build);
    returns (sec, n_docs)."""
    from docs_indexer_spark.operators.fused import fused_build_blocks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.time()
    fb = fused_build_blocks(docs, analyzer="english")
    fb.blocks.write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    fb.unpersist()
    return dt, fb.n_docs


def time_query_latency(spark, sf_dir: str, n_queries: int = 24):
    """Serving-path latencies over a published POSITIONAL block index
    (warm session): BM25 top-k p50/p95 and exact-phrase p50/p95, query
    terms drawn from the df table (mix of head and mid-frequency)."""
    import tempfile

    from pyspark.sql import functions as F

    from docs_indexer_spark.plans.build_index import build_index
    from docs_indexer_spark.plans.query import IndexReader
    from docs_indexer_spark.sources.catalog import SnapshotCatalog

    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="bench_wh_"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    build_index(spark, docs, catalog, "bench-fp", id_col="doc_id",
                n_build_partitions=1, positions=True)
    reader = IndexReader(spark, catalog)
    terms = [
        r["term"]
        for r in reader.df_stats.orderBy(F.desc("df")).limit(60).collect()
    ]
    queries = [
        " ".join(terms[i::12][:3]) for i in range(min(n_queries, 12))
    ] + [t for t in terms[:max(0, n_queries - 12)]]

    def pcts(fn, qs):
        fn(qs[0])  # warm
        lat = []
        for q in qs:
            t0 = time.time()
            fn(q)
            lat.append(time.time() - t0)
        lat.sort()
        return (
            round(lat[len(lat) // 2], 4),
            round(lat[min(len(lat) - 1, int(len(lat) * 0.95))], 4),
        )

    p50, p95 = pcts(lambda q: reader.search(q, k=10).collect(),
                    queries[:n_queries])
    phrases = [" ".join(terms[i: i + 2]) for i in range(0, 24, 2)]
    pp50, pp95 = pcts(lambda q: reader.search_phrase(q, k=10).collect(),
                      phrases)
    # fuzzy serving (SymSpell deletion-index probe + OSA verify):
    # transposed misspellings of head terms — each must hit at
    # fuzziness=1 under Damerau-OSA
    miss = [
        t[:1] + t[2] + t[1] + t[3:]
        for t in terms if len(t) >= 4
    ][:8]
    fp50, fp95 = pcts(lambda q: reader.search_fuzzy(q, k=10).collect(),
                      miss)
    return p50, p95, pp50, pp95, fp50, fp95


def time_suggest_latency(spark, sf_dir: str) -> tuple[float, float, float]:
    """Precomputed-Suggester serving path (SymSpell deletion-index
    candidates): returns (precompute_sec, p50, p95) over misspelled
    2-token queries."""
    from docs_indexer_spark.operators.suggest import Suggester

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.time()
    sg = Suggester(docs)
    precompute = time.time() - t0
    queries = ["tabel scann", "windoq jion", "sorr merge", "grupo bye",
               "filtr queri", "streem batch", "vectr hash", "colum roww"]
    sg.suggest(queries[0]).collect()  # warm
    lat = []
    for q in queries:
        t0 = time.time()
        sg.suggest(q, k=5).collect()
        lat.append(time.time() - t0)
    sg.close()
    lat.sort()
    return (
        round(precompute, 3),
        round(lat[len(lat) // 2], 4),
        round(lat[-1], 4),
    )


def main() -> None:
    spark = get_spark(
        app_name="docs-indexer-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM / parquet reader so query timings measure queries,
    # not session startup (~8 s on the first job otherwise)
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()

    queries = entry_mod.queries()
    per_query: dict[str, float] = {}
    total = 0.0
    cold_total = 0.0
    for name in BENCH_QUERIES:
        fn = queries[name]
        # two runs, report steady-state (min): the first run pays one-time
        # whole-stage-codegen JIT (~5-8 s for the widest aggregates), which
        # a serving deployment amortizes across every subsequent query.
        # cold_total still records the sum of first runs.
        times = []
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            n = df.count()
            times.append(time.time() - t0)
        dt = min(times)
        per_query[name] = round(dt, 3)
        total += dt
        cold_total += times[0]
        print(f"# {name}: {dt:.2f}s warm / {times[0]:.2f}s cold ({n} rows)",
              file=sys.stderr)
    per_query["cold_first_run_total_sec"] = round(cold_total, 3)

    # production dedup paths: xx hash family over the FULL corpus — the
    # at-scale configuration (the md5 queries above are the SQL-parity
    # plane, kept small and oracle-checked)
    from docs_indexer_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        simhash64,
        simhash_near_dup_pairs,
    )

    docs_full = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t0 = time.time()
    sigs = minhash_signatures(docs_full, num_hashes=16, hash="xx")
    n_cand = lsh_candidate_pairs(sigs, bands=4, num_hashes=16).count()
    per_query["minhash_lsh_xx_full_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    n_sim = simhash_near_dup_pairs(simhash64(docs_full, hash="xx"), max_hamming=3).count()
    per_query["simhash_xx_full_sec"] = round(time.time() - t0, 3)
    from docs_indexer_spark.operators.dedup import winnow_fingerprints

    t0 = time.time()
    n_fp = winnow_fingerprints(docs_full, hash="xx").count()
    per_query["winnow_xx_full_sec"] = round(time.time() - t0, 3)
    print(f"# production dedup: {n_cand} lsh candidates, {n_sim} simhash pairs",
          file=sys.stderr)

    build_sec, n_docs = time_index_build(spark, SF_DIR)
    per_query["index_build_sec"] = round(build_sec, 3)
    per_query["index_build_docs_per_sec"] = round(n_docs / build_sec, 1)

    p50, p95, pp50, pp95, fp50, fp95 = time_query_latency(spark, SF_DIR)
    per_query["bm25_query_p50_sec"] = p50
    per_query["bm25_query_p95_sec"] = p95
    per_query["phrase_query_p50_sec"] = pp50
    per_query["phrase_query_p95_sec"] = pp95
    per_query["fuzzy_query_p50_sec"] = fp50
    per_query["fuzzy_query_p95_sec"] = fp95

    sp, sp50, sp95 = time_suggest_latency(spark, SF_DIR)
    per_query["suggest_precompute_sec"] = sp
    per_query["suggest_query_p50_sec"] = sp50
    per_query["suggest_query_p95_sec"] = sp95

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline query set wall-clock + index-build throughput",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
