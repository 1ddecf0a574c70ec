#!/usr/bin/env python
"""Round-5 scale probe for the new LLM/webtext/graph operators at 1M
docs (the same corpus the scaling harness builds from): wall-clock for

  - ngram_contamination (8-grams, ~1/997 bench split → broadcast join
    over ~200M corpus grams)
  - dsir_log_weights (hashed-bigram distributions + broadcast-ratio
    scoring — two corpus passes)
  - pagerank (1M nodes, 3M edges, 10 rounds)

Records BENCH/ops_1m_r5.json.  Only on an idle box.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = "/tmp/graft_bench_corpus_1000000"


def main() -> None:
    from pyspark.sql import functions as F

    from docs_indexer_spark.functions.text_quality import dsir_log_weights
    from docs_indexer_spark.operators.dedup import ngram_contamination
    from docs_indexer_spark.operators.graph import pagerank
    from docs_indexer_spark.session import get_spark

    cores = int(os.environ.get("CORES", "32"))
    spark = get_spark(master=f"local[{cores}]",
                      shuffle_partitions=max(2 * cores, 64))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(CORPUS).select("doc_id", "text")
    n = docs.count()  # warm scan
    result = {"n_docs": n, "cores": cores}

    bench = docs.filter(F.col("doc_id") % 997 == 0)
    corpus = docs.filter(F.col("doc_id") % 997 != 0)
    t0 = time.time()
    hits = ngram_contamination(corpus, bench, n=8).count()
    result["decontaminate_sec"] = round(time.time() - t0, 2)
    result["decontaminate_hits"] = hits
    print(f"# decontaminate: {result['decontaminate_sec']}s, "
          f"{hits} contaminated docs", file=sys.stderr)

    t0 = time.time()
    w = dsir_log_weights(corpus, bench, n_buckets=1024)
    nw = w.count()
    result["dsir_sec"] = round(time.time() - t0, 2)
    result["dsir_docs_scored"] = nw
    print(f"# dsir: {result['dsir_sec']}s, {nw} docs scored",
          file=sys.stderr)

    # doc_ids are 64-bit hashes, so index-map them to 0..n-1 first and
    # translate the (idx*7+j) % n link formula back through the map —
    # every dst is then a REAL node and rank mass circulates
    from pyspark.sql import Window

    idmap = docs.select("doc_id").withColumn(
        "idx",
        F.row_number().over(Window.orderBy("doc_id")) - 1,
    )
    eidx = (
        idmap.select(
            F.col("idx").alias("sidx"),
            F.col("doc_id").alias("src"),
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
        )
        .select(
            "src", F.pmod(F.col("sidx") * 7 + F.col("j"), F.lit(n)).alias("didx")
        )
    )
    edges = eidx.join(
        idmap.select(F.col("idx").alias("didx"), F.col("doc_id").alias("dst")),
        "didx",
    ).select("src", "dst")
    t0 = time.time()
    top = (
        pagerank(edges, n_iter=10,
                 nodes=docs.select(F.col("doc_id").alias("node")))
        .orderBy(F.desc("rank")).limit(5).collect()
    )
    result["pagerank_sec"] = round(time.time() - t0, 2)
    result["pagerank_top_rank"] = round(float(top[0]["rank"]), 9)
    print(f"# pagerank: {result['pagerank_sec']}s", file=sys.stderr)

    with open(os.path.join(REPO, "BENCH", "ops_1m_r5.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
