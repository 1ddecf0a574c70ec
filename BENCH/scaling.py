#!/usr/bin/env python
"""Two-parallelism scaling-efficiency evidence (north rule: ≥0.8 from N to
4N executors; sandbox proxy per BASELINE.md: the same build at local[8] vs
local[32] on the same input).

Runs the full index build (tokenize → postings → stats → compressed
blocks) in two *separate* Spark sessions (fresh JVM each, via subprocess so
JVM/GC state can't leak between runs), reports docs/sec at both levels and

    efficiency = (T_N / T_4N) / (M/N)    where M = 4N cores

Writes BENCH/scaling_result.json and a markdown row for BENCH/BASELINE.md.

Usage:  python BENCH/scaling.py [--input DIR_OR_PARQUET] [--n 8] [--m 32]
        [--docs 120000]  (synthesizes a corpus if --input is omitted)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from docs_indexer_spark.session import get_spark
from docs_indexer_spark.operators.fused import fused_build_blocks

spark = get_spark(master="local[{cores}]", shuffle_partitions={shuffle})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet({input!r})
docs.count()  # warm the scan; we time compute, not first-touch page cache
t0 = time.time()
# stage 1: vocabulary dictionary + corpus stats (vocab-sized aggregations;
# fused_build_blocks runs these jobs eagerly in its setup collects)
fb = fused_build_blocks(docs, analyzer="english")
t1 = time.time()
# stage 2: the single data-sized shuffle -> sort -> fused dedupe+encode
fb.blocks.write.mode("overwrite").format("noop").save()
t2 = time.time()
print(json.dumps({{"cores": {cores}, "sec": t2 - t0, "n_docs": fb.n_docs,
                   "docs_per_sec": fb.n_docs / (t2 - t0),
                   "stages": {{"dict_stats_sec": t1 - t0,
                               "encode_sec": t2 - t1}}}}))
spark.stop()
"""


def run_at(cores: int, input_path: str, runs: int = 1) -> dict:
    """Best (min wall-clock) of ``runs`` fresh-JVM builds.  This host is a
    shared VM with ±20-30% run-to-run noise on identical builds (measured,
    BENCH/BASELINE.md); min-of-R reports the least-contended run — the
    closest observable to true machine capability — identically at both
    parallelism levels."""
    results = []
    for i in range(runs):
        code = RUN_SNIPPET.format(
            repo=REPO, cores=cores, shuffle=max(2 * cores, 16), input=input_path
        )
        attempts = 0
        while True:
            attempts += 1
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
            )
            if out.returncode == 0:
                break
            sys.stderr.write(
                f"# run {i} at local[{cores}] failed "
                f"(attempt {attempts}):\n{out.stderr[-3000:]}\n"
            )
            if attempts >= 2:
                raise RuntimeError(
                    f"scaling run failed twice at local[{cores}]"
                )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
    best = min(results, key=lambda r: r["sec"])
    best["all_runs_sec"] = [round(r["sec"], 2) for r in results]
    return best


def synthesize(n_docs: int) -> str:
    path = os.path.join(tempfile.gettempdir(), f"graft_bench_corpus_{n_docs}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "from docs_indexer_spark.session import get_spark\n"
        "from docs_indexer_spark.sources.corpus import generate_corpus\n"
        "spark = get_spark(master='local[32]')\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"df = generate_corpus(spark, {n_docs})\n"
        "from pyspark.sql import functions as F\n"
        "df = df.withColumn('doc_id', F.xxhash64('url'))\n"
        f"df.write.mode('overwrite').parquet({path!r})\n"
        "spark.stop()\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True)
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--m", type=int, default=32)
    # sized so the local[8] build runs minutes, not seconds — at ~100k docs
    # fixed per-stage overhead (scheduling, worker forks, AQE stage
    # barriers) dominates and the 32-core run can't amortize it
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--runs", type=int, default=3,
                    help="fresh-JVM runs per level; min is reported")
    args = ap.parse_args()

    input_path = args.input or synthesize(args.docs)
    print(f"# input: {input_path}", file=sys.stderr)

    low = run_at(args.n, input_path, runs=args.runs)
    high = run_at(args.m, input_path, runs=args.runs)
    speedup = low["sec"] / high["sec"]
    ratio = args.m / args.n
    efficiency = speedup / ratio
    per_stage = {
        k: round((low["stages"][k] / high["stages"][k]) / ratio, 3)
        for k in low.get("stages", {})
    }
    result = {
        "input": input_path,
        "n_docs": low["n_docs"],
        "low": low,
        "high": high,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "per_stage_efficiency": per_stage,
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH", "scaling_result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
