#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is FROZEN — this file carries
the extra measurement modes the optimization guide §1 asks for):

- per-query timing with the same methodology as bench.py (two runs,
  min, df.count()), restricted to --only q1,q2 for fast iteration;
- optional --noop to time with the noop sink (computes EVERY column,
  guide §1.4) next to the count() number;
- --plans DIR writes .explain("formatted") for each selected query to
  DIR/<query>_<tag>.txt (tag from --tag, default "before").

Usage:
    python bench_extra.py --only pagerank_topn,dsir_weights_topn
    python bench_extra.py --plans plans/r06 --tag before --only ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from docs_indexer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def formatted_plan(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="", help="comma-separated query names")
    ap.add_argument("--plans", default="", help="directory for plan dumps")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--noop", action="store_true",
                    help="also time a noop-sink write (all columns)")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(
        app_name="docs-indexer-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()

    queries = entry_mod.queries()
    names = [n for n in args.only.split(",") if n] or list(queries)
    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        times, noop_times, n = [], [], 0
        for _ in range(args.runs):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            n = df.count()
            times.append(time.time() - t0)
            if args.noop:
                t0 = time.time()
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                noop_times.append(time.time() - t0)
        rec = {"count_min": round(min(times), 3), "rows": n,
               "count_all": [round(t, 3) for t in times]}
        if noop_times:
            rec["noop_min"] = round(min(noop_times), 3)
        out[name] = rec
        print(f"# {name}: {rec}", file=sys.stderr)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, SF_DIR)
            with open(
                os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(formatted_plan(df))
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
