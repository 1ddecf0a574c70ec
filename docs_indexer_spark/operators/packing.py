"""Sequence packing — map a tokenized corpus onto fixed-budget training
sequences (the concat-then-chunk packing GPT-style pretraining uses:
documents are concatenated in a deterministic order and the stream is
cut every ``budget`` tokens).

For every document this computes WHERE it lands in that virtual stream:

    (doc_id, n_tokens, start, seq_id, offset)

``seq_id = start // budget`` and ``offset = start % budget`` — a doc
whose tokens cross a boundary simply spans into ``seq_id + 1`` (the
caller owns truncation/attention-mask policy; this operator owns the
placement, which is the part that needs the corpus-wide coordination).

Scale shape — a distributed two-phase prefix sum, NOT a global window
(a window function without PARTITION BY collapses to one task and is
exactly the antipattern this repo's plan audit exists to catch):

1. range-repartition by doc_id + sortWithinPartitions (each partition
   holds a contiguous doc_id range, internally ordered);
2. per-partition token totals — one tiny aggregate, |partitions| rows
   collected;
3. mapInPandas adds each partition's broadcast prefix offset to a local
   running cumsum (scalar carry across Arrow batches).

The output is a pure function of (doc_id order, token counts) — the
sampled range-partition boundaries affect parallelism, never values —
so the DuckDB twin is a plain ordered window cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_parts: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, start, seq_id, offset) — deterministic
    doc_id-ordered concat-then-chunk packing at ``budget`` tokens."""
    from docs_indexer_spark.functions.analysis import tokens_col

    if budget <= 0:
        raise ValueError("budget must be positive")
    counts = docs.select(
        F.col(id_col), F.size(tokens_col(text_col)).alias("n_tokens")
    )
    n_parts = n_parts or counts.sparkSession.sparkContext.defaultParallelism
    # persisted so phases 2 and 3 read the SAME materialized partitioning
    # (range boundaries are sampled; re-executing the exchange between
    # the totals job and the assignment job could shift a row's pid)
    parted = (
        counts.repartitionByRange(n_parts, id_col)
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # phase 2: per-partition totals (|partitions| rows — tiny collect)
    totals = {
        int(r["_pid"]): int(r["t"])
        for r in parted.groupBy("_pid")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    prefix = {}
    acc = 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid]

    # phase 3: local cumsum + broadcast prefix (scalar carry per batch)
    def assign(batches):
        import numpy as np

        run = None  # [pid, running] — partitions see one pid only
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            if run is None or run[0] != pid:
                run = [pid, prefix[pid]]
            n = pdf["n_tokens"].values.astype("int64")
            ends = np.cumsum(n)
            starts = run[1] + ends - n
            run[1] += int(ends[-1])
            out = pdf[[id_col, "n_tokens"]].copy()
            out["start"] = starts
            out["seq_id"] = (starts // budget).astype("int64")
            out["offset"] = (starts % budget).astype("int64")
            yield out

    out = parted.mapInPandas(
        assign,
        schema=f"{id_col} long, n_tokens int, start long, "
        "seq_id long, offset long",
    )
    # localCheckpoint materializes the assignment NOW (truncating the
    # lineage back to parted), so the cached corpus-sized relation can be
    # released before returning — without this every call leaked a
    # persisted copy of the token counts for the session lifetime, and
    # the caller could never safely unpersist it because the returned
    # plan still depended on it.
    out = out.localCheckpoint(eager=True)
    parted.unpersist()
    return out
