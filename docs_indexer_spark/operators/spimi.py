"""SPIMI-style compressed posting-block construction with a salted,
doc-range-bucketed merge (SURVEY.md §2 C1 + C2).

Input: the uncompressed postings relation (term, doc_id, tf) plus document
lengths and global stats.  Output: the block index

    (term, bucket, block_seq, n_docs, first_doc_id, last_doc_id,
     max_tf, max_score, doc_ids_bin, tfs_bin, tf_norms_bin)

Skew story (the part the reference never had — it ran 1 OpenSearch shard,
/root/reference/common.py:6): a Zipf-head term like "the" may appear in a
large fraction of all documents.  A naive ``groupBy(term)`` would ship that
whole posting list to ONE task.  Instead the shuffle key is
``(term, bucket)`` where ``bucket = floor(doc_id / span)`` is a RANGE of
doc_id — the salt.  Consequences:

- the head term's postings split across up to ``n_buckets`` tasks — the
  merge-stage skew bound improves by that factor;
- within a bucket, blocks are doc_id-sorted; buckets are disjoint ordered
  doc_id ranges, so the per-term global order is simply
  ``(bucket, block_seq)`` — merging partial results is an ordered CONCAT of
  already-encoded blocks: no decode, no re-sort, no second shuffle;
- block-max WAND also exploits the bucketing: buckets partition the doc
  space, so per-bucket WAND + global top-k merge is exact.

Execution shape: ``repartition(term, bucket)`` →
``sortWithinPartitions(term, bucket, doc_id)`` → ``mapInPandas`` with a
carry-over between Arrow batches.  NOT ``groupBy().applyInPandas()`` — that
materializes one pandas DataFrame per (term, bucket) group, and with a 30k
vocabulary × 32 buckets the ~1 ms/group protocol overhead dominates
(measured 113 s for a 2000-doc corpus).  The mapInPandas kernel sees whole
10k-row Arrow batches and slices groups with numpy change-point detection —
same output, ~none of the per-group overhead.

All arithmetic (idf, tf-norm) is native Column math; Python appears only in
the block encoder (numpy varint inside the Arrow batch).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docs_indexer_spark.config import BLOCK_SIZE, BM25Params
from docs_indexer_spark.operators.compression import varint_encode_with_lengths
from docs_indexer_spark.operators.postings import idf_col

BLOCKS_SCHEMA = (
    "term_id long, bucket int, block_seq int, n_docs int, "
    "first_doc_id long, last_doc_id long, max_tf int, max_score double, "
    "doc_ids_bin binary, tfs_bin binary, tf_norms_bin binary"
)

_COLS = ["term_id", "bucket", "doc_id", "tf", "idf", "tf_norm"]


def _encode_runs(pdf: pd.DataFrame, norm_dtype) -> pd.DataFrame:
    """Encode every (term, bucket) run of a sorted frame into block rows.

    Fully vectorized: block boundaries via numpy change points, per-block
    max via ``np.maximum.reduceat`` (blocks tile the frame contiguously),
    and ONE varint pass over the whole batch whose stream is then sliced
    per block by byte offsets — per-block Python is reduced to bytes
    slicing.  (A per-run loop calling the encoder cost ~100 µs/run; with
    Zipf tails most runs are a handful of postings, and that overhead
    dominated the whole build stage.)
    """
    n = len(pdf)
    terms = pdf["term_id"].values.astype(np.int64)
    buckets = pdf["bucket"].values.astype(np.int64)
    ids = pdf["doc_id"].values.astype(np.int64)
    tfs = pdf["tf"].values.astype(np.uint64)
    norms = pdf["tf_norm"].values.astype(norm_dtype)
    scores = pdf["idf"].values.astype(np.float64) * norms.astype(np.float64)

    # run change points of the (term, bucket) key
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (terms[1:] != terms[:-1]) | (buckets[1:] != buckets[:-1])
    run_starts = np.flatnonzero(change)
    run_ends = np.empty_like(run_starts)
    run_ends[:-1] = run_starts[1:]
    run_ends[-1] = n

    # block boundaries: tile each run in BLOCK_SIZE steps
    bs_parts = [np.arange(s, e, BLOCK_SIZE) for s, e in zip(run_starts, run_ends)]
    bs = np.concatenate(bs_parts)
    seqs = np.concatenate([np.arange(len(p)) for p in bs_parts])
    nb_per_run = np.array([len(p) for p in bs_parts])
    be = np.minimum(bs + BLOCK_SIZE, np.repeat(run_ends, nb_per_run))

    # delta gaps with an absolute value at every block start (each block
    # is an independently decodable delta chain)
    gaps = np.empty(n, dtype=np.uint64)
    gaps[1:] = np.diff(ids).astype(np.uint64)
    # absolute (wrapped-modular) value at every block start — bs[0] == 0,
    # so index 0 is covered here
    gaps[bs] = ids[bs].astype(np.uint64)

    id_stream, id_lens = varint_encode_with_lengths(gaps)
    tf_stream, tf_lens = varint_encode_with_lengths(tfs)
    id_off = np.concatenate(([0], np.cumsum(id_lens)))
    tf_off = np.concatenate(([0], np.cumsum(tf_lens)))
    norm_bytes = np.ascontiguousarray(norms).tobytes()
    isz = norms.dtype.itemsize

    return pd.DataFrame(
        {
            "term_id": terms[bs],
            "bucket": buckets[bs].astype(np.int32),
            "block_seq": seqs.astype(np.int32),
            "n_docs": (be - bs).astype(np.int32),
            "first_doc_id": ids[bs],
            "last_doc_id": ids[be - 1],
            "max_tf": np.maximum.reduceat(tfs, bs).astype(np.int32),
            "max_score": np.maximum.reduceat(scores, bs),
            "doc_ids_bin": [
                id_stream[id_off[s] : id_off[e]] for s, e in zip(bs, be)
            ],
            "tfs_bin": [tf_stream[tf_off[s] : tf_off[e]] for s, e in zip(bs, be)],
            "tf_norms_bin": [
                norm_bytes[s * isz : e * isz] for s, e in zip(bs, be)
            ],
        }
    )


def _make_kernel(norm_dtype):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            # hold back the trailing (term_id, bucket) run — it may
            # continue in the next Arrow batch of this partition
            last_term = pdf["term_id"].iloc[-1]
            last_bucket = pdf["bucket"].iloc[-1]
            tail_mask = (pdf["term_id"].values == last_term) & (
                pdf["bucket"].values == last_bucket
            )
            # tail_mask is a suffix because input is sorted by (term,bucket)
            split = len(pdf) - int(tail_mask.sum())
            head, carry = pdf.iloc[:split], pdf.iloc[split:]
            if len(head):
                yield _encode_runs(head, norm_dtype)
        if carry is not None and len(carry):
            yield _encode_runs(carry, norm_dtype)

    return kernel


def build_blocks(
    postings: DataFrame,
    doclens: DataFrame,
    dfs: DataFrame,
    n_docs: int,
    avgdl: float,
    max_doc_id: int,
    params: BM25Params = BM25Params(),
    n_buckets: int | None = None,
    norm_dtype=np.float32,
    shuffle_partitions: int | None = None,
    target_run_postings: int = 1_000_000,
) -> DataFrame:
    """(term, doc_id, tf) ⨝ dl ⨝ df → compressed block index.

    ``n_buckets`` defaults to ADAPTIVE: ceil(max(df) / target_run_postings)
    clamped to [1, 1024].  The bucket count trades head-term task size
    (run ≈ max_df / n_buckets postings — keep ≲ 1M ≈ 8 MB so no single
    merge task is outsized) against tail fragmentation (a term with
    df < n_buckets splits into single-posting runs whose per-block
    metadata inflates the index).  Deriving it from the actual max
    document frequency keeps small corpora at 1 bucket (zero
    fragmentation) and 10^12-doc corpora at the cap (head term 10^11 df →
    ~100M-posting runs across 1024 tasks)."""
    if "term_id" not in postings.columns:
        # string-keyed callers (SQL-parity plane): hash on entry so the
        # shuffle/sort/encode below stay numeric
        postings = postings.withColumn("term_id", F.xxhash64("term")).drop("term")
    if "term_id" not in dfs.columns:
        dfs = dfs.withColumn("term_id", F.xxhash64("term")).drop("term")
    if n_buckets is None:
        max_df = int(dfs.agg(F.max("df")).collect()[0][0] or 1)
        n_buckets = min(1024, max(1, -(-max_df // target_run_postings)))
    span = max(1, (max_doc_id + n_buckets) // n_buckets)
    enriched = (
        postings.join(doclens, "doc_id")
        .join(dfs.select("term_id", "df"), "term_id")
        .withColumn("idf", idf_col(F.col("df"), n_docs))
        .withColumn(
            "tf_norm",
            F.col("tf")
            / (
                F.col("tf")
                + params.k1
                * (1.0 - params.b + params.b * F.col("dl") / F.lit(avgdl))
            ),
        )
        .withColumn("bucket", (F.col("doc_id") / F.lit(span)).cast("int"))
        .select(*_COLS)
    )
    if not shuffle_partitions:
        # explicit N: a bare repartition(cols) is AQE-coalesced toward
        # 64 MB partitions, which throttles the (Python-side) encode stage
        # to a handful of tasks regardless of cores — measured flat 8→32
        # core scaling until pinned.  2× parallelism keeps every core busy
        # through stragglers.
        sc = postings.sparkSession.sparkContext
        shuffle_partitions = max(sc.defaultParallelism * 2, 16)
    part = enriched.repartition(shuffle_partitions, "term_id", "bucket")
    sorted_part = part.sortWithinPartitions("term_id", "bucket", "doc_id")
    return sorted_part.mapInPandas(_make_kernel(norm_dtype), schema=BLOCKS_SCHEMA)


def write_blocks(blocks: DataFrame, path: str, term_partitions: int = 32) -> None:
    """Persist the block index term-clustered so query-time
    `term_id IN (...)` filters prune parquet row groups (min/max stats)."""
    (
        blocks.repartition(term_partitions, "term_id")
        .sortWithinPartitions("term_id", "bucket", "block_seq")
        .write.mode("overwrite")
        .parquet(path)
    )
