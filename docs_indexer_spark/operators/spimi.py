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

from docs_indexer_spark.config import BLOCK_SIZE, BM25Params, DEFAULT_BUCKETS
from docs_indexer_spark.operators.compression import (
    delta_encode_doc_ids,
    encode_tf_norms,
    varint_encode,
)
from docs_indexer_spark.operators.postings import idf_col

BLOCKS_SCHEMA = (
    "term string, bucket int, block_seq int, n_docs int, "
    "first_doc_id long, last_doc_id long, max_tf int, max_score double, "
    "doc_ids_bin binary, tfs_bin binary, tf_norms_bin binary"
)

_COLS = ["term", "bucket", "doc_id", "tf", "idf", "tf_norm"]


def _encode_runs(pdf: pd.DataFrame, norm_dtype, out: list[dict]) -> None:
    """Encode every (term, bucket) run of a sorted frame into block rows."""
    terms = pdf["term"].values
    buckets = pdf["bucket"].values
    ids = pdf["doc_id"].values.astype(np.int64)
    tfs = pdf["tf"].values.astype(np.uint64)
    norms = pdf["tf_norm"].values.astype(norm_dtype)
    scores = pdf["idf"].values.astype(np.float64) * norms.astype(np.float64)
    # change points of the (term, bucket) run-length key
    change = np.empty(len(pdf), dtype=bool)
    change[0] = True
    change[1:] = (terms[1:] != terms[:-1]) | (buckets[1:] != buckets[:-1])
    starts = np.flatnonzero(change)
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:]
    ends[-1] = len(pdf)
    for s, e in zip(starts, ends):
        term = terms[s]
        bucket = int(buckets[s])
        for seq, bs in enumerate(range(s, e, BLOCK_SIZE)):
            be = min(bs + BLOCK_SIZE, e)
            out.append(
                {
                    "term": term,
                    "bucket": bucket,
                    "block_seq": seq,
                    "n_docs": be - bs,
                    "first_doc_id": int(ids[bs]),
                    "last_doc_id": int(ids[be - 1]),
                    "max_tf": int(tfs[bs:be].max()),
                    "max_score": float(scores[bs:be].max()),
                    "doc_ids_bin": delta_encode_doc_ids(ids[bs:be]),
                    "tfs_bin": varint_encode(tfs[bs:be]),
                    "tf_norms_bin": encode_tf_norms(norms[bs:be], norm_dtype),
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
            # hold back the trailing (term, bucket) run — it may continue
            # in the next Arrow batch of this partition
            last_term = pdf["term"].iloc[-1]
            last_bucket = pdf["bucket"].iloc[-1]
            tail_mask = (pdf["term"].values == last_term) & (
                pdf["bucket"].values == last_bucket
            )
            # tail_mask is a suffix because input is sorted by (term,bucket)
            split = len(pdf) - int(tail_mask.sum())
            head, carry = pdf.iloc[:split], pdf.iloc[split:]
            if len(head):
                rows: list[dict] = []
                _encode_runs(head, norm_dtype, rows)
                yield pd.DataFrame(rows)
        if carry is not None and len(carry):
            rows = []
            _encode_runs(carry, norm_dtype, rows)
            yield pd.DataFrame(rows)

    return kernel


def build_blocks(
    postings: DataFrame,
    doclens: DataFrame,
    dfs: DataFrame,
    n_docs: int,
    avgdl: float,
    max_doc_id: int,
    params: BM25Params = BM25Params(),
    n_buckets: int = DEFAULT_BUCKETS,
    norm_dtype=np.float32,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """(term, doc_id, tf) ⨝ dl ⨝ df → compressed block index."""
    span = max(1, (max_doc_id + n_buckets) // n_buckets)
    enriched = (
        postings.join(doclens, "doc_id")
        .join(dfs, "term")
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
    if shuffle_partitions:
        part = enriched.repartition(shuffle_partitions, "term", "bucket")
    else:
        part = enriched.repartition("term", "bucket")
    sorted_part = part.sortWithinPartitions("term", "bucket", "doc_id")
    return sorted_part.mapInPandas(_make_kernel(norm_dtype), schema=BLOCKS_SCHEMA)


def write_blocks(blocks: DataFrame, path: str, term_partitions: int = 32) -> None:
    """Persist the block index term-clustered so query-time `term IN (...)`
    filters prune parquet row groups (min/max stats on `term`)."""
    (
        blocks.repartition(term_partitions, "term")
        .sortWithinPartitions("term", "bucket", "block_seq")
        .write.mode("overwrite")
        .parquet(path)
    )
