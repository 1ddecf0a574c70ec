"""SPIMI-style compressed posting-block construction with a salted,
doc-range-bucketed merge (SURVEY.md §2 C1 + C2).

Input: the uncompressed postings relation (term, doc_id, tf) plus document
lengths and global stats.  Output: the block index

    (term, bucket, block_seq, n_docs, first_doc_id, last_doc_id,
     max_tf, max_score, doc_ids_bin, tfs_bin, tf_norms_bin)

Skew story (the part the reference never had — it ran 1 OpenSearch shard,
/root/reference/common.py:6): a Zipf-head term like "the" may appear in a
large fraction of all documents.  A naive ``groupBy(term)`` would ship that
whole posting list to ONE task.  Instead the grouping key is
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

All arithmetic (idf, tf-norm) is native Column math; Python appears only in
the block encoder (numpy varint, Arrow-batched applyInPandas).
"""

from __future__ import annotations

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


def _make_encoder(norm_dtype):
    def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        """applyInPandas kernel: one (term, bucket) group → ≤⌈n/B⌉ blocks."""
        pdf = pdf.sort_values("doc_id")
        term = pdf["term"].iloc[0]
        bucket = int(pdf["bucket"].iloc[0])
        ids = pdf["doc_id"].values.astype(np.int64)
        tfs = pdf["tf"].values.astype(np.uint64)
        norms = pdf["tf_norm"].values.astype(norm_dtype)
        scores = pdf["idf"].values.astype(np.float64) * norms.astype(np.float64)
        rows = []
        for seq, start in enumerate(range(0, len(ids), BLOCK_SIZE)):
            sl = slice(start, start + BLOCK_SIZE)
            bids, btfs, bnorms = ids[sl], tfs[sl], norms[sl]
            rows.append(
                {
                    "term": term,
                    "bucket": bucket,
                    "block_seq": seq,
                    "n_docs": len(bids),
                    "first_doc_id": int(bids[0]),
                    "last_doc_id": int(bids[-1]),
                    "max_tf": int(btfs.max()),
                    "max_score": float(scores[sl].max()),
                    "doc_ids_bin": delta_encode_doc_ids(bids),
                    "tfs_bin": varint_encode(btfs),
                    "tf_norms_bin": encode_tf_norms(bnorms, norm_dtype),
                }
            )
        return pd.DataFrame(rows)

    return _encode_group


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
        .select("term", "bucket", "doc_id", "tf", "idf", "tf_norm")
    )
    return enriched.groupBy("term", "bucket").applyInPandas(
        _make_encoder(norm_dtype), schema=BLOCKS_SCHEMA
    )


def write_blocks(blocks: DataFrame, path: str, term_partitions: int = 32) -> None:
    """Persist the block index term-clustered so query-time `term IN (...)`
    filters prune parquet row groups (min/max stats on `term`)."""
    (
        blocks.repartition(term_partitions, "term")
        .sortWithinPartitions("term", "bucket", "block_seq")
        .write.mode("overwrite")
        .parquet(path)
    )
