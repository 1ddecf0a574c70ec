"""Fused single-shuffle build ≡ classic (token_relations + build_blocks):
identical block rows, identical df stats, identical BM25 results."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from docs_indexer_spark.operators import spimi
from docs_indexer_spark.operators.fused import fused_build_blocks
from docs_indexer_spark.operators.postings import (
    corpus_stats,
    df_stats,
    token_relations,
)


def _classic_blocks(docs, analyzer, n_buckets, positions=False):
    rel = token_relations(docs, "text", analyzer=analyzer, term_ids=True)
    postings, doclens = rel.postings.persist(), rel.doclens
    n, avgdl = corpus_stats(doclens)
    dfs = df_stats(postings)
    ids = doclens.agg(
        F.max("doc_id").alias("mx"), F.min("doc_id").alias("mn")
    ).collect()[0]
    blocks = spimi.build_blocks(
        postings, doclens, dfs, n, avgdl, int(ids["mx"]), int(ids["mn"]),
        n_buckets=n_buckets,
    )
    return blocks, n, avgdl


def _block_key(r):
    return (r["term_id"], r["bucket"], r["block_seq"])


def _block_val(r):
    d = r.asDict()
    return (
        r["n_docs"], r["first_doc_id"], r["last_doc_id"], r["max_tf"],
        round(r["max_score"], 9),
        bytes(r["doc_ids_bin"]),
        bytes(d["tfs_bin"]) if "tfs_bin" in d else None,
        bytes(r["tf_norms_bin"]),
    )


@pytest.mark.parametrize("analyzer", ["english", "stop"])
def test_fused_equals_classic(spark, analyzer):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 400
    )
    classic, n_c, avgdl_c = _classic_blocks(docs, analyzer, n_buckets=8)
    fused = fused_build_blocks(docs, analyzer=analyzer, n_buckets=8)
    assert fused.n_docs == n_c
    assert abs(fused.avgdl - avgdl_c) < 1e-9
    want = {_block_key(r): _block_val(r) for r in classic.collect()}
    got = {_block_key(r): _block_val(r) for r in fused.blocks.collect()}
    assert got == want


def test_fused_positions_equal_postings(spark):
    """Fused positional blocks decode to the exact positional postings —
    and english-chain positions keep stopword increments."""
    from docs_indexer_spark.operators.spimi import decode_position_blocks

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    fused = fused_build_blocks(docs, analyzer="simple", n_buckets=4, positions=True)
    got = {
        (r["term_id"], r["doc_id"]): list(r["positions"])
        for r in decode_position_blocks(fused.blocks).collect()
    }
    from docs_indexer_spark.operators.phrase import token_positions

    want = {
        (r["term_id"], r["doc_id"]): list(r["positions"])
        for r in token_positions(docs, analyzer="simple")
        .withColumn("term_id", F.xxhash64("term"))
        .select("term_id", "doc_id", "positions")
        .collect()
    }
    assert got == want


def test_fused_df_stats_match(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 400
    )
    fused = fused_build_blocks(docs, analyzer="english", n_buckets=8)
    rel = token_relations(docs, "text", analyzer="english", term_ids=True)
    want = {
        r["term_id"]: r["df"] for r in df_stats(rel.postings).collect()
    }
    got = {r["term_id"]: r["df"] for r in fused.df_stats().collect()}
    assert got == want


def test_tfs_bin_dropped_by_default(spark):
    """Scoring never reads per-posting tfs, so the default tf-path block
    row omits tfs_bin; store_tf=True opts back in with identical
    doc_ids/norm streams; positional blocks always keep it (it segments
    positions_bin on decode)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    lean = fused_build_blocks(docs, analyzer="stop", n_buckets=4)
    assert "tfs_bin" not in lean.blocks.columns
    fat = fused_build_blocks(docs, analyzer="stop", n_buckets=4, store_tf=True)
    assert "tfs_bin" in fat.blocks.columns
    want = {_block_key(r): (bytes(r["doc_ids_bin"]), bytes(r["tf_norms_bin"]))
            for r in lean.blocks.collect()}
    got = {_block_key(r): (bytes(r["doc_ids_bin"]), bytes(r["tf_norms_bin"]))
           for r in fat.blocks.collect()}
    assert got == want
    # the opted-in stream is real and non-empty
    row = fat.blocks.filter(F.length("tfs_bin") > 0).first()
    assert row is not None
    lean.unpersist()
    fat.unpersist()
