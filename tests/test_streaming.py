"""Streaming ingestion + batch-incremental build (reference A18 cadence
model: drain, fingerprint-skip when unchanged)."""

import os

import pytest
from pyspark.sql import functions as F

from docs_indexer_spark.sources.catalog import SnapshotCatalog
from docs_indexer_spark.streaming.incremental import (
    corpus_fingerprint,
    incremental_build,
    stream_ingest,
)


def test_fingerprint_is_content_derived_and_order_free(spark):
    a = spark.createDataFrame(
        [("u1", "2026-01-01 00:00:00", "x", "en"),
         ("u2", "2026-01-02 00:00:00", "y", "en")],
        "url string, warc_ts string, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    b = a.orderBy(F.desc("url"))
    assert corpus_fingerprint(a) == corpus_fingerprint(b)
    c = a.filter(F.col("url") == "u1")
    assert corpus_fingerprint(a) != corpus_fingerprint(c)


def test_stream_ingest_and_incremental_build(spark, tmp_path):
    input_dir = str(tmp_path / "incoming")
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    batch1 = spark.createDataFrame(
        [(f"https://x/{i}/", "2026-01-01 00:00:00", f"alpha beta doc {i}", "en")
         for i in range(20)],
        "url string, warc_ts string, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    batch1.write.mode("append").parquet(input_dir)

    stream_ingest(spark, input_dir, staging, ckpt)
    staged = spark.read.parquet(staging)
    assert staged.count() == 20

    catalog = SnapshotCatalog(str(tmp_path / "wh"))
    m1 = incremental_build(spark, staged, catalog, n_build_partitions=1)
    assert m1["n_docs"] == 20

    # unchanged staging → fingerprint skip (reference A18)
    m2 = incremental_build(spark, spark.read.parquet(staging), catalog,
                           n_build_partitions=1)
    assert m2.get("skipped") is True

    # new files arrive; only they are drained (file-source checkpoint)
    batch2 = spark.createDataFrame(
        [(f"https://x/{i}/", "2026-01-02 00:00:00", f"gamma delta doc {i}", "en")
         for i in range(20, 30)],
        "url string, warc_ts string, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    batch2.write.mode("append").parquet(input_dir)
    stream_ingest(spark, input_dir, staging, ckpt)
    staged2 = spark.read.parquet(staging)
    assert staged2.count() == 30

    m3 = incremental_build(spark, staged2, catalog, n_build_partitions=1)
    assert not m3.get("skipped")
    assert m3["n_docs"] == 30
