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


def test_streaming_exact_dedup_across_batches_and_restarts(spark, tmp_path):
    """applyInPandasWithState keeps seen-set state across micro-batches
    AND across query restarts (checkpointed) — each doc_id emits once
    ever."""
    import pandas as pd

    from docs_indexer_spark.streaming.stateful import streaming_exact_dedup

    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    schema = "doc_id long, text string"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        deduped = streaming_exact_dedup(stream, "doc_id")
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(1, "a"), (1, "a-dup"), (2, "b")], schema
    ).write.mode("append").parquet(src)
    run_once()
    got1 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {1, 2}

    # restart with new data: 1 and 2 are remembered, only 3 emits
    spark.createDataFrame([(2, "b-late"), (3, "c")], schema).write.mode(
        "append"
    ).parquet(src)
    run_once()
    rows = spark.read.parquet(out_dir).collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == [1, 2, 3]


def test_windowed_doc_stats_watermark(spark, tmp_path):
    from pyspark.sql import functions as F

    from docs_indexer_spark.streaming.stateful import windowed_doc_stats

    src = str(tmp_path / "wsrc")
    schema = "doc_id long, warc_ts timestamp, text string"
    df = spark.createDataFrame(
        [
            (1, "2026-01-01 00:01:00", "aaaa"),
            (2, "2026-01-01 00:02:00", "bb"),
            (3, "2026-01-01 00:15:00", "cccccc"),
        ],
        "doc_id long, warc_ts string, text string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    df.write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    agg = windowed_doc_stats(stream, "10 minutes", "30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["window"]["start"].minute: (r["n_docs"], r["avg_chars"])
        for r in spark.sql("select * from win_stats").collect()
    }
    assert rows[0] == (2, 3.0)   # docs 1+2 in [00:00, 00:10)
    assert rows[10] == (1, 6.0)  # doc 3 in [00:10, 00:20)


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
