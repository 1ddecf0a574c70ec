"""Incremental ingestion — batch-incremental first, streaming optional.

The reference's notion of "incremental" is re-run every 10 minutes +
fingerprint-skip when the source is unchanged (/root/reference/helm/
docs-indexer-app/templates/cronjob-docs.yaml:16, docs/design.md:9-19,
SURVEY.md §2 explicit-absences note).  The Spark-native equivalents:

- :func:`incremental_build` — batch incremental: diff the new input
  snapshot against the published generation's fingerprint; unchanged →
  no-op (exactly reference A18); changed → rebuild via the resumable plan.
  On Iceberg this becomes an incremental scan between snapshot ids; here
  (parquet catalog) the fingerprint is content-derived.
- :func:`stream_ingest` — Structured Streaming micro-batch ingestion of a
  growing documents directory: readStream → dedup by url within the
  micro-batch (last warc_ts wins, the es.index upsert semantics) →
  foreachBatch appends to a staging table.  A downstream
  :func:`incremental_build` call publishes a fresh index generation when
  the staged corpus changed.  `availableNow` trigger makes it testable and
  also matches the CronJob cadence model (drain-what-exists, exit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docs_indexer_spark.plans.build_index import build_index
from docs_indexer_spark.sources.catalog import SnapshotCatalog


def corpus_fingerprint(docs: DataFrame) -> str:
    """Content-derived fingerprint: the Iceberg-snapshot-id stand-in.

    One cheap aggregate: xor of per-row xxhash64(url, warc_ts) + count.
    Order-independent, overflow-free (xor), distributed, no collect of
    data rows.
    """
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(url, warc_ts))").alias("h"),
    ).collect()[0]
    return f"{row['n']}-{(row['h'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}"


def incremental_build(
    spark: SparkSession,
    docs: DataFrame,
    catalog: SnapshotCatalog,
    **build_kwargs,
) -> dict:
    """Reference A18 semantics: skip when unchanged, else resumable build
    + atomic publish (A19)."""
    fp = corpus_fingerprint(docs)
    return build_index(spark, docs, catalog, fingerprint=fp, **build_kwargs)


def stream_ingest(
    spark: SparkSession,
    input_dir: str,
    staging_dir: str,
    checkpoint_dir: str,
    schema: str = "url string, warc_ts timestamp, text string, lang string",
) -> None:
    """Drain new files from input_dir into the staging corpus, exactly-once
    per file (Structured Streaming file-source checkpoint), deduped by url
    within each micro-batch."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
        deduped = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        deduped.write.mode("append").parquet(staging_dir)

    (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
