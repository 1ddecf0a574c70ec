"""End-to-end incremental story: fingerprint-skip rebuild (reference A18)
+ snapshot-diff between retained generations (Iceberg incremental scan) —
the CronJob-cadence pipeline a 100-TB deployment runs every 10 minutes."""

import datetime

import pytest
from pyspark.sql import functions as F

from docs_indexer_spark.sources.catalog import SnapshotCatalog
from docs_indexer_spark.streaming.incremental import (
    corpus_fingerprint,
    incremental_build,
)


def _docs(spark, rows):
    ts = datetime.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [(u, ts, t, "en") for u, t in rows],
        "url string, warc_ts timestamp, text string, lang string",
    )


def test_incremental_build_skip_and_snapshot_diff(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "wh"))
    v1 = _docs(spark, [
        ("https://d/a", "alpha content here"),
        ("https://d/b", "beta content here"),
        ("https://d/c", "gamma content here"),
    ])
    m1 = incremental_build(spark, v1, cat, n_build_partitions=1)
    assert m1["n_docs"] == 3
    gen1 = cat.current_generation("index")["generation"]

    # unchanged corpus → fingerprint-identical → no-op (reference A18)
    m1b = incremental_build(spark, v1, cat, n_build_partitions=1)
    assert m1b.get("skipped"), m1b
    assert cat.current_generation("index")["generation"] == gen1

    # changed corpus: b updated, d added → new generation
    v2 = _docs(spark, [
        ("https://d/a", "alpha content here"),
        ("https://d/b", "beta content CHANGED substantially"),
        ("https://d/c", "gamma content here"),
        ("https://d/d", "delta is brand new"),
    ])
    assert corpus_fingerprint(v2) != corpus_fingerprint(v1)
    m2 = incremental_build(spark, v2, cat, n_build_partitions=1)
    assert m2["n_docs"] == 4
    gen2 = cat.current_generation("index")["generation"]
    assert gen2 != gen1

    # Iceberg-style incremental scan between the two retained generations:
    # exactly the changed + added documents
    delta = cat.incremental(spark, "index", "docs.parquet", gen1, gen2)
    urls = {r["url"] for r in delta.select("url").collect()}
    assert urls == {"https://d/b", "https://d/d"}

    # the downstream consumer contract: only the delta needs re-processing
    assert delta.count() == 2
