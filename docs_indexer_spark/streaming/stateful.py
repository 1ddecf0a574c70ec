"""Streaming-native operators: watermarked windowed stats and stateful
cross-batch deduplication.

The reference has no streaming plane (CronJob re-runs + fingerprint skip,
SURVEY §2 explicit-absences); these are the greenfield operators a
web-scale ingest pipeline needs on top of :mod:`incremental`:

- :func:`windowed_doc_stats` — event-time tumbling-window ingest stats
  with a watermark, so late-arriving WARC records update their window
  until the watermark passes and state is dropped (bounded state at
  10^12-doc scale; without the watermark the window state grows forever).
- :func:`streaming_exact_dedup` — FIRST-SEEN filter across micro-batches
  via ``applyInPandasWithState``: the keyed state survives batch
  boundaries AND query restarts (checkpointed), which per-batch
  ``dropDuplicates`` cannot do and ``dropDuplicates`` on an unbounded
  stream cannot bound without a watermark column.  Emits each doc_id's
  first-arriving row exactly once.  State is 1 bit per key, sharded by
  Spark's state store across executors.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_doc_stats(
    stream: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """(window, n_docs, avg_chars) per event-time tumbling window.

    Use with ``.writeStream.outputMode("update")`` (late rows re-emit
    their window) or ``"append"`` (a window emits once its watermark
    passes).
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("window"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.length(text_col)), 2).alias("avg_chars"),
        )
    )


def streaming_exact_dedup(
    stream: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """First occurrence of each ``id_col`` across ALL micro-batches (and
    restarts — the state store is checkpointed)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = stream.schema

    def first_seen(
        key: Any, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            if len(pdf):
                first = pdf.iloc[:1]
                break
        state.update((True,))
        if first is not None:
            yield first

    return stream.groupBy(id_col).applyInPandasWithState(
        first_seen,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
