"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contract is real and tested — schema, partitioning, UDF
signatures, batch shapes.  The codec step itself is STUBBED (image/audio
libraries are not available in this container): ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder (seeded by the content hash) produces stable "pixels" so the
downstream plumbing (resize, feature extraction, frame sampling) is
exercised end-to-end.

Schema convention:

    media(doc_id long, kind string, payload binary,
          meta struct<mime:string, width:int, height:int, duration_ms:int>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_SCHEMA = "doc_id long, kind string, feature array<float>, n_bytes int"


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to HxWx3 uint8.

    STUB: real decoding needs an image library not present in this
    container.  ``fake=True`` returns a deterministic 8x8x3 array seeded by
    the payload's md5 — stable across runs/executors, good enough to test
    every piece of Spark plumbing around it.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image codec library; "
            "run with fake=True for plumbing tests"
        )
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def extract_features(
    media: DataFrame, fake: bool = True, feature_dim: int = 16
) -> DataFrame:
    """payload binary → fixed-dim float feature vector via mapInPandas.

    Batch shape: one Arrow batch of (doc_id, kind, payload) per iteration;
    the decode + pooling runs vectorized inside the batch.  On a real
    cluster this stage is CPU-heavy and embarrassingly parallel — the plan
    repartitions by doc_id so codec work spreads evenly regardless of
    upstream file layout.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"].values:
                img = decode_image(bytes(payload), fake=fake)
                pooled = img.astype(np.float32).reshape(-1)
                # mean-pool into feature_dim buckets
                pad = (-len(pooled)) % feature_dim
                if pad:
                    pooled = np.pad(pooled, (0, pad))
                feats.append(pooled.reshape(feature_dim, -1).mean(axis=1) / 255.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "kind": pdf["kind"].values,
                    "feature": [f.tolist() for f in feats],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"].values],
                }
            )

    balanced = media.repartition("doc_id")
    return balanced.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plumbing: expands each video row into frame
    timestamps (native sequence — the decode itself would hang off each
    (doc_id, frame_ts) row via extract_features)."""
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    return media.filter(F.col("kind") == "video").select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), dur, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
