"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (deterministic fake), but everything Spark-side is
real and tested: binary columns, metadata structs, Arrow batch shape
through mapInPandas, and the partitioning story (payloads stay opaque
bytes until the last step; feature extraction is an embarrassingly
parallel mapInPandas over whatever partitioning the upstream plan
produced — no shuffle added).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

ASSET_SCHEMA = (
    "doc_id long, payload binary, meta struct<n_bytes: long, mime: string, source: string>"
)

FEATURES_SCHEMA = "doc_id long, n_bytes long, features array<double>"


def to_assets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Model documents as multimodal assets: binary payload + metadata
    struct. (With real data the payload would be image/audio bytes; here
    it's the utf-8 encoding of the text — the plumbing is identical.)"""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.repartition(F.col(id_col)).select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Stub decode step — the real implementation needs an image codec
    (PIL/opencv), which this container doesn't ship."""
    raise NotImplementedError(
        "image decode requires an image codec (e.g. PIL); not available in "
        "this environment — extract_features uses a deterministic fake"
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The Spark-side contract (schema, Arrow batch shape, per-partition
    iterator) is production-real; the per-payload 'model' is a
    deterministic fake (byte histogram moments) standing in for decode +
    embed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                # deterministic fake embedding: moments of the byte stream
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
                total = max(int(arr.size), 1)
                feats.append((hist.astype(np.float64) / total).round(6).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                    "features": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURES_SCHEMA)
