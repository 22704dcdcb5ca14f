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
                # no rounding here: callers round with SQL-side half-up
                # semantics (numpy rounds half-to-even, which diverges
                # from Spark/DuckDB round() at exact ties like k/256)
                feats.append((hist.astype(np.float64) / total).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                    "features": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, payload binary, meta struct<n_bytes: long, width: int, height: int>"
)


def resize_images(assets: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Resize step (1 row → 1 row, payload → payload): the decode+resample
    kernel is a deterministic fake (linear resample of the byte stream to
    width×height bytes — a real codec would decode, `cv2.resize`, and
    re-encode in its place), but the Spark contract is production-real:
    binary in/out through Arrow, new typed metadata, no added shuffle —
    the map runs on whatever partitioning the scan produced."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                if arr.size == 0:
                    arr = np.zeros(1, dtype=np.uint8)
                xs = np.linspace(0, arr.size - 1, target)
                out.append(
                    np.interp(xs, np.arange(arr.size), arr).astype(np.uint8).tobytes()
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "meta": [
                        {"n_bytes": target, "width": width, "height": height}
                    ]
                    * len(pdf),
                }
            )

    return assets.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx int, frame binary"


def sample_frames(
    assets: DataFrame, frame_bytes: int = 256, every_nth: int = 4
) -> DataFrame:
    """Frame sampling (1 row → N rows): treat the payload as a sequence of
    fixed-size frames and keep every `every_nth` one — the video-sampling
    contract (a real impl would demux containers and decode keyframes).
    Row multiplication happens inside mapInPandas, so output batch size
    decouples from input batch size exactly as a production frame
    sampler needs; still no added shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max((len(payload) + frame_bytes - 1) // frame_bytes, 1)
                for i in range(0, n_frames, every_nth):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(payload[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame": frames}
            )

    return assets.mapInPandas(run, schema=FRAMES_SCHEMA)
