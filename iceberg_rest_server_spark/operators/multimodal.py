"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decode is REAL where no codec is needed — binary PPM (P6) images and
PCM WAV audio (see decode_ppm / decode_wav below) — and a clearly-marked
stub (deterministic fake) for compressed formats, which need codec
libraries this container doesn't ship. Everything Spark-side is real
and tested: binary columns, metadata structs, Arrow batch shape
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
    """Decode an image payload. REAL for binary PPM (P6) — header parse
    + numpy, no codec library needed (decode_ppm below); compressed
    formats (PNG/JPEG) still require a codec this container doesn't
    ship and stay honestly gated."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        "compressed image decode requires a codec (e.g. PIL); not available "
        "in this environment — only PPM (P6) decodes natively"
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


# ---------------------------------------------------------------- real
# codec-free decoders (r8): PPM images and PCM WAV audio need no external
# codec — pure header parse + numpy/stdlib — so for THESE formats the
# decode step is genuinely implemented; PNG/JPEG/MP3 remain honestly
# NotImplementedError-gated until a codec library exists in the image.


def decode_ppm(payload: bytes) -> "np.ndarray":
    """Decode a binary PPM (P6) image to an (h, w, 3) uint8 array.

    Real decode, no codec library needed: the P6 format is an ASCII
    header (magic, width, height, maxval, with #-comments allowed)
    followed by raw RGB bytes."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: 4 fields, skipping comments
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    width, height, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=width * height * 3, offset=i)
    return data.reshape(height, width, 3).copy()


def encode_ppm(arr: "np.ndarray") -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def resize_rgb(arr: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Nearest-neighbor resize of an (h, w, 3) image — deterministic
    integer index sampling (floor((i + 0.5) * src / dst)), the same
    kernel on every platform (no float filtering libraries)."""
    src_h, src_w = arr.shape[:2]
    ys = ((np.arange(height) * 2 + 1) * src_h) // (2 * height)
    xs = ((np.arange(width) * 2 + 1) * src_w) // (2 * width)
    return arr[ys[:, None], xs[None, :]]


def decode_wav(payload: bytes) -> tuple["np.ndarray", int]:
    """Decode a PCM WAV payload to (samples int16 [n, channels], rate)
    using only the stdlib `wave` module — a real audio decode for the
    one container format that needs no codec."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM supported")
        frames = w.readframes(w.getnframes())
        arr = np.frombuffer(frames, dtype="<i2").reshape(-1, w.getnchannels())
        return arr.copy(), w.getframerate()


def encode_wav(samples: "np.ndarray", rate: int) -> bytes:
    """Encode int16 samples [n, channels] as a PCM WAV payload."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1] if samples.ndim == 2 else 1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


IMAGE_STATS_SCHEMA = (
    "doc_id long, width int, height int, mean_r double, mean_g double, mean_b double"
)


def ppm_image_stats(assets: DataFrame) -> DataFrame:
    """REAL decode + per-channel statistics over PPM payloads via
    mapInPandas — same contract as extract_features (no added shuffle,
    Arrow batches through), but the decode is the genuine article.
    Channel means are exact-integer sums / pixel counts, so results are
    bit-stable across partitionings."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height", "mean_r", "mean_g", "mean_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_ppm(bytes(payload))
                h, w = img.shape[:2]
                sums = img.reshape(-1, 3).astype(np.int64).sum(axis=0)
                n = h * w
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mean_r"].append(sums[0] / n)
                rows["mean_g"].append(sums[1] / n)
                rows["mean_b"].append(sums[2] / n)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(run, schema=IMAGE_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = (
    "doc_id long, n_samples long, rate int, rms double, zero_crossings long"
)


def wav_audio_stats(assets: DataFrame) -> DataFrame:
    """REAL decode + audio features (RMS energy, zero-crossing count)
    over PCM WAV payloads via mapInPandas. RMS uses exact integer power
    sums before the one sqrt (IEEE-correctly-rounded), so results are
    partition-stable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "n_samples", "rate", "rms", "zero_crossings")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, rate = decode_wav(bytes(payload))
                mono = samples[:, 0].astype(np.int64)
                power = int((mono * mono).sum())
                zc = int(((mono[:-1] >= 0) != (mono[1:] >= 0)).sum())
                rows["doc_id"].append(doc_id)
                rows["n_samples"].append(len(mono))
                rows["rate"].append(rate)
                rows["rms"].append(float(np.sqrt(power / max(len(mono), 1))))
                rows["zero_crossings"].append(zc)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(run, schema=AUDIO_STATS_SCHEMA)
