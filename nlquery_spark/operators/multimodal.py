"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media decode libraries (PIL/ffmpeg/torchaudio) are not available in this
environment, so the decode kernels are STUBBED behind
``set_decoder``/deterministic fakes — but the Spark-side contract is real
and tested: schema, Arrow batch shapes, mapInPandas signatures, and
partition-size control are exactly what a production decode stage uses.
"""

from __future__ import annotations

import zlib
from typing import Callable, Iterator, Optional

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), False),
        StructField("meta", StructType(
            [
                StructField("width", IntegerType(), True),
                StructField("height", IntegerType(), True),
                StructField("duration_ms", IntegerType(), True),
                StructField("codec", StringType(), True),
            ]
        ), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("feature", ArrayType(FloatType(), False), False),
        StructField("n_bytes", IntegerType(), False),
    ]
)

# Pluggable real decoder: (kind, payload, meta_dict) -> np.ndarray feature
_DECODER: Optional[Callable] = None


def set_decoder(fn: Optional[Callable]) -> None:
    global _DECODER
    _DECODER = fn


def _fake_decode(kind: str, payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic fake feature extractor (stands in for image decode /
    resize / frame-sample; see module docstring). Real deployments call
    ``set_decoder`` with e.g. a PIL+resnet kernel — the Spark plumbing is
    identical."""
    seed = zlib.crc32(payload) ^ zlib.crc32(kind.encode())
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    return rng.rand(dim).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """media(media_id, kind, payload, meta) -> per-item feature vectors.

    Arrow batches keep payloads off the driver; binary columns stream
    through mapInPandas in bounded batches (set
    spark.sql.execution.arrow.maxRecordsPerBatch down for large blobs).
    """

    def run(batches) -> Iterator:
        import pandas as pd

        decoder = _DECODER
        for pdf in batches:
            ids, kinds, feats, sizes = [], [], [], []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                data = bytes(payload)
                if decoder is not None:
                    vec = np.asarray(decoder(kind, data, {}), dtype=np.float32)
                else:
                    vec = _fake_decode(str(kind), data, dim)
                ids.append(int(media_id))
                kinds.append(str(kind))
                feats.append([float(x) for x in vec])
                sizes.append(len(data))
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "feature": feats, "n_bytes": sizes}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("meta", StructType(
            [
                StructField("width", IntegerType(), True),
                StructField("height", IntegerType(), True),
                StructField("duration_ms", IntegerType(), True),
                StructField("codec", StringType(), True),
            ]
        ), False),
    ]
)

# Pluggable real resize kernel: (payload, src_meta_dict, w, h) -> bytes
_RESIZER: Optional[Callable] = None


def set_resizer(fn: Optional[Callable]) -> None:
    global _RESIZER
    _RESIZER = fn


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake pixel kernel (PIL absent in this environment):
    output length scales with the target area, content is a seeded
    stream of the source payload — the metadata/batch/schema contract
    is the real one; swap in a PIL kernel via ``set_resizer``."""
    seed = zlib.crc32(payload) ^ (width * 31 + height)
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    return rng.bytes(max(width * height // 64, 8))


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image rows -> resized payloads with updated meta; non-image rows
    are filtered Spark-side (pushdown-friendly) before any Python runs.
    Batch shape: binary payloads stream via Arrow in bounded batches —
    tune spark.sql.execution.arrow.maxRecordsPerBatch for large blobs.
    """

    def run(batches) -> Iterator:
        import pandas as pd

        resizer = _RESIZER
        for pdf in batches:
            out = {"media_id": [], "kind": [], "payload": [], "meta": []}
            for media_id, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                data = bytes(payload)
                meta = dict(meta) if meta is not None else {}
                if resizer is not None:
                    new_payload = resizer(data, meta, width, height)
                else:
                    new_payload = _fake_resize(data, width, height)
                meta["width"], meta["height"] = width, height
                out["media_id"].append(int(media_id))
                out["kind"].append(str(kind))
                out["payload"].append(new_payload)
                out["meta"].append(meta)
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "kind", "payload", "meta")
        .mapInPandas(run, RESIZED_SCHEMA)
    )


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

# Pluggable real frame decoder: (payload, meta_dict, ts_ms) -> bytes
_FRAME_DECODER: Optional[Callable] = None


def set_frame_decoder(fn: Optional[Callable]) -> None:
    global _FRAME_DECODER
    _FRAME_DECODER = fn


def _fake_frame(payload: bytes, ts_ms: int) -> bytes:
    seed = zlib.crc32(payload) ^ ts_ms
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    return rng.bytes(32)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video rows -> one row per sampled frame at ``every_ms`` intervals.

    The sampling plan (frame count + timestamps) comes from the REAL
    metadata (duration_ms); only the pixel decode is a deterministic
    fake behind ``set_frame_decoder`` (ffmpeg absent here). Fan-out is
    bounded by ceil(duration/every_ms) rows per video — the explode
    happens inside the Arrow batch, so executor memory sees one video
    payload plus its frames at a time, never the whole partition.
    """
    if every_ms <= 0:
        raise ValueError(f"every_ms must be positive, got {every_ms}")

    def run(batches) -> Iterator:
        import pandas as pd

        decoder = _FRAME_DECODER
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "payload": []}
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                meta = dict(meta) if meta is not None else {}
                duration = meta.get("duration_ms") or 0
                data = bytes(payload)
                idx = 0
                ts = 0
                while ts < duration:
                    frame = (
                        decoder(data, meta, ts)
                        if decoder is not None
                        else _fake_frame(data, ts)
                    )
                    out["media_id"].append(int(media_id))
                    out["frame_idx"].append(idx)
                    out["ts_ms"].append(ts)
                    out["payload"].append(frame)
                    idx += 1
                    ts += every_ms
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload", "meta")
        .mapInPandas(run, FRAMES_SCHEMA)
    )


def synth_media(spark, n: int) -> DataFrame:
    """Deterministic synthetic media table for plumbing tests."""
    kinds = ["image", "audio", "video"]

    def gen(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": [kinds[i % 3] for i in ids],
                    "payload": [
                        (f"blob-{i}".encode() * (1 + i % 7)) for i in ids
                    ],
                    "meta": [
                        {
                            "width": 64 + (i % 4) * 32,
                            "height": 64,
                            "duration_ms": None if i % 3 == 0 else 1000 + i,
                            "codec": ["png", "pcm", "h264"][i % 3],
                        }
                        for i in ids
                    ],
                }
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)
