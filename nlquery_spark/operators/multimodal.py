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
