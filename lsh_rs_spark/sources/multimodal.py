"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Mirrors the reference's image example (`examples/reverse-img-search/src/
prepare.rs:27-65`: read → resize 80×80 → flatten to u8 vec → store) as
Spark-native plumbing: `binaryFile` source → `mapInPandas` decode/feature
stage → fixed-width feature vectors ready for the SRP/L2 LSH path.

The container has no image/audio codecs, so the decode kernels are STUBS:
``decode="fake"`` produces a deterministic byte-histogram feature (real
Spark plumbing — schema, Arrow batching, partitioning — fully exercised and
tested); ``decode="real"`` raises NotImplementedError where Pillow/ffmpeg
would be called.  Swapping in a real decoder changes only `_decode_one`.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 64

FEATURES_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """binaryFile source: (path, modificationTime, length, content BINARY)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", F.col("length").alias("n_bytes"), F.col("content"))
    )


def _decode_one(content: bytes, decode: str) -> np.ndarray:
    if decode == "real":
        raise NotImplementedError(
            "no image/audio codecs in this container — plug Pillow/ffmpeg here"
        )
    # deterministic fake: L1-normalized byte histogram folded to FEATURE_DIM
    arr = np.frombuffer(content or b"\x00", dtype=np.uint8)
    hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float32)
    s = hist.sum()
    return hist / (s if s else 1.0)


def extract_features(binaries: DataFrame, decode: str = "fake") -> DataFrame:
    """mapInPandas decode/feature stage — Arrow-batched, partition-parallel.

    Output: (path, n_bytes, feature ARRAY<FLOAT>[FEATURE_DIM]); feed to
    operators/ann.py (SRP sketches → bucketed near-dup) exactly like text
    embeddings.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_one(c, decode) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "n_bytes": pdf["n_bytes"].astype("int64"),
                    "feature": feats,
                }
            )

    return binaries.mapInPandas(fn, schema=FEATURES_SCHEMA)


def frame_sample_stub(binaries: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing (STUB decode): each payload yields
    ceil(n_bytes / (every_n*1024)) pseudo-frames with offsets — the schema
    and fan-out shape a real ffmpeg sampler would produce."""
    schema = StructType(
        [
            StructField("path", StringType()),
            StructField("frame_idx", LongType()),
            StructField("feature", ArrayType(FloatType())),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        step = every_n * 1024
        for pdf in batches:
            rows = {"path": [], "frame_idx": [], "feature": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                n = max(1, len(content or b"") // step)
                for i in range(n):
                    rows["path"].append(path)
                    rows["frame_idx"].append(i)
                    rows["feature"].append(
                        _decode_one((content or b"")[i * step : (i + 1) * step], "fake")
                    )
            yield pd.DataFrame(rows)

    return binaries.mapInPandas(fn, schema=schema)
