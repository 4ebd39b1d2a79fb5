"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Mirrors the reference's image example (`examples/reverse-img-search/src/
prepare.rs:27-65`: read → resize 80×80 → flatten to u8 vec → store) as
Spark-native plumbing: `binaryFile` source → `mapInPandas` decode/feature
stage → fixed-width feature vectors ready for the SRP/L2 LSH path.

Decode modes:
* ``decode="real"`` — a real decoder: uncompressed P6 PPM is parsed natively
  (pure NumPy, no codec needed), any other format goes through Pillow when
  importable (detected at runtime), else NotImplementedError.  The feature
  is the reference's prepare step at 8×8: grayscale, block-mean downsample,
  flatten to FEATURE_DIM=64, L1-normalize (`prepare.rs:27-65` resizes to
  80×80 and flattens the same way).
* ``decode="fake"`` — deterministic byte-histogram stand-in for formats the
  container cannot decode; keeps every piece of Spark plumbing (schema,
  Arrow batching, partitioning) identical to the real path.
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


try:  # runtime codec detection: Pillow is optional, never required
    from PIL import Image as _PIL_Image  # type: ignore
except ImportError:  # pragma: no cover - absent in this container
    _PIL_Image = None

_GRID = 8  # 8×8 grayscale = FEATURE_DIM features


def _decode_ppm(content: bytes) -> np.ndarray | None:
    """Parse binary P6 PPM (pure NumPy) → (h, w) float grayscale, or None."""
    if not content.startswith(b"P6"):
        return None
    # header: P6 <ws> width <ws> height <ws> maxval <single-ws> raster
    fields: list[int] = []
    i = 2
    while len(fields) < 3 and i < len(content):
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":  # comment to end of line
            while i < len(content) and content[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        fields.append(int(content[i:j]))
        i = j
    i += 1  # single whitespace before raster
    w, h, maxval = fields
    raster = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=i)
    rgb = raster.reshape(h, w, 3).astype(np.float64) / maxval
    return rgb @ np.array([0.299, 0.587, 0.114])  # Rec.601 luma


def _gray_to_feature(gray: np.ndarray) -> np.ndarray:
    """(h, w) grayscale → block-mean 8×8 → flatten → L1-normalize."""
    h, w = gray.shape
    ys = (np.arange(_GRID + 1) * h) // _GRID
    xs = (np.arange(_GRID + 1) * w) // _GRID
    out = np.empty((_GRID, _GRID), dtype=np.float32)
    for r in range(_GRID):
        for c in range(_GRID):
            block = gray[ys[r] : max(ys[r + 1], ys[r] + 1),
                         xs[c] : max(xs[c + 1], xs[c] + 1)]
            out[r, c] = block.mean()
    flat = out.reshape(-1)
    s = flat.sum()
    return flat / (s if s else 1.0)


def _decode_one(content: bytes, decode: str) -> np.ndarray:
    if decode == "real":
        content = content or b""
        gray = _decode_ppm(content)
        if gray is not None:
            return _gray_to_feature(gray)
        if _PIL_Image is not None:
            import io

            img = _PIL_Image.open(io.BytesIO(content)).convert("L")
            return _gray_to_feature(np.asarray(img, dtype=np.float64) / 255.0)
        raise NotImplementedError(
            "decode='real' handles P6 PPM natively; other formats need "
            "Pillow (not installed in this container)"
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
