"""Multimodal (image/audio/video) column plumbing.

Media rides as opaque ``binary`` content columns with a typed metadata
struct.  The Spark-side machinery — schemas, Arrow batch shapes, mapInPandas
signatures, partitioning — is real and tested; the actual codec work is
stubbed because no image/audio libraries exist in this environment:

* ``decode='fake'`` (default) produces deterministic metadata derived from
  the bytes (stable across runs/partitions) so pipelines are testable.
* ``decode='real'`` raises ``NotImplementedError`` with the dependency hint.

At 100 TB: media bytes stay columnar in parquet, flow executor-side through
Arrow batches (never the driver), and per-batch decode parallelism is plain
data parallelism — exactly how a real decoder plugs in.
"""

from __future__ import annotations

import hashlib
import sys
from typing import Iterable, Iterator

try:  # ship this module's functions by value (see functions/alleles.py)
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - best effort
    pass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread a narrow input (e.g. one small parquet file partition) across
    the cluster before a decode/encode-heavy mapInPandas stage; no-op when
    already parallel."""
    if df.isStreaming:
        return df  # micro-batch parallelism is the source's concern
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


#: canonical media-table schema fragment
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("byte_size", T.LongType()),
        T.StructField("content_hash", T.StringType()),
    ]
)


def _fake_meta(content: bytes, media_type: str) -> dict:
    """Deterministic pseudo-decode: dimensions derived from the content hash
    so results are stable and collision-poor, but obviously fake."""
    h = hashlib.sha256(content).digest()
    return {
        "media_type": media_type,
        "width": 16 * (1 + h[0] % 64),
        "height": 16 * (1 + h[1] % 64),
        "n_frames": 1 + h[2] % 300 if media_type == "video" else 1,
        "sample_rate": 8000 * (1 + h[3] % 6) if media_type == "audio" else 0,
        "byte_size": len(content),
        "content_hash": h.hex()[:16],
    }


def decode_media(
    df: DataFrame,
    content_col: str = "content",
    media_type_col: str = "media_type",
    decode: str = "fake",
) -> DataFrame:
    """Append a ``media_meta`` struct per row via Arrow-batched mapInPandas."""
    if decode == "real":
        raise NotImplementedError(
            "real media decode requires PIL/av/librosa which are not installed; "
            "use decode='fake' for pipeline testing"
        )
    if decode != "fake":
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")

    out_schema = T.StructType(df.schema.fields + [T.StructField("media_meta", MEDIA_META_TYPE)])

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _fake_meta(bytes(c) if c is not None else b"", mt or "image")
                for c, mt in zip(pdf[content_col], pdf[media_type_col])
            ]
            pdf = pdf.copy()
            pdf["media_meta"] = metas
            yield pdf

    return _ensure_parallelism(df).mapInPandas(run, schema=out_schema)


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    feature_dim: int = 64,
    decode: str = "fake",
) -> DataFrame:
    """Append a ``features array<float>`` embedding column — the exact batch
    shape a real CNN/audio encoder would produce through the same mapInPandas
    seam.  Fake mode emits hash-quantized values: byte ``i`` of
    ``sha256(content)``, ``sha256(content + b'#1')``, … scaled to
    ``(b - 128) / 128`` — exactly representable in float32, so an external
    SQL oracle recovers the bytes via ``round(x * 128)`` bit-for-bit (a real
    encoder would emit L2-normalized floats instead)."""
    if decode == "real":
        raise NotImplementedError("real feature extraction requires a model runtime")

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for c in pdf[content_col]:
                raw = bytes(c) if c is not None else b""
                buf = b""
                j = 0
                while len(buf) < feature_dim:
                    suffix = b"" if j == 0 else b"#%d" % j
                    buf += hashlib.sha256(raw + suffix).digest()
                    j += 1
                v = np.frombuffer(buf[:feature_dim], dtype=np.uint8).astype(np.float32)
                feats.append(((v - 128.0) / 128.0).tolist())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return _ensure_parallelism(df).mapInPandas(run, schema=out_schema)


def resize_media(
    df: DataFrame,
    target_width: int,
    target_height: int,
    content_col: str = "content",
    meta_col: str = "media_meta",
    decode: str = "fake",
) -> DataFrame:
    """Resize images/frames to ``target_width x target_height``: content is
    rewritten batch-wise through the same mapInPandas seam a real resampler
    (PIL/cv2) would use, and the metadata struct is updated to the new
    dimensions.  Fake mode truncates/pads the bytes to the implied size —
    deterministic, shape-correct, obviously fake."""
    if decode == "real":
        raise NotImplementedError("real resize requires PIL/cv2 which are not installed")
    if decode != "fake":
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")
    if target_width < 1 or target_height < 1:
        raise ValueError("target dimensions must be >= 1")

    out_schema = df.schema

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = target_width * target_height * 3  # fake RGB byte payload
        for pdf in batches:
            new_content, new_meta = [], []
            for c, m in zip(pdf[content_col], pdf[meta_col]):
                raw = bytes(c) if c is not None else b""
                resized = (raw * (size // max(1, len(raw)) + 1))[:size]
                new_content.append(resized)
                meta = dict(m) if m is not None else {}
                meta.update(
                    width=target_width,
                    height=target_height,
                    byte_size=len(resized),
                    content_hash=hashlib.sha256(resized).hexdigest()[:16],
                )
                new_meta.append(meta)
            pdf = pdf.copy()
            pdf[content_col] = new_content
            pdf[meta_col] = new_meta
            yield pdf

    return _ensure_parallelism(df).mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    meta_col: str = "media_meta",
    every_nth: int = 30,
) -> DataFrame:
    """Explode one row per sampled frame index (videos only) — pure Spark:
    ``sequence(0, n_frames-1, every_nth)`` + explode.  A real frame decoder
    would then map over (content, frame_idx) batches."""
    return df.filter(F.col(f"{meta_col}.media_type") == "video").select(
        "*",
        F.explode(
            F.sequence(F.lit(0), F.col(f"{meta_col}.n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )
