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


#: decoder registry: name -> {"meta": fn(bytes, media_type) -> dict,
#: "features": fn(bytes, dim) -> list[float], "resize": fn(bytes, w, h) ->
#: bytes}.  ``decode='real'`` resolves here first, so a deployment with
#: PIL/av installed registers its codecs under 'real' and every operator
#: picks them up through the same mapInPandas seam; without a registration
#: 'real' keeps raising the dependency hint.  Callables are captured in
#: the task closure (cloudpickle), so plain functions/lambdas work.
MEDIA_DECODERS: dict[str, dict] = {}


def register_media_decoder(name: str, *, meta=None, features=None, resize=None) -> None:
    """Register (or replace) a named media decoder.  Any subset of the
    three hooks may be provided; operators raise their usual dependency
    error when the hook they need is missing."""
    MEDIA_DECODERS[name] = {"meta": meta, "features": features, "resize": resize}


def _resolve_decoder(decode: str, kind: str, hint: str):
    """The callable for (decode, kind): None selects the built-in fake;
    registered decoders win; an unregistered 'real' raises the dependency
    hint; anything else is a usage error."""
    if decode == "fake":
        return None
    entry = MEDIA_DECODERS.get(decode)
    if entry is not None and entry.get(kind) is not None:
        return entry[kind]
    if decode == "real":
        raise NotImplementedError(hint)
    raise ValueError(
        f"decode must be 'fake', 'real', or a registered decoder name "
        f"(register_media_decoder), got {decode!r}"
    )


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


def _require_cols(df: DataFrame, cols: "tuple[str, ...]", fn: str) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"{fn}() missing required column(s) {missing}; available: {df.columns}"
        )


def decode_media(
    df: DataFrame,
    content_col: str = "content",
    media_type_col: str = "media_type",
    decode: str = "fake",
) -> DataFrame:
    """Append a ``media_meta`` struct per row via Arrow-batched mapInPandas.
    ``decode``: 'fake' (deterministic pseudo-decode), 'real' or any name
    registered via :func:`register_media_decoder`."""
    _require_cols(df, (content_col, media_type_col), "decode_media")
    decoder = _resolve_decoder(
        decode,
        "meta",
        "real media decode requires PIL/av/librosa which are not installed; "
        "use decode='fake' for pipeline testing or register_media_decoder('real', ...)",
    )

    out_schema = T.StructType(df.schema.fields + [T.StructField("media_meta", MEDIA_META_TYPE)])

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = decoder or _fake_meta
        for pdf in batches:
            metas = [
                fn(bytes(c) if c is not None else b"", mt or "image")
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
    _require_cols(df, (content_col,), "extract_features")
    decoder = _resolve_decoder(
        decode,
        "features",
        "real feature extraction requires a model runtime; "
        "register_media_decoder('real', features=...) to plug one in",
    )

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def _fake_features(raw: bytes, dim: int) -> list[float]:
        import numpy as np

        buf = b""
        j = 0
        while len(buf) < dim:
            suffix = b"" if j == 0 else b"#%d" % j
            buf += hashlib.sha256(raw + suffix).digest()
            j += 1
        v = np.frombuffer(buf[:dim], dtype=np.uint8).astype(np.float32)
        return ((v - 128.0) / 128.0).tolist()

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = decoder or _fake_features
        for pdf in batches:
            feats = []
            for c in pdf[content_col]:
                raw = bytes(c) if c is not None else b""
                feats.append(fn(raw, feature_dim))
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
    _require_cols(df, (content_col, meta_col), "resize_media")
    decoder = _resolve_decoder(
        decode,
        "resize",
        "real resize requires PIL/cv2 which are not installed; "
        "register_media_decoder('real', resize=...) to plug one in",
    )
    if target_width < 1 or target_height < 1:
        raise ValueError("target dimensions must be >= 1")

    out_schema = df.schema

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = target_width * target_height * 3  # fake RGB byte payload
        for pdf in batches:
            new_content, new_meta = [], []
            for c, m in zip(pdf[content_col], pdf[meta_col]):
                raw = bytes(c) if c is not None else b""
                if decoder is not None:
                    resized = decoder(raw, target_width, target_height)
                else:
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
    _require_cols(df, (meta_col,), "sample_frames")
    return df.filter(F.col(f"{meta_col}.media_type") == "video").select(
        "*",
        F.explode(
            F.sequence(F.lit(0), F.col(f"{meta_col}.n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )
