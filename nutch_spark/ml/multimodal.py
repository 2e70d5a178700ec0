"""Multimodal column plumbing — image/audio/video as opaque binary.

Media payloads are ``binary`` columns with typed metadata; the Spark
side — schemas, partition discipline, Arrow batch shapes, UDF
signatures — is real and tested. The actual codec work (decode,
resize, frame-sample) is STUBBED: the image/audio libraries are not in
this container, so each stub either raises ``NotImplementedError``
(real-decode path) or produces a deterministic fake (plumbing tests) —
clearly marked below.

Scale notes: media bytes ride in their own table keyed by media_ref
(never inside the docs table — column pruning must let text-only
pipelines skip the bytes entirely); decode/feature stages are
``mapInPandas`` over Arrow batches so bytes never materialize row-wise
in Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 16

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def synth_media(refs: DataFrame, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for the given media_ref column:
    bytes = md5-derived pseudo-payload, mime by extension."""
    h = F.md5(F.concat(F.col("media_ref"), F.lit(str(seed))))
    return refs.select(
        "media_ref",
        F.when(F.col("media_ref").endswith(".img"), "image/png")
        .otherwise("application/octet-stream")
        .alias("mime"),
        F.to_binary(F.repeat(h, 4), F.lit("hex")).alias("bytes"),
        (F.pmod(F.abs(F.xxhash64("media_ref", F.lit(seed))), 1920) + 1).cast("int").alias("width"),
        (F.pmod(F.abs(F.xxhash64("media_ref", F.lit(seed + 1))), 1080) + 1).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def decode_image(data: bytes) -> "np.ndarray":
    """REAL-DECODE STUB: container has no PIL/libvips. The pipeline
    plumbing (below) never calls this unless fake=False."""
    raise NotImplementedError(
        "image decoding requires PIL/pyvips, not present in this container; "
        "use extract_features(fake=True) for the deterministic fake path"
    )


def _fake_features(data: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake feature vector from the payload bytes (stands in
    for a CNN embedding; same shape/dtype contract)."""
    if data is None:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(data, dtype=np.uint8)
    # fold the byte stream into `dim` buckets, normalize to [0,1)
    pad = (-len(arr)) % dim
    folded = np.pad(arr, (0, pad)).reshape(-1, dim).sum(axis=0).astype(np.float64)
    return ((folded % 251) / 251.0).astype(np.float32)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: (media_ref, feature array<float>).

    Arrow-batched: each batch arrives as a pandas DataFrame, bytes stay
    in one block; with fake=False this is where a real model would run
    (and would raise today — clearly-marked stub)."""
    schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                pdf["bytes"].map(decode_image)  # raises NotImplementedError
            feats = [
                _fake_features(b, dim).tolist() if b is not None else None
                for b in pdf["bytes"]
            ]
            yield pd.DataFrame({"media_ref": pdf["media_ref"], "feature": feats})

    return media.select("media_ref", "bytes").mapInPandas(run, schema=schema)


def resize_plan(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize *planning* is pure column arithmetic (JVM); only the pixel
    work is stubbed. Returns target dims preserving aspect ratio."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return media.select(
        "media_ref",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one row per planned frame
    timestamp (explode of a JVM sequence; decode itself is stubbed)."""
    frames = F.sequence(
        F.lit(0).cast("long"),
        F.coalesce(F.col("duration_ms"), F.lit(0).cast("long")),
        F.lit(every_ms).cast("long"),
    )
    return media.filter(F.col("duration_ms").isNotNull()).select(
        "media_ref", F.explode(frames).alias("frame_ts_ms")
    )


def media_refs_from_docs(docs: DataFrame) -> DataFrame:
    """All media refs from the interleaved spans (kind='media'), distinct."""
    return (
        docs.select(
            F.explode(
                F.filter(F.col("spans"), lambda s: s["kind"] == "media")
            ).alias("s")
        )
        .select(F.col("s.media_ref").alias("media_ref"))
        .filter(F.col("media_ref").isNotNull())
        .distinct()
    )
