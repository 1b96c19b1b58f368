"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque `binary` columns with typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs via
mapInPandas. The container has no image/audio libraries, so the actual codec
step is stubbed (NotImplementedError) or replaced by a deterministic fake —
but the Spark-side contract (schemas, batch iteration, partition behavior)
is real and tested, so swapping in PIL/librosa later is a one-function edit.

At 100 TB the pattern matters more than the codec: binaries stay columnar in
parquet, Arrow moves whole batches into Python once, and per-file work is
bounded by `spark.sql.files.maxPartitionBytes` — no driver involvement.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, blob binary, media_type string, width int, height int, "
    "duration_ms long"
)

DECODED_SCHEMA = (
    "media_id long, media_type string, n_bytes long, sha string, "
    "width int, height int, mean_luma double"
)


def documents_as_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: treat document text bytes as an opaque media blob so
    the binary-column plumbing is exercised end-to-end on real tables."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
        F.lit("text/fake").alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/feature-extract media blobs via mapInPandas.

    ``fake=True`` derives deterministic pseudo-features from the raw bytes
    (so tests validate batching/schema); ``fake=False`` is the marked stub
    where a real codec (PIL / torchaudio / pyav) plugs in.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/pyav on executors; "
                    "install and replace this branch"
                )
            blobs = pdf["blob"]
            n_bytes = blobs.map(len)
            sha = blobs.map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
            # deterministic fake features derived from content bytes
            width = (n_bytes % 640 + 1).astype("int32")
            height = (n_bytes % 480 + 1).astype("int32")
            luma = blobs.map(lambda b: (sum(b[:64]) / max(1, len(b[:64]))) / 255.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes.astype("int64"),
                    "sha": sha,
                    "width": width,
                    "height": height,
                    "mean_luma": luma,
                }
            )

    return df.mapInPandas(_decode, schema=DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand (media_id, duration_ms) into one
    row per sample timestamp with sequence/explode — pure Catalyst; the
    actual frame grab joins this plan against the decoder above."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("sample_ms"),
    )
