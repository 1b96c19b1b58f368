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


def perceptual_hash(df: DataFrame, fake: bool = True) -> DataFrame:
    """64-bit dHash per media blob — the image near-dup fingerprint
    (resize to a 9x8 luma grid, emit 1 where each pixel is brighter than
    its right neighbor). Arrow-batched mapInPandas, numpy row-local work,
    zero shuffles; the hash emits as a 64-char bit STRING so the banded
    pairing below shares the simhash machinery's representation.

    ``fake=True`` derives the 9x8 grid deterministically from the blob
    bytes (tiled + scaled — stable across runs and engines) so the full
    pipeline is testable without PIL; ``fake=False`` is the marked stub
    where a real decoder's grayscale-resize plugs in. The key property
    the fake preserves: blobs differing in a FEW bytes produce hashes
    within small Hamming distance, disjoint blobs do not — so the
    downstream banding is exercised realistically."""
    import numpy as np

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_ids, out_hashes = [], []
        for pdf in batches:
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                if not fake:
                    raise NotImplementedError(
                        "real dHash needs an image decoder (PIL) on "
                        "executors; install and replace this branch"
                    )
                raw = np.frombuffer(bytes(blob), dtype=np.uint8)
                if raw.size == 0:
                    raw = np.zeros(1, dtype=np.uint8)
                # deterministic fake "decode": FOLD the whole blob into a
                # 9x8 luma grid (pad to a multiple of 72, sum the tiles) —
                # every byte influences the grid, so a small corruption
                # perturbs few cells and the Hamming-distance contract the
                # banding relies on holds end-to-end
                pad = (-raw.size) % 72
                folded = (
                    np.pad(raw, (0, pad))
                    .reshape(-1, 72)
                    .sum(axis=0, dtype=np.int64)
                )
                grid = folded.reshape(8, 9)
                bits = (grid[:, 1:] < grid[:, :-1]).flatten()
                out_ids.append(mid)
                out_hashes.append("".join("1" if b else "0" for b in bits))
        yield pd.DataFrame({"media_id": out_ids, "phash": out_hashes})

    return df.select("media_id", "blob").mapInPandas(
        _hash, schema="media_id long, phash string"
    )


def phash_near_dup_pairs(
    hashes: DataFrame, max_hamming: int = 3, n_bands: int | None = None
) -> DataFrame:
    """Image near-dup pairs by perceptual-hash Hamming distance, using the
    same EXACT pigeonhole banding as dedup.simhash_hamming_pairs
    (dedup.py:613): split the 64-bit string into ``max_hamming + 1``
    bands, bucket-join on verbatim band equality (two hashes within h
    differ in at most h bands, so they must share one), then verify the
    exact distance row-locally on candidates only. No self-join, no
    all-pairs — the scale path for billion-image dedup."""
    from ..util import tracked_persist

    if n_bands is None:
        n_bands = max_hamming + 1
    if not max_hamming < n_bands <= 64:
        raise ValueError(
            f"pigeonhole needs max_hamming < n_bands <= 64, got "
            f"h={max_hamming}, n_bands={n_bands}"
        )
    sigs = tracked_persist(hashes.select("media_id", "phash"))
    widths = [
        64 // n_bands + (1 if b < 64 % n_bands else 0) for b in range(n_bands)
    ]
    starts = [sum(widths[:b]) for b in range(n_bands)]
    bands = sigs.select(
        "media_id",
        F.posexplode(
            F.array(
                *[
                    F.substring("phash", starts[b] + 1, widths[b])
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "bv"),
    )
    buckets = (
        bands.groupBy("band", "bv")
        .agg(F.collect_set("media_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.array_sort("ids").alias("ids"))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("ia"), y.alias("ib")),
            ),
        )
    )
    cands = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.ia", "p.ib")
        .distinct()
    )
    a = sigs.select(F.col("media_id").alias("ia"), F.col("phash").alias("ha"))
    b = sigs.select(F.col("media_id").alias("ib"), F.col("phash").alias("hb"))
    # same row-local 64-position compare dedup.simhash_hamming_pairs uses
    hamming = F.aggregate(
        F.sequence(F.lit(1), F.lit(64)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            F.substring(F.col("ha"), i, F.lit(1))
            != F.substring(F.col("hb"), i, F.lit(1)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return (
        cands.join(a, "ia")
        .join(b, "ib")
        .withColumn("hamming", hamming.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("ia", "ib", "hamming")
    )


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
