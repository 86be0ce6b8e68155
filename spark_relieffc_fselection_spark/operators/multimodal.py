"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (north-star family, BASELINE.json).

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake, clearly marked) — but everything Spark-side is
real and tested: the schema contract, the Arrow batch shape through
``mapInPandas``, partition sizing for large blobs, and the
feature-extraction dataflow that downstream operators (dedup,
similarity search) consume.

Schema contract for a multimodal asset table:

    asset_id   bigint
    modality   string        ('image' | 'audio' | 'video')
    content    binary        (opaque encoded bytes)
    meta       struct<width int, height int, sample_rate int,
                      n_frames int, format string>

Scale notes: blobs ride in parquet binary columns; keep
``spark.sql.files.maxPartitionBytes`` at/below 128 MiB so a partition
of blobs fits executor memory, and never collect() content. All
per-asset work is mapInPandas (Arrow-batched, bounded by
``maxRecordsPerBatch``); only small derived features shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id bigint, modality string, content binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, format:string>"
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = (
    "asset_id bigint, modality string, n_bytes bigint, content_sha256 string, "
    f"feature array<float>"
)


def synthetic_assets(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake asset table for tests/demos: binary payloads
    derived from (seed, asset_id) so every run sees identical bytes.

    Generated DISTRIBUTED (mapInPandas over spark.range): blobs are
    born on executors — the pattern a real ingest uses; nothing binary
    transits the driver."""
    mods = ["image", "audio", "video"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "modality": [], "content": [], "meta": []}
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(seed * 100_003 + i)
                modality = mods[i % 3]
                content = rng.integers(
                    0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8
                ).tobytes()
                out["asset_id"].append(i)
                out["modality"].append(modality)
                out["content"].append(content)
                out["meta"].append(
                    {
                        "width": int(rng.integers(16, 512)) if modality == "image" else None,
                        "height": int(rng.integers(16, 512)) if modality == "image" else None,
                        "sample_rate": 16_000 if modality == "audio" else None,
                        "n_frames": int(rng.integers(1, 300)) if modality == "video" else None,
                        "format": {"image": "png", "audio": "wav", "video": "mp4"}[modality],
                    }
                )
            yield pd.DataFrame(out)

    return spark.range(n).repartition(8).mapInPandas(gen, schema=ASSET_SCHEMA)


def decode_asset(content: bytes, modality: str, meta: dict) -> np.ndarray:
    """STUB — real decode needs PIL/libsndfile/ffmpeg, absent here.

    Deterministic fake: returns a float32 'signal' derived from the
    sha256 of the bytes. Swap this single function for a real decoder
    (PIL.Image.open / soundfile.read / av frame sampling) in a
    codec-equipped deployment; everything around it stays unchanged.
    """
    digest = hashlib.sha256(content).digest()
    arr = np.frombuffer(digest * 8, dtype=np.uint8)[: FEATURE_DIM * 4]
    return (arr.astype(np.float32) - 127.5) / 127.5


def extract_features(assets: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Per-asset feature extraction over Arrow batches.

    Real pipeline shape: decode (stubbed) -> embed/resize/frame-sample
    -> fixed-dim feature vector + integrity hash. Output feeds the
    engine's similarity-search and dedup operators unchanged.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            hashes = []
            n_bytes = []
            for content, modality, meta in zip(
                pdf["content"], pdf["modality"], pdf["meta"]
            ):
                raw = bytes(content)
                n_bytes.append(len(raw))
                hashes.append(hashlib.sha256(raw).hexdigest())
                decoded = decode_asset(raw, modality, meta)
                feats.append(decoded[:FEATURE_DIM].astype(np.float32))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": n_bytes,
                    "content_sha256": hashes,
                    "feature": [f.tolist() for f in feats],
                }
            )

    return assets.mapInPandas(run, schema=_FEATURE_SCHEMA)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: filters to images, tags target dims, and
    passes bytes through the (stubbed) transcode kernel. The Spark-side
    contract — schema, pushdown-able modality filter, Arrow batches —
    is the real deliverable; the pixel work is one function swap."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # STUB transcode: real impl decodes, resizes, re-encodes.
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "content": pdf["content"],  # passthrough stub
                    "width": width,
                    "height": height,
                }
            )

    out_schema = "asset_id bigint, content binary, width int, height int"
    return assets.filter(F.col("modality") == "image").mapInPandas(run, schema=out_schema)


def frame_sample_videos(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index (real impl would attach the decoded frame bytes)."""
    vids = assets.filter(F.col("modality") == "video").select(
        "asset_id", F.col("meta.n_frames").alias("n_frames")
    )
    return vids.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
