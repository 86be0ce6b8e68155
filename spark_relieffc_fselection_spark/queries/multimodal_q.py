"""Multimodal pipeline query.

The binary-asset plumbing (opaque ``binary`` content column + typed
metadata -> Arrow-batched decode/feature stage) is exercised against a
REAL oracle by backing the asset table with ``documents.text`` bytes:
byte length and sha256 integrity hashes are engine-independent, so the
whole binary dataflow short of the (stubbed) codec is hash-gated. The
feature vectors themselves come from the deterministic fake decoder
(operators/multimodal.py::decode_asset) and are pinned by unit tests
instead (tests/test_multimodal.py) — a codec stub has no SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.operators.multimodal import extract_features
from spark_relieffc_fselection_spark.queries import register
from spark_relieffc_fselection_spark.sources import load_table

_MODS = ["image", "audio", "video"]


def assets_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary asset table derived from documents: content = UTF-8 bytes
    of the text, modality assigned round-robin. Real ingests read blob
    columns straight from parquet; the derivation here only exists so
    the oracle can re-derive identical bytes."""
    docs = load_table(spark, sf_dir, "documents")
    mods = F.array(*[F.lit(m) for m in _MODS])
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(mods, (F.col("doc_id") % 3 + 1).cast("int")).alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit(None).cast("string").alias("meta"),
    )


@register(
    "q36_multimodal_features",
    oracle="""
    SELECT doc_id AS asset_id,
           ['image','audio','video'][doc_id % 3 + 1] AS modality,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha256
    FROM documents
    """,
    doc="Binary asset columns -> Arrow-batched (stubbed) decode -> "
        "integrity hashes; the binary plumbing is hash-gated against "
        "DuckDB (sha256 over identical bytes), the codec stub is "
        "unit-test-pinned",
)
def q36_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = assets_from_documents(spark, sf_dir)
    return extract_features(assets).select(
        "asset_id", "modality", F.col("n_bytes").cast("long").alias("n_bytes"),
        "content_sha256",
    )


FRAME_EVERY = 7


@register(
    "q63_frame_sample",
    oracle=f"""
    SELECT doc_id AS asset_id, u.f AS frame_idx
    FROM documents,
         LATERAL (SELECT unnest(generate_series(0,
                    greatest((n_chars % 91 + 10) - 1, 0), {FRAME_EVERY})) AS f) u
    WHERE doc_id % 3 = 2
    """,
    doc="Video frame-sampling plumbing: every-Nth-frame index expansion "
        "per video asset (modality-filtered, metadata-driven). n_frames "
        "is derived deterministically from document length so the frame "
        "schedule — the Spark-side deliverable around the stubbed "
        "decoder — is fully oracle-checkable.",
)
def q63_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.multimodal import (
        frame_sample_videos,
    )

    docs = load_table(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in _MODS]), (F.col("doc_id") % 3 + 1).cast("int")
        ).alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct((F.col("n_chars") % 91 + 10).cast("int").alias("n_frames")).alias(
            "meta"
        ),
    )
    return frame_sample_videos(assets, every_n=FRAME_EVERY)
