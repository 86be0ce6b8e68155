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
