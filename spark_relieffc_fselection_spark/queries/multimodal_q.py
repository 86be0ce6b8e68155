"""Multimodal pipeline query — rows-only check (no SQL oracle: the
decode kernel is a Python mapInPandas stage; deterministic, but not
SQL-expressible, so the driver records the weaker rows-only check)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.operators.multimodal import (
    extract_features,
    synthetic_assets,
)
from spark_relieffc_fselection_spark.queries import register


@register(
    "q36_multimodal_features",
    oracle=None,
    doc="Binary asset table -> Arrow-batched (stubbed) decode -> fixed-dim "
        "features + integrity hashes; deterministic across runs",
)
def q36_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = synthetic_assets(spark, n=64)
    return extract_features(assets).select(
        "asset_id", "modality", "n_bytes", "content_sha256"
    )
