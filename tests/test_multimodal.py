import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_videos,
    resize_images,
    synthetic_assets,
)
from spark_relieffc_fselection_spark.operators.simsearch import brute_force_topk


@pytest.fixture(scope="module")
def assets(spark):
    return synthetic_assets(spark, n=30).cache()


def test_asset_schema_contract(assets):
    fields = dict(assets.dtypes)
    assert fields["content"] == "binary"
    assert "struct" in fields["meta"]
    assert assets.count() == 30


def test_extract_features_shape_and_determinism(assets):
    f1 = extract_features(assets).orderBy("asset_id").collect()
    f2 = extract_features(assets).orderBy("asset_id").collect()
    assert len(f1) == 30
    for a, b in zip(f1, f2):
        assert len(a["feature"]) == FEATURE_DIM
        assert a["feature"] == b["feature"]  # deterministic fake decode
        assert len(a["content_sha256"]) == 64
        assert a["n_bytes"] > 0


def test_features_feed_similarity_search(assets, spark):
    feats = extract_features(assets).select(
        F.col("asset_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    topk = brute_force_topk(feats, feats.limit(3), k=5)
    assert topk.count() == 15  # 3 queries x 5 neighbors


def test_resize_filters_to_images(assets):
    out = resize_images(assets, 64, 64).collect()
    n_images = assets.filter("modality = 'image'").count()
    assert len(out) == n_images
    assert all(r["width"] == 64 and r["height"] == 64 for r in out)


def test_frame_sampling(assets):
    frames = frame_sample_videos(assets, every_n=10)
    rows = frames.collect()
    vids = {r["asset_id"]: r["meta"]["n_frames"] for r in
            assets.filter("modality = 'video'").select("asset_id", "meta").collect()}
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r["frame_idx"])
    assert set(by_asset) == set(vids)
    for aid, idxs in by_asset.items():
        assert idxs == list(range(0, max(vids[aid] - 1, 0) + 1, 10))
