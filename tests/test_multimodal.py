import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.operators.multimodal import (
    FEATURE_DIM,
    _stub_decode,
    decode_asset,
    extract_features,
    frame_sample_videos,
    png_decode_gray,
    png_meta,
    probe_asset_meta,
    probe_assets,
    resize_images,
    synthetic_assets,
)
from spark_relieffc_fselection_spark.operators.simsearch import brute_force_topk


def _make_wav(samples: np.ndarray, framerate: int = 8000) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


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


def test_real_wav_decode_pools_actual_samples():
    """PCM WAV decodes through stdlib wave (no optional dep): the
    feature is the per-bin mean of the true samples, not the stub."""
    samples = np.repeat((np.arange(FEATURE_DIM) * 1000).astype(np.int16), 10)
    wav = _make_wav(samples)
    feat = decode_asset(wav, "audio", {})
    expected = (np.arange(FEATURE_DIM) * 1000 / 32768.0).astype(np.float32)
    assert np.allclose(feat, expected, atol=1e-6)
    assert not np.allclose(feat, _stub_decode(wav)[:FEATURE_DIM])


def test_undecodable_bytes_fall_back_to_stub_deterministically():
    junk = b"definitely not a RIFF container"
    a = decode_asset(junk, "audio", {})
    b = decode_asset(junk, "audio", {})
    assert np.allclose(a, _stub_decode(junk)[: len(a)])
    assert np.array_equal(a, b)


def test_probe_asset_meta_reads_real_wav_header():
    wav = _make_wav(np.zeros(4000, np.int16), framerate=8000)
    meta = probe_asset_meta(wav, "audio")
    assert meta["sample_rate"] == 8000
    assert abs(meta["duration_s"] - 0.5) < 1e-9


def test_probe_assets_dataframe(spark):
    """Arrow-batched probe: real WAV rows yield decoded metadata, junk
    rows yield nulls — the corrupt-asset flagging path."""
    wav = _make_wav(np.zeros(1600, np.int16), framerate=16000)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(wav), None),
         (2, "audio", bytearray(b"junk"), None),
         (3, "video", bytearray(b"junk"), None)],
        "asset_id long, modality string, content binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int, format:string>",
    )
    rows = {r["asset_id"]: r for r in probe_assets(df).collect()}
    assert rows[1]["decoded_sample_rate"] == 16000
    assert abs(rows[1]["decoded_duration_s"] - 0.1) < 1e-9
    assert rows[2]["decoded_sample_rate"] is None
    assert rows[3]["decoded_width"] is None


def _make_png(pixels: np.ndarray, colortype: int, filters: list[int]) -> bytes:
    """Encode HxWxC uint8 pixels as a PNG, FORWARD-filtering each row
    with the given per-row filter type (0 none / 1 sub / 2 up / 3 avg /
    4 paeth) — so the decoder's un-filtering of every type is what the
    round-trip asserts."""
    import struct
    import zlib

    h, w, c = pixels.shape
    px = pixels.astype(np.int64)
    raw = bytearray()
    prev = np.zeros(w * c, np.int64)
    for y, f in zip(range(h), filters):
        line = px[y].reshape(-1)
        if f == 0:
            filt = line
        elif f == 1:
            left = np.concatenate([np.zeros(c, np.int64), line[:-c]])
            filt = (line - left) & 255
        elif f == 2:
            filt = (line - prev) & 255
        elif f == 3:
            left = np.concatenate([np.zeros(c, np.int64), line[:-c]])
            filt = (line - ((left + prev) >> 1)) & 255
        else:  # paeth
            left = np.concatenate([np.zeros(c, np.int64), line[:-c]])
            upleft = np.concatenate([np.zeros(c, np.int64), prev[:-c]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = (line - pred) & 255
        raw.append(f)
        raw += filt.astype(np.uint8).tobytes()
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_real_image_decode_reads_actual_pixels():
    """The stdlib PNG codec (no Pillow in this container) must recover
    the actual pixel values — the 4x4 gray image pools to itself."""
    pix = np.arange(0, 256, 16, dtype=np.uint8).reshape(4, 4, 1)
    png = _make_png(pix, colortype=0, filters=[0, 1, 2, 4])
    feat = decode_asset(png, "image", {})
    expected = (np.arange(0, 256, 16, dtype=np.float32) - 127.5) / 127.5
    assert np.allclose(feat, expected, atol=1e-6)
    m = probe_asset_meta(png, "image")
    assert (m["width"], m["height"]) == (4, 4)


def test_png_decoder_all_filters_rgb_roundtrip():
    rng = np.random.default_rng(7)
    pix = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    for filters in ([0] * 5, [1] * 5, [0, 2, 2, 2, 2], [0, 3, 3, 3, 3],
                    [0, 4, 4, 4, 4], [0, 1, 2, 3, 4]):
        png = _make_png(pix, colortype=2, filters=list(filters))
        gray = png_decode_gray(png)
        assert gray is not None and gray.shape == (5, 6)
        p = pix.astype(np.float32)
        luma = (299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]) / 1000.0
        assert np.allclose(gray, luma, atol=1e-4), f"filters={filters}"
    assert png_meta(png) == (6, 5)


def test_png_decoder_rgba_and_gray_alpha():
    rng = np.random.default_rng(11)
    rgba = rng.integers(0, 256, size=(3, 3, 4), dtype=np.uint8)
    gray = png_decode_gray(_make_png(rgba, colortype=6, filters=[0, 1, 4]))
    p = rgba.astype(np.float32)
    luma = (299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]) / 1000.0
    assert np.allclose(gray, luma, atol=1e-4)
    ga = rng.integers(0, 256, size=(3, 3, 2), dtype=np.uint8)
    out = png_decode_gray(_make_png(ga, colortype=4, filters=[2, 3, 4]))
    assert np.allclose(out, ga[:, :, 0].astype(np.float32))


def test_png_decoder_rejects_non_png():
    assert png_decode_gray(b"not a png at all") is None
    assert png_meta(b"junk") is None
    # undecodable image payload -> deterministic stub, never a crash
    feat = decode_asset(b"junk", "image", {})
    assert np.allclose(feat, _stub_decode(b"junk")[:FEATURE_DIM])


def test_tiny_images_never_produce_nan(
):
    """ADVICE r4: widths/heights 1-3 used to NaN out — np.array_split
    into 4 bins yields empty chunks whose mean() is NaN, and the stub
    fallback triggers on exceptions only. Tiny dims now nearest-
    upsample before pooling, so every feature is finite and real
    (pixel-derived, not the stub)."""
    for h, w in [(1, 1), (2, 2), (1, 7), (3, 2), (2, 9)]:
        pix = ((np.arange(h * w, dtype=np.int64).reshape(h, w, 1) * 11) % 251).astype(np.uint8)
        png = _make_png(pix, colortype=0, filters=[0] * h)
        feat = decode_asset(png, "image", {})
        assert np.all(np.isfinite(feat)), (h, w, feat)
        # real decode, not the stub fallback
        assert not np.allclose(feat, _stub_decode(png)[:FEATURE_DIM]), (h, w)
    # constant tiny image -> pooled value matches the pixel exactly
    flat = decode_asset(_make_png(np.full((2, 2, 1), 100, np.uint8),
                                  colortype=0, filters=[0, 0]), "image", {})
    assert np.allclose(flat, (100 - 127.5) / 127.5)


def test_pooling_unchanged_for_regular_images():
    """The tiny-dim fix must not perturb >=4x4 pooling (oracle hashes
    for q36/q63 ride on bit-identical features)."""
    from spark_relieffc_fselection_spark.operators.multimodal import _pool_4x4

    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, size=(11, 17)).astype(np.float32)
    rows = np.array_split(gray, 4, axis=0)
    expect = np.array(
        [[c.mean() for c in np.array_split(r, 4, axis=1)] for r in rows],
        dtype=np.float32,
    )
    assert np.array_equal(_pool_4x4(gray), expect)


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
