"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (north-star family, BASELINE.json).

Decode is REAL where a codec exists — stdlib ``wave`` handles PCM WAV
audio everywhere, Pillow (images) and libsndfile (other audio) are
used when installed — and falls back to a deterministic sha256-derived
stub for absent codecs / undecodable bytes / video (clearly marked in
``decode_asset``). Everything Spark-side is real and tested either
way: the schema contract, the Arrow batch shape through
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


try:  # optional codec: Pillow for images
    from PIL import Image as _PILImage

    _HAS_PIL = True
except ImportError:
    _PILImage = None
    _HAS_PIL = False

try:  # optional codec: libsndfile for non-WAV audio
    import soundfile as _soundfile

    _HAS_SOUNDFILE = True
except ImportError:
    _soundfile = None
    _HAS_SOUNDFILE = False


def _stub_decode(content: bytes) -> np.ndarray:
    """Deterministic fallback 'signal' from the sha256 of the bytes —
    used when no codec can handle the payload (absent library OR
    undecodable bytes). Keeps every downstream dataflow runnable and
    bit-reproducible in codec-less environments like this container."""
    digest = hashlib.sha256(content).digest()
    arr = np.frombuffer(digest * 8, dtype=np.uint8)[: FEATURE_DIM * 4]
    return (arr.astype(np.float32) - 127.5) / 127.5


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_meta(content: bytes) -> tuple[int, int] | None:
    """(width, height) from a PNG IHDR, or None if not a PNG."""
    import struct

    if not content.startswith(_PNG_SIG) or len(content) < 24:
        return None
    if content[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", content[16:24])
    return w, h


def png_decode_gray(content: bytes) -> np.ndarray | None:
    """Minimal pure-stdlib PNG decoder -> float32 grayscale HxW array.

    Supports bit depth 8, color types 0 (gray) / 2 (RGB) / 4 (gray+
    alpha) / 6 (RGBA), no interlace — the overwhelmingly common PNG
    shapes. Returns None for anything else (caller falls back).
    RGB -> luma via ITU-R 601 (299/587/114), alpha ignored.

    This is the PRIMARY png codec even when Pillow is installed: a
    stdlib decode is bit-identical across codec-equipped and
    codec-less deployments, which keeps multimodal features
    reproducible wherever the pipeline runs. Filters 0/1/2 (none/
    sub/up — what encoders emit for synthetic and screenshot-like
    content) are vectorized; 3/4 (average/Paeth) fall back to per-
    pixel loops, fine for thumbnail-scale assets.
    """
    import struct
    import zlib

    if not content.startswith(_PNG_SIG):
        return None
    pos, width, interlace, idat = 8, None, 0, bytearray()
    bitdepth = colortype = height = None
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(colortype)
    if width is None or bitdepth != 8 or interlace != 0 or channels is None:
        return None
    if width == 0 or height == 0:  # degenerate: pooling would yield NaNs
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride, bpp = width * channels, channels
    if len(raw) < height * (stride + 1):
        return None
    out = np.empty((height, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    p = 0
    for y in range(height):
        f = raw[p]
        line = np.frombuffer(raw, np.uint8, stride, p + 1).astype(np.int64)
        p += stride + 1
        if f == 0:
            cur = line
        elif f == 1:  # Sub: per-channel cumulative sum mod 256
            cur = line.reshape(width, bpp).cumsum(axis=0).reshape(stride) & 255
        elif f == 2:  # Up
            cur = (line + prev) & 255
        elif f == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 255
        elif f == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pr) & 255
        else:
            return None
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(height, width, channels).astype(np.float32)
    if colortype in (0, 4):  # gray / gray+alpha
        return px[:, :, 0]
    return (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) / 1000.0


def _pool_4x4(gray: np.ndarray) -> np.ndarray:
    """Box-mean a HxW grayscale array down to 4x4 (deterministic,
    codec-independent — unlike resampling-filter resizes).

    Dimensions below 4 are nearest-index upsampled to 4 first so no
    pooling bin is ever empty: ``np.array_split`` on a 2-row array
    would yield empty chunks whose mean() is NaN, and those NaNs used
    to flow silently into downstream features (ADVICE r4). For
    height/width >= 4 the bin boundaries are unchanged, keeping
    features bit-identical to prior rounds.
    """
    h, w = gray.shape
    if h < 4:
        gray = gray[(np.arange(4) * h) // 4]
    if w < 4:
        gray = gray[:, (np.arange(4) * w) // 4]
    rows = np.array_split(gray, 4, axis=0)
    return np.array(
        [[c.mean() for c in np.array_split(r, 4, axis=1)] for r in rows],
        dtype=np.float32,
    )


def _decode_image(content: bytes) -> np.ndarray:
    """Real image decode: stdlib PNG codec first (always available,
    bit-identical everywhere), Pillow for other formats when
    installed. Grayscale -> 4x4 box-pooled thumbnail -> [-1, 1]."""
    import io

    gray = png_decode_gray(content)
    if gray is None:
        if not _HAS_PIL:
            raise ValueError("undecodable image payload without Pillow")
        with _PILImage.open(io.BytesIO(content)) as im:
            gray = np.asarray(im.convert("L"), dtype=np.float32)
    px = _pool_4x4(gray).reshape(-1)[:FEATURE_DIM]
    return (px - 127.5) / 127.5


def _decode_audio(content: bytes) -> np.ndarray:
    """Real audio decode: stdlib ``wave`` for PCM WAV (always
    available), soundfile for other formats when installed. Samples are
    mean-pooled into FEATURE_DIM equal bins, normalized to [-1, 1]."""
    import io
    import wave as _wave

    try:
        with _wave.open(io.BytesIO(content)) as w:
            n = w.getnframes()
            raw = w.readframes(n)
            width = w.getsampwidth()
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
        samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
        if width == 1:
            samples -= 128.0
        scale = float(2 ** (8 * width - 1))
    except Exception:
        if not _HAS_SOUNDFILE:
            raise
        samples, _sr = _soundfile.read(io.BytesIO(content), dtype="float64")
        samples = np.atleast_2d(samples.T)[0]
        scale = 1.0
    if samples.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    bins = np.array_split(samples, FEATURE_DIM)
    pooled = np.array([b.mean() if b.size else 0.0 for b in bins])
    return (pooled / scale).astype(np.float32)


def decode_asset(content: bytes, modality: str, meta: dict) -> np.ndarray:
    """Decode one asset to a FEATURE_DIM float32 signal.

    REAL decode wherever a codec exists — stdlib ``wave`` for PCM WAV
    audio and the stdlib PNG codec for images (both always available),
    Pillow for other image formats and libsndfile for other audio
    when installed — with the deterministic sha256 stub as the fallback
    for absent codecs, undecodable bytes, and video (ffmpeg/av is never
    assumed). The fallback is what keeps the synthetic oracle-gated
    corpora (random bytes, valid in no codec) deterministic across
    codec-equipped and codec-less deployments.
    """
    try:
        if modality == "image":
            out = _decode_image(content)
        elif modality == "audio":
            out = _decode_audio(content)
        else:
            out = _stub_decode(content)
    except Exception:
        out = _stub_decode(content)
    if not np.all(np.isfinite(out)):
        # A codec that "succeeded" but produced NaN/inf (e.g. a
        # degenerate decode) must not poison downstream features.
        out = _stub_decode(content)
    if out.size < FEATURE_DIM:
        out = np.pad(out, (0, FEATURE_DIM - out.size))
    return out[:FEATURE_DIM].astype(np.float32)


def probe_asset_meta(content: bytes, modality: str) -> dict:
    """Extract REAL metadata (width/height, sample_rate/duration) from
    the encoded bytes when a codec can read them; all-None otherwise.
    The declared `meta` column is the ingest contract — this probe is
    the verification side (mismatch = corrupt or mislabeled asset)."""
    import io
    import wave as _wave

    out = {"width": None, "height": None, "sample_rate": None, "duration_s": None}
    try:
        if modality == "image":
            wh = png_meta(content)
            if wh is not None:
                out["width"], out["height"] = wh
            elif _HAS_PIL:
                with _PILImage.open(io.BytesIO(content)) as im:
                    out["width"], out["height"] = im.size
        elif modality == "audio":
            with _wave.open(io.BytesIO(content)) as w:
                out["sample_rate"] = w.getframerate()
                out["duration_s"] = w.getnframes() / float(w.getframerate() or 1)
    except Exception:
        pass
    return out


def probe_assets(assets: DataFrame) -> DataFrame:
    """Codec-verified metadata per asset (Arrow-batched): real
    width/height/sample_rate/duration where decodable, nulls where not.
    Join against the declared `meta` struct to flag corrupt rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probes = [
                probe_asset_meta(bytes(c), m)
                for c, m in zip(pdf["content"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "decoded_width": [p["width"] for p in probes],
                    "decoded_height": [p["height"] for p in probes],
                    "decoded_sample_rate": [p["sample_rate"] for p in probes],
                    "decoded_duration_s": [p["duration_s"] for p in probes],
                }
            )

    return assets.mapInPandas(
        run,
        schema="asset_id bigint, modality string, decoded_width int, "
        "decoded_height int, decoded_sample_rate int, decoded_duration_s double",
    )


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
