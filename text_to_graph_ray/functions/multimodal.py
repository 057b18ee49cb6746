"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The sandbox ships no image/audio codecs, so the decode kernels are STUBBED —
``DecodeImage(fake=True)`` produces deterministic pseudo-pixels from a crc of
the payload (shape/layout real, values fake), and ``fake=False`` raises
``NotImplementedError`` where a real decoder (PIL/ffmpeg) would plug in. The
Ray-side contract — schema, batch sizing for large binaries, actor signature,
output layout — is real and tested.

Scale note: binary payloads dominate block size; callers should use small
``batch_size`` (e.g. 64) and let ``DataContext.target_max_block_size`` bound
blocks rather than holding whole partitions in worker heaps.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

try:  # real image codec when the environment ships one; stubs otherwise
    from PIL import Image as _PILImage  # noqa: N812
except ImportError:
    _PILImage = None


def _pil_decode(payload: bytes) -> np.ndarray:
    """Decode encoded image bytes to (H, W, 3) float32 via PIL."""
    import io

    img = _PILImage.open(io.BytesIO(payload)).convert("RGB")
    return np.asarray(img, dtype=np.float32)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # "image" | "audio" | "video"
        ("payload", pa.binary()),     # opaque encoded bytes
        ("width", pa.int64()),        # typed metadata (0 when unknown)
        ("height", pa.int64()),
        ("sample_rate", pa.int64()),
        ("n_frames", pa.int64()),
    ]
)


def media_table_from_documents(batch: pa.Table, id_col="doc_id", text_col="text") -> pa.Table:
    """Deterministic fake media rows derived from a text table — test/bench
    harness for the multimodal path (no external data). Kinds cycle
    image/audio/video by id so every decode branch is exercised."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i, t in zip(ids, texts):
        payload = (t or "").encode("utf-8")
        crc = zlib.crc32(payload)
        kind = ("image", "audio", "video")[i % 3]
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["width"].append(8 + (crc % 8) if kind != "audio" else 0)
        rows["height"].append(8 if kind != "audio" else 0)
        rows["sample_rate"].append(8000 + (crc % 4) * 4000 if kind == "audio" else 0)
        rows["n_frames"].append(1 if kind == "image" else (10 + crc % 20 if kind == "video" else 0))
    return pa.table({f.name: pa.array(rows[f.name], type=f.type) for f in MEDIA_SCHEMA})


class DecodeImage:
    """Actor-pool decode stage: payload -> float32 feature summary.

    Real decoder unavailable in this environment; ``fake=True`` (default)
    synthesizes deterministic pseudo-pixels seeded by crc32(payload) so the
    downstream plumbing (shapes, reductions, schema) is exercised end-to-end.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _decode(self, payload: bytes, w: int, h: int) -> np.ndarray:
        if not self.fake:
            if _PILImage is not None:
                return _pil_decode(payload)
            raise NotImplementedError("real image decode requires PIL/libjpeg — not available in this environment")
        seed = zlib.crc32(payload or b"")
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, size=(h, max(w, 1), 3)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        ws = batch.column("width").to_pylist()
        hs = batch.column("height").to_pylist()
        means, stds = [], []
        for p, w, h in zip(payloads, ws, hs):
            img = self._decode(p, int(w), int(h))
            means.append(round(float(img.mean()), 4))
            stds.append(round(float(img.std()), 4))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "width": batch.column("width"),
                "height": batch.column("height"),
                "pixel_mean": pa.array(means, type=pa.float64()),
                "pixel_std": pa.array(stds, type=pa.float64()),
            }
        )


class ResizeImage:
    """Actor-pool resize stage: decode (fake) pixels -> nearest-neighbor
    resample to (target_w, target_h) -> per-item stats. The resample math is
    real (index mapping is exactly what a nearest-neighbor kernel does); only
    the pixel source is the deterministic fake decoder. Non-image rows pass
    through unresized with null stats."""

    def __init__(self, target_w: int = 4, target_h: int = 4, fake: bool = True):
        self.tw, self.th = target_w, target_h
        self.decoder = DecodeImage(fake=fake)

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[0], img.shape[1]
        rows = (np.arange(self.th) * h // self.th).astype(np.int64)
        cols = (np.arange(self.tw) * w // self.tw).astype(np.int64)
        return img[rows][:, cols]

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, out_w, out_h = [], [], []
        for kind, p, w, h in zip(
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
        ):
            if kind != "image":
                means.append(None)
                out_w.append(int(w))
                out_h.append(int(h))
                continue
            small = self._resize(self.decoder._decode(p, int(w), int(h)))
            means.append(round(float(small.mean()), 4))
            out_w.append(self.tw)
            out_h.append(self.th)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "out_w": pa.array(out_w, type=pa.int64()),
                "out_h": pa.array(out_h, type=pa.int64()),
                "resized_mean": pa.array(means, type=pa.float64()),
            }
        )


class FrameSampler:
    """Video frame-sample stub: picks every ``stride``-th frame index without
    decoding. Real frame extraction would live behind the same signature."""

    def __init__(self, stride: int = 10):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_frames = batch.column("n_frames").to_pylist()
        sampled = [list(range(0, int(n), self.stride)) for n in n_frames]
        return batch.append_column("sampled_frames", pa.array(sampled, type=pa.list_(pa.int64())))


class DecodeMedia:
    """Actor-pool multi-kind decode stage: image -> pseudo-pixels, audio ->
    pseudo-waveform, video -> frame-sampled pseudo-pixels — all crc-seeded
    deterministic fakes behind the same signature a PIL/soundfile/ffmpeg
    decoder would have (``fake=False`` raises where the real codec plugs in).
    Emits one uniform (media_id, kind, ..., feat_mean, feat_std) row per item.
    """

    def __init__(self, fake: bool = True, video_stride: int = 5, max_frames: int = 4):
        self.fake = fake
        self.video_stride = video_stride
        self.max_frames = max_frames

    def _decode_one(self, kind: str, payload: bytes, w: int, h: int, sr: int, nf: int) -> np.ndarray:
        if not self.fake:
            if kind == "image" and _PILImage is not None:
                return _pil_decode(payload)
            raise NotImplementedError(
                "real media decode requires PIL (images) / soundfile / ffmpeg — not available in this environment"
            )
        crc = zlib.crc32(payload or b"")
        if kind == "audio":
            n = max(sr // 100, 1)
            return np.random.RandomState(crc).standard_normal(n).astype(np.float32)
        if kind == "video":
            frames = list(range(0, max(int(nf), 1), self.video_stride))[: self.max_frames]
            stack = [
                np.random.RandomState((crc + fi) & 0xFFFFFFFF)
                .randint(0, 256, size=(h, max(w, 1), 3))
                .astype(np.float32)
                for fi in frames
            ]
            return np.stack(stack)
        return np.random.RandomState(crc).randint(0, 256, size=(h, max(w, 1), 3)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, stds = [], []
        for kind, p, w, h, sr, nf in zip(
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
            batch.column("sample_rate").to_pylist(),
            batch.column("n_frames").to_pylist(),
        ):
            arr = self._decode_one(kind, p, int(w), int(h), int(sr), int(nf))
            means.append(round(float(arr.mean()), 4))
            stds.append(round(float(arr.std()), 4))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "width": batch.column("width"),
                "height": batch.column("height"),
                "sample_rate": batch.column("sample_rate"),
                "n_frames": batch.column("n_frames"),
                "feat_mean": pa.array(means, type=pa.float64()),
                "feat_std": pa.array(stds, type=pa.float64()),
            }
        )


def decode_stats(media_ds, concurrency: int = 2, batch_size: int = 64):
    """media table -> per-item decode feature summary across all three kinds
    (the shape a real feature-extraction stage would have)."""
    return media_ds.map_batches(
        DecodeMedia, batch_format="pyarrow", batch_size=batch_size, concurrency=(1, concurrency)
    ).sort("media_id")


FEATURE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("f00", pa.float64()),
        ("f01", pa.float64()),
        ("f10", pa.float64()),
        ("f11", pa.float64()),
        ("fstd", pa.float64()),
    ]
)


class ExtractImageFeatures:
    """Actor-pool feature-extraction stage: image rows -> a fixed pooled
    feature vector (2x2 quadrant means + global std, the spatial-pyramid
    pooling a pre-training filter would feed a classifier). The pooling math
    is real; only the pixel source is the deterministic fake decoder (real
    decode via PIL when available, same dual path as DecodeImage). Non-image
    rows are dropped (this stage consumes the image partition of the media
    stream). Flat float columns, not a list column, so the driver's
    value-hash comparison sees plain scalars."""

    def __init__(self, fake: bool = True):
        self.decoder = DecodeImage(fake=fake)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {f.name: [] for f in FEATURE_SCHEMA}
        for mid, kind, p, w, h in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
        ):
            if kind != "image":
                continue
            img = self.decoder._decode(p, int(w), int(h))
            hh, ww = img.shape[0] // 2, img.shape[1] // 2
            rows["media_id"].append(int(mid))
            rows["f00"].append(round(float(img[:hh, :ww].mean()), 4))
            rows["f01"].append(round(float(img[:hh, ww:].mean()), 4))
            rows["f10"].append(round(float(img[hh:, :ww].mean()), 4))
            rows["f11"].append(round(float(img[hh:, ww:].mean()), 4))
            rows["fstd"].append(round(float(img.std()), 4))
        return pa.table({f.name: pa.array(rows[f.name], type=f.type) for f in FEATURE_SCHEMA})
