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
    harness for the multimodal path (no external data)."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i, t in zip(ids, texts):
        payload = (t or "").encode("utf-8")
        rows["media_id"].append(i)
        rows["kind"].append("image")
        rows["payload"].append(payload)
        rows["width"].append(8 + (zlib.crc32(payload) % 8))
        rows["height"].append(8)
        rows["sample_rate"].append(0)
        rows["n_frames"].append(1)
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
            raise NotImplementedError("real image decode requires PIL/libjpeg — not shipped in this sandbox")
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


class FrameSampler:
    """Video frame-sample stub: picks every ``stride``-th frame index without
    decoding. Real frame extraction would live behind the same signature."""

    def __init__(self, stride: int = 10):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_frames = batch.column("n_frames").to_pylist()
        sampled = [list(range(0, int(n), self.stride)) for n in n_frames]
        return batch.append_column("sampled_frames", pa.array(sampled, type=pa.list_(pa.int64())))


def decode_stats(media_ds, concurrency: int = 2, batch_size: int = 64):
    """media table -> per-item decode feature summary (the shape a real
    feature-extraction stage would have)."""
    return media_ds.map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=batch_size, concurrency=(1, concurrency)
    ).sort("media_id")
