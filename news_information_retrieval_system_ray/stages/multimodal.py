"""Multimodal (image/audio/video) stage plumbing.

Media travel as opaque ``binary`` columns with typed metadata columns —
never decoded on the driver.  Decode / feature-extraction run as
actor-pool ``map_batches`` stages with SMALL batch sizes (a batch ×
concurrency of multi-MB payloads must fit a worker heap; SURVEY
'Memory-aware').

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container,
so the codec boundary is stubbed: ``decoder="fake"`` produces a
deterministic fake decode (seeded by content hash) so the Ray-side
plumbing — schema, batch sizing, actor signature, output layout — is
real and tested; ``decoder="pil"`` raises NotImplementedError unless
the library imports.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),          # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),             # typed metadata (0 when unknown)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features seeded from the
    content hash, so tests are stable and dedup-by-feature is exercised."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(out_dim).astype(np.float32)


class MediaFeatureStage:
    """payload binary -> fixed-dim feature vector (actor pool stage).

    Real deployments pass ``decoder="pil"`` (images) etc.; the decoder
    object is constructed once per actor.  Use batch_size<=64 for
    multi-MB payloads.
    """

    def __init__(self, out_dim: int = 64, decoder: str = "fake", payload_col: str = "payload"):
        self.out_dim = out_dim
        self.payload_col = payload_col
        self.decoder = decoder
        if decoder == "pil":
            try:
                from PIL import Image  # noqa: F401
                self._pil = Image
            except ImportError as e:  # pragma: no cover - lib absent here
                raise NotImplementedError(
                    "PIL not available in this environment; use decoder='fake' "
                    "for plumbing tests") from e
        elif decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            _fake_decode(p, self.out_dim)
            for p in batch.column(self.payload_col).to_pylist()
        ]
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
        })


class ImageResizeStage:
    """Stubbed resize: passes metadata through with the target size applied.

    The real stage would decode -> resize -> re-encode per row inside the
    actor; shape of inputs/outputs (and the small-batch requirement) is
    identical, so pipeline wiring is fully testable without codecs.
    """

    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = batch.drop_columns([c for c in ("width", "height") if c in batch.column_names])
        out = out.append_column("width", pa.array([self.width] * n, pa.int32()))
        out = out.append_column("height", pa.array([self.height] * n, pa.int32()))
        return out


class FrameSampleStage:
    """Video payload -> every-Nth-frame rows (flat_map shape: one input
    row explodes to ``n_frames`` output rows with frame_idx + per-frame
    feature).  Decode is stubbed like MediaFeatureStage (ffmpeg absent);
    frame count derives from duration_ms at a nominal fps, features are
    content-hash-seeded per (payload, frame_idx) — deterministic.
    """

    def __init__(self, every_n: int = 10, fps: float = 25.0, out_dim: int = 16,
                 max_frames: int = 32):
        self.every_n = every_n
        self.fps = fps
        self.out_dim = out_dim
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, feats = [], [], []
        payloads = batch.column("payload").to_pylist()
        durations = batch.column("duration_ms").to_pylist()
        media_ids = batch.column("media_id").to_pylist()
        for mid, payload, dur in zip(media_ids, payloads, durations):
            n_frames = max(1, int((dur or 0) / 1000.0 * self.fps))
            sampled = range(0, min(n_frames, self.max_frames * self.every_n), self.every_n)
            for fi in sampled:
                ids.append(mid)
                idxs.append(fi)
                feats.append(_fake_decode((payload or b"") + fi.to_bytes(4, "big"),
                                          self.out_dim).tolist())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "feature": pa.array(feats, pa.list_(pa.float32())),
        })


def make_fake_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.bytes(256) for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(["image"] * n),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["image/fake"] * n),
        "width": pa.array([640] * n, pa.int32()),
        "height": pa.array([480] * n, pa.int32()),
        "duration_ms": pa.array([0] * n, pa.int32()),
    })
