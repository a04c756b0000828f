"""Multimodal column plumbing: opaque binary media + typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in
this container): ``decode=`` selects either the deterministic fake
decoder (default, fully tested) or the real-library path which raises
``NotImplementedError`` with the exact dependency needed. Everything
around the kernel — schema, small-batch sizing for fat binary rows,
actor-pool stage shape, output layout — is real and tested; swapping
in PIL/torchaudio later changes only ``_decode_real``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),       # opaque encoded bytes
    ("width", pa.int32()),          # typed metadata riding along
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table matching MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(256, 4096)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(rng.integers(16, 512, n).astype(np.int32)),
        "height": pa.array(rng.integers(16, 512, n).astype(np.int32)),
        "duration_ms": pa.array(rng.integers(0, 60_000, n).astype(np.int32)),
    })


def _decode_real(payload: bytes, kind: str):
    raise NotImplementedError(
        "real decode needs Pillow (image) / soundfile (audio) / pyav "
        "(video), none of which ship in this container — use "
        "decode='fake' or install the dependency and fill this in"
    )


def _decode_fake(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in: 16-byte blake2b of the payload as the
    'decoded' feature seed."""
    d = hashlib.blake2b(payload, digest_size=16).digest()
    return np.frombuffer(d, dtype=np.uint8).astype(np.float64)


class MediaFeatures:
    """Actor-pool stage: decode + fixed-size feature vector per row.

    Batch size should be small for fat binary rows (a 4 MB payload ×
    4096-row default batch = 16 GB per batch — size batches in MB, not
    rows). ``feature_extract`` keeps the decode amortized per actor.
    """

    def __init__(self, decode: str = "fake", feat_dim: int = 16):
        self.decode = _decode_fake if decode == "fake" else _decode_real
        self.feat_dim = feat_dim

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = []
        for payload, kind in zip(t["payload"].to_pylist(),
                                 t["kind"].to_pylist()):
            raw = self.decode(payload, kind)
            f = np.resize(raw, self.feat_dim) / 255.0
            feats.append(f)
        return pa.table({
            "media_id": t["media_id"],
            "kind": t["kind"],
            "feature": pa.array([list(f) for f in feats],
                                pa.list_(pa.float64())),
            "payload_bytes": pa.array(
                [len(p) for p in t["payload"].to_pylist()], pa.int64()),
        })


def media_features(ds: ray.data.Dataset, *, decode: str = "fake",
                   feat_dim: int = 16, batch_size: int = 64,
                   concurrency=(1, 4)) -> ray.data.Dataset:
    """Decode/feature-extract stage: actor pool, small batches (binary
    payloads stay in Arrow end to end; no pandas object columns)."""
    return ds.map_batches(
        MediaFeatures, fn_constructor_kwargs={"decode": decode,
                                              "feat_dim": feat_dim},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample(ds: ray.data.Dataset, *, every_ms: int = 1000,
                 batch_size: int = 64) -> ray.data.Dataset:
    """Video 'frame sampling' plumbing: one output row per sampled
    timestamp with a byte-slice payload (the real frame extraction is
    the stubbed decode; offsets/row-explosion layout is real)."""

    def f(t: pa.Table) -> pa.Table:
        mids, ts, chunks = [], [], []
        for mid, kind, payload, dur in zip(
            t["media_id"].to_pylist(), t["kind"].to_pylist(),
            t["payload"].to_pylist(), t["duration_ms"].to_pylist(),
        ):
            if kind != "video" or not dur:
                continue
            n_frames = max(1, dur // every_ms)
            step = max(1, len(payload) // n_frames)
            for i in range(n_frames):
                mids.append(mid)
                ts.append(i * every_ms)
                chunks.append(payload[i * step:(i + 1) * step])
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "ts_ms": pa.array(ts, pa.int64()),
            "frame": pa.array(chunks, pa.binary()),
        })

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)
