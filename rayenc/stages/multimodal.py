"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are NOT in this container, so the
decode kernels are stubbed two ways (per the brief):
- ``StrictDecoder`` raises NotImplementedError — the production slot
  where a real libjpeg/ffmpeg call goes;
- ``FakeDecoder`` produces a deterministic pseudo-decode from the
  payload bytes, so the Ray-side plumbing — schema, actor-pool
  signature, batch sizing, output layout — is real and TESTED.

Layout convention: payload ``bytes`` column + metadata columns
(media_type, width, height, sample_rate...). Batches stay in
batch_format="pyarrow" (binary round-trips Arrow fine but not pandas —
see ray_guide pitfalls). Batch sizes must be SMALL for large payloads:
size batch_size so batch_bytes x concurrency fits the worker heap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image/png", "audio/wav", ...
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table (binary payloads with metadata).

    duration_s is drawn AFTER the original columns so payloads/types are
    byte-identical to the round-1 fixture (rows-only checks stay stable)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.bytes(int(s)) for s in rng.integers(64, 4096, size=n)]
    w = rng.integers(8, 64, size=n).astype(np.int32)
    h = rng.integers(8, 64, size=n).astype(np.int32)
    types = rng.choice(["image/png", "image/jpeg", "audio/wav"], size=n)
    duration = rng.uniform(1.0, 30.0, size=n).astype(np.float32)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), type=pa.int64()),
            "media_type": pa.array(types.tolist(), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(w, type=pa.int32()),
            "height": pa.array(h, type=pa.int32()),
            "duration_s": pa.array(duration, type=pa.float32()),
        }
    )


class StrictDecoder:
    """Production decode slot: real codec libraries are not available in
    this environment, so calling this raises (clearly-marked stub)."""

    def __init__(self):
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "image/audio decode libraries are not available in this container; "
            "swap in a real decoder (PIL/ffmpeg) or use FakeDecoder for plumbing tests"
        )


class FakeDecoder:
    """Deterministic pseudo-decoder: expands payload bytes into a fake
    fixed-size 'pixel' feature vector via seeded hashing. Exercises the
    exact actor signature / schema a real decoder would have."""

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim

    def decode_one(self, payload: bytes) -> np.ndarray:
        d = hashlib.shake_256(payload).digest(8 * self.feature_dim)
        raw = np.frombuffer(d, dtype=np.uint64)[: self.feature_dim]
        return (raw >> np.uint64(11)).astype(np.float32) / np.float32(2**53)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.vstack(
            [self.decode_one(p) for p in batch["payload"].to_pylist()]
        ) if batch.num_rows else np.empty((0, self.feature_dim), np.float32)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), type=pa.float32()), self.feature_dim
                ),
                "payload_bytes": pa.array(
                    [len(p) for p in batch["payload"].to_pylist()], type=pa.int64()
                ),
            }
        )


class FakeResizer:
    """Deterministic 'resize': rescales the fake feature vector — stands
    in for an image resize stage (same actor/batch shape)."""

    def __init__(self, out_dim: int = 8):
        self.out_dim = out_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["features"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        dim = col.type.list_size
        mat = np.asarray(col.values.to_numpy(zero_copy_only=False)).reshape(-1, dim)
        factor = dim // self.out_dim
        small = mat[:, : factor * self.out_dim].reshape(-1, self.out_dim, factor).mean(axis=2)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(small.astype(np.float32).reshape(-1), type=pa.float32()),
                    self.out_dim,
                ),
            }
        )


class FakeFrameSampler:
    """Video frame sampling: ONE media row -> n_frames frame rows — the
    explode (flat-map) shape a real ffmpeg frame sampler has. Frames are
    sampled at evenly spaced timestamps over duration_s; each frame's
    feature vector derives deterministically from (payload, frame_idx).
    Swap the per-frame hash for an actual seek+decode when ffmpeg
    exists; the Ray-side plumbing (schema, expansion factor, batch
    sizing) is real and tested."""

    def __init__(self, n_frames: int = 4, feature_dim: int = 16):
        self.n_frames = n_frames
        self.feature_dim = feature_dim

    def _frame_features(self, payload: bytes, idx: int) -> np.ndarray:
        d = hashlib.shake_256(payload + idx.to_bytes(4, "little")).digest(
            8 * self.feature_dim
        )
        raw = np.frombuffer(d, dtype=np.uint64)[: self.feature_dim]
        return (raw >> np.uint64(11)).astype(np.float32) / np.float32(2**53)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        fidx: list[int] = []
        ts: list[float] = []
        feats: list[np.ndarray] = []
        durations = (
            batch["duration_s"].to_pylist()
            if "duration_s" in batch.column_names
            else [float(self.n_frames)] * batch.num_rows
        )
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist(), durations
        ):
            for i in range(self.n_frames):
                ids.append(mid)
                fidx.append(i)
                ts.append(round((i + 0.5) * float(dur or 0.0) / self.n_frames, 4))
                feats.append(self._frame_features(payload, i))
        mat = (
            np.vstack(feats)
            if feats
            else np.empty((0, self.feature_dim), np.float32)
        )
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(fidx, type=pa.int64()),
                "ts_s": pa.array(ts, type=pa.float64()),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), type=pa.float32()), self.feature_dim
                ),
            }
        )


def decode_pipeline(
    ds: "ray.data.Dataset",
    decoder=FakeDecoder,
    batch_size: int = 64,  # small: payloads are large binaries
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    """Actor-pool decode stage with multimodal-appropriate batch sizing."""
    return ds.map_batches(
        decoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
