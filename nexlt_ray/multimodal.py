"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in this
environment) behind `DecodeBackend`: the default `FakeDecodeBackend` is a
deterministic stand-in (content-hash-derived "pixels"), a real deployment
plugs in PIL/torchaudio by subclassing. The Ray-side plumbing — schemas,
actor-pool stages, batch sizing for large binary payloads, output layout —
is real and tested (tests/test_operators.py).

Scale notes: binary payloads dominate block size; stages here run with small
`batch_size` and `batch_format="pyarrow"` (binary columns round-trip
zero-copy through Arrow; pandas would object-box them).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.binary()),          # opaque encoded bytes
        ("media_type", pa.string()),       # "image/png", "audio/wav", ...
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


class DecodeBackend:
    """Interface for real decoders; raise by default."""

    def decode_image(self, payload: bytes) -> np.ndarray:  # (h, w, 3) uint8
        raise NotImplementedError(
            "no image codec available in this environment; plug in a real "
            "backend (PIL/opencv) by subclassing DecodeBackend"
        )

    def decode_audio(self, payload: bytes) -> np.ndarray:  # (n,) float32
        raise NotImplementedError(
            "no audio codec available in this environment; plug in a real "
            "backend (soundfile/torchaudio) by subclassing DecodeBackend"
        )


class FakeDecodeBackend(DecodeBackend):
    """Deterministic fake: 'pixels' are a seeded function of the payload
    hash. Lets the full pipeline (schema, batching, feature extraction,
    output layout) run and be tested without codecs."""

    def decode_image(self, payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)

    def decode_audio(self, payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(1024).astype(np.float32)


class ImageFeatureExtractor:
    """Actor-pool stage: decode + per-channel mean/std features.

    `__init__` constructs the backend once per actor (model-load analog);
    `__call__` is per batch. Use with:
        ds.map_batches(ImageFeatureExtractor, batch_size=64, concurrency=N)
    — small batch_size because payloads are large binaries."""

    def __init__(self, backend: DecodeBackend | None = None):
        self.backend = backend or FakeDecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            img = self.backend.decode_image(payload)
            feats.append(
                np.concatenate(
                    [img.mean(axis=(0, 1)), img.std(axis=(0, 1))]
                ).astype(np.float32)
            )
        return pa.table(
            {
                "item_id": batch["item_id"],
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
                "payload_sha256": pa.array(
                    [
                        hashlib.sha256(p).hexdigest()
                        for p in batch["payload"].to_pylist()
                    ],
                    pa.string(),
                ),
            }
        )


class FrameSampler:
    """Actor-pool stage: sample every `stride`-th 'frame' of a fake video
    payload (deterministic slices of the payload hash stream) — exercises
    the 1->N flat-map output layout for frame extraction."""

    def __init__(self, stride: int = 4, n_frames: int = 8):
        self.stride = stride
        self.n_frames = n_frames
        self.backend = FakeDecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        item_ids, frame_nos, shas = [], [], []
        for iid, payload in zip(
            batch["item_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            for fi in range(0, self.n_frames, self.stride):
                frame = self.backend.decode_image(payload + fi.to_bytes(4, "big"))
                item_ids.append(iid)
                frame_nos.append(fi)
                shas.append(hashlib.sha256(frame.tobytes()).hexdigest())
        return pa.table(
            {
                "item_id": pa.array(item_ids, pa.int64()),
                "frame_no": pa.array(frame_nos, pa.int32()),
                "frame_sha256": pa.array(shas, pa.string()),
            }
        )


def synthetic_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus in IMAGE_SCHEMA shape."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=256, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "item_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image/fake"] * n, pa.string()),
            "width": pa.array(np.full(n, 16, dtype=np.int32)),
            "height": pa.array(np.full(n, 16, dtype=np.int32)),
        }
    )
