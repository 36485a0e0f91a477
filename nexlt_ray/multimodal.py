"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

Decoding: `StdlibDecodeBackend` (the default) REALLY decodes PNG and PPM
images and PCM WAV audio using only the stdlib (zlib, wave, struct) +
numpy, implemented from the public format specs (PNG: RFC 2083 — IHDR/
IDAT/IEND chunks, all five scanline filters; WAV: RIFF PCM). No codec
*libraries* ship in this environment, but these formats don't need one.
Video remains stubbed (`FakeDecodeBackend` — a deterministic stand-in; no
video codec is implementable from stdlib), and a real deployment can plug
PIL/torchaudio/ffmpeg by subclassing `DecodeBackend`. The Ray-side
plumbing — schemas, actor-pool stages, batch sizing for large binary
payloads, output layout — is real and tested (tests/test_operators.py).

Scale notes: binary payloads dominate block size; stages here run with small
`batch_size` and `batch_format="pyarrow"` (binary columns round-trip
zero-copy through Arrow; pandas would object-box them).
"""

from __future__ import annotations

import hashlib
import io
import struct
import zlib

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
            "subclass provides the codec: StdlibDecodeBackend covers "
            "PNG/PPM; JPEG etc. need a library backend (PIL/opencv)"
        )

    def decode_audio(self, payload: bytes) -> np.ndarray:  # (n,) float32
        raise NotImplementedError(
            "subclass provides the codec: StdlibDecodeBackend covers PCM "
            "WAV; MP3/FLAC etc. need a library backend (soundfile)"
        )


def _unfilter_scanlines(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """PNG scanline de-filtering (RFC 2083 §6). Filters None/Sub/Up are
    vectorized (Sub is a per-lane modular cumsum — addition mod 256 is
    associative, so cumsum in a wide dtype & 0xFF is exact); Average/Paeth
    have a true per-pixel recurrence and fall back to a byte loop."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).copy()
        pos += stride + 1
        if f == 0:
            pass
        elif f == 1:  # Sub
            for lane in range(ch):
                row[lane::ch] = (
                    np.cumsum(row[lane::ch], dtype=np.uint64) & 0xFF
                ).astype(np.uint8)
        elif f == 2:  # Up
            row = (row.astype(np.uint16) + prev) .astype(np.uint8)
        elif f == 3:  # Average
            r = row.astype(np.int32)
            for x in range(stride):
                a = int(r[x - ch]) if x >= ch else 0
                r[x] = (r[x] + ((a + int(prev[x])) >> 1)) & 0xFF
            row = r.astype(np.uint8)
        elif f == 4:  # Paeth
            r = row.astype(np.int32)
            for x in range(stride):
                a = int(r[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                r[x] = (r[x] + pred) & 0xFF
            row = r.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = row
        prev = out[y]
    return out


class StdlibDecodeBackend(DecodeBackend):
    """Real decoders from the public specs, stdlib-only (zlib/wave/struct):
    PNG (8-bit gray/RGB/RGBA, non-interlaced, all five filters), PPM P6,
    and PCM WAV (8/16/32-bit, any channel count, averaged to mono)."""

    def decode_image(self, payload: bytes) -> np.ndarray:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return self._decode_png(payload)
        if payload[:2] == b"P6":
            return self._decode_ppm(payload)
        raise ValueError("unsupported image format (expect PNG or PPM P6)")

    @staticmethod
    def _decode_png(data: bytes) -> np.ndarray:
        pos, idat = 8, b""
        w = h = depth = color = interlace = None
        while pos + 8 <= len(data):
            (ln,), typ = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
            pos += 8
            chunk = data[pos : pos + ln]
            pos += ln + 4  # skip CRC (payloads here are trusted/own-encoded)
            if typ == b"IHDR":
                w, h, depth, color, _, _, interlace = struct.unpack(
                    ">IIBBBBB", chunk
                )
            elif typ == b"IDAT":
                idat += chunk
            elif typ == b"IEND":
                break
        if depth != 8 or interlace != 0 or color not in (0, 2, 6):
            raise ValueError(
                f"unsupported PNG variant (depth={depth}, color={color}, "
                f"interlace={interlace}); this decoder covers 8-bit "
                "gray/RGB/RGBA non-interlaced"
            )
        ch = {0: 1, 2: 3, 6: 4}[color]
        px = _unfilter_scanlines(zlib.decompress(idat), w, h, ch).reshape(h, w, ch)
        if ch == 1:
            return np.repeat(px, 3, axis=2)
        return px[:, :, :3]  # RGBA: alpha dropped, (h, w, 3) contract

    @staticmethod
    def _decode_ppm(data: bytes) -> np.ndarray:
        # P6 <w> <h> <maxval>\n then raw RGB; '#' comments allowed
        toks: list[bytes] = []
        i = 2
        while len(toks) < 3:
            while i < len(data) and data[i : i + 1].isspace():
                i += 1
            if data[i : i + 1] == b"#":
                while data[i : i + 1] not in (b"\n", b""):
                    i += 1
                continue
            j = i
            while j < len(data) and not data[j : j + 1].isspace():
                j += 1
            toks.append(data[i:j])
            i = j
        i += 1  # single whitespace after maxval
        w, h, maxval = (int(t) for t in toks)
        if maxval != 255:
            raise ValueError("PPM maxval != 255 unsupported")
        return np.frombuffer(data, np.uint8, w * h * 3, i).reshape(h, w, 3).copy()

    def decode_audio(self, payload: bytes) -> np.ndarray:
        import wave

        with wave.open(io.BytesIO(payload)) as wv:
            ch, sw, n = wv.getnchannels(), wv.getsampwidth(), wv.getnframes()
            raw = wv.readframes(n)
        if sw == 2:
            a = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        elif sw == 4:
            a = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
        elif sw == 1:
            a = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported WAV sample width {sw}")
        return a.reshape(-1, ch).mean(axis=1).astype(np.float32)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (own-output test/corpus generation): 8-bit
    gray (h,w) / RGB (h,w,3) / RGBA (h,w,4), one filter type for all rows
    (any of 0-4 — exercising every decoder filter path)."""
    if img.ndim == 2:
        color, ch = 0, 1
        px = img[:, :, None]
    elif img.shape[2] == 3:
        color, ch = 2, 3
        px = img
    else:
        color, ch = 6, 4
        px = img
    h, w = px.shape[:2]
    flat = px.reshape(h, w * ch).astype(np.int32)
    prev = np.zeros(w * ch, dtype=np.int32)
    lines = []
    for y in range(h):
        row = flat[y]
        left = np.concatenate([np.zeros(ch, np.int32), row[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
        if filter_type == 0:
            enc = row
        elif filter_type == 1:
            enc = row - left
        elif filter_type == 2:
            enc = row - prev
        elif filter_type == 3:
            enc = row - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - upleft
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, upleft)
            )
            enc = row - pred
        lines.append(bytes([filter_type]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = row

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Minimal mono 16-bit PCM WAV encoder (stdlib wave)."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(
            np.clip(np.asarray(samples) * 32767.0, -32768, 32767)
            .astype("<i2")
            .tobytes()
        )
    return buf.getvalue()


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
        self.backend = backend or StdlibDecodeBackend()

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


class AudioFeatureExtractor:
    """Actor-pool stage: WAV decode + duration/RMS/peak features."""

    def __init__(self, backend: DecodeBackend | None = None):
        self.backend = backend or StdlibDecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_s, rms, peak = [], [], []
        for payload in batch["payload"].to_pylist():
            a = self.backend.decode_audio(payload)
            n_s.append(a.size)
            rms.append(float(np.sqrt(np.mean(a.astype(np.float64) ** 2))))
            peak.append(float(np.abs(a).max(initial=0.0)))
        return pa.table(
            {
                "item_id": batch["item_id"],
                "n_samples": pa.array(n_s, pa.int64()),
                "rms": pa.array(rms, pa.float64()),
                "peak": pa.array(peak, pa.float64()),
            }
        )


def synthetic_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media corpus in IMAGE_SCHEMA shape: REAL 16x16 PNG
    payloads (filter type rotates over 0-4 so the pipeline exercises every
    decoder filter path)."""
    rng = np.random.default_rng(seed)
    payloads = [
        encode_png(
            rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8),
            filter_type=i % 5,
        )
        for i in range(n)
    ]
    return pa.table(
        {
            "item_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image/png"] * n, pa.string()),
            "width": pa.array(np.full(n, 16, dtype=np.int32)),
            "height": pa.array(np.full(n, 16, dtype=np.int32)),
        }
    )


def synthetic_audio_table(n: int, seed: int = 7) -> pa.Table:
    """Deterministic audio corpus: REAL mono 16-bit PCM WAV payloads
    (seeded sine + noise mixtures, 1024 samples)."""
    rng = np.random.default_rng(seed)
    t = np.arange(1024) / 16000.0
    payloads = []
    for _ in range(n):
        f = float(rng.uniform(100, 2000))
        amp = float(rng.uniform(0.1, 0.9))
        sig = amp * np.sin(2 * np.pi * f * t) + 0.01 * rng.standard_normal(t.size)
        payloads.append(encode_wav(sig))
    return pa.table(
        {
            "item_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["audio/wav"] * n, pa.string()),
            "width": pa.array(np.zeros(n, dtype=np.int32)),
            "height": pa.array(np.zeros(n, dtype=np.int32)),
        }
    )
