"""Baseline JPEG codec (ITU-T T.81, public spec), stdlib + numpy only.

Decoder: baseline sequential DCT (SOF0), 8-bit samples, 1 or 3
components, any sampling factors up to 4, restart intervals, byte
stuffing — the profile every camera/web "jpg" uses. Markers handled:
SOI/EOI, APPn/COM (skipped), DQT (8- and 16-bit tables), SOF0 (SOF1
accepted — same entropy coding), DHT, DRI, SOS, RSTn. Progressive
(SOF2) and arithmetic coding raise a clear error.

Encoder: baseline 4:4:4 or 4:2:0, Annex K quantization tables scaled by
the IJG quality formula, Annex K standard Huffman tables, optional
restart interval — used by tests to produce real JPEG streams in an
environment with no image libraries (the decoder reads the DQT/DHT
tables from the stream, so decode correctness never assumes the
encoder's table choice).

Pieces with an independent mathematical definition are tested against
brute-force references (tests/test_jpeg.py): the matrix IDCT vs the
T.81 A.3.3 quadruple-loop formula, zigzag vs a hand walk, Huffman
canonical codes vs the T.81 C.2 code-length expansion, encode->decode
round-trips with PSNR bounds, and a hand-built single-block stream
decoded to exactly predictable pixels.

Speed notes: the DCT/color/upsample math is vectorized numpy over whole
planes; the entropy (Huffman) loop is per-symbol Python, which is the
right trade for an actor-pool decode stage whose per-payload work is
bounded (the reference deployment plugs libjpeg-turbo via a
DecodeBackend subclass for bulk decode; this implementation is the
spec-true fallback and the test oracle).

Reference seam in the NeXLT blueprint: schema.xml declares binary
(base64) field types (SURVEY §1.2); image payloads ride the same opaque
binary-column contract (multimodal.IMAGE_SCHEMA).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# shared constants
# --------------------------------------------------------------------------

# zigzag: ZZ_RASTER[k] = raster index (r*8+c) of the k-th zigzag coefficient
# (T.81 Figure 5). Generated, not transcribed: antidiagonal walk, even
# diagonals bottom-up, odd top-down.
def _zigzag_raster() -> np.ndarray:
    out = []
    for s in range(15):
        rs = (
            range(min(s, 7), max(0, s - 7) - 1, -1)
            if s % 2 == 0
            else range(max(0, s - 7), min(s, 7) + 1)
        )
        for r in rs:
            out.append(r * 8 + (s - r))
    return np.asarray(out, dtype=np.int64)


ZZ_RASTER = _zigzag_raster()

# orthonormal 8-point DCT-II basis: C[u, x] = c(u) cos((2x+1) u pi / 16).
# Forward 2-D DCT of block b: C @ b @ C.T ; inverse: C.T @ F @ C.
_X = np.arange(8)
DCT_M = np.cos((2 * _X[None, :] + 1) * _X[:, None] * np.pi / 16) * np.sqrt(0.25)
DCT_M[0] *= np.sqrt(0.5)

# Annex K Table K.1 / K.2 quantization tables (natural raster order)
QUANT_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# Annex K standard Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


# --------------------------------------------------------------------------
# Huffman (canonical codes per T.81 Annex C)
# --------------------------------------------------------------------------

def huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length): the C.2 canonical expansion — codes of each
    length are consecutive, starting from (prev_start + prev_count) << 1."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """16-bit-peek LUT decoder: every canonical code of length L fills the
    2^(16-L) LUT slots sharing its L-bit prefix (the flat equivalent of
    T.81 F.2.2.3 DECODE — same codes, one lookup instead of a per-bit
    walk). Unfilled slots mean "invalid prefix"."""

    def __init__(self, bits: list[int], vals: list[int]):
        lut_len = np.zeros(1 << 16, np.uint8)
        lut_sym = np.zeros(1 << 16, np.uint8)
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                base = code << (16 - length)
                span = 1 << (16 - length)
                lut_len[base : base + span] = length
                lut_sym[base : base + span] = vals[k]
                code += 1
                k += 1
            code <<= 1
        # bytes objects: indexing yields a plain int, the fastest scalar path
        self.lut_len = lut_len.tobytes()
        self.lut_sym = lut_sym.tobytes()

def _decode_block_zz(d, nbits, pos, dlen, dsym, alen, asym, pred):
    """Entropy-decode one block: returns (64-long zigzag coefficient list,
    new bit position, new DC predictor). Fully inlined plain-int hot loop
    — LUT lookup (peek 16 bits through the 3-byte zero pad; a hit whose
    length passes `nbits` means the segment ended mid-symbol), then the
    T.81 F.2.2.1 EXTEND arithmetic, with no per-symbol function calls."""
    zz = [0] * 64
    i = pos >> 3
    off = pos & 7
    idx = (((d[i] << 16) | (d[i + 1] << 8) | d[i + 2]) >> (8 - off)) & 0xFFFF
    ln = dlen[idx]
    if ln == 0 or pos + ln > nbits:
        raise ValueError("invalid Huffman code in entropy stream")
    pos += ln
    t = dsym[idx]
    if t:
        if pos + t > nbits:
            raise ValueError("entropy segment exhausted mid-symbol")
        i = pos >> 3
        off = pos & 7
        chunk = (d[i] << 24) | (d[i + 1] << 16) | (d[i + 2] << 8) | d[i + 3]
        v = (chunk >> (32 - off - t)) & ((1 << t) - 1)
        pos += t
        pred += v if v >= (1 << (t - 1)) else v - (1 << t) + 1
    zz[0] = pred
    k = 1
    while k < 64:
        i = pos >> 3
        off = pos & 7
        idx = (
            ((d[i] << 16) | (d[i + 1] << 8) | d[i + 2]) >> (8 - off)
        ) & 0xFFFF
        ln = alen[idx]
        if ln == 0 or pos + ln > nbits:
            raise ValueError("invalid Huffman code in entropy stream")
        pos += ln
        rs = asym[idx]
        s = rs & 0xF
        if s == 0:
            if rs == 0xF0:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += rs >> 4
        if k > 63:
            raise ValueError("AC coefficient index out of range")
        if pos + s > nbits:
            raise ValueError("entropy segment exhausted mid-symbol")
        i = pos >> 3
        off = pos & 7
        chunk = (d[i] << 24) | (d[i + 1] << 16) | (d[i + 2] << 8) | d[i + 3]
        v = (chunk >> (32 - off - s)) & ((1 << s) - 1)
        pos += s
        zz[k] = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
        k += 1
    return zz, pos, pred


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

class _Component:
    __slots__ = (
        "cid", "h", "v", "tq", "td", "ta", "plane", "pred",
        "rows", "cols", "zz", "gy", "gx",
    )


#: dimension sanity cap — a corrupt SOF can declare 65535x65535 and OOM the
#: worker before any entropy data is read (decompression-bomb guard)
MAX_PIXELS = 100_000_000


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (h, w, 3) uint8 RGB (grayscale replicated).

    Contract for pipeline error isolation (multimodal on_error='mark'):
    any malformed/truncated stream raises ValueError — never hangs, never
    leaks parser internals (IndexError/KeyError/struct.error), never
    allocates beyond MAX_PIXELS."""
    try:
        return _decode_jpeg(data)
    except ValueError:
        raise
    except (IndexError, KeyError, AttributeError, OverflowError,
            struct.error) as e:
        raise ValueError(
            f"corrupt JPEG stream: {type(e).__name__}: {e}"
        ) from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    comps: list[_Component] = []
    w = h = 0
    restart_interval = 0

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        while data[pos + 1] == 0xFF:  # fill bytes before a marker are legal
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            continue
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seg_len]
        pos += seg_len

        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tq_id = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if prec == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, i).astype(np.int32)
                    i += 128
                # DQT payload is in zigzag order -> store raster
                raster = np.empty(64, np.int32)
                raster[ZZ_RASTER] = tbl
                qt[tq_id] = raster.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. sequential
            _, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if h * w > MAX_PIXELS or h == 0 or w == 0:
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            comps = []
            for c in range(ncomp):
                comp = _Component()
                comp.cid = seg[6 + 3 * c]
                comp.h = seg[7 + 3 * c] >> 4
                comp.v = seg[7 + 3 * c] & 0xF
                comp.tq = seg[8 + 3 * c]
                comps.append(comp)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (marker 0xFF{marker:02X}); this "
                "decoder covers baseline sequential DCT (SOF0/SOF1)"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                i += 17 + n
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            sel = {seg[1 + 2 * j]: seg[2 + 2 * j] for j in range(ns)}
            for comp in comps:
                if comp.cid in sel:
                    comp.td = sel[comp.cid] >> 4
                    comp.ta = sel[comp.cid] & 0xF
            pos = _decode_scan(data, pos, comps, qt, huff_dc, huff_ac,
                               w, h, restart_interval)
        # APPn / COM / others: skipped via seg_len

    if not comps:
        raise ValueError("no SOF frame found")
    return _planes_to_rgb(comps, w, h)


def _split_entropy_segments(data: bytes, pos: int):
    """Vectorized scan-body slicing: locate every 0xFF, classify its
    successor (0x00 = stuffing, D0-D7 = restart, else = end of scan),
    return the unstuffed bytes per restart segment + the scan-end offset."""
    sub = np.frombuffer(data, np.uint8)[pos:]
    ff = np.flatnonzero(sub == 0xFF)
    # a lone trailing 0xFF ends the scan (treat its successor as EOI)
    nxt = np.where(
        ff + 1 < sub.size, sub[np.minimum(ff + 1, sub.size - 1)], 0xD9
    )
    stuff = nxt == 0x00
    rst = (nxt >= 0xD0) & (nxt <= 0xD7)
    enders = ff[~(stuff | rst)]
    end = int(enders[0]) if enders.size else int(sub.size)
    in_scan = ff < end
    stuff_at = ff[in_scan & stuff]
    rst_at = ff[in_scan & rst]
    segments = []
    start = 0
    for r in [int(x) for x in rst_at] + [end]:
        seg = sub[start:r]
        drop = stuff_at[(stuff_at >= start) & (stuff_at < r)] + 1 - start
        if drop.size:
            seg = np.delete(seg, drop)
        segments.append(seg.tobytes())
        start = r + 2  # skip the RST marker itself
    return segments, pos + end


def _decode_scan(data, pos, comps, qt, huff_dc, huff_ac, w, h, ri):
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c.rows = mcuy * c.v
        c.cols = mcux * c.h
        c.zz = []  # per-block zigzag coefficient lists, decode order
        c.gy = []  # block-grid coordinates matching c.zz
        c.gx = []
        c.pred = 0

    segments, i = _split_entropy_segments(data, pos)

    n_mcu = mcux * mcuy
    per_seg = ri if ri else n_mcu
    mcu = 0
    for seg in segments:
        if mcu >= n_mcu:
            break
        d = seg + b"\x00\x00\x00"  # peek pad; overrun guarded via nbits
        nbits = 8 * len(seg)
        pos_b = 0
        for c in comps:
            c.pred = 0  # DC predictors reset at each restart
        for _ in range(min(per_seg, n_mcu - mcu)):
            my, mx = divmod(mcu, mcux)
            for c in comps:
                hdc, hac = huff_dc[c.td], huff_ac[c.ta]
                for by in range(c.v):
                    for bx in range(c.h):
                        zz, pos_b, c.pred = _decode_block_zz(
                            d, nbits, pos_b,
                            hdc.lut_len, hdc.lut_sym,
                            hac.lut_len, hac.lut_sym, c.pred,
                        )
                        c.zz.append(zz)
                        c.gy.append(my * c.v + by)
                        c.gx.append(mx * c.h + bx)
            mcu += 1

    # batched dequant + de-zigzag + IDCT per component (one einsum for all
    # blocks, not a tiny matmul per block)
    for c in comps:
        if not c.zz:
            c.plane = np.zeros((c.rows * 8, c.cols * 8))
            continue
        zz = np.asarray(c.zz, np.int32)  # (nb, 64) zigzag order
        raster = np.zeros_like(zz)
        raster[:, ZZ_RASTER] = zz
        coef = raster.reshape(-1, 8, 8) * qt[c.tq]
        blocks = np.einsum("ux,buv,vy->bxy", DCT_M, coef, DCT_M)
        grid = np.zeros((c.rows, c.cols, 8, 8))
        grid[np.asarray(c.gy), np.asarray(c.gx)] = blocks
        c.plane = grid.transpose(0, 2, 1, 3).reshape(c.rows * 8, c.cols * 8)
    return i  # positioned at the 0xFF of the next marker




def _planes_to_rgb(comps, w, h) -> np.ndarray:
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    planes = []
    for c in comps:
        p = c.plane
        ry, rx = vmax // c.v, hmax // c.h
        if ry > 1 or rx > 1:  # nearest-neighbor chroma upsample
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        planes.append(p[:h, :w] + 128.0)
    if len(planes) == 1:
        g = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per F.1.2.3


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int32)


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Blockwise forward DCT + quantize: (H/8, W/8, 64) int32 zigzag coefs."""
    hh, ww = plane.shape
    b = plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3) - 128.0
    f = np.einsum("ux,bcxy,vy->bcuv", DCT_M, b, DCT_M)
    # baseline caps AC magnitudes at 10 bits (T.81 Table F.2); quality=100
    # (all-ones quant) on adversarial blocks can exceed it, so clamp
    fq = np.clip(np.rint(f / q), -1023, 1023).astype(np.int32)
    return fq.reshape(-1, 64)[:, ZZ_RASTER].reshape(
        hh // 8, ww // 8, 64
    )


def _encode_block(bw, zz, pred, dc_codes, ac_codes) -> int:
    diff = int(zz[0]) - pred
    t = int(diff and int(np.abs(diff)).bit_length())
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    nz = np.flatnonzero(zz[1:]) + 1
    k = 0  # last emitted index
    for idx in nz:
        run = int(idx) - k - 1
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        v = int(zz[idx])
        s = int(np.abs(v)).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        k = int(idx)
    if k < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -(-h // mult) * mult, -(-w // mult) * mult
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w, 3) or (h, w) uint8 to a baseline JPEG byte stream."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _quality_scale(QUANT_LUMA.reshape(8, 8), quality)
    qc = _quality_scale(QUANT_CHROMA.reshape(8, 8), quality)

    if gray:
        planes = [_pad_edge(img.astype(np.float64), 8)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            y = _pad_edge(y, 16)
            cb = _pad_edge(cb, 16)
            cr = _pad_edge(cr, 16)
            # 2x2 box average (the JFIF downsample)
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "444":
            y, cb, cr = (_pad_edge(p, 8) for p in (y, cb, cr))
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be '444' or '420'")
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    coefs = [
        _fdct_quant(p, ql if qs == 0 else qc) for p, qs in zip(planes, qsel)
    ]

    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0, no thumbnail
    for tq_id, tbl in ((0, ql), (1, qc)) if not gray else ((0, ql),):
        zz = tbl.reshape(-1)[ZZ_RASTER].astype(np.uint8)
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tq_id) + zz.tobytes()
    ncomp = 1 if gray else 3
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += struct.pack(
            "BBB", ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]
        )
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
              (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        tables += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                   (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tid, bits, vals in tables:
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(vals), tid)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        # DC/AC table selectors: luma 0/0, chroma 1/1
        sel = 0x00 if ci == 0 else 0x11
        out += struct.pack("BB", ci + 1, sel)
    out += b"\x00\x3F\x00"  # Ss=0 Se=63 Ah/Al=0

    dc_l = huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    codecs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (ncomp - 1)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = coefs[0].shape[1] // samp[0][0]
    mcuy = coefs[0].shape[0] // samp[0][1]
    preds = [0] * ncomp
    bw = _BitWriter()
    n_since_rst, rst_idx = 0, 0
    for mcu in range(mcux * mcuy):
        if restart_interval and n_since_rst == restart_interval:
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (rst_idx & 7)])
            bw = _BitWriter()
            preds = [0] * ncomp
            n_since_rst = 0
            rst_idx += 1
        my, mx = divmod(mcu, mcux)
        for ci in range(ncomp):
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    zz = coefs[ci][my * sv + by, mx * sh + bx]
                    preds[ci] = _encode_block(
                        bw, zz, preds[ci], codecs[ci][0], codecs[ci][1]
                    )
        n_since_rst += 1
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def idct2d_reference(coef: np.ndarray) -> np.ndarray:
    """Brute-force T.81 A.3.3 inverse DCT (quadruple loop) — test oracle."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.5) if u == 0 else 1.0
                    cv = np.sqrt(0.5) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4.0
    return out
