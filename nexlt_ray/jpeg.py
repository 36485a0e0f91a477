"""Baseline + progressive JPEG codec (ITU-T T.81, public spec), stdlib +
numpy only.

Decoder: baseline sequential DCT (SOF0) AND progressive DCT (SOF2, the
web's other common profile — T.81 Annex G: spectral selection bands,
successive approximation with DC/AC first + refinement scans, EOB
runs), 8-bit samples, 1 or 3 components, any sampling factors up to 4,
restart intervals, byte stuffing. Markers handled: SOI/EOI, APPn/COM
(skipped), DQT (8- and 16-bit tables), SOF0/SOF1/SOF2, DHT, DRI, SOS,
RSTn. Lossless/hierarchical and arithmetic coding raise a clear error.

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
        "rows", "cols", "zz", "gy", "gx", "blocks",
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
    progressive = False

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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 prog.
            progressive = marker == 0xC2
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
                comp.blocks = None
                comps.append(comp)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (marker 0xFF{marker:02X}); this "
                "decoder covers sequential (SOF0/SOF1) and progressive "
                "(SOF2) DCT"
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
            by_cid = {comp.cid: comp for comp in comps}
            scan_comps = []
            for j in range(ns):
                comp = by_cid.get(seg[1 + 2 * j])
                if comp is None:
                    raise ValueError("SOS selects a component not in SOF")
                comp.td = sel[comp.cid] >> 4
                comp.ta = sel[comp.cid] & 0xF
                scan_comps.append(comp)
            if progressive:
                ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
                pos = _decode_scan_progressive(
                    data, pos, comps, scan_comps, ss, se, a >> 4, a & 0xF,
                    huff_dc, huff_ac, w, h, restart_interval,
                )
            else:
                pos = _decode_scan(data, pos, comps, qt, huff_dc, huff_ac,
                                   w, h, restart_interval)
        # APPn / COM / others: skipped via seg_len

    if not comps:
        raise ValueError("no SOF frame found")
    if progressive:
        _idct_progressive(comps, qt)
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




# --------------------------------------------------------------------------
# progressive scans (T.81 Annex G.1.2 / G.2 decode control)
#
# Coefficients accumulate across scans in per-component dense block grids
# (zigzag order), then one batched dequant+IDCT runs at EOI. The scan
# kernels below are per-symbol Python like the baseline hot loop — the
# right trade for bounded per-payload work in an actor-pool decode stage.
# --------------------------------------------------------------------------

def _hdecode(d, nbits, pos, hlen, hsym):
    """One Huffman symbol via the 16-bit-peek LUT (same discipline as the
    baseline loop)."""
    i = pos >> 3
    off = pos & 7
    idx = (((d[i] << 16) | (d[i + 1] << 8) | d[i + 2]) >> (8 - off)) & 0xFFFF
    ln = hlen[idx]
    if ln == 0 or pos + ln > nbits:
        raise ValueError("invalid Huffman code in entropy stream")
    return hsym[idx], pos + ln


def _receive(d, nbits, pos, n):
    """n raw bits (n <= 16), MSB first — T.81 F.2.2.4 RECEIVE."""
    if n == 0:
        return 0, pos
    if pos + n > nbits:
        raise ValueError("entropy segment exhausted mid-symbol")
    i = pos >> 3
    off = pos & 7
    chunk = (d[i] << 24) | (d[i + 1] << 16) | (d[i + 2] << 8) | d[i + 3]
    return (chunk >> (32 - off - n)) & ((1 << n) - 1), pos + n


def _alloc_blocks(comps, w, h):
    """Dense MCU-padded coefficient grids (one 64-list per block, zigzag)."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        if c.blocks is None:
            c.rows = mcuy * c.v
            c.cols = mcux * c.h
            c.blocks = [[0] * 64 for _ in range(c.rows * c.cols)]
    return mcux, mcuy, hmax, vmax


def _decode_scan_progressive(data, pos, comps, scan, ss, se, ah, al,
                             huff_dc, huff_ac, w, h, ri):
    mcux, mcuy, hmax, vmax = _alloc_blocks(comps, w, h)
    dc_scan = ss == 0
    if dc_scan and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if not dc_scan and len(scan) != 1:
        raise ValueError("progressive AC scans are non-interleaved")
    if not (0 <= ss <= se <= 63):
        raise ValueError("invalid spectral band")

    interleaved = len(scan) > 1
    if interleaved:
        n_units = mcux * mcuy
    else:
        # non-interleaved scans cover the component's own complete-block
        # grid (T.81 A.2.2), not the MCU-padded grid
        c0 = scan[0]
        cw = -(-(w * c0.h) // hmax)
        ch = -(-(h * c0.v) // vmax)
        bw = -(-cw // 8)
        bh = -(-ch // 8)
        n_units = bw * bh

    segments, end = _split_entropy_segments(data, pos)
    per_seg = ri if ri else n_units
    unit = 0
    for seg in segments:
        if unit >= n_units:
            break
        d = seg + b"\x00\x00\x00"
        nbits = 8 * len(seg)
        p = 0
        eobrun = 0
        for c in scan:
            c.pred = 0
        for _ in range(min(per_seg, n_units - unit)):
            if dc_scan:
                if interleaved:
                    my, mx = divmod(unit, mcux)
                    for c in scan:
                        hdc = huff_dc[c.td] if ah == 0 else None
                        for by in range(c.v):
                            for bx in range(c.h):
                                blk = c.blocks[
                                    (my * c.v + by) * c.cols + (mx * c.h + bx)
                                ]
                                p = _dc_unit(d, nbits, p, blk, c, hdc, ah, al)
                else:
                    c = scan[0]
                    by, bx = divmod(unit, bw)
                    blk = c.blocks[by * c.cols + bx]
                    hdc = huff_dc[c.td] if ah == 0 else None
                    p = _dc_unit(d, nbits, p, blk, c, hdc, ah, al)
            else:
                c = scan[0]
                by, bx = divmod(unit, bw)
                blk = c.blocks[by * c.cols + bx]
                hac = huff_ac[c.ta]
                if ah == 0:
                    p, eobrun = _ac_first(
                        d, nbits, p, blk, hac, ss, se, al, eobrun
                    )
                else:
                    p, eobrun = _ac_refine(
                        d, nbits, p, blk, hac, ss, se, al, eobrun
                    )
            unit += 1
    return end


def _dc_unit(d, nbits, pos, blk, c, hdc, ah, al):
    """One block's DC contribution: first scan decodes a diff at the
    current approximation (G.1.2.1); a refinement scan appends one
    magnitude bit."""
    if ah == 0:
        t, pos = _hdecode(d, nbits, pos, hdc.lut_len, hdc.lut_sym)
        if t > 15:
            raise ValueError("invalid DC size category")
        v, pos = _receive(d, nbits, pos, t)
        if t:
            c.pred += v if v >= (1 << (t - 1)) else v - (1 << t) + 1
        blk[0] = c.pred << al
    else:
        bit, pos = _receive(d, nbits, pos, 1)
        if bit:
            blk[0] |= 1 << al
    return pos


def _ac_first(d, nbits, pos, blk, hac, ss, se, al, eobrun):
    """First scan of an AC band (G.1.2.2): run/size symbols plus EOBn
    end-of-band run lengths that skip whole blocks."""
    if eobrun > 0:
        return pos, eobrun - 1
    alen, asym = hac.lut_len, hac.lut_sym
    k = ss
    while k <= se:
        rs, pos = _hdecode(d, nbits, pos, alen, asym)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:
                extra, pos = _receive(d, nbits, pos, r)
                eobrun = (1 << r) + extra - 1  # this block ends the run's 1st
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC coefficient index out of band")
        v, pos = _receive(d, nbits, pos, s)
        blk[k] = (v if v >= (1 << (s - 1)) else v - (1 << s) + 1) << al
        k += 1
    return pos, eobrun


def _ac_refine(d, nbits, pos, blk, hac, ss, se, al, eobrun):
    """Refinement scan of an AC band (G.1.2.3): one correction bit per
    already-nonzero coefficient crossed, new coefficients appear as
    +/-2^Al; EOB runs carry correction bits for the blocks they span."""
    p1 = 1 << al
    m1 = -1 << al
    alen, asym = hac.lut_len, hac.lut_sym
    k = ss
    if eobrun == 0:
        while k <= se:
            rs, pos = _hdecode(d, nbits, pos, alen, asym)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    extra, pos = _receive(d, nbits, pos, r)
                    eobrun = (1 << r) + extra
                    break
                # r == 15: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement symbol must have size 1")
                bit, pos = _receive(d, nbits, pos, 1)
                newval = p1 if bit else m1
            while k <= se:
                cv = blk[k]
                if cv != 0:
                    bit, pos = _receive(d, nbits, pos, 1)
                    if bit and not (cv & p1):
                        blk[k] = cv + (p1 if cv >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            cv = blk[k]
            if cv != 0:
                bit, pos = _receive(d, nbits, pos, 1)
                if bit and not (cv & p1):
                    blk[k] = cv + (p1 if cv >= 0 else m1)
            k += 1
        eobrun -= 1
    return pos, eobrun


def _idct_progressive(comps, qt):
    """Batched dequant + de-zigzag + IDCT over each component's full grid
    (same einsum discipline as the baseline path)."""
    for c in comps:
        if c.blocks is None:
            raise ValueError("progressive JPEG has no scan data")
        if c.tq not in qt:
            raise ValueError("missing quantization table")
        zz = np.asarray(c.blocks, np.int32)
        raster = np.zeros_like(zz)
        raster[:, ZZ_RASTER] = zz
        coef = raster.reshape(-1, 8, 8) * qt[c.tq]
        blocks = np.einsum("ux,buv,vy->bxy", DCT_M, coef, DCT_M)
        c.plane = (
            blocks.reshape(c.rows, c.cols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c.rows * 8, c.cols * 8)
        )


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


def _prepare_coefs(img: np.ndarray, quality: int, subsampling: str):
    """Shared encoder front end: color convert, pad, subsample, FDCT +
    quantize. Returns (coefs, samp, qsel, gray, ql, qc, h, w)."""
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
    return coefs, samp, qsel, gray, ql, qc, h, w


def _emit_frame_headers(out, h, w, gray, ql, qc, samp, qsel, sof_marker,
                        restart_interval):
    """SOI through DRI — everything before the first SOS."""
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0, no thumbnail
    for tq_id, tbl in ((0, ql), (1, qc)) if not gray else ((0, ql),):
        zz = tbl.reshape(-1)[ZZ_RASTER].astype(np.uint8)
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tq_id) + zz.tobytes()
    ncomp = 1 if gray else 3
    out += bytes([0xFF, sof_marker]) + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp
    )
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


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w, 3) or (h, w) uint8 to a baseline JPEG byte stream."""
    coefs, samp, qsel, gray, ql, qc, h, w = _prepare_coefs(
        img, quality, subsampling
    )
    ncomp = 1 if gray else 3
    out = bytearray(b"\xFF\xD8")  # SOI
    _emit_frame_headers(out, h, w, gray, ql, qc, samp, qsel, 0xC0,
                        restart_interval)
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


# --------------------------------------------------------------------------
# progressive encoder (T.81 Annex G.1.1; scan script in encode_jpeg_progressive)
# --------------------------------------------------------------------------

# Progressive AC scans need EOBn symbols (r<<4, r=1..14) that the Annex K
# sequential tables do not define (their code space is full) — real
# progressive files carry custom DHTs. This flat 8-bit table covers every
# legal AC run/size symbol (EOB0..EOB14, ZRL, all (r,s) with s=1..10):
# 176 codes of length 8, Kraft 176/256 < 1, trivially canonical.
AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
AC_PROG_VALS = [(r << 4) | s for r in range(16) for s in range(11)]


class _ScanWriter:
    """Entropy writer for one progressive scan: owns the BitWriter, the
    EOB-run counter, the correction bits pending behind the next EOBn
    symbol, and restart emission. Restart boundaries flush the run, the
    pending bits and the bit buffer, then emit RSTn (numbering restarts
    at D0 each scan per T.81 B.2.1)."""

    def __init__(self, out: bytearray, ac_codes=None):
        self.out = out
        self.bw = _BitWriter()
        self.ac = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []
        self.rst = 0

    def flush_eobrun(self):
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, ln = self.ac[r << 4]
            self.bw.write(code, ln)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
            for b in self.pending:
                self.bw.write(b, 1)
            self.pending.clear()

    def add_eob_block(self, tail_bits=()):
        self.eobrun += 1
        self.pending.extend(tail_bits)
        # EOBn's run length field is capped at 14 extension bits
        if self.eobrun == 0x7FFF or len(self.pending) > 900:
            self.flush_eobrun()

    def restart(self):
        self.flush_eobrun()
        self.bw.flush()
        self.out += self.bw.out
        self.out += bytes([0xFF, 0xD0 + (self.rst & 7)])
        self.rst += 1
        self.bw = _BitWriter()

    def finish(self):
        self.flush_eobrun()
        self.bw.flush()
        self.out += self.bw.out


def _sos_header(out, scan_sel, ss, se, ah, al):
    out += b"\xFF\xDA" + struct.pack(
        ">HB", 6 + 2 * len(scan_sel), len(scan_sel)
    )
    for cid, tsel in scan_sel:
        out += struct.pack("BB", cid, tsel)
    out += struct.pack("BBB", ss, se, (ah << 4) | al)


def _comp_block_grid(coefs_ci, samp_ci, samp, h, w):
    """Non-interleaved scans cover ceil(comp_size/8) complete blocks —
    a sub-grid of the MCU-padded FDCT grid."""
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    cw = -(-(w * samp_ci[0]) // hmax)
    ch = -(-(h * samp_ci[1]) // vmax)
    return -(-ch // 8), -(-cw // 8)


def _enc_dc_scan(out, coefs, samp, dc_codes, al, ri, first, prev_al=0):
    """DC scan, all components interleaved in MCU order. First scan
    (Ah=0) difference-codes the point-transformed values; a refinement
    scan emits one raw bit per block."""
    ncomp = len(coefs)
    mcuy = coefs[0].shape[0] // samp[0][1]
    mcux = coefs[0].shape[1] // samp[0][0]
    sw = _ScanWriter(out)
    preds = [0] * ncomp
    n = 0
    for mcu in range(mcux * mcuy):
        if ri and n == ri:
            sw.restart()
            preds = [0] * ncomp
            n = 0
        my, mx = divmod(mcu, mcux)
        for ci in range(ncomp):
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    v = int(coefs[ci][my * sv + by, mx * sh + bx, 0])
                    if first:
                        pt = v >> al
                        diff = pt - preds[ci]
                        preds[ci] = pt
                        t = int(diff and abs(diff).bit_length())
                        code, ln = dc_codes[ci][t]
                        sw.bw.write(code, ln)
                        if t:
                            sw.bw.write(
                                diff if diff >= 0 else diff + (1 << t) - 1, t
                            )
                    else:
                        sw.bw.write((v >> al) & 1, 1)
        n += 1
    sw.finish()


def _enc_ac_first(out, coef_ci, bh, bw_, cols_stride, ac_codes, ss, se, al,
                  ri):
    """First scan of an AC band for one component (non-interleaved)."""
    sw = _ScanWriter(out, ac_codes)
    n = 0
    flat = coef_ci.reshape(-1, 64)
    for u in range(bh * bw_):
        if ri and n == ri:
            sw.restart()
            n = 0
        n += 1
        by, bx = divmod(u, bw_)
        blk = flat[by * cols_stride + bx]
        r = 0
        emitted = False
        for k in range(ss, se + 1):
            v = int(blk[k])
            v = (v >> al) if v >= 0 else -((-v) >> al)  # toward zero
            if v == 0:
                r += 1
                continue
            sw.flush_eobrun()
            emitted = True
            while r > 15:
                code, ln = ac_codes[0xF0]
                sw.bw.write(code, ln)
                r -= 16
            s = abs(v).bit_length()
            code, ln = ac_codes[(r << 4) | s]
            sw.bw.write(code, ln)
            sw.bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            r = 0
        if r > 0 or not emitted:
            sw.add_eob_block()
    sw.finish()


def _enc_ac_refine(out, coef_ci, bh, bw_, cols_stride, ac_codes, ss, se, al,
                   ri):
    """Refinement scan of an AC band: emits exactly the stream the
    decoder's crossing loop reads — each ZRL / (r,1) symbol is followed
    by the correction bits of the already-nonzero coefficients its span
    crosses; the post-EOB tail's correction bits queue behind the next
    EOBn symbol (G.1.2.3 run structure, encoded by direct simulation of
    the decode loop)."""
    sw = _ScanWriter(out, ac_codes)
    n = 0
    flat = coef_ci.reshape(-1, 64)
    for u in range(bh * bw_):
        if ri and n == ri:
            sw.restart()
            n = 0
        n += 1
        by, bx = divmod(u, bw_)
        blk = flat[by * cols_stride + bx]
        # history magnitude at this approximation: >0 means already
        # nonzero; ==1 exactly means newly nonzero THIS scan
        mags = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        news = [i for i, m in enumerate(mags) if m == 1]
        k = 0  # index into the band
        for np_i in news:
            # zero-history coefficients between k and the new coef
            z = sum(1 for i in range(k, np_i) if mags[i] == 0)
            while z > 15:
                sw.flush_eobrun()
                code, ln = ac_codes[0xF0]
                sw.bw.write(code, ln)
                # span: crosses exactly 16 zero-history coefs, emitting
                # correction bits of nonzero-history coefs passed
                crossed = 0
                while crossed < 16:
                    if mags[k] == 0:
                        crossed += 1
                    else:
                        sw.bw.write(mags[k] & 1, 1)
                    k += 1
                z -= 16
            sw.flush_eobrun()
            code, ln = ac_codes[(z << 4) | 1]
            sw.bw.write(code, ln)
            sw.bw.write(1 if int(blk[ss + np_i]) > 0 else 0, 1)
            while k < np_i:
                if mags[k] > 1:
                    sw.bw.write(mags[k] & 1, 1)
                k += 1
            k = np_i + 1
        if k <= se - ss:
            # tail joins an EOB run; its correction bits ride behind EOBn
            sw.add_eob_block(
                [mags[i] & 1 for i in range(k, se - ss + 1) if mags[i] > 1]
            )
    sw.finish()


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, subsampling: str = "444",
    restart_interval: int = 0, dc_shift: int = 1, ac_shift: int = 1,
    bands: tuple = ((1, 5), (6, 63)),
) -> bytes:
    """Encode (h, w, 3) or (h, w) uint8 to a progressive (SOF2) JPEG.

    Scan script: interleaved DC first scan at Al=dc_shift, per-component
    AC band first scans at Al=ac_shift (spectral selection per `bands`),
    then DC and AC refinement scans down to Al=0 — exercising every
    progressive coding mode. The quantized coefficients equal the
    baseline encoder's for the same (quality, subsampling), so decoded
    pixels are bit-identical to the baseline stream's."""
    coefs, samp, qsel, gray, ql, qc, h, w = _prepare_coefs(
        img, quality, subsampling
    )
    ncomp = 1 if gray else 3
    if bands and (bands[0][0] != 1 or bands[-1][1] != 63):
        raise ValueError("bands must cover 1..63")
    out = bytearray(b"\xFF\xD8")
    _emit_frame_headers(out, h, w, gray, ql, qc, samp, qsel, 0xC2,
                        restart_interval)
    ri = restart_interval
    dc_codes = [huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)] + [
        huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ] * (ncomp - 1)
    # override the AC table ids with the EOBn-capable progressive table
    for tid in ([0x10] if gray else [0x10, 0x11]):
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(AC_PROG_VALS), tid)
        out += bytes(AC_PROG_BITS) + bytes(AC_PROG_VALS)
    prog_ac = huffman_codes(AC_PROG_BITS, AC_PROG_VALS)
    ac_codes = [prog_ac] * ncomp
    all_sel = [(ci + 1, 0x00 if ci == 0 else 0x10) for ci in range(ncomp)]

    # 1. DC first scan (interleaved)
    _sos_header(out, all_sel, 0, 0, 0, dc_shift)
    _enc_dc_scan(out, coefs, samp, dc_codes, dc_shift, ri, first=True)

    # 2. AC band first scans, per component
    for ci in range(ncomp):
        bh, bw_ = _comp_block_grid(coefs[ci], samp[ci], samp, h, w)
        stride = coefs[ci].shape[1]
        ta = 0 if ci == 0 else 1
        for bs, be in bands:
            _sos_header(out, [(ci + 1, ta)], bs, be, 0, ac_shift)
            _enc_ac_first(out, coefs[ci], bh, bw_, stride, ac_codes[ci],
                          bs, be, ac_shift, ri)

    # 3. DC refinement scans (interleaved, raw bits)
    for al in range(dc_shift - 1, -1, -1):
        _sos_header(out, [(cid, 0) for cid, _ in all_sel], 0, 0, al + 1, al)
        _enc_dc_scan(out, coefs, samp, dc_codes, al, ri, first=False)

    # 4. AC refinement scans, per component, full band
    for al in range(ac_shift - 1, -1, -1):
        for ci in range(ncomp):
            bh, bw_ = _comp_block_grid(coefs[ci], samp[ci], samp, h, w)
            stride = coefs[ci].shape[1]
            ta = 0 if ci == 0 else 1
            _sos_header(out, [(ci + 1, ta)], 1, 63, al + 1, al)
            _enc_ac_refine(out, coefs[ci], bh, bw_, stride, ac_codes[ci],
                           1, 63, al, ri)

    out += b"\xFF\xD9"
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
