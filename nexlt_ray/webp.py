"""WebP lossless (VP8L) codec, stdlib + numpy only, from the public
"WebP Lossless Bitstream Specification" (Google, 2012-2023).

Decoder: the full VP8L feature set — LSB-first bit stream, simple and
normal (code-length-coded) Huffman codes, color cache, LZ77 backward
references with the two-level prefix coding, meta-Huffman groups, and
all four transforms (predictor with its 14 modes, cross-channel color
transform, subtract-green, color-indexing with sub-byte pixel packing).
RIFF container with plain "VP8L" or extended "VP8X" chunk layouts;
lossy "VP8 " payloads raise a clear error.

Encoder: a fixture/test generator emitting valid VP8L streams that
exercise every decoder path (each transform, packed palettes, color
cache, LZ77 with both near-map and plain distances, simple + normal
codes, meta-Huffman) — round-trip bit-exactness over arbitrary RGB(A)
images is property-tested (tests/test_webp.py).

INTEROP CAVEATS (documented, not hidden): no WebP codec library or
external .webp fixture exists in this environment, so three spec
details that round-trips cannot distinguish are reconstructed from the
spec text and marked inline: the 120-entry near-distance neighborhood
order (`_DIST_MAP`), the Select predictor's tie-break, and the
top-right pixel rule at the right image edge. Everything else
(canonical Huffman construction, prefix-code value ranges, transform
algebra, packing geometry) is pinned by construction or by independent
hand-built streams in the tests.

Reference seam in the NeXLT blueprint: image payloads ride the opaque
binary-column contract (multimodal.IMAGE_SCHEMA; SURVEY §1.2 base64
binary field types).
"""

from __future__ import annotations

import struct

import numpy as np

# order in which code-length-code lengths are stored (spec section 6.2.2)
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]

#: dimension sanity cap (decompression-bomb guard, same as jpeg/gif)
MAX_PIXELS = 100_000_000


def _make_dist_map() -> np.ndarray:
    """Near-distance codes 1..120 -> (dx, dy) neighborhood, ordered by
    L2 distance with |dx| ascending then +dx before -dx as tie-break
    (reconstructed from the spec's published table; see module
    docstring). Entry i holds the linear offset multiplier pair."""
    cand = []
    for dy in range(8):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue
            cand.append((dx * dx + dy * dy, abs(dx), 0 if dx > 0 else 1,
                         dx, dy))
    cand.sort()
    return np.asarray([(dx, dy) for _, _, _, dx, dy in cand[:120]],
                      dtype=np.int64)


_DIST_MAP = _make_dist_map()


# ---------------------------------------------------------------------------
# bit I/O (LSB-first, like DEFLATE)
# ---------------------------------------------------------------------------

class _Bits:
    __slots__ = ("d", "pos", "nbits")

    def __init__(self, data: bytes):
        # zero padding lets the LUT peek read past the logical end; the
        # logical end is still enforced via nbits
        self.d = data + b"\x00\x00\x00\x00"
        self.pos = 0
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > self.nbits:
            raise ValueError("VP8L bitstream exhausted")
        self.pos = p + n
        i = p >> 3
        d = self.d
        acc = (d[i] | (d[i + 1] << 8) | (d[i + 2] << 16)) >> (p & 7)
        return acc & ((1 << n) - 1)


class _BitsW:
    __slots__ = ("out", "acc", "nacc")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, val: int, n: int):
        self.acc |= (val & ((1 << n) - 1)) << self.nacc
        self.nacc += n
        while self.nacc >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nacc -= 8

    def finish(self) -> bytes:
        if self.nacc:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nacc = 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# canonical Huffman (DEFLATE discipline: codes assigned by length then
# symbol; stored so an LSB-first reader sees each code MSB-first, i.e.
# the writer emits the code's bits reversed)
# ---------------------------------------------------------------------------

def _rev(code: int, length: int) -> int:
    r = 0
    for _ in range(length):
        r = (r << 1) | (code & 1)
        code >>= 1
    return r


def _canonical(lengths) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical per code length."""
    pairs = sorted(
        (l, s) for s, l in enumerate(lengths) if l > 0
    )
    out = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= l - prev_len
        prev_len = l
        out[s] = (code, l)
        code += 1
    return out


class _HuffDec:
    """Flat LUT decoder over reversed canonical codes. A single-symbol
    code (the simple 1-symbol form, or a degenerate normal code with one
    nonzero length) consumes 0 bits, per the spec."""

    __slots__ = ("lut", "width", "single")

    def __init__(self, lengths):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("VP8L Huffman code with no symbols")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.lut = None
            self.width = 0
            return
        self.single = -1
        width = max(l for l, _ in nz)
        if width > 15:
            raise ValueError("VP8L code length > 15")
        codes = _canonical(lengths)
        # Kraft completeness check: an over/under-subscribed code is corrupt
        if sum(1 << (width - l) for l, _ in nz) != (1 << width):
            raise ValueError("VP8L Huffman code is not complete")
        # plain lists: scalar indexing is several times faster than numpy
        lut_sym = [0] * (1 << width)
        lut_len = [0] * (1 << width)
        for s, (c, l) in codes.items():
            base = _rev(c, l)
            step = 1 << l
            for j in range(base, 1 << width, step):
                lut_sym[j] = s
                lut_len[j] = l
        self.lut = (lut_sym, lut_len)
        self.width = width

    def next(self, br: _Bits) -> int:
        if self.single >= 0:
            return self.single
        p = br.pos
        if p >= br.nbits:
            raise ValueError("VP8L bitstream exhausted")
        i = p >> 3
        d = br.d
        acc = (d[i] | (d[i + 1] << 8) | (d[i + 2] << 16)) >> (p & 7)
        idx = acc & ((1 << self.width) - 1)
        ln = self.lut[1][idx]
        if ln == 0 or p + ln > br.nbits:
            raise ValueError("invalid VP8L Huffman code")
        br.pos = p + ln
        return self.lut[0][idx]


# ---------------------------------------------------------------------------
# Huffman code reading (spec section 6.2)
# ---------------------------------------------------------------------------

def _read_code(br: _Bits, alphabet_size: int) -> _HuffDec:
    lengths = [0] * alphabet_size
    if br.read(1):  # simple code
        n = br.read(1) + 1
        if br.read(1):
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        if sym0 >= alphabet_size:
            raise ValueError("VP8L simple-code symbol out of range")
        lengths[sym0] = 1
        if n == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size or sym1 == sym0:
                raise ValueError("VP8L simple-code symbol invalid")
            lengths[sym1] = 1
        return _HuffDec(lengths)
    # normal code: code-length code first
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _HuffDec(clc_lengths)
    if br.read(1):  # limited symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code = clc.next(br)
        if code < 16:
            lengths[symbol] = code
            symbol += 1
            if code:
                prev_len = code
        elif code == 16:
            rep = 3 + br.read(2)
            lengths[symbol : symbol + rep] = [prev_len] * rep
            symbol += rep
        elif code == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
        if symbol > alphabet_size:
            raise ValueError("VP8L code lengths overflow the alphabet")
    return _HuffDec(lengths)


def _prefix_value(code: int, br: _Bits) -> int:
    """LZ77 length/distance prefix decode (spec 6.2.3): codes 0..3 are
    the values 1..4; beyond that each code pair doubles the range with
    (code-2)>>1 extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_code(value: int) -> tuple[int, int, int]:
    """Inverse of _prefix_value: value -> (code, extra_bits_val, n_extra)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    hi = v.bit_length() - 1
    extra = hi - 1
    code = 2 * hi + ((v >> extra) & 1)
    return code, v & ((1 << extra) - 1), extra


# ---------------------------------------------------------------------------
# entropy-coded image (spec section 6.2.4 decoding flow)
# ---------------------------------------------------------------------------

def _read_entropy_image(br: _Bits, w: int, h: int, is_main: bool):
    """Returns (pixels int64 array of 0xAARRGGBB, shape (h, w))."""
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_main and br.read(1):  # meta-Huffman present
        meta_bits = br.read(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta = _read_entropy_image(br, mw, mh, False)
        # group index = (red << 8) | green
        meta = ((meta >> 16) & 0xFF) << 8 | ((meta >> 8) & 0xFF)
        n_groups = int(meta.max()) + 1
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("invalid VP8L color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        g = _read_code(br, 256 + 24 + cache_size)
        r = _read_code(br, 256)
        b = _read_code(br, 256)
        a = _read_code(br, 256)
        d = _read_code(br, 40)
        groups.append((g, r, b, a, d))
    cache = [0] * cache_size
    out = [0] * (w * h)  # plain list: per-pixel writes beat numpy scalars
    pos = 0
    n = w * h
    cur_group = groups[0]
    cshift = 32 - cache_bits if cache_bits else 0
    while pos < n:
        if meta is not None:
            y, x = divmod(pos, w)
            cur_group = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        gc, rc, bc, ac, dc = cur_group
        s = gc.next(br)
        if s < 256:  # literal (stream order: green sym, red, blue, alpha)
            red = rc.next(br)
            blue = bc.next(br)
            px = (ac.next(br) << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> cshift] = px
        elif s < 256 + 24:  # backward reference
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(dc.next(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = int(dy) * w + int(dx)
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backward reference out of range")
            if cache_size:
                for _ in range(length):
                    px = out[pos - dist]
                    out[pos] = px
                    pos += 1
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> cshift] = px
            elif dist >= length:
                out[pos : pos + length] = out[pos - dist : pos - dist + length]
                pos += length
            else:
                for _ in range(length):
                    out[pos] = out[pos - dist]
                    pos += 1
        else:  # color cache hit
            if s - 256 - 24 >= cache_size:
                raise ValueError("VP8L cache index out of range")
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return np.asarray(out, np.int64).reshape(h, w)


# ---------------------------------------------------------------------------
# inverse transforms (spec section 5)
# ---------------------------------------------------------------------------

def _px_split(img: np.ndarray):
    return ((img >> 24) & 0xFF, (img >> 16) & 0xFF,
            (img >> 8) & 0xFF, img & 0xFF)


def _px_join(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


def _avg2(p1, p2):
    # SWAR per-lane floor average: (a & b) + (((a ^ b) >> 1) & 0x7f lanes)
    return (p1 & p2) + (((p1 ^ p2) >> 1) & 0x7F7F7F7F)


def _px_split_scalar(p):
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _join_scalar(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), top)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(tl, top)
    if mode == 9:
        return _avg2(top, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(top, tr))
    if mode == 11:  # Select
        pa = 0
        pb = 0
        for sh in (24, 16, 8, 0):
            l_c = (left >> sh) & 0xFF
            t_c = (top >> sh) & 0xFF
            tl_c = (tl >> sh) & 0xFF
            p_c = l_c + t_c - tl_c
            pa += abs(p_c - l_c)
            pb += abs(p_c - t_c)
        # tie-break: <= picks left (reconstructed; see module docstring)
        return left if pa <= pb else top
    if mode == 12:  # ClampAddSubtractFull
        out = 0
        for sh in (24, 16, 8, 0):
            v = ((left >> sh) & 0xFF) + ((top >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
            out |= max(0, min(255, v)) << sh
        return out
    if mode == 13:  # ClampAddSubtractHalf
        av = _avg2(left, top)
        out = 0
        for sh in (24, 16, 8, 0):
            a_c = (av >> sh) & 0xFF
            tl_c = (tl >> sh) & 0xFF
            # spec: clamp(a + (a - b) / 2), integer division toward zero
            d = a_c - tl_c
            v = a_c + (d // 2 if d >= 0 else -((-d) // 2))
            out |= max(0, min(255, v)) << sh
        return out
    raise ValueError(f"invalid VP8L predictor mode {mode}")


def _inv_predictor(img: np.ndarray, modes: np.ndarray, size_bits: int):
    h, w = img.shape
    res = img.tolist()  # plain ints: the serial loop is 3-4x faster
    mode_rows = modes.tolist()
    out = [[0] * w for _ in range(h)]
    prev = None
    for y in range(h):
        row = out[y]
        rrow = res[y]
        mrow = mode_rows[y >> size_bits]
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = row[x - 1]  # mode forced to L on first row
            elif x == 0:
                pred = prev[0]  # mode forced to T on first col
            else:
                mode = mrow[x >> size_bits]
                left = row[x - 1]
                top = prev[x]
                tl = prev[x - 1]
                # top-right at the right edge: use top (reconstructed rule;
                # see module docstring)
                tr = prev[x + 1] if x + 1 < w else top
                pred = _predict(mode, left, top, tl, tr)
            row[x] = _add_px(rrow[x], pred)
        prev = row
    return np.asarray(out, np.int64)


def _add_px(residual: int, pred: int) -> int:
    # SWAR per-lane mod-256 add: low 7 bits carry-free, top bit via xor
    t = (residual & 0x7F7F7F7F) + (pred & 0x7F7F7F7F)
    return t ^ ((residual ^ pred) & 0x80808080)


def _sub_px(px: int, pred: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((px >> sh) & 0xFF) - ((pred >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed int8 multiply >> 5 (spec section 5.3)."""
    t8 = t - 256 if t >= 128 else t
    c8 = c - 256 if c >= 128 else c
    return (t8 * c8) >> 5


def _s8(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 128, v - 256, v)


def _inv_color_transform(img: np.ndarray, cts: np.ndarray, size_bits: int):
    """Per block (the multipliers are block-constant), fully vectorized:
    delta(t, c) = (int8(t) * int8(c)) >> 5 (arithmetic shift)."""
    h, w = img.shape
    a, r, g, b = _px_split(img)
    r = r.astype(np.int64)
    b = b.astype(np.int64)
    bs = 1 << size_bits
    for by in range(cts.shape[0]):
        for bx in range(cts.shape[1]):
            ct = int(cts[by, bx])
            g2r = ct >> 16 & 0xFF
            g2b = ct >> 8 & 0xFF
            r2b = ct & 0xFF
            if g2r >= 128:
                g2r -= 256
            if g2b >= 128:
                g2b -= 256
            if r2b >= 128:
                r2b -= 256
            ys = slice(by * bs, min((by + 1) * bs, h))
            xs = slice(bx * bs, min((bx + 1) * bs, w))
            gg = _s8(g[ys, xs])
            rr = (r[ys, xs] + ((g2r * gg) >> 5)) & 0xFF
            bb = (b[ys, xs] + ((g2b * gg) >> 5) + ((r2b * _s8(rr)) >> 5)) & 0xFF
            r[ys, xs] = rr
            b[ys, xs] = bb
    return _px_join(a, r, g.astype(np.int64), b)


def _inv_subtract_green(img: np.ndarray):
    a, r, g, b = _px_split(img)
    return _px_join(a, (r + g) & 0xFF, g, (b + g) & 0xFF)


# ---------------------------------------------------------------------------
# decoder entry
# ---------------------------------------------------------------------------

def decode_webp(data: bytes) -> np.ndarray:
    """Decode a lossless WebP to (h, w, 3) uint8 RGB (alpha dropped, as
    the other image decoders do). ValueError-only on malformed input."""
    try:
        return _decode_webp(data)
    except ValueError:
        raise
    except (IndexError, KeyError, AttributeError, OverflowError,
            struct.error) as e:
        raise ValueError(f"corrupt WebP stream: {type(e).__name__}: {e}") from e


def _decode_webp(data: bytes) -> np.ndarray:
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP header)")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            payload = body
            break
        if tag == b"VP8 ":
            raise ValueError(
                "lossy WebP (VP8) needs a library backend; this decoder "
                "covers lossless VP8L"
            )
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if payload is None:
        raise ValueError("no VP8L chunk found")
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _Bits(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    if w * h > MAX_PIXELS:
        raise ValueError(f"implausible WebP dimensions {w}x{h}")
    img = _decode_spatial(br, w, h)
    a, r, g, b = _px_split(img)
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def _decode_spatial(br: _Bits, w: int, h: int) -> np.ndarray:
    transforms = []
    xsize = w
    seen = set()
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype == 0:  # PREDICTOR
            size_bits = br.read(3) + 2
            bw = -(-xsize // (1 << size_bits))
            bh = -(-h // (1 << size_bits))
            sub = _read_entropy_image(br, bw, bh, False)
            transforms.append(("pred", size_bits, (sub >> 8) & 0xFF))
        elif ttype == 1:  # COLOR
            size_bits = br.read(3) + 2
            bw = -(-xsize // (1 << size_bits))
            bh = -(-h // (1 << size_bits))
            sub = _read_entropy_image(br, bw, bh, False)
            transforms.append(("color", size_bits, sub & 0x00FFFFFF))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append(("subg",))
        else:  # COLOR_INDEXING
            n_colors = br.read(8) + 1
            pal_img = _read_entropy_image(br, n_colors, 1, False)
            pal = np.cumsum(
                np.stack(_px_split(pal_img[0]), axis=1).astype(np.int64),
                axis=0,
            ) & 0xFF  # palette entries are delta-coded per channel
            if n_colors <= 2:
                wbits = 3
            elif n_colors <= 4:
                wbits = 2
            elif n_colors <= 16:
                wbits = 1
            else:
                wbits = 0
            transforms.append(("index", wbits, pal, xsize))
            xsize = -(-xsize // (1 << wbits))
    img = _read_entropy_image(br, xsize, h, True)
    for t in reversed(transforms):
        if t[0] == "pred":
            img = _inv_predictor(img, t[2], t[1])
        elif t[0] == "color":
            img = _inv_color_transform(img, t[2], t[1])
        elif t[0] == "subg":
            img = _inv_subtract_green(img)
        else:
            _, wbits, pal, orig_w = t
            idx = (img >> 8) & 0xFF  # indices ride the green channel
            if wbits:
                per = 1 << wbits
                bits = 8 >> wbits
                cols = []
                for j in range(per):
                    cols.append((idx >> (j * bits)) & ((1 << bits) - 1))
                idx = np.stack(cols, axis=2).reshape(img.shape[0], -1)
                idx = idx[:, :orig_w]
            if int(idx.max()) >= pal.shape[0]:
                raise ValueError("VP8L palette index out of range")
            px = pal[idx.reshape(-1)]
            img = _px_join(
                px[:, 0], px[:, 1], px[:, 2], px[:, 3]
            ).reshape(idx.shape)
    return img


# ---------------------------------------------------------------------------
# encoder (fixture/test generator; every decoder path reachable)
# ---------------------------------------------------------------------------

def _complete_lengths(freqs: dict[int, int], alphabet_size: int) -> list[int]:
    """Kraft-complete canonical lengths over exactly the symbols present:
    with k symbols and L = ceil(log2 k), 2^L - k symbols get length L-1
    and the rest L (shorter lengths to the more frequent). k == 1 maps to
    the 0-bit single-symbol code."""
    syms = sorted(freqs, key=lambda s: (-freqs[s], s))
    k = len(syms)
    lengths = [0] * alphabet_size
    if k == 0:
        return lengths
    if k == 1:
        lengths[syms[0]] = 1
        return lengths
    L = max(1, (k - 1).bit_length())
    n_short = (1 << L) - k
    for i, s in enumerate(syms):
        lengths[s] = L - 1 if i < n_short else L
    return lengths


def _write_code(bw: _BitsW, lengths: list[int]):
    """Emit one Huffman code definition: the simple form when it fits,
    else the normal (code-length-coded) form."""
    nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
    if 1 <= len(nz) <= 2 and all(s <= 255 for s, _ in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        s0 = nz[0][0]
        if s0 <= 1 and len(nz) == 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        if len(nz) == 2:
            bw.write(nz[1][0], 8)
        return
    bw.write(0, 1)  # normal
    # RLE the lengths into code-length-code symbols
    tokens: list[tuple[int, int, int]] = []  # (clc_symbol, extra, n_extra)
    i = 0
    n = len(lengths)
    while i < n:
        if lengths[i] == 0:
            run = 1
            while i + run < n and lengths[i + run] == 0:
                run += 1
            left = run
            while left >= 11:
                take = min(left, 138)
                tokens.append((18, take - 11, 7))
                left -= take
            while left >= 3:
                take = min(left, 10)
                tokens.append((17, take - 3, 3))
                left -= take
            tokens.extend((0, 0, 0) for _ in range(left))
            i += run
        else:
            tokens.append((lengths[i], 0, 0))
            i += 1
    clc_freq: dict[int, int] = {}
    for sym, _, _ in tokens:
        clc_freq[sym] = clc_freq.get(sym, 0) + 1
    clc_lengths = _complete_lengths(clc_freq, 19)
    if sum(1 for l in clc_lengths if l) == 1:
        # the reader needs a decodable (>=2 symbol) CLC; pad with a dummy
        dummy = 15 if clc_lengths[15] == 0 else 14
        clc_freq[dummy] = 0
        only = next(s for s, l in enumerate(clc_lengths) if l)
        clc_lengths = [0] * 19
        clc_lengths[only] = 1
        clc_lengths[dummy] = 1
    bw.write(15, 4)  # num_code_lengths = 4 + 15 = 19: write all slots
    for s in _CLC_ORDER:
        bw.write(clc_lengths[s], 3)
    bw.write(0, 1)  # no max_symbol limit
    clc_codes = _canonical(clc_lengths)
    for sym, extra, n_extra in tokens:
        c, l = clc_codes[sym]
        bw.write(_rev(c, l), l)
        if n_extra:
            bw.write(extra, n_extra)


def _tokenize(pixels: np.ndarray, w: int, cache_bits: int,
              use_lz77: bool, dist_rev: dict[int, int]):
    """Pixel stream -> token list; mirrors the decoder's cache updates."""
    flat = [int(p) for p in pixels.reshape(-1)]
    n = len(flat)
    cache = [0] * ((1 << cache_bits) if cache_bits else 0)
    toks = []
    pos = 0
    while pos < n:
        if use_lz77 and pos > 0:
            best_len = 0
            best_dist = 0
            for dist in (1, w, w + 1, w - 1):
                if dist < 1 or dist > pos:
                    continue
                ln = 0
                while (pos + ln < n and ln < 4096
                       and flat[pos + ln - dist] == flat[pos + ln]):
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
            if best_len >= 3:
                code_val = dist_rev.get(best_dist, best_dist + 120)
                toks.append(("copy", best_len, code_val))
                for i in range(best_len):
                    px = flat[pos - best_dist + i]
                    if cache_bits:
                        cache[(0x1E35A7BD * px & 0xFFFFFFFF)
                              >> (32 - cache_bits)] = px
                pos += best_len
                continue
        px = flat[pos]
        if cache_bits:
            idx = (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[idx] == px and pos > 0:
                toks.append(("cache", idx))
                pos += 1
                continue
            cache[idx] = px
        toks.append(("lit", px))
        pos += 1
    return toks


def _write_entropy_image(bw: _BitsW, pixels: np.ndarray, is_main: bool,
                         cache_bits: int = 0, use_lz77: bool = False,
                         meta_bits: int | None = None):
    h, w = pixels.shape
    dist_rev: dict[int, int] = {}
    if use_lz77:
        for i in range(119, -1, -1):
            dx, dy = _DIST_MAP[i]
            d = int(dy) * w + int(dx)
            if d >= 1:
                dist_rev[d] = i + 1  # smaller code wins on ties
    if is_main:
        if meta_bits is not None:
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            mw = -(-w // (1 << meta_bits))
            mh = -(-h // (1 << meta_bits))
            gid = (np.add.outer(np.arange(mh), np.arange(mw)) & 1)
            meta_px = (0xFF << 24) | (gid.astype(np.int64) << 8)
            _write_entropy_image(bw, meta_px, False)
            n_groups = 2
        else:
            bw.write(0, 1)
            n_groups = 1
    else:
        n_groups = 1
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    cache_size = (1 << cache_bits) if cache_bits else 0

    toks = _tokenize(pixels, w, cache_bits, use_lz77, dist_rev)
    # assign each token to its group by the position of its FIRST pixel
    group_of = []
    if is_main and meta_bits is not None:
        pos = 0
        for t in toks:
            y, x = divmod(pos, w)
            group_of.append(((y >> meta_bits) + (x >> meta_bits)) & 1)
            pos += t[1] if t[0] == "copy" else 1
    else:
        group_of = [0] * len(toks)

    hists = [
        {"g": {}, "r": {}, "b": {}, "a": {}, "d": {}} for _ in range(n_groups)
    ]

    def bump(hist, key):
        hist[key] = hist.get(key, 0) + 1

    for t, gi in zip(toks, group_of):
        hs = hists[gi]
        if t[0] == "lit":
            px = t[1]
            bump(hs["g"], (px >> 8) & 0xFF)
            bump(hs["r"], (px >> 16) & 0xFF)
            bump(hs["b"], px & 0xFF)
            bump(hs["a"], (px >> 24) & 0xFF)
        elif t[0] == "cache":
            bump(hs["g"], 256 + 24 + t[1])
        else:
            bump(hs["g"], 256 + _prefix_code(t[1])[0])
            bump(hs["d"], _prefix_code(t[2])[0])

    all_codes = []
    for hs in hists:
        for key, alpha in (("g", 256 + 24 + cache_size), ("r", 256),
                           ("b", 256), ("a", 256), ("d", 40)):
            freqs = hs[key]
            if not freqs:
                freqs = {0: 1}  # unused code: valid 1-symbol definition
            lengths = _complete_lengths(freqs, alpha)
            _write_code(bw, lengths)
            all_codes.append(_canonical(lengths))
    groups = [tuple(all_codes[i * 5 : i * 5 + 5]) for i in range(n_groups)]

    def put(codes, sym):
        c, l = codes[sym]
        if l == 1 and len(codes) == 1:
            return  # single-symbol code: 0 bits on the wire
        bw.write(_rev(c, l), l)

    for t, gi in zip(toks, group_of):
        gc, rc, bc, ac, dc = groups[gi]
        if t[0] == "lit":
            px = t[1]
            put(gc, (px >> 8) & 0xFF)
            put(rc, (px >> 16) & 0xFF)
            put(bc, px & 0xFF)
            put(ac, (px >> 24) & 0xFF)
        elif t[0] == "cache":
            put(gc, 256 + 24 + t[1])
        else:
            code, extra, n_extra = _prefix_code(t[1])
            put(gc, 256 + code)
            if n_extra:
                bw.write(extra, n_extra)
            code, extra, n_extra = _prefix_code(t[2])
            put(dc, code)
            if n_extra:
                bw.write(extra, n_extra)


def _fwd_predictor(img: np.ndarray, modes: np.ndarray, size_bits: int):
    h, w = img.shape
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(img[0, x - 1])
            elif x == 0:
                pred = int(img[y - 1, 0])
            else:
                mode = int(modes[y >> size_bits, x >> size_bits])
                left = int(img[y, x - 1])
                top = int(img[y - 1, x])
                tl = int(img[y - 1, x - 1])
                tr = int(img[y - 1, x + 1]) if x + 1 < w else int(img[y - 1, x])
                pred = _predict(mode, left, top, tl, tr)
            out[y, x] = _sub_px(int(img[y, x]), pred)
    return out


def encode_webp(
    img: np.ndarray,
    subtract_green: bool = False,
    predictor: int | None = None,
    predictor_size_bits: int = 4,
    color_transform: tuple[int, int, int] | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    use_lz77: bool = False,
    meta_bits: int | None = None,
) -> bytes:
    """Encode (h, w, 3) or (h, w, 4) uint8 to a lossless WebP.

    `predictor`: a fixed mode 0..13, or -1 to vary the mode per block
    (cycling through all 14 — the full-coverage fixture). `palette`
    excludes the other pixel transforms (as real encoders do)."""
    img = np.asarray(img, np.uint8)
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    alpha = (img[:, :, 3].astype(np.int64) if img.shape[2] == 4
             else np.full((h, w), 255, np.int64))
    px = _px_join(alpha, img[:, :, 0].astype(np.int64),
                  img[:, :, 1].astype(np.int64),
                  img[:, :, 2].astype(np.int64))

    bw = _BitsW()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(int((alpha != 255).any()), 1)
    bw.write(0, 3)  # version

    if palette:
        if subtract_green or predictor is not None or color_transform:
            raise ValueError("palette excludes the other pixel transforms")
        colors, inv = np.unique(px.reshape(-1), return_inverse=True)
        n_colors = len(colors)
        if n_colors > 256:
            raise ValueError("palette requires <= 256 distinct colors")
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(n_colors - 1, 8)
        chans = np.stack(_px_split(colors), axis=1).astype(np.int64)
        deltas = np.diff(np.vstack([[[0, 0, 0, 0]], chans]), axis=0) & 0xFF
        pal_px = _px_join(deltas[:, 0], deltas[:, 1],
                          deltas[:, 2], deltas[:, 3]).reshape(1, -1)
        _write_entropy_image(bw, pal_px, False)
        idx = inv.reshape(h, w).astype(np.int64)
        if n_colors <= 2:
            wbits = 3
        elif n_colors <= 4:
            wbits = 2
        elif n_colors <= 16:
            wbits = 1
        else:
            wbits = 0
        if wbits:
            per = 1 << wbits
            bits = 8 >> wbits
            pw = -(-w // per)
            packed = np.zeros((h, pw), np.int64)
            for j in range(per):
                col = idx[:, j::per]
                packed[:, : col.shape[1]] |= col << (j * bits)
            main = (0xFF << 24) | (packed << 8)
        else:
            main = (0xFF << 24) | (idx << 8)
    else:
        main = px
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)  # SUBTRACT_GREEN
            a, r, g, b = _px_split(main)
            main = _px_join(a, (r - g) & 0xFF, g, (b - g) & 0xFF)
        if color_transform is not None:
            bw.write(1, 1)
            bw.write(1, 2)  # COLOR
            sb = predictor_size_bits
            bw.write(sb - 2, 3)
            bwidth = -(-w // (1 << sb))
            bheight = -(-h // (1 << sb))
            g2r, g2b, r2b = (v & 0xFF for v in color_transform)
            ct_px = np.full((bheight, bwidth),
                            (0xFF << 24) | (g2r << 16) | (g2b << 8) | r2b,
                            np.int64)
            _write_entropy_image(bw, ct_px, False)
            a, r, g, b = _px_split(main)
            nr = np.zeros_like(r)
            nb = np.zeros_like(b)
            for y in range(h):
                for x in range(w):
                    gg = int(g[y, x])
                    rr = int(r[y, x])
                    nr[y, x] = (rr - _ct_delta(g2r, gg)) & 0xFF
                    nb[y, x] = (int(b[y, x]) - _ct_delta(g2b, gg)
                                - _ct_delta(r2b, rr)) & 0xFF
            main = _px_join(a, nr, g, nb)
        if predictor is not None:
            bw.write(1, 1)
            bw.write(0, 2)  # PREDICTOR
            sb = predictor_size_bits
            bw.write(sb - 2, 3)
            bwidth = -(-w // (1 << sb))
            bheight = -(-h // (1 << sb))
            if predictor == -1:
                modes = (np.add.outer(np.arange(bheight) * 3,
                                      np.arange(bwidth)) % 14)
            else:
                modes = np.full((bheight, bwidth), predictor)
            modes = modes.astype(np.int64)
            mode_px = (0xFF << 24) | (modes << 8)
            _write_entropy_image(bw, mode_px, False)
            main = _fwd_predictor(main, modes, sb)
    bw.write(0, 1)  # no more transforms
    _write_entropy_image(bw, main, True, cache_bits=cache_bits,
                         use_lz77=use_lz77, meta_bits=meta_bits)
    payload = b"\x2F" + bw.finish()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
