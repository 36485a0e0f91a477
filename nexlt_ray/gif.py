"""GIF87a/89a decoder + encoder (stdlib + numpy), from the public spec
(W3C/CompuServe GRAPHICS INTERCHANGE FORMAT 89a, 1990).

Decoder: logical screen descriptor, global/local color tables, interlaced
and sequential image data, LZW decompression (variable code width 3..12
bits, clear/EOI codes), 89a extension blocks skipped (graphic control,
comment, application). Returns the FIRST image frame as (h, w, 3) uint8
RGB — the decode_image contract; multi-frame animation enumeration is
`decode_gif_frames`.

Encoder: minimal single-frame 87a writer with a real LZW compressor —
exists so tests can round-trip arbitrary palettes/pixels bit-exactly (GIF
is lossless, so encode->decode == identity is a hard equality test, the
same strategy as the PNG/Y4M codecs in multimodal.py).

Entropy loops are per-code Python (bounded per payload; see the JPEG
module's speed note — same trade, same library-backend seam for bulk).
"""

from __future__ import annotations

import struct

import numpy as np


def _read_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF sub-blocks (len byte + payload) until a 0 terminator."""
    out = bytearray()
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: initial width min_code_size+1, dictionary grows to
    4096 entries, CLEAR resets, codes packed LSB-first.

    Width-bump discipline (the classic interop trap): a running next-code
    counter advances on EVERY data code read — not on table inserts — and
    the width grows when it passes 2^width (decoder mirror of the
    compress(1)/giflib encoder, whose pre-insert check runs after each
    emission). tests/test_jpeg.py pins this with a width-boundary fixture.
    """
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    def reset():
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return table, min_code_size + 1, eoi + 1

    table, width, next_code = reset()
    prev: bytes | None = None
    # LSB-first int accumulator (plain-int ops; no per-bit array reads)
    acc = nacc = ptr = 0
    n_data = len(data)
    while len(out) < n_pixels:
        while nacc < width:
            if ptr >= n_data:
                raise ValueError(
                    "LZW stream exhausted before all pixels decoded"
                )
            acc |= data[ptr] << nacc
            ptr += 1
            nacc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        if code == clear:
            table, width, next_code = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("corrupt LZW stream (code beyond table)")
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("LZW stream ended early")
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def _deinterlace(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out[order] = rows
    return out


#: dimension sanity cap, same rationale as jpeg.MAX_PIXELS
MAX_PIXELS = 100_000_000


def decode_gif_frames(data: bytes):
    """Yield (h, w, 3) uint8 RGB arrays, one per image block.

    Error contract (pipeline isolation): malformed/truncated streams raise
    ValueError — parser internals (IndexError/struct.error) never escape."""
    try:
        yield from _decode_gif_frames(data)
    except ValueError:
        raise
    except (IndexError, KeyError, OverflowError, struct.error) as e:
        raise ValueError(f"corrupt GIF stream: {type(e).__name__}: {e}") from e


def _decode_gif_frames(data: bytes):
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension: label + sub-blocks, all skipped
            pos += 1
            _, pos = _read_blocks(data, pos)
        elif b == 0x2C:  # image descriptor
            _, _, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
            if w * h > MAX_PIXELS or w == 0 or h == 0:
                raise ValueError(f"implausible GIF dimensions {w}x{h}")
            pos += 9
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("image has no color table")
            min_code = data[pos]
            pos += 1
            lzw, pos = _read_blocks(data, pos)
            idx = _lzw_decode(lzw, min_code, w * h)
            if iflags & 0x40:
                idx = _deinterlace(idx, w, h).ravel()
            yield ct[idx].reshape(h, w, 3)
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X}")


def decode_gif(data: bytes) -> np.ndarray:
    """First frame as (h, w, 3) uint8 RGB."""
    for frame in decode_gif_frames(data):
        return frame
    raise ValueError("GIF contains no image")


# --------------------------------------------------------------------------
# encoder (single frame, global color table, real LZW)
# --------------------------------------------------------------------------

def _lzw_encode(idx: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = n_acc = 0

    def emit(code: int, width: int):
        nonlocal acc, n_acc
        acc |= code << n_acc
        n_acc += width
        while n_acc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8

    # width-bump discipline mirrors _lzw_decode: after EVERY emission, bump
    # when the pre-insert next-code has reached 2^width (giflib order:
    # output, check, insert)
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    buf = b""
    for px in idx.tobytes():
        cand = buf + bytes([px])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code < 4095:
            table[cand] = next_code
            next_code += 1
        else:  # table nearly full: clear and restart (decoder stays in sync)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        buf = bytes([px])
    if buf:
        emit(table[buf], width)
        if next_code >= (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if n_acc:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 with <=256 distinct colors to GIF87a."""
    img = np.asarray(img, np.uint8)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if palette.shape[0] > 256:
        raise ValueError("encode_gif requires <=256 distinct colors")
    # color table size: power of two >= max(2, n)
    bits = max(1, int(np.ceil(np.log2(max(2, palette.shape[0])))))
    n_ct = 1 << bits
    ct = np.zeros((n_ct, 3), np.uint8)
    ct[: palette.shape[0]] = palette
    min_code = max(2, bits)

    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += ct.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code)
    lzw = _lzw_encode(idx.astype(np.uint8), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)
