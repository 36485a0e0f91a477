"""WebP lossless (VP8L) codec tests.

Round-trip bit-exactness across the full transform/coding matrix, plus
independent hand-built streams pinning the spec conventions the
round-trips alone can't distinguish (canonical code assignment, prefix
code values, the near-distance table prefix published in the spec).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nexlt_ray.webp import (
    _DIST_MAP,
    _Bits,
    _BitsW,
    _canonical,
    _HuffDec,
    _prefix_code,
    _prefix_value,
    _rev,
    decode_webp,
    encode_webp,
)


def _rt(img, **kw):
    dec = decode_webp(encode_webp(img, **kw))
    exp = img[:, :, :3] if img.ndim == 3 else np.repeat(img[:, :, None], 3, 2)
    assert np.array_equal(dec, exp), kw


def test_webp_roundtrip_transform_matrix():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (23, 17, 3), np.uint8)
    _rt(img)
    _rt(img, subtract_green=True)
    _rt(img, predictor=7)
    _rt(img, predictor=-1, predictor_size_bits=2)  # all 14 modes
    _rt(img, color_transform=(0x40, 0x23, 0xF0))
    _rt(img, subtract_green=True, color_transform=(9, 200, 77),
        predictor=-1, predictor_size_bits=3)
    _rt(img, cache_bits=6)
    _rt(img, meta_bits=3)
    _rt(img, subtract_green=True, predictor=5, cache_bits=5,
        use_lz77=True, meta_bits=2)


def test_webp_lz77_and_cache():
    rng = np.random.default_rng(10)
    # repetitive image: long matches at distances 1 / w / w±1, plus
    # near-map and plain distance codes
    img = np.repeat(np.repeat(rng.integers(0, 256, (6, 5, 3), np.uint8), 4, 0),
                    4, 1)
    _rt(img, use_lz77=True)
    _rt(img, use_lz77=True, cache_bits=4)
    _rt(np.repeat(rng.integers(0, 256, (8, 21, 3), np.uint8)[:1], 30, axis=0),
        use_lz77=True, cache_bits=8)


def test_webp_palette_every_packing_width():
    rng = np.random.default_rng(11)
    for ncol in (2, 3, 4, 5, 16, 17, 200, 256):
        pal = rng.integers(0, 256, (ncol, 3), np.uint8)
        img = pal[rng.integers(0, ncol, (19, 21))]
        _rt(img, palette=True)
    # width not a multiple of the packing factor
    pal = rng.integers(0, 256, (3, 3), np.uint8)
    _rt(pal[rng.integers(0, 3, (7, 13))], palette=True)
    _rt(pal[rng.integers(0, 3, (7, 1))], palette=True)


def test_webp_alpha_and_edge_sizes():
    rng = np.random.default_rng(12)
    rgba = rng.integers(0, 256, (9, 9, 4), np.uint8)
    assert np.array_equal(decode_webp(encode_webp(rgba)), rgba[:, :, :3])
    for shape in ((1, 1, 3), (1, 40, 3), (40, 1, 3), (2, 2, 3)):
        _rt(rng.integers(0, 256, shape, np.uint8), predictor=-1)


def test_webp_vp8x_container_and_rejects():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (5, 7, 3), np.uint8)
    plain = encode_webp(img)
    # rewrap: VP8X header chunk first, then the VP8L chunk
    vp8l_chunk = plain[12:]
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + bytes(10)
    body = b"WEBP" + vp8x + vp8l_chunk
    wrapped = b"RIFF" + len(body).to_bytes(4, "little") + body
    assert np.array_equal(decode_webp(wrapped), img)
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp(b"NOPE" + plain[4:])
    lossy = plain[:12] + b"VP8 " + plain[16:]
    with pytest.raises(ValueError, match="lossy"):
        decode_webp(lossy)
    with pytest.raises(ValueError, match="VP8L chunk"):
        decode_webp(plain[:12])


def test_prefix_code_values_match_spec_table():
    """Spec 6.2.3: prefix codes 0..3 mean 1..4; code k >= 4 spans
    [(2+(k&1))<<((k-2)>>1)] + 1 ... with (k-2)>>1 extra bits. Check the
    decoder against the closed-form table and the encoder inverse."""
    expected_first = {0: 1, 1: 2, 2: 3, 3: 4}
    for code, v in expected_first.items():
        br = _Bits(b"\x00" * 4)
        assert _prefix_value(code, br) == v
    # code 4: 1 extra bit -> values 5..6 ; code 5: -> 7..8 ; code 6: 2 bits 9..12
    for code, lo, hi in ((4, 5, 6), (5, 7, 8), (6, 9, 12), (7, 13, 16),
                         (8, 17, 24), (9, 25, 32)):
        n_extra = (code - 2) >> 1
        for extra in (0, (1 << n_extra) - 1):
            bw = _BitsW()
            bw.write(extra, n_extra)
            br = _Bits(bw.finish() + b"\x00")
            got = _prefix_value(code, br)
            assert got == (lo if extra == 0 else hi)
    # encoder inverse is exact over the whole LZ77 range
    for v in list(range(1, 300)) + [4095, 4096]:
        code, extra, n_extra = _prefix_code(v)
        bw = _BitsW()
        bw.write(extra, n_extra)
        br = _Bits(bw.finish() + b"\x00")
        assert _prefix_value(code, br) == v


def test_distance_map_prefix_matches_spec():
    """The first rows of the spec's published 120-entry neighborhood
    table; deeper entries follow the same generation rule (module
    docstring records the reconstruction caveat)."""
    spec_prefix = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
        (4, 2), (-4, 2),
    ]
    assert [tuple(e) for e in _DIST_MAP[: len(spec_prefix)]] == spec_prefix
    assert len(_DIST_MAP) == 120


def test_canonical_huffman_hand_built():
    """DEFLATE-style canonical assignment: lengths [2,1,3,3] ->
    codes B=0, A=10, C=110, D=111; bits stored reversed for the
    LSB-first reader. Decode a hand-packed symbol sequence."""
    lengths = [2, 1, 3, 3]
    codes = _canonical(lengths)
    assert codes == {1: (0, 1), 0: (2, 2), 2: (6, 3), 3: (7, 3)}
    dec = _HuffDec(lengths)
    bw = _BitsW()
    for sym in (1, 0, 2, 3, 1, 1, 0):
        c, l = codes[sym]
        bw.write(_rev(c, l), l)
    br = _Bits(bw.finish())
    out = [dec.next(br) for _ in range(7)]
    assert out == [1, 0, 2, 3, 1, 1, 0]


def test_webp_hand_built_minimal_stream():
    """Build a 2x1 all-literal VP8L stream bit by bit with an
    independent writer (no encoder involvement): simple 1-symbol codes
    for every channel -> the two pixels cost zero entropy bits."""
    bw = _BitsW()
    bw.write(1, 14)  # width-1 = 1 -> w=2
    bw.write(0, 14)  # height-1 = 0 -> h=1
    bw.write(0, 1)   # no alpha
    bw.write(0, 3)   # version
    bw.write(0, 1)   # no transforms
    bw.write(0, 1)   # no meta
    bw.write(0, 1)   # no cache
    # five simple codes, each a single symbol
    for sym in (77, 10, 20, 255, 0):  # green, red, blue, alpha, distance
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        bw.write(1, 1)  # 8-bit symbol
        bw.write(sym, 8)
    payload = b"\x2F" + bw.finish()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    data = b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
    out = decode_webp(data)
    assert out.shape == (1, 2, 3)
    assert np.array_equal(out[0, 0], [10, 77, 20])
    assert np.array_equal(out[0, 1], [10, 77, 20])


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31),
    subg=st.booleans(),
    pred=st.sampled_from([None, -1, 0, 7, 11, 12, 13]),
    cache=st.sampled_from([0, 3, 8]),
    lz=st.booleans(),
)
def test_webp_roundtrip_property(h, w, seed, subg, pred, cache, lz):
    rng = np.random.default_rng(seed)
    # mix noise with flat regions so LZ77/cache paths actually trigger
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    if h > 2:
        img[h // 2 :] = img[: h - h // 2]
    _rt(img, subtract_green=subg, predictor=pred, cache_bits=cache,
        use_lz77=lz, predictor_size_bits=2)


@settings(max_examples=40, deadline=None)
@given(cut=st.integers(0, 4000), flip=st.integers(0, 2**31),
       seed=st.integers(0, 5))
def test_webp_malformed_streams_raise_valueerror(cut, flip, seed):
    rng = np.random.default_rng(seed)
    payload = encode_webp(
        rng.integers(0, 256, (16, 16, 3), np.uint8),
        subtract_green=True, predictor=7, cache_bits=4, use_lz77=True,
    )
    trunc = payload[: cut % (len(payload) + 1)]
    b = bytearray(payload)
    b[12 + flip % (len(b) - 12)] ^= 1 + (flip >> 8) % 255
    for stream in (trunc, bytes(b)):
        try:
            out = decode_webp(stream)
            assert out.dtype == np.uint8 and out.ndim == 3
        except ValueError:
            pass  # the contract: ValueError or a valid image


def test_backend_dispatches_webp():
    from nexlt_ray.multimodal import StdlibDecodeBackend

    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, (12, 12, 3), np.uint8)
    be = StdlibDecodeBackend()
    assert np.array_equal(be.decode_image(encode_webp(img, predictor=7)), img)
