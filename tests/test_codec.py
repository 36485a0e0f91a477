"""Unit + property tests for the posting-list codec and SmallFloat norms."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nexlt_ray.codec import (
    decode_block,
    decode_block_positions,
    decode_postings,
    encode_postings,
    small_float_byte4_to_int,
    small_float_int_to_byte4,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (varint_decode(varint_encode(arr)) == arr).all()


def test_varint_known_encodings():
    assert varint_encode(np.array([0], np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], np.uint64)) == b"\xac\x02"


def test_smallfloat_exact_below_8_and_monotonic():
    v = np.arange(0, 200000)
    enc = small_float_int_to_byte4(v)
    dec = small_float_byte4_to_int(enc)
    assert (dec[:16] == v[:16]).all()  # 4-bit mantissa keeps 0..15 exact
    assert (np.diff(enc.astype(int)) >= 0).all()  # monotonic
    assert (dec <= v).all()  # decode never overshoots (floor semantics)
    # relative error bounded by mantissa width
    big = v >= 8
    assert (v[big] - dec[big] <= v[big] // 8).all()


def test_smallfloat_known_values():
    # hand-computed from the Lucene SmallFloat intToByte4 algorithm
    for i, b, back in [(0, 0, 0), (7, 7, 7), (12, 12, 12), (100, 36, 96), (5000, 81, 4608)]:
        assert int(small_float_int_to_byte4(i)[0]) == b
        assert int(small_float_byte4_to_int(b)[0]) == back


@pytest.mark.parametrize("n", [1, 3, 127, 128, 129, 1000])
def test_postings_roundtrip(n):
    rng = np.random.default_rng(n)
    docs = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 30, size=n).astype(np.int64)
    norms = rng.integers(0, 256, size=n).astype(np.uint8)
    pos_flat = np.concatenate(
        [np.sort(rng.choice(5000, size=int(t), replace=False)) for t in tfs]
    ).astype(np.int64)
    enc = encode_postings(docs, tfs, norms, pos_flat=pos_flat)
    assert enc["df"] == n and enc["cf"] == int(tfs.sum())
    d, t = decode_postings(enc["blob"], enc["block_off"], enc["block_last"], n)
    assert (d == docs).all() and (t == tfs).all()
    # block metadata
    nb = len(enc["block_off"])
    assert nb == (n + 127) // 128
    cum = np.concatenate(([0], np.cumsum(tfs)))
    for bi in range(nb):
        lo, hi = bi * 128, min((bi + 1) * 128, n)
        assert enc["block_last"][bi] == docs[hi - 1]
        assert enc["block_max_tf"][bi] == tfs[lo:hi].max()
        assert enc["block_min_norm"][bi] == norms[lo:hi].min()
        plists = decode_block_positions(enc["pos_blob"], enc["block_pos_off"], bi, n)
        for j, p in enumerate(plists):
            i = lo + j
            assert (p == pos_flat[cum[i] : cum[i + 1]]).all()
        d2, t2 = decode_block(
            np.frombuffer(enc["blob"], np.uint8), enc["block_off"], enc["block_last"], bi, n
        )
        assert (d2 == docs[lo:hi]).all() and (t2 == tfs[lo:hi]).all()


def test_postings_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_postings(
            np.array([5, 3]), np.array([1, 1]), np.array([0, 0], np.uint8)
        )


def _random_postings(rng, n, doc_space=10**7, max_tf=30, pos_space=5000):
    docs = np.sort(rng.choice(doc_space, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, max_tf, size=n).astype(np.int64)
    norms = rng.integers(0, 256, size=n).astype(np.uint8)
    pos_flat = np.concatenate(
        [np.sort(rng.choice(pos_space, size=int(t), replace=False)) for t in tfs]
    ).astype(np.int64)
    return docs, tfs, norms, pos_flat


@pytest.mark.parametrize("n", [1, 3, 127, 128, 129, 1000])
def test_for_codec_matches_varint(n):
    """FOR bit-packed blocks decode to EXACTLY what the varint codec decodes:
    same docs/tfs/positions, same block metadata — only the blob bytes differ."""
    from nexlt_ray.codec import (
        decode_positions_span,
        decode_positions_span_for,
        decode_span,
        decode_span_for,
        encode_postings_for,
        first_block_deltas,
    )

    rng = np.random.default_rng(1000 + n)
    docs, tfs, norms, pos_flat = _random_postings(rng, n)
    ev = encode_postings(docs, tfs, norms, pos_flat=pos_flat)
    ef = encode_postings_for(docs, tfs, norms, pos_flat=pos_flat)

    # metadata identical across codecs
    for k in ("df", "cf", "max_tf", "min_norm"):
        assert ev[k] == ef[k]
    for k in ("block_last", "block_max_tf", "block_min_norm"):
        assert np.array_equal(ev[k], ef[k]), k

    nblocks = len(ef["block_off"])
    for lo in range(nblocks):
        for hi in range(lo, nblocks + 2):
            dv, tv = decode_span(ev["blob"], ev["block_off"], ev["block_last"], lo, hi, n)
            df_, tf_ = decode_span_for(
                ef["blob"], ef["block_off"], ef["block_last"], lo, hi, n
            )
            assert np.array_equal(dv, df_), (lo, hi)
            assert np.array_equal(tv, tf_), (lo, hi)
            cv, pv = decode_positions_span(ev["pos_blob"], ev["block_pos_off"], lo, hi, n)
            cf_, pf_ = decode_positions_span_for(
                ef["pos_blob"], ef["block_pos_off"], lo, hi, n
            )
            assert np.array_equal(cv, cf_), (lo, hi)
            assert np.array_equal(pv, pf_), (lo, hi)

    # exact skip pointers: first docID of block bi via first_block_deltas
    fv = first_block_deltas(ev["blob"], ev["block_off"], codec="varint")
    ff = first_block_deltas(ef["blob"], ef["block_off"], codec="for")
    assert np.array_equal(fv, ff)
    firsts = docs[128 * np.arange(nblocks)]
    prev_last = np.concatenate(([0], ev["block_last"][:-1]))
    assert np.array_equal(prev_last + ff.astype(np.int64), firsts)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=1, max_value=70),
        ),
        min_size=1,
        max_size=300,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=0, max_value=2**32),
)
@settings(max_examples=60, deadline=None)
def test_for_codec_fuzz(pairs, seed):
    """Hypothesis fuzz: arbitrary doc gaps (incl. huge strided-ID gaps) and
    tf spreads round-trip bit-identically through the FOR codec."""
    from nexlt_ray.codec import (
        decode_positions_span_for,
        decode_span_for,
        encode_postings_for,
    )

    pairs.sort()
    docs = np.array([p[0] for p in pairs], dtype=np.int64)
    tfs = np.array([p[1] for p in pairs], dtype=np.int64)
    n = docs.size
    rng = np.random.default_rng(seed)
    norms = rng.integers(0, 256, size=n).astype(np.uint8)
    starts = rng.integers(0, 2**30, size=n)
    starts[rng.random(n) < 0.2] = 0  # absolute position 0 -> width-0 blocks
    # first position is the start itself (delta 0 reachable): a single
    # position 0 in a trailing block packs to ZERO bits and sits exactly at
    # the blob end — the regression class below
    pos_flat = np.concatenate(
        [
            s + np.concatenate(([0], np.cumsum(rng.integers(1, 1000, size=int(t) - 1))))
            for s, t in zip(starts, tfs)
        ]
    ).astype(np.int64)
    enc = encode_postings_for(docs, tfs, norms, pos_flat=pos_flat)
    d, t = decode_span_for(
        enc["blob"], enc["block_off"], enc["block_last"], 0, len(enc["block_off"]), n
    )
    assert np.array_equal(d, docs) and np.array_equal(t, tfs)
    c, p = decode_positions_span_for(
        enc["pos_blob"], enc["block_pos_off"], 0, len(enc["block_pos_off"]), n
    )
    assert np.array_equal(c, tfs) and np.array_equal(p, pos_flat)


def test_for_codec_smaller_than_varint_on_dense_lists():
    """The point of FOR: dense postings (small deltas) pack below varint's
    1-byte-per-value floor."""
    from nexlt_ray.codec import encode_postings_for

    rng = np.random.default_rng(7)
    n = 4096
    docs = np.cumsum(rng.integers(1, 4, size=n)).astype(np.int64)  # ~2-bit deltas
    tfs = rng.integers(1, 4, size=n).astype(np.int64)
    norms = rng.integers(0, 256, size=n).astype(np.uint8)
    ev = encode_postings(docs, tfs, norms)
    ef = encode_postings_for(docs, tfs, norms)
    assert len(ef["blob"]) < 0.6 * len(ev["blob"])


def test_decode_positions_span_fast_equals_reference():
    """The one-pass span decoder vs the per-block reference, over random
    posting lists and every (bi_lo, bi_hi) window."""
    import numpy as np

    from nexlt_ray.codec import (
        BLOCK_SIZE,
        decode_positions_span,
        decode_positions_span_ref,
        varint_encode,
    )

    rng = np.random.default_rng(31)
    for trial in range(6):
        n_total = int(rng.integers(1, 5 * BLOCK_SIZE))
        tfs = rng.integers(0, 6, n_total)  # zero-tf postings allowed
        # build the blob exactly like the indexer: per block, counts then
        # per-posting deltas (first absolute, rest deltas)
        blob = b""
        offs = []
        pos_per_posting = [
            np.sort(rng.choice(10_000, t, replace=False)) for t in tfs
        ]
        for b0 in range(0, n_total, BLOCK_SIZE):
            offs.append(len(blob))
            cnts = tfs[b0 : b0 + BLOCK_SIZE]
            blob += varint_encode(cnts.astype(np.uint64))
            deltas = []
            for p in pos_per_posting[b0 : b0 + BLOCK_SIZE]:
                if p.size:
                    deltas.append(np.concatenate(([p[0]], np.diff(p))))
            if deltas:
                blob += varint_encode(
                    np.concatenate(deltas).astype(np.uint64)
                )
        offs = np.asarray(offs, np.int64)
        nblocks = len(offs)
        for lo in range(nblocks):
            for hi in range(lo, nblocks + 2):
                a = decode_positions_span(blob, offs, lo, hi, n_total)
                e = decode_positions_span_ref(blob, offs, lo, hi, n_total)
                assert np.array_equal(a[0], e[0]), (trial, lo, hi)
                assert np.array_equal(a[1], e[1]), (trial, lo, hi)


def test_for_positions_width_zero_at_blob_end():
    """Regression (found by check_index on a 1M-doc index): a trailing
    block whose position stream packs to WIDTH 0 (single posting, single
    position 0) puts the value's bit offset exactly at the blob end; the
    full-span two-word gather then indexed one word past the padded view
    and raised IndexError, while per-block decode (per-slice re-pad)
    worked. _gather_bits now clamps — width-0 values read only masked
    bits."""
    from nexlt_ray.codec import (
        decode_positions_span_for,
        encode_postings_for,
    )

    n = 129  # two blocks: 128 + 1 — the trailing block has one posting
    docs = np.arange(1, n + 1, dtype=np.int64)
    tfs = np.ones(n, dtype=np.int64)
    norms = np.full(n, 100, dtype=np.uint8)
    pos_flat = np.arange(n, dtype=np.int64)
    pos_flat[-1] = 0  # last block's only position: 0 -> width-0 packing
    enc = encode_postings_for(docs, tfs, norms, pos_flat=pos_flat)
    nblocks = len(enc["block_pos_off"])
    c, p = decode_positions_span_for(
        enc["pos_blob"], enc["block_pos_off"], 0, nblocks, n
    )
    assert np.array_equal(c, tfs)
    assert np.array_equal(p, pos_flat)
    # per-block decode agrees (it always did; keep them pinned together)
    cs, ps = [], []
    for b in range(nblocks):
        cb, pb = decode_positions_span_for(
            enc["pos_blob"], enc["block_pos_off"], b, b + 1, n
        )
        cs.append(cb)
        ps.append(pb)
    assert np.array_equal(np.concatenate(cs), tfs)
    assert np.array_equal(np.concatenate(ps), pos_flat)
    # the crash additionally needs the blob end WORD-ALIGNED (the eager
    # words[wi+1] gather only leaves the padded view then): replay a
    # deterministic search over mixed-tf shapes and check every aligned
    # blob against the per-block reference — trial 6 of this exact seed
    # raised IndexError before the clamp
    rng = np.random.default_rng(0)
    n_aligned = 0
    for _ in range(40):
        tfs2 = rng.integers(1, 4, size=n).astype(np.int64)
        tfs2[-1] = 1
        pos2 = []
        for j, t in enumerate(tfs2):
            if j == n - 1:
                pos2.append(np.array([0], dtype=np.int64))
            else:
                start = int(rng.integers(0, 1000))
                pos2.append(start + np.concatenate(
                    ([0], np.cumsum(rng.integers(1, 50, size=int(t) - 1)))
                ).astype(np.int64))
        pf2 = np.concatenate(pos2)
        e2 = encode_postings_for(
            np.arange(1, n + 1, dtype=np.int64), tfs2,
            np.full(n, 100, dtype=np.uint8), pos_flat=pf2,
        )
        if len(e2["pos_blob"]) % 8:
            continue
        n_aligned += 1
        nb2 = len(e2["block_pos_off"])
        c2, p2 = decode_positions_span_for(
            e2["pos_blob"], e2["block_pos_off"], 0, nb2, n
        )
        assert np.array_equal(c2, tfs2) and np.array_equal(p2, pf2)
    assert n_aligned >= 1  # the search must actually exercise aligned blobs
