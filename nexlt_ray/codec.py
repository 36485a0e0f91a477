"""Posting-list codec: group-varint-style byte encoding, delta compression,
block-max metadata, and Lucene SmallFloat doc-length norms.

Reference parity notes
----------------------
The reference stores postings inside Lucene 4.9 segments (configured at
/root/reference/solr/NeXLT/solr/collection1/conf/solrconfig.xml:201-234); we
re-express the same information — per term: (docID, tf[, positions]) lists,
df, total term frequency, and a one-byte doc-length norm per document
(schema norms discipline, schema.xml:1088) — as delta-encoded varint blobs in
Arrow/Parquet segment tables with per-block skip metadata (last docID, max tf,
min norm byte) enabling block-max WAND pruning.

Everything here is pure NumPy (no Ray): unit-testable, and fast enough to run
inside `map_batches` workers without per-row Python loops.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # postings per skip block (Lucene uses 128-doc packed blocks)

# ---------------------------------------------------------------------------
# Vectorized LEB128 varint codec (uint64-capable)
# ---------------------------------------------------------------------------


# LEB128 width thresholds: value < 2^(7k) needs k bytes
_WIDTH_THRESHOLDS = (np.uint64(1) << (np.uint64(7) * np.arange(1, 10, dtype=np.uint64)))


def _varint_widths(v: np.ndarray) -> np.ndarray:
    """Bytes each uint64 value needs under LEB128 (vectorized, >=1)."""
    return np.searchsorted(_WIDTH_THRESHOLDS, v, side="right").astype(np.int64) + 1


def varint_encode(values: np.ndarray, widths: np.ndarray | None = None) -> bytes:
    """Encode a uint64 array as concatenated LEB128 varints (vectorized).

    Each value is emitted little-endian, 7 bits per byte, high bit set on all
    but the final byte of a value. `widths` (from _varint_widths) may be
    passed to avoid recomputing byte counts.
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = _varint_widths(v) if widths is None else widths
    maxw = int(nbytes.max())
    if maxw == 1:  # common case: every value fits one byte
        return v.astype(np.uint8).tobytes()
    # scatter per byte plane directly into the output buffer: plane k only
    # touches the values wide enough to have a k-th byte, so the work per
    # plane shrinks with k (vs the old full (maxw, n) matrix + transposed
    # boolean select, which copied every byte twice)
    byte_start = np.cumsum(nbytes) - nbytes
    out = np.empty(int(byte_start[-1] + nbytes[-1]), dtype=np.uint8)
    chunk0 = (v & np.uint64(0x7F)).astype(np.uint8)
    chunk0 |= (nbytes > 1).astype(np.uint8) << 7
    out[byte_start] = chunk0
    for k in range(1, maxw):
        mask = nbytes > k
        vk = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        chunk = vk.astype(np.uint8)
        chunk |= (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[byte_start[mask] + k] = chunk
    return out.tobytes()


def varint_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode concatenated LEB128 varints to a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    # start of each value: position 0 and every position after a terminator
    starts = np.flatnonzero(np.concatenate(([True], is_last[:-1])))
    n = starts.size
    if count is not None:
        assert n == count, f"varint_decode: expected {count} values, got {n}"
    ends = np.concatenate((starts[1:], [b.size]))
    widths = ends - starts
    out = np.zeros(n, dtype=np.uint64)
    maxw = int(widths.max())
    for k in range(maxw):
        mask = widths > k
        chunk = b[starts[mask] + k].astype(np.uint64) & np.uint64(0x7F)
        out[mask] |= chunk << np.uint64(7 * k)
    return out


# ---------------------------------------------------------------------------
# Lucene SmallFloat norm byte (public Lucene SmallFloat.intToByte4 semantics)
# ---------------------------------------------------------------------------


def small_float_int_to_byte4(i: np.ndarray | int) -> np.ndarray:
    """Lucene `SmallFloat.intToByte4`: lossy 8-bit encoding of a non-negative
    int (doc length). Exact for values 0..7; above that, 3 mantissa bits +
    exponent. Monotonic. Matches Lucene 8+ norm encoding semantics (public
    Lucene source); the reference's Solr schema stores exactly such one-byte
    norms per doc (schema.xml:1088 DefaultSimilarity norms discipline).
    """
    v = np.atleast_1d(np.asarray(i, dtype=np.int64))
    if (v < 0).any():
        raise ValueError("negative length")
    out = np.empty(v.shape, dtype=np.uint8)
    small = v < 8  # numBits < 4
    out[small] = v[small].astype(np.uint8)
    big = ~small
    if big.any():
        vb = v[big]
        # numBits = position of highest set bit + 1
        numbits = 64 - _clz64(vb)
        shift = numbits - 4
        encoded = (vb >> shift) & 0x07 | ((shift + 1) << 3)
        if (encoded > 255).any():
            raise ValueError("length too large for byte4 encoding")
        out[big] = encoded.astype(np.uint8)
    return out


def _clz64(v: np.ndarray) -> np.ndarray:
    """Count leading zeros of positive int64 values (vectorized)."""
    # highest bit position via float log2 is unsafe near 2^53; use bit loop.
    bits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = tmp >= (np.int64(1) << np.int64(shift))
        bits[mask] += shift
        tmp[mask] >>= np.int64(shift)
    return 64 - (bits + 1)


def small_float_byte4_to_int(b: np.ndarray | int) -> np.ndarray:
    """Inverse of `small_float_int_to_byte4` (approximate doc length)."""
    v = np.atleast_1d(np.asarray(b, dtype=np.int64))
    bits = v & 0x07
    shift = (v >> 3) - 1
    out = np.where(shift == -1, bits, (bits | 0x08) << np.maximum(shift, 0))
    return out.astype(np.int64)


# Precomputed decode table (256 entries) — the analog of Lucene's norm cache.
NORM_DECODE_TABLE = small_float_byte4_to_int(np.arange(256))


# ---------------------------------------------------------------------------
# Posting-list block encoding
# ---------------------------------------------------------------------------


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    norm_bytes: np.ndarray,
    pos_flat: np.ndarray | None = None,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Encode one term's postings (sorted by doc_id ascending) into skip blocks.

    Returns a dict with:
      blob          bytes — concatenated per-block [doc deltas varint][tfs varint]
      pos_blob      bytes — per-block [npos varint per posting][pos deltas varint]
    ``pos_flat`` holds every posting's (sorted, ascending) positions
    concatenated in posting order; posting i owns the slice
    pos_flat[cumsum(tfs)[i-1] : cumsum(tfs)[i]] (len == its tf).
      block_last    int64[]  — last docID per block (skip pointers)
      block_off     int32[]  — byte offset of each block in `blob`
      block_pos_off int32[]  — byte offset of each block in `pos_blob`
      block_max_tf  int32[]  — max tf per block            (block-max metadata)
      block_min_norm uint8[] — min norm byte per block     (block-max metadata)
    The block-max pair (max_tf, min_norm) yields a valid BM25 upper bound for
    the block without needing avgdl at encode time: ub >= max_d score(tf_d, dl_d)
    because BM25 is increasing in tf and decreasing in dl.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    norm_bytes = np.asarray(norm_bytes, dtype=np.uint8)
    n = doc_ids.size
    assert n > 0
    if n > 1 and not (np.diff(doc_ids) > 0).all():
        raise ValueError("doc_ids must be strictly increasing")

    # One varint_encode call per stream (the per-block loop of tiny encode
    # calls was the stage-3 merge hotspot: ~50 us of numpy fixed cost x 4
    # calls x n/128 blocks). The value STREAMS are laid out block-wise
    # ([deltas of block][tfs of block] per block) with vectorized scatter
    # indexing, and block byte offsets come from the varint width cumsum —
    # byte-identical to the per-block encoding (the first delta of a block
    # vs the previous block's last doc equals the plain diff).
    bs = block_size
    nblocks = (n + bs - 1) // bs
    i = np.arange(n, dtype=np.int64)
    lo_i = (i // bs) * bs
    cnt_i = np.minimum(bs, n - lo_i)

    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = np.uint64(doc_ids[0])
    if n > 1:
        deltas[1:] = np.diff(doc_ids).astype(np.uint64)
    vals = np.empty(2 * n, dtype=np.uint64)
    vals[i + lo_i] = deltas
    vals[i + lo_i + cnt_i] = tfs.astype(np.uint64)
    widths = _varint_widths(vals)
    byte_start = np.concatenate(([0], np.cumsum(widths)))
    block_starts = 2 * bs * np.arange(nblocks, dtype=np.int64)
    block_off = byte_start[np.minimum(block_starts, 2 * n)].astype(np.int32)
    blob = varint_encode(vals, widths)

    blk_lo = bs * np.arange(nblocks, dtype=np.int64)
    blk_hi = np.minimum(blk_lo + bs, n)
    block_last = doc_ids[blk_hi - 1]
    block_max_tf = np.maximum.reduceat(tfs, blk_lo).astype(np.int32)
    block_min_norm = np.minimum.reduceat(norm_bytes, blk_lo).astype(np.uint8)

    pos_blob = b""
    block_pos_off = np.zeros(nblocks, dtype=np.int32)
    if pos_flat is not None:
        cum_tf = np.concatenate(([0], np.cumsum(tfs)))
        flat = np.asarray(pos_flat, dtype=np.int64)
        npos = flat.size
        # delta within each posting's position list; each posting's first
        # position stays absolute (global diff + reset at posting starts —
        # block boundaries don't reset, matching the per-block encoder since
        # postings never span blocks)
        full = np.empty(npos, dtype=np.int64)
        if npos:
            full[0] = flat[0]
            full[1:] = np.diff(flat)
            firsts = cum_tf[:-1]
            full[firsts] = flat[firsts]
        # stream layout per block: [counts(=tfs)][position deltas]
        pvals = np.empty(n + npos, dtype=np.uint64)
        pvals[i + cum_tf[lo_i]] = tfs.astype(np.uint64)
        if npos:
            # position j of the stream sits at hi(block of its posting) + j
            p_of_j = np.repeat(i, tfs)
            hi_of_j = np.minimum(lo_i[p_of_j] + bs, n)
            pvals[hi_of_j + np.arange(npos, dtype=np.int64)] = full.astype(np.uint64)
        pwidths = _varint_widths(pvals)
        pbyte_start = np.concatenate(([0], np.cumsum(pwidths)))
        pblock_starts = blk_lo + cum_tf[blk_lo]
        block_pos_off = pbyte_start[pblock_starts].astype(np.int32)
        pos_blob = varint_encode(pvals, pwidths)

    return {
        "blob": blob,
        "pos_blob": pos_blob,
        "block_last": block_last,
        "block_off": block_off,
        "block_pos_off": block_pos_off,
        "block_max_tf": block_max_tf,
        "block_min_norm": block_min_norm,
        "df": n,
        "cf": int(tfs.sum()),
        "max_tf": int(tfs.max()),
        "min_norm": int(norm_bytes.min()),
    }


# ---------------------------------------------------------------------------
# FOR (Frame-of-Reference) bit-packed block codec — the Lucene PackedInts
# discipline: each 128-posting skip block stores its values at a fixed bit
# width (the block's max bit length), so decode is a branch-free gather
# instead of a varint boundary scan. Layout per block:
#   byte 0: delta bit width (db)      byte 1: tf bit width (tb)
#   ceil(cnt*db/8) bytes packed deltas, then ceil(cnt*tb/8) bytes packed tfs
# (positions blob: byte 0 = count width, byte 1 = position-delta width,
#  packed counts then packed deltas). Bit order is little-endian value-major
# (bit k of the stream lives at byte k>>3, bit k&7; each value's LSB first).
# Unlike Lucene's ForDeltaUtil we do not patch exceptions (PFor): a block
# crossing a strided-docID bucket gap simply gets a wide width — rare (one
# block per gap) and correctness-neutral. Value streams are identical to the
# varint codec's (same deltas, same per-posting absolute-first positions), so
# decode outputs are bit-identical across codecs.
# ---------------------------------------------------------------------------


def _bitlen_u64(v: np.ndarray) -> np.ndarray:
    """Bit length of each uint64 value (0 for 0), vectorized."""
    v = np.asarray(v, dtype=np.uint64)
    out = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = tmp >= (np.uint64(1) << np.uint64(s))
        out[m] += s
        tmp[m] >>= np.uint64(s)
    return np.where(v == 0, 0, out + 1)


def _blk_max(arr: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """maximum.reduceat guarded for the empty-array case."""
    if arr.size == 0:
        return np.zeros(starts.size, dtype=arr.dtype)
    return np.maximum.reduceat(arr, starts)


def _scatter_bits(
    words_out: np.ndarray,
    values: np.ndarray,
    bitpos: np.ndarray,
) -> None:
    """OR each value's bits (LSB first) into the little-endian uint64 word
    array `words_out` at bit offset `bitpos[i]`. Each value touches at most
    two words (unbuffered `bitwise_or.at` handles colliding indices), so the
    cost is O(values), not O(total bits). Values must already fit their
    block width (true by construction: width = block max bit length)."""
    if values.size == 0:
        return
    v = values.astype(np.uint64, copy=False)
    wi = (bitpos >> 6).astype(np.int64)
    s = (bitpos & 63).astype(np.uint64)
    np.bitwise_or.at(words_out, wi, v << s)  # low word (overflow bits drop)
    rs = (np.uint64(64) - s) & np.uint64(63)
    hi = np.where(s == 0, np.uint64(0), v >> rs)
    nz = hi != 0
    if nz.any():
        np.bitwise_or.at(words_out, wi[nz] + 1, hi[nz])


def _as_words(seg: np.ndarray) -> np.ndarray:
    """uint64 little-endian view of a byte segment, zero-padded so that
    words[wi+1] is always readable for any in-range bit position."""
    padded = np.zeros(((seg.size + 8 + 7) // 8) * 8, dtype=np.uint8)
    padded[: seg.size] = seg
    return padded.view("<u8")


def _gather_bits(
    words: np.ndarray, bitpos: np.ndarray, bits: np.ndarray
) -> np.ndarray:
    """Read a `bits[i]`-wide little-endian value at bit offset `bitpos[i]`
    from the padded uint64 word view (branch-free two-word gather).

    Word indices are clamped to the view: a WIDTH-0 value may sit exactly
    at the buffer end (a lone 0 position delta packs to zero bits, so its
    start offset equals the data end — found by check_index on a 1M-doc
    index, where the full-span positions decode of such a row raised
    IndexError while per-block decode, whose per-slice re-pad absorbed it,
    worked). Any value with width > 0 ends inside the buffer, so the
    clamped words only ever feed bits the mask discards."""
    wi = np.minimum((bitpos >> 6).astype(np.int64), words.size - 1)
    s = (bitpos & 63).astype(np.uint64)
    lo = words[wi] >> s
    rs = (np.uint64(64) - s) & np.uint64(63)
    hi = np.where(
        s == 0,
        np.uint64(0),
        words[np.minimum(wi + 1, words.size - 1)] << rs,
    )
    bits_u = bits.astype(np.uint64)
    full = np.uint64(0xFFFFFFFFFFFFFFFF)
    mask = np.where(
        bits_u >= 64, full, (np.uint64(1) << np.minimum(bits_u, np.uint64(63))) - np.uint64(1)
    )
    return (lo | hi) & mask


def encode_postings_for(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    norm_bytes: np.ndarray,
    pos_flat: np.ndarray | None = None,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """`encode_postings` with FOR bit-packed blocks instead of varints.

    Same inputs, same returned dict shape and metadata (block_last/off/
    max_tf/min_norm, df, cf, ...); only `blob`/`pos_blob` bytes differ.
    Decode with `decode_span_for` / `decode_positions_span_for`.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    norm_bytes = np.asarray(norm_bytes, dtype=np.uint8)
    n = doc_ids.size
    assert n > 0
    if n > 1 and not (np.diff(doc_ids) > 0).all():
        raise ValueError("doc_ids must be strictly increasing")

    bs = block_size
    nblocks = (n + bs - 1) // bs
    blk_lo = bs * np.arange(nblocks, dtype=np.int64)
    blk_hi = np.minimum(blk_lo + bs, n)
    cnt = blk_hi - blk_lo

    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = np.uint64(doc_ids[0])
    if n > 1:
        deltas[1:] = np.diff(doc_ids).astype(np.uint64)
    tfs_u = tfs.astype(np.uint64)

    db = _blk_max(_bitlen_u64(deltas), blk_lo)
    tb = _blk_max(_bitlen_u64(tfs_u), blk_lo)
    dbytes = (cnt * db + 7) // 8
    tbytes = (cnt * tb + 7) // 8
    sizes = 2 + dbytes + tbytes
    off64 = np.concatenate(([0], np.cumsum(sizes)))
    total = int(off64[-1])
    block_off = off64[:-1].astype(np.int32)

    words = np.zeros((total + 7) // 8 + 1, dtype="<u8")
    within = np.arange(n, dtype=np.int64) - np.repeat(blk_lo, cnt)
    d_base = np.repeat((off64[:-1] + 2) * 8, cnt)
    _scatter_bits(words, deltas, d_base + within * np.repeat(db, cnt))
    t_base = np.repeat((off64[:-1] + 2 + dbytes) * 8, cnt)
    _scatter_bits(words, tfs_u, t_base + within * np.repeat(tb, cnt))
    blob_arr = words.view(np.uint8)[:total].copy()
    blob_arr[block_off.astype(np.int64)] = db.astype(np.uint8)
    blob_arr[block_off.astype(np.int64) + 1] = tb.astype(np.uint8)
    blob = blob_arr.tobytes()

    block_last = doc_ids[blk_hi - 1]
    block_max_tf = np.maximum.reduceat(tfs, blk_lo).astype(np.int32)
    block_min_norm = np.minimum.reduceat(norm_bytes, blk_lo).astype(np.uint8)

    pos_blob = b""
    block_pos_off = np.zeros(nblocks, dtype=np.int32)
    if pos_flat is not None:
        cum_tf = np.concatenate(([0], np.cumsum(tfs)))
        flat = np.asarray(pos_flat, dtype=np.int64)
        npos = flat.size
        full = np.empty(npos, dtype=np.int64)
        if npos:
            full[0] = flat[0]
            full[1:] = np.diff(flat)
            firsts = cum_tf[:-1]
            full[firsts] = flat[firsts]
        full_u = full.astype(np.uint64)
        m = cum_tf[blk_hi] - cum_tf[blk_lo]  # positions per block
        cb = tb  # counts ARE the tfs
        if npos:
            plen = _bitlen_u64(full_u)
            pstarts = np.minimum(cum_tf[blk_lo], npos - 1)
            pb = _blk_max(plen, pstarts)
            pb[m == 0] = 0
        else:
            pb = np.zeros(nblocks, dtype=np.int64)
        cbytes = (cnt * cb + 7) // 8
        pbytes = (m * pb + 7) // 8
        psizes = 2 + cbytes + pbytes
        poff64 = np.concatenate(([0], np.cumsum(psizes)))
        ptotal = int(poff64[-1])
        block_pos_off = poff64[:-1].astype(np.int32)

        pwords = np.zeros((ptotal + 7) // 8 + 1, dtype="<u8")
        c_base = np.repeat((poff64[:-1] + 2) * 8, cnt)
        _scatter_bits(pwords, tfs_u, c_base + within * np.repeat(cb, cnt))
        if npos:
            pwithin = np.arange(npos, dtype=np.int64) - np.repeat(cum_tf[blk_lo], m)
            p_base = np.repeat((poff64[:-1] + 2 + cbytes) * 8, m)
            _scatter_bits(pwords, full_u, p_base + pwithin * np.repeat(pb, m))
        pos_arr = pwords.view(np.uint8)[:ptotal].copy()
        pos_arr[block_pos_off.astype(np.int64)] = cb.astype(np.uint8)
        pos_arr[block_pos_off.astype(np.int64) + 1] = pb.astype(np.uint8)
        pos_blob = pos_arr.tobytes()

    return {
        "blob": blob,
        "pos_blob": pos_blob,
        "block_last": block_last,
        "block_off": block_off,
        "block_pos_off": block_pos_off,
        "block_max_tf": block_max_tf,
        "block_min_norm": block_min_norm,
        "df": n,
        "cf": int(tfs.sum()),
        "max_tf": int(tfs.max()),
        "min_norm": int(norm_bytes.min()),
    }


def decode_span_for(
    blob: bytes | np.ndarray,
    block_off: np.ndarray,
    block_last: np.ndarray,
    bi_lo: int,
    bi_hi: int,
    n_total: int,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray]:
    """FOR analog of `decode_span`: blocks [bi_lo, bi_hi) in one vectorized
    two-word gather pass → (doc_ids int64, tfs int64)."""
    b = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    nblocks = len(block_off)
    bi_hi = min(bi_hi, nblocks)
    if bi_lo >= bi_hi:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    byte_lo = int(block_off[bi_lo])
    byte_hi = int(block_off[bi_hi]) if bi_hi < nblocks else b.size
    words = _as_words(b[byte_lo:byte_hi])

    blk = np.arange(bi_lo, bi_hi, dtype=np.int64)
    bs = block_size
    cnt = np.minimum((blk + 1) * bs, n_total) - blk * bs
    offs = np.asarray(block_off, dtype=np.int64)[blk] - byte_lo
    db = b[offs + byte_lo].astype(np.int64)
    tb = b[offs + byte_lo + 1].astype(np.int64)
    dbytes = (cnt * db + 7) // 8

    n_out = int(cnt.sum())
    starts = np.cumsum(cnt) - cnt
    within = np.arange(n_out, dtype=np.int64) - np.repeat(starts, cnt)
    db_v = np.repeat(db, cnt)
    tb_v = np.repeat(tb, cnt)
    d_bitpos = np.repeat((offs + 2) * 8, cnt) + within * db_v
    t_bitpos = np.repeat((offs + 2 + dbytes) * 8, cnt) + within * tb_v
    deltas = _gather_bits(words, d_bitpos, db_v).astype(np.int64)
    tfs = _gather_bits(words, t_bitpos, tb_v).astype(np.int64)

    # segmented cumsum: docs = cumsum(deltas) rebased per block on the
    # previous block's last docID
    g = np.cumsum(deltas)
    prev_last = np.where(blk > 0, np.asarray(block_last, dtype=np.int64)[np.maximum(blk - 1, 0)], 0)
    base = prev_last - np.where(starts > 0, g[np.maximum(starts - 1, 0)], 0)
    docs = g + np.repeat(base, cnt)
    return docs, tfs


def decode_positions_span_for(
    pos_blob: bytes | np.ndarray,
    block_pos_off: np.ndarray,
    bi_lo: int,
    bi_hi: int,
    n_total: int,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray]:
    """FOR analog of `decode_positions_span` → (counts, absolute positions)."""
    b = (
        np.frombuffer(pos_blob, dtype=np.uint8)
        if not isinstance(pos_blob, np.ndarray)
        else pos_blob
    )
    nblocks = len(block_pos_off)
    bi_hi = min(bi_hi, nblocks)
    if bi_hi <= bi_lo:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    byte_lo = int(block_pos_off[bi_lo])
    byte_hi = int(block_pos_off[bi_hi]) if bi_hi < nblocks else b.size
    words = _as_words(b[byte_lo:byte_hi])

    blk = np.arange(bi_lo, bi_hi, dtype=np.int64)
    bs = block_size
    cnt = np.minimum((blk + 1) * bs, n_total) - blk * bs
    offs = np.asarray(block_pos_off, dtype=np.int64)[blk] - byte_lo
    cb = b[offs + byte_lo].astype(np.int64)
    pb = b[offs + byte_lo + 1].astype(np.int64)
    cbytes = (cnt * cb + 7) // 8

    n_cnt = int(cnt.sum())
    cstarts = np.cumsum(cnt) - cnt
    within = np.arange(n_cnt, dtype=np.int64) - np.repeat(cstarts, cnt)
    cb_v = np.repeat(cb, cnt)
    c_bitpos = np.repeat((offs + 2) * 8, cnt) + within * cb_v
    counts = _gather_bits(words, c_bitpos, cb_v).astype(np.int64)

    # positions per block from the decoded counts
    m = np.add.reduceat(counts, cstarts) if n_cnt else np.zeros(blk.size, np.int64)
    npos = int(m.sum())
    if npos == 0:
        return counts, np.empty(0, np.int64)
    mstarts = np.cumsum(m) - m
    pwithin = np.arange(npos, dtype=np.int64) - np.repeat(mstarts, m)
    pb_v = np.repeat(pb, m)
    p_bitpos = np.repeat((offs + 2 + cbytes) * 8, m) + pwithin * pb_v
    d = _gather_bits(words, p_bitpos, pb_v).astype(np.int64)

    # per-posting segmented cumsum (first value absolute per posting)
    g = np.cumsum(d)
    pstarts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    nz = counts > 0
    seg_of = np.repeat(np.arange(counts.size)[nz], counts[nz])
    before = np.where(pstarts > 0, g[np.maximum(pstarts - 1, 0)], 0)
    return counts, g - before[seg_of]


def first_block_deltas(
    blob: bytes | np.ndarray, block_off: np.ndarray, codec: str = "varint"
) -> np.ndarray:
    """First delta value of every block (uint64), for exact skip pointers:
    first docID of block bi = block_last[bi-1] + first_delta[bi]."""
    b = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    offs = np.asarray(block_off, dtype=np.int64)
    if codec == "for":
        db = b[offs].astype(np.int64)
        words = _as_words(b)
        return _gather_bits(words, (offs + 2) * 8, db)
    # varint: decode just the first LEB128 value of each block
    delta = np.zeros(offs.size, dtype=np.uint64)
    active = np.ones(offs.size, dtype=bool)
    for k in range(10):
        idx = np.minimum(offs + k, b.size - 1)
        byte = b[idx]
        delta[active] |= (byte[active].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * k)
        active = active & ((byte & 0x80) != 0)
        if not active.any():
            break
    return delta


def decode_block(
    blob: bytes | np.ndarray,
    block_off: np.ndarray,
    block_last: np.ndarray,
    bi: int,
    n_total: int,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode skip-block `bi` of a term's blob → (doc_ids int64, tfs int64)."""
    b = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    nblocks = len(block_off)
    start = int(block_off[bi])
    end = int(block_off[bi + 1]) if bi + 1 < nblocks else b.size
    lo = bi * block_size
    hi = min(lo + block_size, n_total)
    cnt = hi - lo
    vals = varint_decode(b[start:end], count=2 * cnt)
    deltas = vals[:cnt].astype(np.int64)
    tfs = vals[cnt:].astype(np.int64)
    prev_last = int(block_last[bi - 1]) if bi > 0 else 0
    docs = np.cumsum(deltas) + prev_last
    return docs, tfs


def decode_span(
    blob: bytes | np.ndarray,
    block_off: np.ndarray,
    block_last: np.ndarray,
    bi_lo: int,
    bi_hi: int,
    n_total: int,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode blocks [bi_lo, bi_hi) in ONE varint pass → (doc_ids, tfs).

    The hot decode path: one vectorized varint_decode over the byte span,
    then per-block slicing/cumsum (loop is over blocks, not values)."""
    b = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    nblocks = len(block_off)
    bi_hi = min(bi_hi, nblocks)
    if bi_lo >= bi_hi:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    start = int(block_off[bi_lo])
    end = int(block_off[bi_hi]) if bi_hi < nblocks else b.size
    vals = varint_decode(b[start:end]).astype(np.int64)
    out_n = min(bi_hi * block_size, n_total) - bi_lo * block_size
    docs = np.empty(out_n, dtype=np.int64)
    tfs = np.empty(out_n, dtype=np.int64)
    p = 0  # position in vals
    q = 0  # position in output
    for bi in range(bi_lo, bi_hi):
        cnt = min((bi + 1) * block_size, n_total) - bi * block_size
        deltas = vals[p : p + cnt]
        tfs[q : q + cnt] = vals[p + cnt : p + 2 * cnt]
        prev_last = int(block_last[bi - 1]) if bi > 0 else 0
        docs[q : q + cnt] = np.cumsum(deltas) + prev_last
        p += 2 * cnt
        q += cnt
    return docs, tfs


def decode_postings(
    blob: bytes, block_off: np.ndarray, block_last: np.ndarray, n_total: int,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode the full posting list → (doc_ids, tfs)."""
    return decode_span(
        blob, block_off, block_last, 0, len(block_off), n_total, block_size
    )


def decode_positions_span(
    pos_blob: bytes | np.ndarray,
    block_pos_off: np.ndarray,
    bi_lo: int,
    bi_hi: int,
    n_total: int,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode positions of blocks [bi_lo, bi_hi) in ONE varint pass.

    Blocks are contiguous in the blob, so the whole span decodes with a
    single boundary scan; per-block count/delta regions are then split
    vectorized (value indices of block starts via searchsorted on the
    varint start offsets). Equivalent to the per-block reference
    `decode_positions_span_ref` (property-tested), ~#blocks x fewer numpy
    dispatches — the cold-phrase/flat_positions hot path.

    Returns (counts, positions): `counts[i]` = number of positions of the
    i-th posting in the span (== its tf), `positions` = all absolute
    positions concatenated in posting order.
    """
    b = (
        np.frombuffer(pos_blob, dtype=np.uint8)
        if not isinstance(pos_blob, np.ndarray)
        else pos_blob
    )
    nblocks = len(block_pos_off)
    bi_hi = min(bi_hi, nblocks)
    if bi_hi <= bi_lo:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    seg_start = int(block_pos_off[bi_lo])
    seg_end = int(block_pos_off[bi_hi]) if bi_hi < nblocks else b.size
    seg = b[seg_start:seg_end]
    if seg.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # single varint pass (same boundary scan varint_decode does, kept here
    # so the value byte-offsets are available for the block split)
    is_last = (seg & 0x80) == 0
    val_starts = np.flatnonzero(np.concatenate(([True], is_last[:-1])))
    ends = np.concatenate((val_starts[1:], [seg.size]))
    widths = ends - val_starts
    vals = np.zeros(val_starts.size, dtype=np.uint64)
    for k in range(int(widths.max())):
        m = widths > k
        chunk = seg[val_starts[m] + k].astype(np.uint64) & np.uint64(0x7F)
        vals[m] |= chunk << np.uint64(7 * k)
    # per-block count-region geometry
    bis = np.arange(bi_lo, bi_hi, dtype=np.int64)
    cnt_per_blk = np.maximum(
        np.minimum((bis + 1) * block_size, n_total) - bis * block_size, 0
    )
    blk_val_idx = np.searchsorted(
        val_starts, np.asarray(block_pos_off[bi_lo:bi_hi], np.int64) - seg_start
    )
    # mask: True where a value is a tf-count (first cnt values per block)
    n_vals = vals.size
    marks = np.zeros(n_vals + 1, np.int64)
    np.add.at(marks, blk_val_idx, 1)
    np.add.at(marks, np.minimum(blk_val_idx + cnt_per_blk, n_vals), -1)
    is_count = np.cumsum(marks[:-1]) > 0
    counts = vals[is_count].astype(np.int64)
    d = vals[~is_count].astype(np.int64)
    if d.size == 0:
        return counts, np.empty(0, np.int64)
    # global segmented cumsum: first value of each posting is absolute,
    # the rest are deltas (postings never straddle blocks, so the same
    # correction works across the concatenated span)
    g = np.cumsum(d)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    nz = counts > 0
    seg_of = np.repeat(np.arange(counts.size)[nz], counts[nz])
    before = np.where(starts > 0, g[np.maximum(starts - 1, 0)], 0)
    return counts, g - before[seg_of]


def decode_positions_span_ref(
    pos_blob: bytes | np.ndarray,
    block_pos_off: np.ndarray,
    bi_lo: int,
    bi_hi: int,
    n_total: int,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-block reference implementation of decode_positions_span (kept as
    the equivalence-test oracle; one varint pass per block).
    """
    b = (
        np.frombuffer(pos_blob, dtype=np.uint8)
        if not isinstance(pos_blob, np.ndarray)
        else pos_blob
    )
    nblocks = len(block_pos_off)
    bi_hi = min(bi_hi, nblocks)
    counts_l, pos_l = [], []
    for bi in range(bi_lo, bi_hi):
        start = int(block_pos_off[bi])
        end = int(block_pos_off[bi + 1]) if bi + 1 < nblocks else b.size
        cnt = min((bi + 1) * block_size, n_total) - bi * block_size
        vals = varint_decode(b[start:end]).astype(np.int64)
        counts = vals[:cnt]
        d = vals[cnt:]
        if d.size:
            # segment-cumsum: first value of each posting is absolute, the
            # rest are deltas -> abs = cumsum - cumsum_before_segment_start
            g = np.cumsum(d)
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            nz = counts > 0
            seg_of = np.repeat(np.arange(cnt)[nz], counts[nz])
            before = np.where(starts > 0, g[np.maximum(starts - 1, 0)], 0)
            abs_pos = g - before[seg_of]
            pos_l.append(abs_pos)
        counts_l.append(counts)
    if not counts_l:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return (
        np.concatenate(counts_l),
        np.concatenate(pos_l) if pos_l else np.empty(0, np.int64),
    )


def decode_block_positions(
    pos_blob: bytes | np.ndarray,
    block_pos_off: np.ndarray,
    bi: int,
    n_total: int,
    block_size: int = BLOCK_SIZE,
) -> list[np.ndarray]:
    """Decode per-posting position lists for skip-block `bi`."""
    b = (
        np.frombuffer(pos_blob, dtype=np.uint8)
        if not isinstance(pos_blob, np.ndarray)
        else pos_blob
    )
    nblocks = len(block_pos_off)
    start = int(block_pos_off[bi])
    end = int(block_pos_off[bi + 1]) if bi + 1 < nblocks else b.size
    lo = bi * block_size
    cnt = min(lo + block_size, n_total) - lo
    seg = b[start:end]
    vals = varint_decode(seg)
    counts = vals[:cnt].astype(np.int64)
    flat = vals[cnt:].astype(np.int64)
    out: list[np.ndarray] = []
    p = 0
    for c in counts:
        d = flat[p : p + c]
        out.append(np.cumsum(d) if c else d)
        p += int(c)
    return out


# ---------------------------------------------------------------------------
# codec dispatch: name -> (encode_postings, decode_span, decode_positions_span)
# ---------------------------------------------------------------------------
CODECS = {
    "varint": (encode_postings, decode_span, decode_positions_span),
    "for": (encode_postings_for, decode_span_for, decode_positions_span_for),
}


def encoder_for(codec: str):
    return CODECS[codec][0]


def span_decoder_for(codec: str):
    return CODECS[codec][1]


def positions_decoder_for(codec: str):
    return CODECS[codec][2]
