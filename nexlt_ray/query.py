"""Query engine: top-k BM25 over a built index — the Ray-Data-native
replacement for the reference's Solr `/select` serving path
(solrconfig.xml:840-901; UI query construction solrTestLib_v2.js:38-102;
CGI variant corpus.cgi:328-339).

Two rank-identical evaluators (tests assert bit-equality of results):
  * exhaustive       — decode every posting of every query term, vectorized
                       float32 scoring (the offline / oracle-check path);
  * block-max WAND   — vectorized doc-range-at-a-time evaluation: the doc
                       space is walked in fixed ranges; a range is skipped
                       (blocks never decoded/scored) when the sum of the
                       overlapping blocks' upper bounds (max_tf + min_norm
                       block-max metadata, codec.encode_postings) cannot beat
                       the current top-k threshold; surviving ranges are
                       scored with the same vectorized float32 kernel. This
                       is Lucene BlockMaxWAND's pruning logic restructured
                       for columnar batch scoring instead of a per-doc
                       pointer-chasing loop.

Both follow the scoring spec in nexlt_ray.bm25 exactly (float32 per-term cast,
query-clause-order summation, ascending-docID tie-break), so top-k docIDs and
scores are rank-identical to the pure-Python oracle (tests/test_rank_identity).

Query grammar (reference UI semantics): whitespace-separated terms combine as
OR (Solr default q.op, schema.xml:1039-1041); a double-quoted string is a
positional phrase (UI phrase fq, solrTestLib_v2.js:43-53); `mode="AND"`
requires all terms. Analysis uses the index's tokenizer profile, query-time
chain (no catenated overlaps).

Serving-side state mirrors the reference's Solr caches
(filterCache/documentCache, solrconfig.xml:534-558): an LRU of TermPostings
which additionally memoizes decoded blocks, so repeated terms score without
re-decoding.
"""

from __future__ import annotations

import json
import os
import re
from collections import OrderedDict
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import bm25
from .build import _expand_slices, term_bucket_of
from .codec import first_block_deltas, positions_decoder_for, span_decoder_for

# query complexity cap (reference maxBooleanClauses, solrconfig.xml:500)
MAX_BOOLEAN_CLAUSES = 1024


def _position_bitmap(
    dp: np.ndarray, pp: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Positional bitmap of a (doc_of_position, position) stream: doc run u
    owns ``span[u] = max_pos + 1`` bits starting at ``starts[u]`` (positions
    are doc-grouped and ascending within a doc, so the run's last entry is
    its max). Bit ``starts[u] + p`` is set iff the term occurs at position
    ``p`` in doc ``docs_u[u]``. Words hold 32 valid bits each (bit weights
    stay exactly representable through the float64 bincount accumulate);
    uint32 words and (when the bit space fits) int32 starts halve gather
    traffic on stopword-sized streams. Returns
    (docs_u, counts, starts, span, words); ``counts`` (positions per doc
    run) lets callers rank a cached stream without re-running the boundary
    pass."""
    bound = np.concatenate(([True], dp[1:] != dp[:-1]))
    docs_u = dp[bound]
    idx = np.flatnonzero(bound)
    ends = np.append(idx[1:], dp.size) - 1
    span = (pp[ends] + 1).astype(np.int32)
    counts = np.diff(np.append(idx, dp.size))
    starts = np.concatenate(([0], np.cumsum(span, dtype=np.int64)[:-1]))
    nbits = int(starts[-1] + span[-1])
    # int32 bit stream when the bit space fits: halves the memory traffic
    # of the dominant repeat+add pass (this host is DRAM-bound; interleaved
    # A/B on a 4.5M-position stopword stream: ~95 -> 64 ms)
    if nbits < (1 << 31):
        bit = np.repeat(starts.astype(np.int32), counts) + pp.astype(
            np.int32
        )
    else:
        bit = np.repeat(starts, counts) + pp
    # int32 starts need headroom: a probe can overshoot its doc's span by
    # up to the seed doc's length before the ok-mask kills the lane
    if nbits < (1 << 31) - (1 << 24):
        starts = starts.astype(np.int32)
    # `bit` is strictly increasing (positions ascend within a doc, start
    # offsets ascend across docs), so words can be OR-reduced group-wise —
    # all-integer, ~1.35x over the float64 bincount(weights=ldexp) route
    # on top of the int32 gain (exact-equal in both A/Bs)
    widx = bit >> 5
    vals = np.uint32(1) << (bit & 31).astype(np.uint32)
    grp = np.flatnonzero(np.concatenate(([True], widx[1:] != widx[:-1])))
    words = np.zeros((nbits + 31) >> 5, np.uint32)
    words[widx[grp]] = np.bitwise_or.reduceat(vals, grp)
    return docs_u, counts, starts, span, words


@dataclass
class TermPostings:
    """Merged postings of one term (all range-bucket rows, doc-ascending),
    with a flattened skip-block view and lazy per-span decode cache."""

    term: str
    df: int
    cf: int
    max_tf: int
    min_norm: int
    rows: list[dict]
    blk_row: np.ndarray = field(default=None, repr=False)      # row idx per block
    blk_local: np.ndarray = field(default=None, repr=False)    # bi within row
    blk_last: np.ndarray = field(default=None, repr=False)
    blk_max_tf: np.ndarray = field(default=None, repr=False)
    blk_min_norm: np.ndarray = field(default=None, repr=False)
    _all: tuple | None = field(default=None, repr=False)
    _ubs: np.ndarray | None = field(default=None, repr=False)
    _pos_flat: tuple | None = field(default=None, repr=False)
    _pos_keys: tuple | None = field(default=None, repr=False)  # bitmap cache

    def __post_init__(self):
        rows_i, local_i, lasts, mtfs, mnorms, cnts = [], [], [], [], [], []
        for ri, r in enumerate(self.rows):
            nb = len(r["block_off"])
            bs = r["block_size"]
            rows_i.append(np.full(nb, ri, dtype=np.int32))
            local_i.append(np.arange(nb, dtype=np.int32))
            lasts.append(r["block_last"])
            mtfs.append(r["block_max_tf"])
            mnorms.append(r["block_min_norm"])
            c = np.full(nb, bs, dtype=np.int64)
            c[-1] = r["df"] - (nb - 1) * bs
            cnts.append(c)
        self.blk_row = np.concatenate(rows_i)
        self.blk_local = np.concatenate(local_i)
        self.blk_last = np.concatenate(lasts).astype(np.int64)
        self.blk_max_tf = np.concatenate(mtfs).astype(np.int32)
        self.blk_min_norm = np.concatenate(mnorms).astype(np.uint8)
        self.blk_cnt = np.concatenate(cnts)
        # first docID per block, decoded from just the first delta value of
        # each block (vectorized, codec-dispatched): exact skip pointers for
        # jumping doc-space gaps (strided ids leave ~2^40-wide holes between
        # doc buckets)
        firsts = []
        for r in self.rows:
            delta = first_block_deltas(
                r["blob"], r["block_off"], codec=r.get("codec", "varint")
            )
            lasts = np.asarray(r["block_last"], dtype=np.int64)
            prev = np.concatenate(([0], lasts[:-1]))
            firsts.append(prev + delta.astype(np.int64))
        self.blk_first = np.concatenate(firsts)
        self._block_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._pos_block_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    @property
    def n_blocks(self) -> int:
        return self.blk_last.size

    def block_ubs(self, n_docs: int, avgdl: float, params: bm25.BM25Params) -> np.ndarray:
        if self._ubs is None:
            self._ubs = bm25.term_upper_bounds(
                self.blk_max_tf, self.blk_min_norm, self.df, n_docs, avgdl, params
            )
        return self._ubs

    def _decode_run(self, j_lo: int, j_hi: int) -> None:
        """Decode uncached global blocks [j_lo, j_hi) into the block cache,
        one varint pass per contiguous per-row span."""
        j = j_lo
        while j < j_hi:
            ri = int(self.blk_row[j])
            r = self.rows[ri]
            lo = int(self.blk_local[j])
            j2 = j
            while j2 < j_hi and int(self.blk_row[j2]) == ri:
                j2 += 1
            hi = lo + (j2 - j)
            d, t = span_decoder_for(r.get("codec", "varint"))(
                r["blob"], r["block_off"], r["block_last"], lo, hi, r["df"],
                r["block_size"],
            )
            off = 0
            for jj in range(j, j2):
                c = int(self.blk_cnt[jj])
                self._block_cache[jj] = (d[off : off + c], t[off : off + c])
                off += c
            j = j2

    def decode_blocks(self, j_lo: int, j_hi: int) -> tuple[np.ndarray, np.ndarray]:
        """Decoded (docs, tfs) for global blocks [j_lo, j_hi); memoized per
        block (the Solr documentCache analog for postings)."""
        run_start = None
        for j in range(j_lo, j_hi):
            if j not in self._block_cache:
                if run_start is None:
                    run_start = j
            elif run_start is not None:
                self._decode_run(run_start, j)
                run_start = None
        if run_start is not None:
            self._decode_run(run_start, j_hi)
        if j_hi - j_lo == 1:
            return self._block_cache[j_lo]
        pieces = [self._block_cache[j] for j in range(j_lo, j_hi)]
        return (
            np.concatenate([p[0] for p in pieces]),
            np.concatenate([p[1] for p in pieces]),
        )

    def decode_all(self) -> tuple[np.ndarray, np.ndarray]:
        if self._all is None:
            self._all = self.decode_blocks(0, self.n_blocks)
        return self._all

    def postings_for_docs(self, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(docs, tfs) from only the skip blocks that can contain a candidate
        doc — sufficient for membership tests / lookups against `cand`
        (blocks without candidates cannot contribute). Doc-ascending."""
        if self._all is not None:
            return self._all
        if cand.size >= self.n_blocks:  # dense: every block likely touched
            return self.decode_all()
        need = np.unique(np.searchsorted(self.blk_last, cand))
        need = need[need < self.n_blocks]
        if need.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        if need.size * 8 > self.n_blocks:
            # dense candidates: per-block bookkeeping costs more than the
            # row-level single-pass varint decode — fall back
            return self.decode_all()
        pieces = []
        for run in np.split(need, np.flatnonzero(np.diff(need) > 1) + 1):
            pieces.append(self.decode_blocks(int(run[0]), int(run[-1]) + 1))
        return (
            np.concatenate([p[0] for p in pieces]),
            np.concatenate([p[1] for p in pieces]),
        )

    def flat_positions(self) -> tuple[np.ndarray, np.ndarray]:
        """(doc_of_position, position) flat arrays over the whole posting
        list, doc-ascending — the vectorized phrase-evaluation form."""
        if self._pos_flat is None:
            docs, _ = self.decode_all()
            counts_l, pos_l = [], []
            for r in self.rows:
                c, p = positions_decoder_for(r.get("codec", "varint"))(
                    r["pos_blob"], r["block_pos_off"], 0, len(r["block_pos_off"]),
                    r["df"], r["block_size"],
                )
                counts_l.append(c)
                pos_l.append(p)
            counts = np.concatenate(counts_l)
            pos = np.concatenate(pos_l)
            self._pos_flat = (np.repeat(docs, counts), pos)
        return self._pos_flat

    def _pos_decode_run(self, j_lo: int, j_hi: int) -> None:
        """Decode positions of uncached global blocks [j_lo, j_hi) into the
        per-block position cache, one varint pass per per-row span."""
        j = j_lo
        while j < j_hi:
            ri = int(self.blk_row[j])
            r = self.rows[ri]
            lo = int(self.blk_local[j])
            j2 = j
            while j2 < j_hi and int(self.blk_row[j2]) == ri:
                j2 += 1
            counts, pos = positions_decoder_for(r.get("codec", "varint"))(
                r["pos_blob"], r["block_pos_off"], lo, lo + (j2 - j), r["df"],
                r["block_size"],
            )
            docs, _ = self.decode_blocks(j, j2)
            off_p = off_pos = 0
            for jj in range(j, j2):
                c = int(self.blk_cnt[jj])
                cnt_j = counts[off_p : off_p + c]
                n_pos = int(cnt_j.sum())
                self._pos_block_cache[jj] = (
                    np.repeat(docs[off_p : off_p + c], cnt_j),
                    pos[off_pos : off_pos + n_pos],
                )
                off_p += c
                off_pos += n_pos
            j = j2

    def positions_for_docs(self, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(doc_of_position, position) restricted to the skip blocks that can
        contain a candidate doc — for a stopword term in a rare phrase this
        decodes a tiny fraction of the position stream instead of all of it.
        Output docs are ascending (blocks are doc-ascending globally)."""
        if self._pos_flat is not None:  # already fully decoded — reuse
            return self._pos_flat
        if cand.size >= self.n_blocks:  # dense: every block likely touched
            return self.flat_positions()
        need = np.unique(np.searchsorted(self.blk_last, cand))
        need = need[need < self.n_blocks]
        if need.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        if need.size * 8 > self.n_blocks:
            # dense candidates: the row-level one-pass decode wins
            return self.flat_positions()
        # decode only uncached stretches of CONTIGUOUS needed blocks (gaps
        # between needed blocks are never decoded)
        for run in np.split(need, np.flatnonzero(np.diff(need) > 1) + 1):
            j_lo, j_hi = int(run[0]), int(run[-1]) + 1
            sub = None
            for j in range(j_lo, j_hi):
                if j not in self._pos_block_cache:
                    if sub is None:
                        sub = j
                elif sub is not None:
                    self._pos_decode_run(sub, j)
                    sub = None
            if sub is not None:
                self._pos_decode_run(sub, j_hi)
        pieces = [self._pos_block_cache[int(j)] for j in need]
        if not pieces:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return (
            np.concatenate([p[0] for p in pieces]),
            np.concatenate([p[1] for p in pieces]),
        )


_RANGE_RX = re.compile(r"^\[(.+) TO (.+)\]$")
_FUZZY_RX = re.compile(r'^([^\s"*?~]+)~([12])?$')
# body may not contain a quote: '"a b" "c d"~2' is multi-clause input, not
# one sloppy phrase — it falls through to the terms parse instead
_SLOP_RX = re.compile(r'^"([^"]*)"~(\d+)$', re.S)


def _split_phrase_slop(body: str) -> tuple[str, int]:
    """Peel the '"~N' slop marker `parse` appends to a sloppy-phrase body;
    (body, 0) for a plain phrase."""
    i = body.rfind('"~')
    if i >= 0 and body[i + 2:].isdigit():
        return body[:i], int(body[i + 2:])
    return body, 0


def _levenshtein_leq(a: str, b: str, k: int) -> bool:
    """Unit-cost edit distance <= k (banded DP, early exit)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        best = cur[0]
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
            best = min(best, cur[j])
        if best > k:
            return False
        prev = cur
    return prev[lb] <= k


def _lev1_hits(base: str, uniq: np.ndarray, lens: np.ndarray | None = None) -> np.ndarray:
    """Boolean mask over `uniq` (1-D numpy unicode array, typically a
    batch's or dictionary's UNIQUE terms) of terms within ONE unit-cost
    edit of `base` — the vectorized FuzzyQuery(max_edits=1) scan.

    Uses the exact prefix+suffix characterization of edit distance 1:
    with p = |common prefix|, s = |common suffix| (each capped at the
    shorter length), dist(a, b) <= 1 iff |la-lb| <= 1 and
    p + s >= min(la, lb) - (1 if la == lb else 0). Everything is numpy
    over a fixed-width codepoint matrix: O(band_size * len(base)) with
    no per-term Python call, so it stays flat as term dictionaries and
    fuzzy query batches grow."""
    out = np.zeros(uniq.size, dtype=bool)
    lb = len(base)
    if uniq.size == 0 or lb == 0:
        return out
    if lens is None:
        lens = np.char.str_len(uniq)
    band_idx = np.flatnonzero(np.abs(lens - lb) <= 1)
    if band_idx.size == 0:
        return out
    cand = uniq[band_idx]
    clens = lens[band_idx]
    w = max(int(clens.max()), lb)
    m = np.ascontiguousarray(cand.astype(f"U{w}")).view(np.uint32)
    m = m.reshape(cand.size, w)
    basev = np.array([base], dtype=f"U{w}").view(np.uint32)
    for lt in (lb - 1, lb, lb + 1):
        if lt <= 0:
            continue
        rows = np.flatnonzero(clens == lt)
        if rows.size == 0:
            continue
        mlen = min(lt, lb)
        sub = m[rows]
        pref = np.cumprod(sub[:, :mlen] == basev[:mlen], axis=1).sum(axis=1)
        suf = np.cumprod(
            sub[:, lt - mlen:lt][:, ::-1] == basev[lb - mlen:lb][::-1], axis=1
        ).sum(axis=1)
        need = mlen - 1 if lt == lb else mlen
        out[band_idx[rows]] = pref + suf >= need
    return out


def _lex_order(
    docs_a: np.ndarray, keys_a: list[np.ndarray], asc: list[bool]
) -> np.ndarray:
    """Sort permutation by (key_1, ..., key_n, doc_id). np.lexsort: LAST
    key is primary -> (doc_id, key_n, ..., key_1); descending via negated
    dense rank — ranks over any subset give the same comparative order as
    over the full set, so per-bucket / per-shard partial top-k then a
    merged re-sort is exact."""
    lex: list[np.ndarray] = [docs_a]
    for kb, a in zip(reversed(keys_a), reversed(asc)):
        lex.append(kb if a else -np.unique(kb, return_inverse=True)[1])
    return np.lexsort(tuple(lex))


def _parse_range(v) -> tuple[str, str] | None:
    """Solr range-literal fq value `[lo TO hi]` -> (lo, hi); None if the
    value is a plain term. `*` is an open end."""
    if not isinstance(v, str):
        return None
    m = _RANGE_RX.match(v)
    return (m.group(1), m.group(2)) if m else None


class FilterSet:
    """Lazily evaluated fielded filter (Solr fq analog, corpus.cgi:328-339)
    restructured for doc-range sharding: the filter's doc set is represented
    PER DOC-BUCKET, each bucket's sorted doc-id array built on first touch
    from that bucket's meta column shard and memoized. A selective query
    therefore evaluates the filter only on the buckets its candidate docs
    live in — never a full-corpus column scan up front. Surfaces whose
    semantics genuinely span the corpus (numFound of a filtered match-all,
    filtered facet counts over everything) force every bucket, but one
    bucket at a time — peak allocation stays O(bucket), not O(n_docs)."""

    def __init__(self, reader: "IndexReader", key: tuple):
        self.reader = reader
        self.key = key
        self._buckets: dict[int, np.ndarray] = {}
        self._count: int | None = None

    def bucket_docs(self, b: int) -> np.ndarray:
        """Sorted doc ids in bucket `b` matching the filter (lazy, memoized)."""
        ids = self._buckets.get(b)
        if ids is None:
            r = self.reader
            mask: np.ndarray | None = None
            for fname, vals in self.key:
                col = r._meta_shard(fname, b)
                if len(col) == 0:
                    mask = np.empty(0, bool)
                    break
                if isinstance(col, (pa.Array, pa.ChunkedArray)):
                    # multiValued column: doc matches if ANY list element is
                    # in vals (Solr fq semantics on a multiValued field)
                    import pyarrow.compute as _pc

                    arr = (
                        col.combine_chunks()
                        if isinstance(col, pa.ChunkedArray)
                        else col
                    )
                    flat_hit = _pc.is_in(
                        arr.flatten(), value_set=pa.array(list(vals))
                    ).to_numpy(zero_copy_only=False)
                    ln = np.asarray(
                        _pc.fill_null(_pc.list_value_length(arr), 0),
                        dtype=np.int64,
                    )
                    ends = np.cumsum(ln)
                    m = np.zeros(len(col), dtype=bool)
                    m[
                        np.searchsorted(
                            ends, np.flatnonzero(flat_hit), side="right"
                        )
                    ] = True
                else:
                    plain = [v for v in vals if _parse_range(v) is None]
                    m = (
                        np.isin(col, np.array(plain, dtype=object))
                        if plain
                        else np.zeros(len(col), dtype=bool)
                    )
                    for v in vals:
                        rng = _parse_range(v)
                        if rng is None:
                            continue
                        # Solr range fq field:[lo TO hi], inclusive, * =
                        # open end; numeric compare on numeric columns,
                        # lexicographic on strings — OR'd with the field's
                        # plain values like any other fq value
                        lo, hi = rng
                        num = np.issubdtype(np.asarray(col).dtype, np.number)
                        rm = np.ones(len(col), dtype=bool)
                        if lo != "*":
                            rm &= col >= (float(lo) if num else lo)
                        if hi != "*":
                            rm &= col <= (float(hi) if num else hi)
                        m |= rm
                mask = m if mask is None else (mask & m)
            ids = (
                np.flatnonzero(mask).astype(np.int64) + r._doc_offsets[b]
                if mask is not None and mask.size
                else np.empty(0, np.int64)
            )
            self._buckets[b] = ids
        return ids

    def mask(self, docs: np.ndarray) -> np.ndarray:
        """Boolean membership for sorted `docs`, touching only their buckets."""
        out = np.zeros(docs.size, dtype=bool)
        buckets = self.reader._buckets_of(docs)
        for b in np.unique(buckets):
            sel = buckets == b
            out[sel] = IndexReader._mask_member(
                docs[sel], self.bucket_docs(int(b))
            )
        return out

    def cached_range_info(self, lo: int, hi: int) -> tuple[np.ndarray, bool]:
        """(sorted filter docs in [lo, hi) from ALREADY-evaluated buckets,
        complete?) — complete is True iff every bucket overlapping the range
        was previously evaluated. WAND uses this as a free pre-check: it
        never FORCES evaluation of a bucket just because a doc range
        overlaps it (a range can span many buckets that hold no candidate
        postings at all); un-evaluated buckets are handled by masking the
        decoded candidate docs instead, which evaluates exactly the buckets
        candidates live in."""
        offs = self.reader._doc_offsets
        cnts = self.reader._doc_counts
        b0 = max(0, int(np.searchsorted(offs, lo, side="right")) - 1)
        pieces = []
        complete = True
        for b in range(b0, len(offs)):
            if offs[b] >= hi:
                break
            if cnts[b] == 0 or offs[b] + cnts[b] <= lo:
                continue
            ids = self._buckets.get(b)
            if ids is None:
                complete = False
                continue
            a = int(np.searchsorted(ids, lo))
            z = int(np.searchsorted(ids, hi))
            if z > a:
                pieces.append(ids[a:z])
        return (
            np.concatenate(pieces) if pieces else np.empty(0, np.int64)
        ), complete

    def first_k(self, k: int) -> np.ndarray:
        """First k matching doc ids ascending — stops as soon as k are
        found, so a match-all+fq page touches only a bucket prefix."""
        out: list[np.ndarray] = []
        have = 0
        for b in range(len(self.reader._doc_offsets)):
            if self.reader._doc_counts[b] == 0:
                continue
            ids = self.bucket_docs(b)
            if ids.size:
                out.append(ids[: k - have])
                have += out[-1].size
                if have >= k:
                    break
        return np.concatenate(out) if out else np.empty(0, np.int64)

    def count(self) -> int:
        """Total matching docs (forces all buckets, one at a time)."""
        if self._count is None:
            self._count = sum(
                self.bucket_docs(b).size
                for b in range(len(self.reader._doc_offsets))
                if self.reader._doc_counts[b]
            )
        return int(self._count)

    def all_docs(self) -> np.ndarray:
        """Full sorted doc set — only for surfaces that genuinely need it
        (offline/aux paths); serving paths use the bucket-wise accessors."""
        parts = [
            self.bucket_docs(b)
            for b in range(len(self.reader._doc_offsets))
            if self.reader._doc_counts[b]
        ]
        parts = [p for p in parts if p.size]
        return np.concatenate(parts) if parts else np.empty(0, np.int64)


class NotFilterSet:
    """AND-NOT composition for MUST_NOT clauses (Lucene `-term`): wraps an
    optional base filter and a sorted excluded-doc array. Exclusion never
    re-weights scores (Lucene: prohibited clauses don't score); it only
    shrinks the allowed doc set. cached_range_info reports incomplete when
    the base does (or always, with no base), so WAND falls back to masking
    decoded candidates — correctness never depends on range pre-checks."""

    def __init__(self, reader: "IndexReader", base, excluded: np.ndarray):
        self.reader = reader
        self.base = base
        self._excl = excluded  # sorted unique int64

    def _drop(self, ids: np.ndarray) -> np.ndarray:
        if ids.size == 0 or self._excl.size == 0:
            return ids
        return ids[~IndexReader._mask_member(ids, self._excl)]

    def bucket_docs(self, b: int) -> np.ndarray:
        if self.base is not None:
            return self._drop(self.base.bucket_docs(b))
        c = int(self.reader._doc_counts[b])
        ids = np.arange(c, dtype=np.int64) + self.reader._doc_offsets[b]
        return self._drop(ids)

    def mask(self, docs: np.ndarray) -> np.ndarray:
        m = (
            self.base.mask(docs)
            if self.base is not None
            else np.ones(docs.size, dtype=bool)
        )
        if self._excl.size:
            m &= ~IndexReader._mask_member(docs, self._excl)
        return m

    def cached_range_info(self, lo: int, hi: int) -> tuple[np.ndarray, bool]:
        if self.base is None:
            return np.empty(0, np.int64), False
        docs, complete = self.base.cached_range_info(lo, hi)
        return self._drop(docs), complete

    def first_k(self, k: int) -> np.ndarray:
        out: list[np.ndarray] = []
        have = 0
        for b in range(len(self.reader._doc_offsets)):
            if self.reader._doc_counts[b] == 0:
                continue
            ids = self.bucket_docs(b)
            if ids.size:
                out.append(ids[: k - have])
                have += out[-1].size
                if have >= k:
                    break
        return np.concatenate(out) if out else np.empty(0, np.int64)

    def count(self) -> int:
        return sum(
            self.bucket_docs(b).size
            for b in range(len(self.reader._doc_offsets))
            if self.reader._doc_counts[b]
        )

    def all_docs(self) -> np.ndarray:
        parts = [
            self.bucket_docs(b)
            for b in range(len(self.reader._doc_offsets))
            if self.reader._doc_counts[b]
        ]
        parts = [p for p in parts if p.size]
        return np.concatenate(parts) if parts else np.empty(0, np.int64)


class QueryFilterSet:
    """FilterSet-shaped view over a MATERIALIZED sorted doc-id set — the
    query-valued fq (Solr: any fq is a full query whose doc set lands in the
    filterCache as a bitset; the reference UI's target-language search box
    issues exactly this, `fq=<lang>:"<phrase>"`, solrTestLib_v2.js:50-53).
    Unlike the lazily-evaluated meta FilterSet, the set is computed up front
    (it is the cached artifact) and every range is therefore `complete`."""

    def __init__(self, reader: "IndexReader", docs: np.ndarray):
        self.reader = reader
        self._docs = docs  # sorted unique int64

    def bucket_docs(self, b: int) -> np.ndarray:
        lo = int(self.reader._doc_offsets[b])
        hi = lo + int(self.reader._doc_counts[b])
        a = int(np.searchsorted(self._docs, lo))
        z = int(np.searchsorted(self._docs, hi))
        return self._docs[a:z]

    def mask(self, docs: np.ndarray) -> np.ndarray:
        return IndexReader._mask_member(docs, self._docs)

    def cached_range_info(self, lo: int, hi: int) -> tuple[np.ndarray, bool]:
        a = int(np.searchsorted(self._docs, lo))
        z = int(np.searchsorted(self._docs, hi))
        return self._docs[a:z], True

    def first_k(self, k: int) -> np.ndarray:
        return self._docs[: max(k, 0)]

    def count(self) -> int:
        return int(self._docs.size)

    def all_docs(self) -> np.ndarray:
        return self._docs


class IndexReader:
    """Loads a built index; serves top-k BM25 queries.

    Stateful by design — in a serving deployment this object lives inside a
    Ray actor pool (one reader per actor, `__init__` loads the manifest once;
    see pipelines.SearchActor)."""

    def __init__(self, index_dir: str, cache_terms: int = 4096,
                 wand_range_blocks: int = 64,
                 synonyms: dict[str, list[str]] | None = None):
        self.index_dir = index_dir
        self._init_args = (cache_terms, wand_range_blocks, synonyms)
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self._manifest_raw = f.read()
        self.manifest = json.loads(self._manifest_raw)
        self.cfg = self.manifest["config"]
        self.profile = self.cfg["profile"]
        self.protected = frozenset(self.cfg.get("protected_words", ()))
        # query-time synonym expansion (reference SynonymFilter in the QUERY
        # chain only, schema.xml:295-307 + synonyms.txt): each expansion is
        # an extra SHOULD clause after its source term. Term queries only
        # (phrases keep exact positional semantics).
        self.synonyms = {k: list(v) for k, v in (synonyms or {}).items()}
        self.n_docs = self.manifest["n_docs"]
        self.n_docs_local = self.manifest["n_docs"]  # pre-override (cluster)
        self.avgdl = float(self.manifest["avgdl"])
        self.params = bm25.BM25Params()
        self._k_table = bm25.norm_k_table(self.avgdl, self.params)
        self._term_cache: OrderedDict[str, TermPostings | None] = OrderedDict()
        self._cache_cap = cache_terms
        self._range_width = self.cfg["block_size"] * wand_range_blocks
        # bucket -> ordered segment file list. Two layouts (see
        # BuildConfig.segment_range_groups): one parquet per term bucket, or
        # a bucket=NNNNN/ dir of per-doc-range-group files (rg order ==
        # ascending doc ranges, preserved so per-term rows concatenate in
        # range order).
        self._seg_files: dict[int, list[str]] = {}
        seg_dir = os.path.join(index_dir, "segments")
        if os.path.isdir(seg_dir):
            for name in os.listdir(seg_dir):
                path = os.path.join(seg_dir, name)
                if name.startswith("bucket=") and name.endswith(".parquet"):
                    b = int(name[len("bucket=") : -len(".parquet")])
                    self._seg_files[b] = [path]
                elif name.startswith("bucket=") and os.path.isdir(path):
                    b = int(name[len("bucket=") :])
                    self._seg_files[b] = [
                        os.path.join(path, f)
                        for f in sorted(os.listdir(path))
                        if f.startswith("rg=") and f.endswith(".parquet")
                    ]
        self._doc_offsets = np.asarray(self.manifest["doc_offsets"], dtype=np.int64)
        self._doc_counts = np.asarray(self.manifest["doc_counts"], dtype=np.int64)
        # doc-range-sharded serving state: norms and doc-meta columns load
        # PER DOC-BUCKET on demand with an LRU (at 10^12 docs a reader must
        # never concatenate a whole column; a query touches only the buckets
        # its candidate docs live in). _shard_loads counts actual parquet
        # reads (tested).
        self._norm_shards: OrderedDict[int, np.ndarray] = OrderedDict()
        self._meta_shards: OrderedDict[tuple[str, int], np.ndarray] = OrderedDict()
        self._shard_cap = 4096          # norm shards kept (1 B/doc — cheap)
        self._meta_shard_cap = 256      # meta column shards kept
        self._shard_loads: list[tuple[str, int]] = []
        # Solr filterCache analog: (field, values)-tuple -> FilterSet with
        # lazily built per-bucket doc sets
        self._filter_cache: OrderedDict[tuple, FilterSet] = OrderedDict()
        self._filter_cache_cap = 64
        # Solr queryResultCache analog (solrconfig.xml:544-547, LRUCache
        # size=512): ordered doc lists keyed by (query, k, mode, algorithm,
        # lang, filters). Repeat queries — the dominant serving pattern the
        # reference UI produces — return without touching postings.
        self._result_cache: OrderedDict[tuple, list] = OrderedDict()
        self._result_cache_cap = 512
        # prefix-expansion cache (PrefixQuery / terms component): term-hash
        # partitioning scatters a prefix across every term bucket, so an
        # expansion is a term-column scan of all segment files (pruned by
        # row-group stats via the range filter); cache the result
        self._prefix_cache: OrderedDict[str, list] = OrderedDict()
        self._prefix_cache_cap = 64
        # distributed-search seams (cluster.ShardWorker): per-term global-df
        # override (Solr ExactStatsCache analog — idf computed from
        # cluster-wide stats so per-shard scores equal the monolithic
        # index's) and a tombstone doc set (NRT deletes: masked from every
        # match/filter path, but — like Lucene — still counted in df/N
        # until a merge expunges them)
        self._df_override: dict[str, int] = {}
        self.deleted_docs: np.ndarray | None = None

    def refresh(self) -> bool:
        """Re-open at the current commit point (Solr commit/openSearcher
        analog). Index maintenance (`extend_index` / `delete_docs` /
        `reindex`) atomically replaces manifest.json; if it changed since
        this reader loaded, drop every cache and reload. Returns True iff
        a reload happened. After maintenance rewrites bucket files, a
        stale reader's caches no longer match its manifest — call this (or
        construct a new reader) before serving again; Solr likewise swaps
        in a new searcher on commit."""
        with open(os.path.join(self.index_dir, "manifest.json")) as f:
            raw = f.read()
        if raw == self._manifest_raw:
            return False
        cache_terms, wand_range_blocks, synonyms = self._init_args
        self.__init__(self.index_dir, cache_terms, wand_range_blocks, synonyms)
        return True

    # ------------------------------------------------------------------
    # postings access
    # ------------------------------------------------------------------
    def _apply_df_override(self, term: str, tp: TermPostings | None):
        """Swap in the cluster-global df for scoring (set_global_stats).
        The shard-local df survives as ``df_local`` (term_dfs reports it);
        structural uses of df are per-row (``r["df"]`` in __post_init__),
        so mutating the merged top-level df only changes idf — exactly the
        ExactStatsCache contract. Memoized upper bounds reset."""
        g = self._df_override.get(term)
        if g is not None and tp is not None and tp.df != g:
            if not hasattr(tp, "df_local"):
                tp.df_local = tp.df
            tp.df = g
            tp._ubs = None
        return tp

    def set_global_stats(
        self, n_docs: int, avgdl: float, df_by_term: dict[str, int]
    ) -> None:
        """Serve with CLUSTER-global BM25 statistics (distributed search,
        cluster.DistributedSearcher): overrides N, avgdl and — per term in
        `df_by_term` — df, so this shard's float32 scores are identical to
        a single monolithic index over the union corpus.

        Change-aware: score-dependent caches (results, block-max bounds)
        drop only when something that enters a score actually changed —
        (N, avgdl) or a df override VALUE. The coordinator pushes before
        the first scoring use of every term (phase 1 precedes phase 2), so
        a brand-new override can only have been scored under its own value
        never a stale one; re-pushing the same stats for each new query —
        the steady serving pattern — therefore keeps shard result caches
        warm. Postings/filter caches always stay (contents unaffected)."""
        dims_changed = int(n_docs) != self.n_docs or float(avgdl) != self.avgdl
        if dims_changed:
            self.n_docs = int(n_docs)
            self.avgdl = float(avgdl)
            self._k_table = bm25.norm_k_table(self.avgdl, self.params)
        df_changed = False
        for t, g in df_by_term.items():
            g = int(g)
            prev = self._df_override.get(t)
            if prev == g:
                continue
            if prev is not None:
                # a previously-pushed value changed (refresh between
                # pushes) — cached results scored under it are stale
                df_changed = True
            self._df_override[t] = g
            tp = self._term_cache.get(t)
            if tp is not None:
                self._apply_df_override(t, tp)
        if dims_changed or df_changed:
            self._result_cache.clear()
        if dims_changed:
            # block-max upper bounds depend on (N, avgdl) and memoize
            # without keying on them — drop every cached term's (a term
            # whose global df equals its local df still needs new-N/avgdl
            # bounds, else WAND may skip blocks)
            for term, tp in self._term_cache.items():
                if tp is None:  # negative cache entry (term absent locally)
                    continue
                tp._ubs = None
                self._apply_df_override(term, tp)

    def set_deleted(self, doc_ids: np.ndarray | None) -> None:
        """Install the tombstone doc set (sorted int64; None clears).
        Deleted docs stop matching every query/filter/facet path but keep
        contributing to df/N until a merge rewrites the segments — the
        Lucene liveDocs discipline."""
        if doc_ids is None or len(doc_ids) == 0:
            self.deleted_docs = None
        else:
            arr = np.unique(np.asarray(doc_ids, dtype=np.int64))
            self.deleted_docs = arr
        self._result_cache.clear()

    def postings(self, term: str) -> TermPostings | None:
        if term in self._term_cache:
            self._term_cache.move_to_end(term)
            return self._apply_df_override(term, self._term_cache[term])
        bucket = term_bucket_of(term, self.cfg["num_term_buckets"])
        paths = self._seg_files.get(bucket)
        tp: TermPostings | None = None
        if paths:
            tbls = [
                pq.read_table(p, filters=[("term", "==", term)])
                for p in paths
            ]
            tbl = tbls[0] if len(tbls) == 1 else pa.concat_tables(tbls)
            if tbl.num_rows:
                rows = []
                for r in tbl.to_pylist():
                    r["block_last"] = np.asarray(r["block_last"], dtype=np.int64)
                    r["block_off"] = np.asarray(r["block_off"], dtype=np.int32)
                    r["block_pos_off"] = np.asarray(r["block_pos_off"], dtype=np.int32)
                    r["block_max_tf"] = np.asarray(r["block_max_tf"], dtype=np.int32)
                    r["block_min_norm"] = np.asarray(
                        r["block_min_norm"], dtype=np.uint8
                    )
                    r["block_size"] = self.cfg["block_size"]
                    r["codec"] = self.cfg.get("postings_codec", "varint")
                    rows.append(r)
                rows.sort(key=lambda r: r["range_bucket"])
                tp = TermPostings(
                    term=term,
                    df=sum(r["df"] for r in rows),
                    cf=sum(r["cf"] for r in rows),
                    max_tf=max(r["max_tf"] for r in rows),
                    min_norm=min(r["min_norm"] for r in rows),
                    rows=rows,
                )
        self._term_cache[term] = tp
        if len(self._term_cache) > self._cache_cap:
            self._term_cache.popitem(last=False)
        return self._apply_df_override(term, tp)

    # ------------------------------------------------------------------
    # prefix expansion (Lucene PrefixQuery / Solr terms component)
    # ------------------------------------------------------------------
    @staticmethod
    def _prefix_upper(prefix: str) -> str | None:
        """Smallest string > every string with this prefix (codepoint order
        == byte order for valid UTF-8), for row-group pruning; None if the
        prefix is all U+10FFFF."""
        for i in range(len(prefix) - 1, -1, -1):
            c = ord(prefix[i])
            for nc in range(c + 1, 0x110000):
                if not (0xD800 <= nc <= 0xDFFF):
                    return prefix[:i] + chr(nc)
        return None

    def _prefix_term_rows(self, prefix: str) -> list[tuple[str, int]]:
        """All (term, summed df) with the given prefix, scanning the term/df
        columns of every term-bucket segment (hash partitioning has no
        sorted global dictionary — the analog of Lucene's per-segment terms
        enum; reads are column-pruned and range-filtered so row-group stats
        prune non-overlapping chunks). Cached per prefix."""
        hit = self._prefix_cache.get(prefix)
        if hit is not None:
            self._prefix_cache.move_to_end(prefix)
            return hit
        flt = [("term", ">=", prefix)]
        hi = self._prefix_upper(prefix)
        if hi is not None:
            flt.append(("term", "<", hi))
        counts: dict[str, int] = {}
        for path in (p for ps in self._seg_files.values() for p in ps):
            tbl = pq.read_table(path, columns=["term", "df"], filters=flt)
            for t, d in zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()):
                if t.startswith(prefix):  # exactness beyond the range prune
                    counts[t] = counts.get(t, 0) + int(d)
        rows = sorted(counts.items())
        self._prefix_cache[prefix] = rows
        if len(self._prefix_cache) > self._prefix_cache_cap:
            self._prefix_cache.popitem(last=False)
        return rows

    def expand_prefix(self, prefix: str) -> list[str]:
        """Terms matching `prefix*`, ascending."""
        return [t for t, _ in self._prefix_term_rows(prefix)]

    def expand_wildcard(self, pattern: str) -> list[str]:
        """Terms matching a Lucene wildcard pattern (* = any run, ? = one
        char), ascending. The literal prefix before the first wildcard
        drives the same range-pruned segment scan as PrefixQuery; the rest
        is an anchored regex over the pruned candidates. A
        leading-wildcard pattern scans the full dictionary (the same cost
        Lucene documents for it)."""
        import re as _re

        lit = min(
            (pattern.index(c) for c in "*?" if c in pattern),
            default=len(pattern),
        )
        rx = _re.compile(
            "".join(
                ".*" if c == "*" else "." if c == "?" else _re.escape(c)
                for c in pattern
            )
            + r"\Z"
        )
        return [
            t for t, _ in self._prefix_term_rows(pattern[:lit])
            if rx.match(t)
        ]

    def suggest(self, prefix: str, n: int = 10) -> list[tuple[str, int]]:
        """Solr terms-component analog (terms.prefix / autocomplete): top-n
        (term, df) for the prefix, df-desc then term-asc."""
        rows = self._prefix_term_rows(prefix)
        return sorted(rows, key=lambda r: (-r[1], r[0]))[:n]

    def expand_fuzzy(self, base: str, max_edits: int = 1) -> list[str]:
        """Terms within `max_edits` Levenshtein edits of `base` (Lucene
        FuzzyQuery with prefix_length=0): full dictionary scan with a
        length-band prefilter (|len(t)| within max_edits of |len(base)|) —
        the automaton-free equivalent; the scanned dictionary is the same
        cached artifact prefix expansion uses. max_edits=1 (the Lucene
        default and the only NeXLT usage) runs the vectorized prefix+suffix
        kernel (`_lev1_hits`); k=2 falls back to the banded DP."""
        rows = self._prefix_term_rows("")
        if max_edits == 1:
            uniq = np.array([t for t, _ in rows], dtype="U")
            return [str(t) for t in uniq[_lev1_hits(base, uniq)]]
        lb, ub = len(base) - max_edits, len(base) + max_edits
        return [
            t for t, _ in rows
            if lb <= len(t) <= ub and _levenshtein_leq(base, t, max_edits)
        ]

    def spellcheck(self, term: str, n: int = 1) -> list[tuple[str, int]]:
        """Did-you-mean (Solr SpellCheckComponent / Lucene
        DirectSpellChecker analog — the reference UI renders
        spellcheck.suggestions.collation, velocity/did_you_mean.vm):
        top-n dictionary terms within ONE edit of `term`, df desc then
        term asc, `term` itself excluded. Same cached dictionary artifact
        and vectorized `_lev1_hits` scan as expand_fuzzy."""
        rows = self._prefix_term_rows("")
        uniq = np.array([t for t, _ in rows], dtype="U")
        dfs = np.array([d for _, d in rows], dtype=np.int64)
        hit = _lev1_hits(term, uniq)
        hit &= uniq != term
        idx = np.flatnonzero(hit)
        order = np.lexsort((uniq[idx], -dfs[idx]))[:n]
        return [(str(uniq[idx[o]]), int(dfs[idx[o]])) for o in order]

    def _prefix_docs(self, prefix: str, fset, kind: str = "prefix") -> np.ndarray:
        """Sorted doc ids matching a prefix / wildcard / fuzzy term — the
        union bitset of the expanded terms' postings (Lucene
        CONSTANT_SCORE_REWRITE: multi-term expansion builds a doc set and is
        exempt from maxBooleanClauses)."""
        if kind == "wildcard":
            terms = self.expand_wildcard(prefix)
        elif kind == "fuzzy":
            m = _FUZZY_RX.match(prefix)
            terms = self.expand_fuzzy(m.group(1), int(m.group(2) or 1))
        else:
            terms = self.expand_prefix(prefix)
        sets = [
            tp.decode_all()[0]
            for tp in (self.postings(t) for t in terms)
            if tp is not None
        ]
        if not sets:
            return np.empty(0, np.int64)
        cur = np.unique(np.concatenate(sets))
        if fset is not None and cur.size:
            cur = cur[fset.mask(cur)]
        return cur

    # ------------------------------------------------------------------
    # doc-meta / stored fields (reference J3: top-k ids -> stored fields,
    # solrconfig.xml:840-901)
    # ------------------------------------------------------------------
    def doc_fields(
        self, doc_ids: list[int], columns: list[str] | None = None
    ) -> pa.Table:
        columns = columns or ["repo", "path", "commit", "lang", "content_sha256"]
        need = sorted(set(int(d) for d in doc_ids))
        buckets = np.searchsorted(self._doc_offsets, need, side="right") - 1
        out = []
        for b in sorted(set(buckets.tolist())):
            path = os.path.join(self.index_dir, "docstore", f"bucket={b:05d}.parquet")
            ranks = [
                int(d - self._doc_offsets[bk])
                for d, bk in zip(need, buckets)
                if bk == b
            ]
            t = pq.read_table(
                path,
                columns=["doc_bucket", "local_rank"] + columns,
                filters=[("local_rank", "in", ranks)],
            )
            out.append(t)
        tbl = pa.concat_tables(out) if out else None
        if tbl is None:
            return pa.table({})
        doc_id = (
            self._doc_offsets[np.asarray(tbl["doc_bucket"])]
            + np.asarray(tbl["local_rank"])
        )
        tbl = tbl.drop_columns(["doc_bucket", "local_rank"]).add_column(
            0, "doc_id", pa.array(doc_id, pa.int64())
        )
        order = np.argsort(np.asarray(tbl["doc_id"]))
        return tbl.take(pa.array(order))

    def get(
        self, ids: list[str], columns: list[str] | None = None
    ) -> pa.Table:
        """RealTimeGet analog (reference /get handler, solrconfig.xml:915;
        uniqueKey = the content hash, schema.xml:1030-1033): fetch stored
        fields by content_sha256. The docstore is sha-range partitioned AND
        sha-sorted within each bucket (BucketWriter), so each id resolves
        with one bucket probe + binary search — no scan, no index lookup."""
        columns = columns or ["repo", "path", "commit", "lang", "content"]
        cfg = self.manifest["config"]
        nb = int(cfg["num_doc_buckets"])
        by_bucket: dict[int, list[str]] = {}
        for s in ids:
            b = (int(s[:8], 16) * nb) >> 32
            by_bucket.setdefault(b, []).append(s)
        out = []
        for b, shas in sorted(by_bucket.items()):
            path = self._docstore_path(b)
            if not os.path.exists(path):
                continue
            t = pq.read_table(
                path,
                columns=["doc_bucket", "local_rank", "content_sha256"]
                + [c for c in columns if c != "content_sha256"],
            )
            col = np.asarray(t["content_sha256"].to_pylist(), dtype="U64")
            want = np.asarray(sorted(set(shas)), dtype="U64")
            idx = np.searchsorted(col, want)
            safe = np.minimum(idx, col.size - 1)
            hit = (idx < col.size) & (col[safe] == want)
            if hit.any():
                out.append(t.take(pa.array(safe[hit])))
        if not out:
            return pa.table({})
        tbl = pa.concat_tables(out)
        doc_id = (
            self._doc_offsets[np.asarray(tbl["doc_bucket"])]
            + np.asarray(tbl["local_rank"])
        )
        tbl = tbl.drop_columns(["doc_bucket", "local_rank"]).add_column(
            0, "doc_id", pa.array(doc_id, pa.int64())
        )
        return tbl.take(pa.array(np.argsort(np.asarray(tbl["doc_id"]))))

    def analyze(
        self, text: str, lang: str | None = None, query_time: bool = False
    ) -> list[tuple[str, int]]:
        """Field-analysis introspection (reference /analysis/field handler,
        solrconfig.xml:987): (token, position) pairs the index/query chain
        emits for `text` under this index's profile routing."""
        from .tokenize import tokenize_batch

        tb = tokenize_batch(
            [text],
            profile=self._query_profile(lang),
            with_overlaps=not query_time,
            protected=self.protected,
        )
        order = np.lexsort((tb.terms.astype("U"), tb.positions))
        return [
            (str(tb.terms[i]), int(tb.positions[i])) for i in order
        ]

    # ------------------------------------------------------------------
    # highlighting (reference HighlightComponent, solrconfig.xml:1144-1243;
    # declared-unused by the NeXLT UI — no CGI sends hl= — but part of the
    # reference query surface)
    # ------------------------------------------------------------------
    def highlight(
        self,
        query: str,
        k: int = 10,
        context: int = 2,
        lang: str | None = None,
        filters: dict | None = None,
    ) -> pa.Table:
        """Snippets for the BM25 top-k: per query term present in a hit,
        the first token position read from the POSITIONAL POSTINGS (the
        index decides positions — no document rescan) and a +-context-token
        window rendered by re-analyzing the stored content (Solr's standard
        highlighter re-analyzes stored fields the same way). Overlap tokens
        (WordDelimiter catenations at posInc=0) render as the
        lexicographically-first token at their position (analyze() order).
        Returns (doc_id, term, first_pos, snippet), doc-ascending then
        term-ascending."""
        top = self.search(query, k=k, lang=lang, filters=filters)
        return self.highlight_for_docs(
            query, [d for d, _ in top], context=context, lang=lang
        )

    def highlight_for_docs(
        self,
        query: str,
        doc_ids: list[int],
        context: int = 2,
        lang: str | None = None,
    ) -> pa.Table:
        """highlight()'s snippet kernel over a GIVEN doc set — the
        distributed-search seam (cluster.DistributedSearcher runs the exact
        global top-k first, then each shard snippets only its own hits)."""
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "first_pos": pa.array([], pa.int64()),
                "snippet": pa.array([], pa.string()),
            }
        )
        if not doc_ids:
            return empty
        top_docs = np.array(sorted(doc_ids), dtype=np.int64)
        qterms = sorted({t for t, _ in self.analyze(query, lang=lang,
                                                    query_time=True)})
        firsts: dict[tuple[int, str], int] = {}
        for term in qterms:
            tp = self.postings(term)
            if tp is None:
                continue
            dp, pp = tp.positions_for_docs(top_docs)
            if dp.size == 0:
                continue
            m = np.isin(dp, top_docs)
            if not m.any():
                continue
            d_, p_ = dp[m], pp[m]
            order = np.lexsort((p_, d_))
            d_, p_ = d_[order], p_[order]
            first = np.concatenate(([True], d_[1:] != d_[:-1]))
            for dd, p0 in zip(d_[first], p_[first]):
                firsts[(int(dd), term)] = int(p0)
        if not firsts:
            return empty
        content = self.doc_fields(top_docs.tolist(), ["content", "lang"])
        pos_tokens: dict[int, dict[int, str]] = {}
        for did, ctext, dlang in zip(
            content["doc_id"].to_pylist(),
            content["content"].to_pylist(),
            content["lang"].to_pylist(),
        ):
            by_pos: dict[int, str] = {}
            for tok, pos in self.analyze(ctext, lang=lang or dlang):
                by_pos.setdefault(int(pos), tok)
            pos_tokens[int(did)] = by_pos
        rows = sorted(firsts.items())
        snippets = []
        for (did, _term), p0 in rows:
            by_pos = pos_tokens.get(did, {})
            n = (max(by_pos) + 1) if by_pos else 0
            window = range(max(0, p0 - context), min(n - 1, p0 + context) + 1)
            snippets.append(" ".join(by_pos[i] for i in window if i in by_pos))
        return pa.table(
            {
                "doc_id": pa.array([d for (d, _), _ in rows], pa.int64()),
                "term": pa.array([t for (_, t), _ in rows], pa.string()),
                "first_pos": pa.array([p for _, p in rows], pa.int64()),
                "snippet": pa.array(snippets, pa.string()),
            }
        )

    # ------------------------------------------------------------------
    # more-like-this (reference MoreLikeThisHandler shape,
    # solrconfig.xml /mlt; Lucene MLT term selection)
    # ------------------------------------------------------------------
    def more_like_this(
        self,
        doc_id: int,
        k: int = 10,
        max_query_terms: int = 25,
        min_tf: int = 2,
        min_df: int = 2,
        lang: str | None = None,
        filters: dict | None = None,
    ) -> list[tuple[int, float]]:
        """Docs similar to `doc_id`: select the source doc's most
        interesting terms by tf * idf (Lucene MoreLikeThis term selection —
        mintf/mindf gates, top maxqt terms; idf is the engine's BM25 idf so
        selection and scoring agree), then run them as an OR query with the
        usual BM25/WAND machinery, excluding the source doc. Deterministic:
        term ties break ascending. Composes with fq like any search."""
        pairs = self.mlt_source_terms(int(doc_id), lang=lang, min_tf=min_tf)
        cands: list[tuple[float, str]] = []
        for term, tf in pairs:
            tp = self.postings(term)
            if tp is None or tp.df < min_df:
                continue
            cands.append((float(tf) * bm25.idf(tp.df, self.n_docs), term))
        cands.sort(key=lambda x: (-x[0], x[1]))
        qterms = [term for _, term in cands[:max_query_terms]]
        return self.search_analyzed_terms(
            qterms, k, exclude=(int(doc_id),), lang=lang, filters=filters
        )

    def mlt_source_terms(
        self, doc_id: int, lang: str | None = None, min_tf: int = 2
    ) -> list[tuple[str, int]]:
        """MLT phase 0: the source doc's unique analyzed terms with
        tf >= min_tf, term-ascending — the distributed-search seam (the
        coordinator fetches these from the OWNING shard, then ranks them by
        CLUSTER-global idf before the fan-out query)."""
        t = self.doc_fields([int(doc_id)], columns=["content", "lang"])
        if t.num_rows == 0:
            return []
        text = t["content"][0].as_py()
        doc_lang = t["lang"][0].as_py() if "lang" in t.column_names else None
        from .tokenize import tokenize_batch

        tb = tokenize_batch(
            [text],
            profile=self._query_profile(lang or doc_lang),
            protected=self.protected,
        )
        if tb.terms.size == 0:
            return []
        terms_u, tfs = np.unique(tb.terms.astype("U"), return_counts=True)
        return [
            (str(term), int(tf))
            for term, tf in zip(terms_u, tfs)
            if tf >= min_tf
        ]

    def search_analyzed_terms(
        self,
        qterms: list[str],
        k: int,
        exclude: tuple = (),
        lang: str | None = None,
        filters: dict | None = None,
    ) -> list[tuple[int, float]]:
        """Top-k OR query over ALREADY-ANALYZED terms (no re-tokenization —
        MLT and the distributed MLT fan-out must score the selected terms
        verbatim), minus `exclude` doc ids."""
        if not qterms or k <= 0:
            return []
        fset = self._filter_docs(filters, lang)
        res = self._search_wand(qterms, k + len(exclude), fset)
        drop = {int(d) for d in exclude}
        return [(d, s) for d, s in res if d not in drop][:k]

    # ------------------------------------------------------------------
    # scoring helpers
    # ------------------------------------------------------------------
    def _clause_postings(self, terms: list[str]) -> list[TermPostings | None]:
        return [self.postings(t) for t in terms]

    # -- doc-range-sharded norms / doc-meta ----------------------------
    def _docstore_path(self, b: int) -> str:
        return os.path.join(self.index_dir, "docstore", f"bucket={b:05d}.parquet")

    def _norm_shard(self, b: int) -> np.ndarray:
        shard = self._norm_shards.get(b)
        if shard is None:
            path = self._docstore_path(b)
            if os.path.exists(path):
                shard = np.asarray(
                    pq.read_table(path, columns=["norm_byte"])["norm_byte"]
                ).astype(np.uint8)
            else:
                shard = np.empty(0, np.uint8)
            self._shard_loads.append(("norm", b))
            self._norm_shards[b] = shard
            if len(self._norm_shards) > self._shard_cap:
                self._norm_shards.popitem(last=False)
        else:
            self._norm_shards.move_to_end(b)
        return shard

    def _meta_shard(self, name: str, b: int):
        """One doc bucket's column `name`: numpy for scalar columns, a
        combined pyarrow ListArray for multiValued (`*_all`) columns —
        list membership/flatten stay in Arrow kernels (FilterSet, facets).
        multiValued fields are not sortable, exactly like Solr."""
        key = (name, b)
        shard = self._meta_shards.get(key)
        if shard is None:
            path = self._docstore_path(b)
            if os.path.exists(path):
                col = pq.read_table(path, columns=[name])[name]
                if pa.types.is_list(col.type) or pa.types.is_large_list(
                    col.type
                ):
                    shard = col.combine_chunks()
                else:
                    shard = col.to_numpy(zero_copy_only=False)
            else:
                shard = np.empty(0, object)
            self._shard_loads.append((name, b))
            self._meta_shards[key] = shard
            if len(self._meta_shards) > self._meta_shard_cap:
                self._meta_shards.popitem(last=False)
        else:
            self._meta_shards.move_to_end(key)
        return shard

    def _buckets_of(self, docs: np.ndarray) -> np.ndarray:
        return np.searchsorted(self._doc_offsets, docs, side="right") - 1

    def _norm_bytes_for(self, docs: np.ndarray) -> np.ndarray:
        """Norm byte per doc, loading only the doc buckets `docs` touch."""
        out = np.empty(docs.size, dtype=np.uint8)
        buckets = self._buckets_of(docs)
        for b in np.unique(buckets):
            sel = buckets == b
            out[sel] = self._norm_shard(int(b))[
                docs[sel] - self._doc_offsets[b]
            ]
        return out

    def _meta_values(self, name: str, docs: np.ndarray) -> np.ndarray:
        """Doc-meta column values per doc (object array), loading only the
        buckets `docs` touch — the docValues analog, doc-range sharded."""
        out = np.empty(docs.size, dtype=object)
        buckets = self._buckets_of(docs)
        for b in np.unique(buckets):
            sel = buckets == b
            out[sel] = self._meta_shard(name, int(b))[
                docs[sel] - self._doc_offsets[b]
            ]
        return out

    # -- fielded filters (Solr fq analog: corpus.cgi:328-339 product /
    #    resource / lang filter queries; solrTestLib_v2.js:38-102) --------
    def _filter_docs(self, filters: dict | None, lang: str | None = None):
        """Filter for the normalized spec (values OR within a field, AND
        across fields) — cached per filter (the Solr filterCache LRU
        discipline, solrconfig.xml:534-541). Meta fields evaluate lazily per
        doc bucket (FilterSet). The reserved field ``content`` takes QUERY
        strings over the analyzed field (term / "phrase" / OR list — the
        reference UI's target-text fq, solrTestLib_v2.js:50-53); their doc
        set is materialized once and cached (exactly Solr's fq bitset),
        intersected with the meta filters when both are present. fq never
        re-weights: BM25 statistics stay corpus-global. NRT tombstones
        (set_deleted) compose here as a final AND-NOT, so every caller —
        search, match_count, facets, sorts — masks deleted docs."""
        base = self._filter_docs_inner(filters, lang)
        if self.deleted_docs is not None:
            return NotFilterSet(self, base, self.deleted_docs)
        return base

    def _filter_docs_inner(self, filters: dict | None, lang: str | None = None):
        if not filters:
            return None
        meta = {f: v for f, v in filters.items() if f != "content"}
        fq_q = filters.get("content")
        mset = None
        if meta:
            key = tuple(
                (f, tuple(sorted([v] if isinstance(v, str) else v)))
                for f, v in sorted(meta.items())
            )
            mset = self._filter_cache.get(key)
            if mset is not None:
                self._filter_cache.move_to_end(key)
            else:
                mset = FilterSet(self, key)
                self._filter_cache[key] = mset
                if len(self._filter_cache) > self._filter_cache_cap:
                    self._filter_cache.popitem(last=False)
        if fq_q is None:
            return mset
        qs = [fq_q] if isinstance(fq_q, str) else sorted(fq_q)
        qkey = ("content", tuple(qs), lang, None if mset is None else mset.key)
        qset = self._filter_cache.get(qkey)
        if qset is not None:
            self._filter_cache.move_to_end(qkey)
            return qset
        sets = [self._matching_docs(q, mode="OR", lang=lang) for q in qs]
        docs = (
            np.unique(np.concatenate(sets)) if len(sets) > 1 else sets[0]
        )
        if mset is not None and docs.size:
            docs = docs[mset.mask(docs)]
        qset = QueryFilterSet(self, docs)
        self._filter_cache[qkey] = qset
        if len(self._filter_cache) > self._filter_cache_cap:
            self._filter_cache.popitem(last=False)
        return qset

    @staticmethod
    def _mask_member(values: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
        """Boolean membership of `values` in a SORTED unique id array."""
        if sorted_set.size == 0:
            return np.zeros(values.size, dtype=bool)
        idx = np.searchsorted(sorted_set, values)
        return (idx < sorted_set.size) & (
            sorted_set[np.minimum(idx, sorted_set.size - 1)] == values
        )

    def _term_contrib(
        self, tp: TermPostings, docs: np.ndarray, tfs: np.ndarray
    ) -> np.ndarray:
        nb = self._norm_bytes_for(docs)
        return bm25.term_scores(
            tfs, nb, tp.df, self.n_docs, self.avgdl, self.params, self._k_table
        )

    def explain(
        self, query: str, doc_id: int, lang: str | None = None
    ) -> list[dict]:
        """Solr debugQuery / Lucene Explanation analog: the per-term BM25
        breakdown of `doc_id`'s score for an OR term query — one dict per
        query term with tf, df, and the float32 contribution. Accumulating
        the contributions in term order float32-exactly reproduces the
        doc's search() score (tested). Terms absent from the doc (or the
        index) report tf=0, contribution 0."""
        from .tokenize import tokenize_query

        terms = tokenize_query(
            query, profile=self._query_profile(lang), protected=self.protected
        )
        doc = np.array([doc_id], dtype=np.int64)
        out = []
        for t, tp in zip(terms, self._clause_postings(terms)):
            tf, df, contrib = 0, 0, 0.0
            if tp is not None:
                df = int(tp.df)
                d, tfs = tp.postings_for_docs(doc)
                at = np.searchsorted(d, doc_id)
                if at < d.size and d[at] == doc_id:
                    tf = int(tfs[at])
                    contrib = float(
                        self._term_contrib(tp, doc, np.array([tf]))[0]
                    )
            out.append({"term": t, "tf": tf, "df": df, "contribution": contrib})
        return out

    # ------------------------------------------------------------------
    # search
    # ------------------------------------------------------------------
    @staticmethod
    def parse(query: str) -> tuple[str, str]:
        q = query.strip()
        if q in ("*", "*:*", "[* TO *]"):
            # match-all — the reference's actual flagship query shape is
            # q=<lang>:[* TO *] with fq filters doing the real selection
            # (solrTestLib_v2.js:38-44, corpus.cgi:328)
            return "all", ""
        m = _SLOP_RX.match(q)
        if m:
            # Lucene sloppy PhraseQuery `"a b"~N` — slop rides along in the
            # body after a '"~' marker (no plain-phrase body can produce
            # one; _split_phrase_slop peels it off before tokenization)
            return "phrase", m.group(1) + '"~' + m.group(2)
        if len(q) >= 2 and q.startswith('"') and q.endswith('"'):
            return "phrase", q[1:-1]
        if (
            len(q) >= 2
            and q.endswith("*")
            and " " not in q
            and '"' not in q
            and "*" not in q[:-1]
            and "?" not in q
        ):
            # Lucene PrefixQuery (q=val*): constant-score, the wildcard
            # term is NOT analyzed beyond lowercasing (Solr multiterm
            # analysis)
            return "prefix", q[:-1].lower()
        if (
            len(q) >= 2
            and (("*" in q) or ("?" in q))
            and " " not in q
            and '"' not in q
            and q not in ("*", "**")
        ):
            # Lucene WildcardQuery (q=v?l*e): * = any run, ? = one char;
            # same constant-score rewrite as prefix
            return "wildcard", q.lower()
        if _FUZZY_RX.match(q):
            # Lucene FuzzyQuery (q=term~ / term~2): Levenshtein expansion,
            # same constant-score rewrite
            return "fuzzy", q.lower()
        return "terms", q

    @staticmethod
    def _split_prohibited(body: str) -> tuple[str, list[str]]:
        """Lucene MUST_NOT syntax: a leading '-' on a whitespace clause
        prohibits it ('http -parse'). '-' inside a clause is content
        (wi-fi). Returns (positive body, prohibited raw clauses)."""
        pos, neg = [], []
        for clause in body.split():
            if clause.startswith("-") and len(clause) > 1:
                neg.append(clause[1:])
            else:
                pos.append(clause)
        return " ".join(pos), neg

    def _apply_prohibited(self, neg_clauses: list[str], fset, lang):
        """Union the prohibited clauses' doc sets and compose AND-NOT with
        the existing filter. Prohibited docs never score (Lucene semantics);
        a pure-negative query becomes match-all minus the set (the Solr
        top-level rewrite)."""
        from .tokenize import tokenize_query

        sets = []
        for c in neg_clauses:
            for t in tokenize_query(
                c, profile=self._query_profile(lang), protected=self.protected
            ):
                tp = self.postings(t)
                if tp is not None:
                    sets.append(tp.decode_all()[0])
        excl = (
            np.unique(np.concatenate(sets)) if sets else np.empty(0, np.int64)
        )
        return NotFilterSet(self, fset, excl)

    _BOOST_RX = re.compile(r"^(.*)\^(\d+(?:\.\d+)?)$")

    @classmethod
    def _parse_boolean_clauses(cls, body: str):
        """Lucene boost/MUST syntax: `term^2` multiplies the clause's score
        contribution, `+term` makes it required (docs must contain it; other
        clauses stay SHOULD). Returns [(raw, boost, required)] or None when
        the body uses neither operator (fast path unchanged)."""
        out, has = [], False
        for c in body.split():
            req = c.startswith("+") and len(c) > 1
            if req:
                c = c[1:]
                has = True
            boost = 1.0
            m = cls._BOOST_RX.match(c)
            if m and m.group(1):
                c = m.group(1)
                boost = float(m.group(2))
                has = True
            out.append((c, boost, req))
        return out if has else None

    def _boolean_tokens(
        self, clauses, lang: str | None
    ) -> list[tuple[str, float, bool]]:
        from .tokenize import tokenize_query

        toks: list[tuple[str, float, bool]] = []
        for raw, boost, req in clauses:
            for t in tokenize_query(
                raw, profile=self._query_profile(lang), protected=self.protected
            ):
                toks.append((t, boost, req))
        return toks

    def _search_boolean(
        self, clauses, k: int, fset, lang: str | None,
        min_should_match: int = 0,
    ) -> list[tuple[int, float]]:
        """Exhaustive scorer for boosted/required queries: score = sum of
        boost * BM25 contribution over present clauses; docs missing any
        required clause are dropped (a required term absent from the index
        means zero matches — Lucene MUST). min_should_match counts SHOULD
        clauses only, exactly Lucene's minimumNumberShouldMatch."""
        toks = self._boolean_tokens(clauses, lang)
        if not toks or k <= 0:
            return []
        plist = self._clause_postings([t for t, _, _ in toks])
        if any(tp is None for tp, (_, _, req) in zip(plist, toks) if req):
            return []
        decoded = [
            tp.decode_all() if tp else (np.empty(0, np.int64), np.empty(0, np.int64))
            for tp in plist
        ]
        decoded = self._clip_to_filter(decoded, fset)
        all_docs = [d for d, _ in decoded if d.size]
        if not all_docs:
            return []
        union = np.unique(np.concatenate(all_docs))
        acc = np.zeros(union.size, dtype=np.float32)
        mask = np.ones(union.size, dtype=bool)
        should_cnt = np.zeros(union.size, dtype=np.int32)
        for tp, (d, t), (_, boost, req) in zip(plist, decoded, toks):
            if tp is not None and d.size:
                s = self._term_contrib(tp, d, t) * np.float32(boost)
                at = np.searchsorted(union, d)
                acc[at] += s
                if not req:
                    should_cnt[at] += 1
            if req:
                mask &= (
                    np.isin(union, d, assume_unique=True)
                    if d.size
                    else np.zeros(union.size, dtype=bool)
                )
        if min_should_match > 0:
            mask &= should_cnt >= min_should_match
        union, acc = union[mask], acc[mask]
        if union.size == 0:
            return []
        order = np.lexsort((union, -acc))[:k]
        return [(int(union[i]), float(acc[i])) for i in order]

    def _boolean_docs(
        self, clauses, fset, lang: str | None, min_should_match: int = 0
    ) -> np.ndarray:
        """Match set for boosted/required queries (boosts don't change
        membership; required clauses intersect; min_should_match counts
        SHOULD clauses only, like Lucene)."""
        toks = self._boolean_tokens(clauses, lang)
        if not toks:
            return np.empty(0, np.int64)
        plist = self._clause_postings([t for t, _, _ in toks])
        if any(tp is None for tp, (_, _, req) in zip(plist, toks) if req):
            return np.empty(0, np.int64)
        sets = [
            tp.decode_all()[0] if tp else np.empty(0, np.int64)
            for tp in plist
        ]
        union = (
            np.unique(np.concatenate([s for s in sets if s.size]))
            if any(s.size for s in sets)
            else np.empty(0, np.int64)
        )
        if min_should_match > 0 and union.size:
            cnt = np.zeros(union.size, dtype=np.int32)
            for s, (_, _, req) in zip(sets, toks):
                if not req and s.size:
                    at = np.searchsorted(union, s)
                    sel = (at < union.size) & (union[np.minimum(at, union.size - 1)] == s)
                    cnt[at[sel]] += 1
            union = union[cnt >= min_should_match]
        for s, (_, _, req) in zip(sets, toks):
            if req and union.size:
                union = union[np.isin(union, s, assume_unique=True)]
        if fset is not None and union.size:
            union = union[fset.mask(union)]
        return union

    def _all_docs(self) -> np.ndarray:
        """Every existing doc id (bucket offsets + ranks — valid for dense
        and strided id layouts)."""
        parts = [
            np.arange(c, dtype=np.int64) + o
            for o, c in zip(self._doc_offsets, self._doc_counts)
            if c
        ]
        return np.concatenate(parts) if parts else np.empty(0, np.int64)

    def _query_profile(self, lang: str | None) -> str:
        if self.profile == "auto":
            from .tokenize import profile_for_lang

            return profile_for_lang(lang or "", "code")
        return self.profile

    def search(
        self,
        query: str,
        k: int = 10,
        mode: str = "OR",
        algorithm: str = "wand",
        lang: str | None = None,
        filters: dict | None = None,
        use_cache: bool = True,
        min_should_match: int = 0,
    ) -> list[tuple[int, float]]:
        """Top-k (doc_id, float32 score); ties broken by ascending doc_id.
        `algorithm`: "wand" (vectorized block-max) or "exhaustive" —
        rank-identical by construction and by test. `lang` selects the
        query analyzer on per-language ("auto") indexes, like querying a
        specific language field in the reference. `filters` restricts
        results to docs whose doc-meta columns match (values OR within a
        field, AND across fields — the Solr fq composition the reference UI
        issues, solrTestLib_v2.js:38-102); BM25 statistics stay corpus-global
        exactly like Solr's fq (filters select, they don't re-weight).
        `use_cache=False` bypasses the queryResultCache (for benchmarking
        the compute path; results are identical by construction)."""
        ckey = None
        if use_cache:
            fk = (
                tuple(
                    (f, tuple(sorted([v] if isinstance(v, str) else v)))
                    for f, v in sorted(filters.items())
                )
                if filters
                else None
            )
            ckey = (query, k, mode, algorithm, lang, fk, min_should_match)
            hit = self._result_cache.get(ckey)
            if hit is not None:
                self._result_cache.move_to_end(ckey)
                return list(hit)
        out = self._search_impl(
            query, k, mode, algorithm, lang, filters, min_should_match
        )
        if ckey is not None:
            self._result_cache[ckey] = out
            if len(self._result_cache) > self._result_cache_cap:
                self._result_cache.popitem(last=False)
        return list(out)

    def search_elevated(
        self,
        query: str,
        elevate: list[int],
        exclude: list[int] | tuple = (),
        k: int = 10,
        mode: str = "OR",
        lang: str | None = None,
        filters: dict | None = None,
    ) -> list[tuple[int, float]]:
        """Solr QueryElevationComponent analog (the reference ships
        conf/elevate.xml: per query, pinned doc ids in editorial order plus
        exclude=\"true\" docs; solrconfig.xml:1351 references the QEC
        marker transformer). Pinned docs come first in `elevate` order —
        included even when they don't match the query (forceElevation;
        score 0.0) — `exclude` docs are removed, and the remainder fills to
        k by the normal (score desc, doc_id asc) order. A pinned doc
        outside the organic top-k gets its EXACT score via explain()'s
        float32 term-order accumulation (identical to search()'s by test)."""
        pins = [int(d) for d in elevate]
        drop = set(pins) | {int(d) for d in exclude}
        # k + |drop| organic hits guarantee k survivors after removal
        hits = self.search(
            query, k=k + len(drop), mode=mode, lang=lang, filters=filters
        )
        smap = dict(hits)
        out: list[tuple[int, float]] = []
        for pid in pins:
            s = smap.get(pid)
            if s is None:
                acc = np.float32(0.0)
                for e in self.explain(query, pid, lang=lang):
                    acc = np.float32(acc + np.float32(e["contribution"]))
                s = float(acc)
            out.append((pid, s))
        for d, s in hits:
            if len(out) >= k:
                break
            if d in drop:
                continue
            out.append((d, s))
        return out[:k]

    def query_scoring_terms(self, query: str, lang: str | None = None) -> list[str]:
        """The concrete analyzed terms whose df enters this query's BM25
        scores — the distributed-search phase-1 contract (each shard
        reports local df per scoring term; the coordinator sums them into
        the global df map). Mirrors _search_impl's routing exactly:
        constant-score kinds (*:*, prefix/wildcard/fuzzy) score no terms;
        prohibited clauses never score; boolean bodies contribute each
        clause's analyzed terms; synonym expansion matches search()'s."""
        from .tokenize import tokenize_query

        kind, body = self.parse(query)
        if kind in ("all", "prefix", "wildcard", "fuzzy"):
            return []
        if kind == "terms":
            body, _neg = self._split_prohibited(body)
            if not body.strip():
                return []
            clauses = self._parse_boolean_clauses(body)
            if clauses is not None:
                return [t for t, _, _ in self._boolean_tokens(clauses, lang)]
        if kind == "phrase":
            body, _slop = _split_phrase_slop(body)
        terms = tokenize_query(
            body, profile=self._query_profile(lang), protected=self.protected
        )
        if kind != "phrase" and self.synonyms:
            expanded: list[str] = []
            for t in terms:
                expanded.append(t)
                expanded.extend(self.synonyms.get(t, []))
            terms = expanded
        return terms

    def term_dfs(self, query: str, lang: str | None = None) -> dict[str, int]:
        """Shard-LOCAL df per scoring term of `query` (distributed-search
        phase 1). Reads through the postings cache — the postings phase 2
        scores with are already warm afterwards. df_local survives any
        earlier global-df override."""
        out: dict[str, int] = {}
        for t in self.query_scoring_terms(query, lang):
            if t in out:
                continue
            tp = self.postings(t)
            if tp is not None:
                out[t] = int(getattr(tp, "df_local", tp.df))
        return out

    def _search_impl(
        self,
        query: str,
        k: int,
        mode: str,
        algorithm: str,
        lang: str | None,
        filters: dict | None,
        min_should_match: int = 0,
    ) -> list[tuple[int, float]]:
        from .tokenize import tokenize_query

        kind, body = self.parse(query)
        neg: list[str] = []
        if kind == "terms":
            pos_body, neg = self._split_prohibited(body)
            if neg:
                body = pos_body
                if not body.strip():
                    kind = "all"  # pure-negative: Solr top-level rewrite
        fset = self._filter_docs(filters, lang)
        if neg:
            fset = self._apply_prohibited(neg, fset, lang)
        if kind == "all":
            # constant-score match-all (Solr q=*:* scores 1.0). Both arms
            # emit only the first k existing ids bucket-by-bucket — never an
            # n_docs-sized array (10^12 at scale); the filtered arm evaluates
            # the fq on just the bucket prefix holding the page.
            if fset is None:
                out: list[tuple[int, float]] = []
                for o, c in zip(self._doc_offsets, self._doc_counts):
                    take = min(int(c), max(k, 0) - len(out))
                    out.extend((int(o) + i, 1.0) for i in range(take))
                    if len(out) >= max(k, 0):
                        break
                return out
            return [(int(d), 1.0) for d in fset.first_k(max(k, 0))]
        if kind in ("prefix", "wildcard", "fuzzy"):
            # constant-score doc-set semantics (Lucene
            # MultiTermQuery.CONSTANT_SCORE_REWRITE, the Solr default):
            # score 1.0, ascending doc id
            docs = self._prefix_docs(body, fset, kind=kind)
            return [(int(d), 1.0) for d in docs[: max(k, 0)]]
        if kind == "terms":
            clauses = self._parse_boolean_clauses(body)
            if clauses is not None:
                return self._search_boolean(
                    clauses, k, fset, lang, min_should_match
                )
        slop = 0
        if kind == "phrase":
            body, slop = _split_phrase_slop(body)
        terms = tokenize_query(
            body, profile=self._query_profile(lang), protected=self.protected
        )
        if kind != "phrase" and self.synonyms:
            expanded: list[str] = []
            for t in terms:
                expanded.append(t)
                expanded.extend(self.synonyms.get(t, []))
            terms = expanded
        if len(terms) > MAX_BOOLEAN_CLAUSES:
            raise ValueError(
                f"query expands to {len(terms)} clauses > "
                f"maxBooleanClauses={MAX_BOOLEAN_CLAUSES} (reference cap, "
                "solrconfig.xml:500)"
            )
        if not terms or k <= 0:
            return []
        if kind == "phrase":
            return self._search_phrase(terms, k, fset, slop=slop)
        if algorithm == "exhaustive" or mode == "AND" or min_should_match > 1:
            # mm > 1 routes to the exhaustive scorer: the membership count
            # invalidates WAND's per-term upper-bound pruning (Lucene's
            # WANDScorer carries mm natively; rank-identity here comes from
            # the exhaustive path instead)
            return self._search_exhaustive(
                terms, k, mode, fset, min_should_match
            )
        return self._search_wand(terms, k, fset)

    def match_count(
        self, query: str, mode: str = "OR", lang: str | None = None,
        filters: dict | None = None, min_should_match: int = 0,
    ) -> int:
        """numFound analog (reference G3, corpus.cgi:409)."""
        if self.parse(query)[0] == "all":
            if not filters:
                # no doc-array materialization; tombstones subtract (each
                # deleted id names an existing doc by construction)
                dead = 0 if self.deleted_docs is None else self.deleted_docs.size
                return int(self.n_docs) - dead
            # filtered match-all: count bucket-by-bucket (O(bucket) peak)
            return self._filter_docs(filters, lang).count()
        return int(
            self._matching_docs(
                query, mode, lang=lang, filters=filters,
                min_should_match=min_should_match,
            ).size
        )

    # ------------------------------------------------------------------
    # facets on query results (reference G4 FacetComponent,
    # solrconfig.xml:1104; facet links ResultWidget.js:11-38 — clicking a
    # facet value adds an fq, i.e. `filters` here: drill-down)
    # ------------------------------------------------------------------
    def facets(
        self, query: str, fields: list[str], mode: str = "OR",
        lang: str | None = None, filters: dict | None = None,
    ) -> dict[str, list[tuple[str, int]]]:
        """Per-field (value, count) over ALL matching docs, count-desc then
        value-asc (Solr facet.sort=count discipline). Counts stream one doc
        bucket at a time (np.unique per bucket, merged into a dict bounded
        by facet-value cardinality) — a match-all facet never materializes a
        corpus-sized doc array."""
        counters: dict[str, dict[str, int]] = {f: {} for f in fields}
        for b, docs_b in self._match_buckets(query, mode, lang, filters):
            local = docs_b - self._doc_offsets[b]
            for f in fields:
                col = self._meta_shard(f, b)
                if isinstance(col, (pa.Array, pa.ChunkedArray)):
                    # multiValued facet (Solr: every list element counts
                    # once per doc — the reference facets on the
                    # multiValued product field, corpus.cgi:345-357)
                    arr = (
                        col.combine_chunks()
                        if isinstance(col, pa.ChunkedArray)
                        else col
                    )
                    sel = arr.take(pa.array(local))
                    vals, counts = np.unique(
                        sel.flatten().to_numpy(zero_copy_only=False).astype("U"),
                        return_counts=True,
                    )
                else:
                    vals, counts = np.unique(
                        col[local].astype("U"), return_counts=True
                    )
                d = counters[f]
                for v, c in zip(vals.tolist(), counts.tolist()):
                    d[v] = d.get(v, 0) + int(c)
        return {
            f: sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))
            for f, d in counters.items()
        }

    def facet_pivot(
        self, query: str, fields: tuple[str, str], mode: str = "OR",
        lang: str | None = None, filters: dict | None = None,
    ) -> list[tuple[str, str, int]]:
        """Two-level pivot facet (Solr facet.pivot=f1,f2): (v1, v2, count)
        over all matching docs, count-desc then value-asc. Streams one doc
        bucket at a time like `facets` — scalar meta fields only (Solr
        pivots don't take multiValued fields either without special
        handling)."""
        f1, f2 = fields
        counter: dict[tuple[str, str], int] = {}
        for b, docs_b in self._match_buckets(query, mode, lang, filters):
            local = docs_b - self._doc_offsets[b]
            c1 = self._meta_shard(f1, b)[local].astype("U")
            c2 = self._meta_shard(f2, b)[local].astype("U")
            u1, i1 = np.unique(c1, return_inverse=True)
            u2, i2 = np.unique(c2, return_inverse=True)
            key = i1.astype(np.int64) * np.int64(u2.size) + i2
            ku, kc = np.unique(key, return_counts=True)
            for kk, cc in zip(ku.tolist(), kc.tolist()):
                pair = (str(u1[kk // u2.size]), str(u2[kk % u2.size]))
                counter[pair] = counter.get(pair, 0) + int(cc)
        return [
            (v1, v2, c)
            for (v1, v2), c in sorted(
                counter.items(), key=lambda kv: (-kv[1], kv[0])
            )
        ]

    def _match_buckets(
        self, query: str, mode: str = "OR", lang: str | None = None,
        filters: dict | None = None,
    ):
        """Yield (doc_bucket, sorted matching doc ids in that bucket) — the
        bucket-streaming form of _matching_docs. Match-all (the reference
        UI's default browse view, q=*:* / q=<lang>:[* TO *],
        solrTestLib_v2.js:38-44) never materializes a corpus-sized array:
        each bucket's id range is generated (or its fq subset evaluated)
        on its turn, so peak allocation is O(bucket)."""
        kind, _ = self.parse(query)
        if kind == "all":
            fset = self._filter_docs(filters, lang)
            for b in range(len(self._doc_offsets)):
                c = int(self._doc_counts[b])
                if c == 0:
                    continue
                if fset is None:
                    yield b, np.arange(c, dtype=np.int64) + self._doc_offsets[b]
                else:
                    ids = fset.bucket_docs(b)
                    if ids.size:
                        yield b, ids
            return
        docs = self._matching_docs(query, mode, lang=lang, filters=filters)
        if docs.size == 0:
            return
        buckets = self._buckets_of(docs)
        bounds = np.flatnonzero(
            np.concatenate(([True], buckets[1:] != buckets[:-1]))
        )
        for i, s in enumerate(bounds):
            e = bounds[i + 1] if i + 1 < bounds.size else docs.size
            yield int(buckets[s]), docs[s:e]

    def _matching_docs(
        self, query: str, mode: str = "OR", lang: str | None = None,
        filters: dict | None = None, min_should_match: int = 0,
    ) -> np.ndarray:
        """The ONE match-set analysis path shared by match_count / facets /
        search_sorted: same profile routing, protected set, synonym
        expansion and filter composition as search() (a 'auto'-profile index
        or protected query terms must behave identically on every query
        surface)."""
        from .tokenize import tokenize_query

        kind, body = self.parse(query)
        neg: list[str] = []
        if kind == "terms":
            pos_body, neg = self._split_prohibited(body)
            if neg:
                body = pos_body
                if not body.strip():
                    kind = "all"  # pure-negative: Solr top-level rewrite
        fset = self._filter_docs(filters, lang)
        if neg:
            fset = self._apply_prohibited(neg, fset, lang)
        if kind == "all":
            # offline/aux form — serving surfaces (facets/search_sorted/
            # match_count) go through _match_buckets and never hit this
            return fset.all_docs() if fset is not None else self._all_docs()
        if kind in ("prefix", "wildcard", "fuzzy"):
            return self._prefix_docs(body, fset, kind=kind)
        if kind == "terms":
            clauses = self._parse_boolean_clauses(body)
            if clauses is not None:
                return self._boolean_docs(
                    clauses, fset, lang, min_should_match
                )
        slop = 0
        if kind == "phrase":
            body, slop = _split_phrase_slop(body)
        terms = tokenize_query(
            body, profile=self._query_profile(lang), protected=self.protected
        )
        if kind != "phrase" and self.synonyms:
            terms = [x for t in terms for x in (t, *self.synonyms.get(t, []))]
        if not terms:
            return np.empty(0, np.int64)
        if kind == "phrase":
            return self._phrase_candidates(terms, fset, slop=slop)
        sets = [
            tp.decode_all()[0] if tp else np.empty(0, np.int64)
            for tp in self._clause_postings(terms)
        ]
        if mode == "AND":
            cur = sets[0]
            for s in sets[1:]:
                cur = np.intersect1d(cur, s, assume_unique=True)
        elif min_should_match > 1:
            # Solr mm: docs matching >= mm of the SHOULD clauses (clause
            # count — membership counted once per clause over unique-doc
            # posting sets)
            cc = (
                np.concatenate([s for s in sets if s.size])
                if any(s.size for s in sets)
                else np.empty(0, np.int64)
            )
            u, c = np.unique(cc, return_counts=True)
            cur = u[c >= min_should_match]
        else:
            cur = np.unique(np.concatenate(sets)) if sets else np.empty(0, np.int64)
        if fset is not None and cur.size:
            cur = cur[fset.mask(cur)]
        return cur

    # ------------------------------------------------------------------
    # field sort + pagination (reference O2 field sort `sort=srclc asc`,
    # solrTestLib_v2.js:83-96; O3 start/rows windows, PagerWidget.js +
    # queryResultWindowSize, solrconfig.xml:637-643)
    # ------------------------------------------------------------------
    def sorted_candidates(
        self,
        query: str,
        sort_fields: list[str],
        asc: list[bool],
        need: int,
        mode: str = "OR",
        lang: str | None = None,
        filters: dict | None = None,
        cursor: tuple | None = None,
        id_offset: int = 0,
    ) -> tuple[np.ndarray, list[np.ndarray], int]:
        """The field-sort kernel: top-`need` matching docs in
        (sort keys, doc_id) order plus their key columns and the total match
        count. Streams one doc bucket at a time — each bucket contributes
        only its partial top-`need` (exact: a doc outside its bucket's
        top-`need` can't be in the global top-`need`), so a match-all browse
        never allocates an O(n_docs) array. `id_offset` shifts returned doc
        ids into a global id space (distributed search: the cursor doc-id
        tie-break and the keyset predicate must compare GLOBAL ids, so the
        shift happens before the cursor filter — cluster.ShardWorker)."""
        num_found = 0
        cand_docs: list[np.ndarray] = []
        cand_keys: list[list[np.ndarray]] = [[] for _ in sort_fields]
        for b, docs_b in self._match_buckets(query, mode, lang, filters):
            num_found += int(docs_b.size)
            local = docs_b - self._doc_offsets[b]
            keys_b = [
                self._meta_shard(f, b)[local].astype("U") for f in sort_fields
            ]
            docs_b = docs_b + id_offset
            if cursor is not None:
                # keyset predicate: (keys, doc_id) strictly after the cursor
                # in the (per-key-direction) total order — vectorized
                # lexicographic compare, applied BEFORE the partial top-k
                after = np.zeros(docs_b.size, dtype=bool)
                eq = np.ones(docs_b.size, dtype=bool)
                for kb, a, cv in zip(keys_b, asc, cursor[:-1]):
                    gt = (kb > str(cv)) if a else (kb < str(cv))
                    after |= eq & gt
                    eq &= kb == str(cv)
                after |= eq & (docs_b > int(cursor[-1]))
                docs_b = docs_b[after]
                keys_b = [kb[after] for kb in keys_b]
            if docs_b.size > need:
                order_b = _lex_order(docs_b, keys_b, asc)[:need]
                docs_b = docs_b[order_b]
                keys_b = [kb[order_b] for kb in keys_b]
            cand_docs.append(docs_b)
            for i, kb in enumerate(keys_b):
                cand_keys[i].append(kb)
        if num_found == 0:
            return np.empty(0, np.int64), [
                np.empty(0, "U1") for _ in sort_fields
            ], 0
        docs = np.concatenate(cand_docs)
        keys = [np.concatenate(ks) for ks in cand_keys]
        order = _lex_order(docs, keys, asc)[: max(need, 0)]
        return docs[order], [k[order] for k in keys], num_found

    def search_sorted(
        self,
        query: str,
        sort_by: str | list[str],
        ascending: bool | list[bool] = True,
        start: int = 0,
        rows: int = 10,
        mode: str = "OR",
        lang: str | None = None,
        filters: dict | None = None,
        cursor: tuple | None = None,
    ) -> pa.Table:
        """Matching docs ordered by one or more doc-meta columns (doc_id
        tie-break), windowed by (start, rows); returns stored fields of the
        page. Multi-key sort matches the reference UI's `product asc,
        srclc asc` / `release desc, srclc asc` orderings
        (solrTestLib_v2.js:83-96). numFound rides in the result's schema
        metadata (b"num_found") like Solr's response header.

        `cursor` enables Solr cursorMark deep paging: pass the previous
        page's b"next_cursor" (a tuple of that page's last sort-key values
        plus its doc_id — doc_id is the mandatory uniqueKey tie-break that
        makes the order total) to get the NEXT page; candidates are
        keyset-filtered per bucket BEFORE the partial top-k, so page P
        costs the same as page 0 instead of sorting start+rows candidates.
        Mutually exclusive with `start` (as in Solr). numFound stays the
        full match count.

        Scale discipline: the sort streams one doc bucket at a time — each
        bucket contributes only its partial top-(start+rows) candidates
        (per-bucket lexsort), and the global page comes from a bounded merge
        of O(buckets * page) candidates. The match-all browse view (the
        reference UI default, q=*:* + sort=srclc asc) therefore never
        allocates an O(n_docs) array or runs a corpus-wide lexsort."""
        sort_fields = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        asc = (
            [ascending] * len(sort_fields)
            if isinstance(ascending, bool)
            else list(ascending)
        )
        if len(asc) != len(sort_fields):
            raise ValueError("ascending must match sort_by length")
        if cursor is not None:
            if start:
                raise ValueError("cursor and start are mutually exclusive")
            if len(cursor) != len(sort_fields) + 1:
                raise ValueError("cursor must hold one value per sort key + doc_id")
        docs, keys, num_found = self.sorted_candidates(
            query, sort_fields, asc, start + rows, mode, lang, filters, cursor
        )
        if num_found == 0:
            return pa.table({}).replace_schema_metadata({b"num_found": b"0"})
        page = docs[start : start + rows]
        meta = {b"num_found": str(num_found).encode()}
        if page.size:
            import json

            last = start + page.size - 1
            nc = [str(ks[last]) for ks in keys] + [int(docs[last])]
            meta[b"next_cursor"] = json.dumps(nc).encode()
        fields = self.doc_fields([int(d) for d in page])
        if fields.num_rows == 0:
            return fields.replace_schema_metadata(meta)
        # doc_fields returns doc_id-ascending; restore the page's sort order
        pos = {int(d): i for i, d in enumerate(fields["doc_id"].to_pylist())}
        out = fields.take(pa.array([pos[int(d)] for d in page]))
        return out.replace_schema_metadata(meta)

    # -- shared scoring kernel -----------------------------------------
    def _score_union(
        self,
        plist: list[TermPostings | None],
        decoded: list[tuple[np.ndarray, np.ndarray]],
    ) -> tuple[np.ndarray, np.ndarray]:
        """Union of doc ids + float32 scores accumulated in clause order."""
        all_docs = [d for d, _ in decoded if d.size]
        if not all_docs:
            return np.empty(0, np.int64), np.empty(0, np.float32)
        union = np.unique(np.concatenate(all_docs))
        acc = np.zeros(union.size, dtype=np.float32)
        for tp, (d, t) in zip(plist, decoded):
            if tp is None or d.size == 0:
                continue
            s = self._term_contrib(tp, d, t)
            idx = np.searchsorted(union, d)
            acc[idx] += s
        return union, acc

    @staticmethod
    def _clip_to_filter(
        decoded: list[tuple[np.ndarray, np.ndarray]], fset: FilterSet | None
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Restrict decoded postings to the filter's doc set BEFORE scoring
        (docs outside the fq never enter the union/accumulator). The filter
        evaluates lazily per doc bucket — only buckets the postings touch."""
        if fset is None:
            return decoded
        out = []
        for d, t in decoded:
            if d.size == 0:
                out.append((d, t))
                continue
            m = fset.mask(d)
            out.append((d[m], t[m]))
        return out

    # -- exhaustive ----------------------------------------------------
    def _search_exhaustive(
        self, terms: list[str], k: int, mode: str = "OR",
        fset: FilterSet | None = None, min_should_match: int = 0,
    ) -> list[tuple[int, float]]:
        plist = self._clause_postings(terms)
        decoded = [
            tp.decode_all() if tp else (np.empty(0, np.int64), np.empty(0, np.int64))
            for tp in plist
        ]
        decoded = self._clip_to_filter(decoded, fset)
        union, acc = self._score_union(plist, decoded)
        if union.size == 0:
            return []
        if min_should_match > 1:
            # Solr mm / Lucene BooleanQuery.minimumNumberShouldMatch: keep
            # docs matching >= mm of the SHOULD clauses (clause count, so a
            # repeated term counts per clause, as in Lucene)
            cnt = np.zeros(union.size, dtype=np.int32)
            for d, _ in decoded:
                if d.size:
                    cnt[np.searchsorted(union, d)] += 1
            keep = cnt >= min_should_match
            union, acc = union[keep], acc[keep]
            if union.size == 0:
                return []
        if mode == "AND":
            mask = np.ones(union.size, dtype=bool)
            for tp, (d, _) in zip(plist, decoded):
                mask &= np.isin(union, d, assume_unique=True)
            union, acc = union[mask], acc[mask]
            if union.size == 0:
                return []
        order = np.lexsort((union, -acc))
        top = order[:k]
        return [(int(union[i]), float(acc[i])) for i in top]

    # -- vectorized block-max WAND -------------------------------------
    def _search_wand(
        self, terms: list[str], k: int, fset: FilterSet | None = None
    ) -> list[tuple[int, float]]:
        plist = [tp for tp in self._clause_postings(terms)]
        live = [(ci, tp) for ci, tp in enumerate(plist) if tp is not None]
        if not live:
            return []
        for _, tp in live:  # warm the memoized per-block upper bounds
            tp.block_ubs(self.n_docs, self.avgdl, self.params)
        R = self._range_width
        top_docs = np.empty(0, dtype=np.int64)
        top_scores = np.empty(0, dtype=np.float32)
        threshold = None  # valid once we hold k results
        max_doc = int(max(tp.blk_last[-1] for _, tp in live))
        lo = 0
        ranges_skipped = 0
        while lo <= max_doc:
            # skip doc-space gaps: lower-bound the next EXISTING doc across
            # terms via skip pointers (strided ids leave ~2^40-wide holes
            # between doc buckets; dense ids just never take the jump)
            j0s = []
            nxt = None
            for ci, tp in live:
                j0 = int(np.searchsorted(tp.blk_last, lo))
                j0s.append(j0)
                if j0 < tp.n_blocks:
                    b = max(lo, int(tp.blk_first[j0]))
                    nxt = b if nxt is None else min(nxt, b)
            if nxt is None:
                break  # every term exhausted
            if nxt >= lo + R:
                lo = nxt - (nxt % R)
                continue
            hi = lo + R
            frange: np.ndarray | None = None
            if fset is not None:
                # fq pre-check from already-evaluated filter buckets only
                # (free): skip the range outright when the filter provably
                # holds no docs here. Never forces bucket evaluation — that
                # happens bucket-exactly via mask() after decode.
                fr, complete = fset.cached_range_info(lo, hi)
                if complete:
                    if fr.size == 0:
                        lo = hi
                        continue
                    frange = fr
            # per-term overlapping block span via skip pointers
            spans = []
            ub_sum = np.float32(0.0)
            for (ci, tp), j0 in zip(live, j0s):
                ub = tp.block_ubs(self.n_docs, self.avgdl, self.params)
                if j0 >= tp.n_blocks:
                    spans.append(None)
                    continue
                j1 = int(np.searchsorted(tp.blk_last, hi - 1)) + 1
                j1 = min(j1, tp.n_blocks)
                spans.append((j0, j1))
                ub_sum = np.float32(ub_sum + ub[j0:j1].max())
            if threshold is not None and ub_sum <= threshold:
                ranges_skipped += 1
                lo = hi
                continue
            # decode + clip + score this range
            decoded = []
            for (ci, tp), span in zip(live, spans):
                if span is None:
                    decoded.append((np.empty(0, np.int64), np.empty(0, np.int64)))
                    continue
                d, t = tp.decode_blocks(span[0], span[1])
                a = int(np.searchsorted(d, lo))
                b = int(np.searchsorted(d, hi))
                decoded.append((d[a:b], t[a:b]))
            if frange is not None:
                # clip to the range's filter docs (already evaluated above)
                decoded = [
                    (d[m], t[m])
                    for d, t in decoded
                    for m in (self._mask_member(d, frange),)
                ]
            elif fset is not None:
                # lazy path: evaluates the filter on exactly the buckets
                # the decoded candidate docs live in
                decoded = self._clip_to_filter(decoded, fset)
            union, acc = self._score_union([tp for _, tp in live], decoded)
            if union.size:
                cand_docs = np.concatenate((top_docs, union))
                cand_scores = np.concatenate((top_scores, acc))
                order = np.lexsort((cand_docs, -cand_scores))[:k]
                top_docs = cand_docs[order]
                top_scores = cand_scores[order]
                if top_docs.size == k:
                    threshold = top_scores.min()
            lo = hi
        order = np.lexsort((top_docs, -top_scores))
        return [(int(top_docs[i]), float(top_scores[i])) for i in order]

    # -- phrase --------------------------------------------------------
    @staticmethod
    def _sorted_intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Intersection of two SORTED unique int arrays without re-sorting
        (binary-search membership; np.intersect1d would sort the concat)."""
        if a.size > b.size:
            a, b = b, a
        if a.size == 0:
            return a
        idx = np.searchsorted(b, a)
        sel = (idx < b.size) & (b[np.minimum(idx, b.size - 1)] == a)
        return a[sel]

    def _phrase_candidates(
        self, terms: list[str], fset: FilterSet | None = None, slop: int = 0
    ) -> np.ndarray:
        """Docs containing the terms at consecutive positions — fully
        vectorized: seed (candidate_rank, phrase_start) parallel arrays from
        the rarest term's position stream, then for each hotter term probe
        its positional bitmap at start+i, keeping only surviving starts.
        Sorted by construction throughout; no per-row Python.

        slop > 0 (Lucene sloppy PhraseQuery, `"a b"~N`) widens each probe
        to an OR over start+i+delta for delta in [-slop, slop] — for a
        2-term phrase that is exactly Lucene's movement cost
        |p_b - p_a - 1| <= slop (reordered "b a" matches at slop >= 2, the
        SloppyPhraseScorer behaviour). For phrases of 3+ terms the n-term
        sloppy alignment (a priority-queue algorithm) is not implemented;
        the slop DEGRADES to 0 — sound but conservative (every exact-phrase
        match is a sloppy match, so no wrong doc is ever returned; distant
        arrangements a real SloppyPhraseScorer would accept are missed). A
        serving layer must not raise on user-typed queries."""
        if slop and len(terms) > 2:
            slop = 0
        plist = self._clause_postings(terms)
        empty = np.empty(0, dtype=np.int64)
        if any(tp is None for tp in plist):
            return empty
        cand = None
        for tp in sorted(plist, key=lambda t: t.df):  # rarest first
            if cand is None:
                cand = tp.decode_all()[0]
                if fset is not None and cand.size:
                    # fq clip right after the rarest term: the filter
                    # evaluates only on buckets holding phrase candidates
                    cand = cand[fset.mask(cand)]
            else:
                # later (more frequent) terms: decode only blocks that can
                # hold a current candidate
                d = tp.postings_for_docs(cand)[0]
                cand = self._sorted_intersect(cand, d)
            if cand.size == 0:
                return empty
        ordered = sorted(enumerate(plist), key=lambda x: x[1].cf)
        # seed (rank, phrase_start) parallel int32 arrays from the RAREST
        # term's positions at candidate docs. Ranks are DENSE candidate
        # ordinals (bounded by the rarest df, < 2**31) — never raw doc ids,
        # which may be strided (bucket << 40) and would overflow any int64
        # pack; int32 parallel arrays also halve memory traffic on the
        # 1M+-entry stopword-phrase streams vs packed int64 keys.
        i0, tp0 = ordered[0]
        dp, pp = tp0.positions_for_docs(cand)
        if dp.size == 0:
            return empty
        # rank each position via its doc run (one boundary pass over the
        # stream + a doc-level binary search) — cheaper than expanding
        # per-candidate slice index arrays over a 1M+ position stream; for
        # a fully decoded term the run boundaries come from the cached
        # bitmap tuple instead of a fresh pass
        if tp0._pos_flat is not None and dp is tp0._pos_flat[0]:
            if tp0._pos_keys is None:
                tp0._pos_keys = _position_bitmap(dp, pp)
            docs_u0, counts0 = tp0._pos_keys[0], tp0._pos_keys[1]
        else:
            bound0 = np.concatenate(([True], dp[1:] != dp[:-1]))
            docs_u0 = dp[bound0]
            counts0 = np.diff(np.append(np.flatnonzero(bound0), dp.size))
        rk = np.searchsorted(cand, docs_u0)
        rk_safe = np.minimum(rk, cand.size - 1)
        ok_u = (rk < cand.size) & (cand[rk_safe] == docs_u0)
        r = np.repeat(rk_safe.astype(np.int32), counts0)
        if ok_u.all():  # candidates cover the whole stream
            s = (pp - i0).astype(np.int32)
        else:
            keep = np.repeat(ok_u, counts0)
            r = r[keep]
            s = (pp[keep] - i0).astype(np.int32)
        last = len(ordered) - 1
        for j, (i, tp) in enumerate(ordered[1:], start=1):
            if r.size == 0:
                return empty
            # hotter terms: probe a POSITIONAL BITMAP instead of
            # binary-searching a packed (doc, pos) key array — for a
            # stopword phrase the surviving set is ~cf of the rarest term
            # (1.2M for '"the import"' at 200k docs) and a per-key
            # searchsorted into the hot term's 2.5M-entry stream was ~80 ms
            # alone; bitmap probes are a handful of O(survivors) gathers.
            # The bitmap lives in the term's own compact bit space and is
            # query-independent, so it is cached once the term's position
            # stream is fully decoded.
            if tp._pos_flat is not None:  # fully decoded — skip doc probing
                dp, pp = tp._pos_flat
            else:
                cur = cand[r[np.concatenate(([True], r[1:] != r[:-1]))]]
                dp, pp = tp.positions_for_docs(cur)
            if dp.size == 0:
                return empty
            if tp._pos_flat is not None and dp is tp._pos_flat[0]:
                if tp._pos_keys is None:
                    tp._pos_keys = _position_bitmap(dp, pp)
                docs_u, _, starts, span, words = tp._pos_keys
            else:
                docs_u, _, starts, span, words = _position_bitmap(dp, pp)
            # translate candidates into this term's doc-ordinal space once
            # (bounded by the rarest df), then gather per survivor. The
            # clamp is a single scalar min at the bit-space end: a probe
            # past its doc's span may read a neighbouring doc's bit, but
            # the `ok` mask already kills that lane, so only the hard
            # array bound needs protecting.
            ord_c = np.searchsorted(docs_u, cand)
            safe = np.minimum(ord_c, docs_u.size - 1)
            in_t = (ord_c < docs_u.size) & (docs_u[safe] == cand)
            t_ord = safe[r]
            hit = np.zeros(r.size, dtype=bool)
            neg_possible = (i < i0) or slop > 0
            for delta in range(-slop, slop + 1):
                if slop and terms[i] == terms[i0] and i + delta == i0:
                    # repeated-term phrase: a probe at the seed's own
                    # position would match the seed occurrence itself;
                    # Lucene requires distinct positions per term instance
                    continue
                probe = s + np.int32(i + delta)  # term i's allowed position
                ok = in_t[r] & (probe < span[t_ord])
                if neg_possible:
                    ok &= probe >= 0
                bit = starts[t_ord] + probe
                np.minimum(
                    bit, bit.dtype.type(int(words.size) * 32 - 1), out=bit
                )
                if neg_possible:
                    np.maximum(bit, 0, out=bit)
                sh = (bit & 31).astype(np.uint32)
                hit |= ok & (((words[bit >> 5] >> sh) & np.uint32(1)) != 0)
            r = r[hit]
            if j != last:  # the last term's survivors only need ranks
                s = s[hit]
        if r.size == 0:
            return empty
        return cand[r[np.concatenate(([True], r[1:] != r[:-1]))]]

    def _search_phrase(
        self, terms: list[str], k: int, fset: FilterSet | None = None,
        slop: int = 0,
    ) -> list[tuple[int, float]]:
        cand = self._phrase_candidates(terms, fset, slop=slop)
        if cand.size == 0:
            return []
        plist = self._clause_postings(terms)
        acc = np.zeros(cand.size, dtype=np.float32)
        nb = self._norm_bytes_for(cand)  # every term scores the same docs
        for tp in plist:
            d, t = tp.postings_for_docs(cand)
            idx = np.searchsorted(d, cand)
            sel = (idx < d.size) & (d[np.minimum(idx, d.size - 1)] == cand)
            acc[sel] += bm25.term_scores(
                t[idx[sel]], nb[sel], tp.df, self.n_docs, self.avgdl,
                self.params, self._k_table,
            )
        order = np.lexsort((cand, -acc))
        top = order[:k]
        return [(int(cand[i]), float(acc[i])) for i in top]
