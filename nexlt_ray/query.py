"""Query engine: top-k BM25 over a built index — the Ray-Data-native
replacement for the reference's Solr `/select` serving path
(solrconfig.xml:840-901; UI query construction solrTestLib_v2.js:38-102;
CGI variant corpus.cgi:328-339).

Two rank-identical evaluators (tests assert bit-equality of results):
  * exhaustive  — decode every posting of every query term, vectorized
                  float32 scoring (the offline / oracle-check path);
  * block-max WAND — doc-at-a-time with term- and block-level upper bounds
                  (max_tf + min_norm metadata, see codec.encode_postings) and
                  a bounded min-heap (north-rule query path; the analog of
                  Lucene's BlockMaxWAND top-k collector).

Both follow the scoring spec in nexlt_ray.bm25 exactly (float32 per-term cast,
query-clause-order summation, ascending-docID tie-break), so top-k docIDs and
scores are rank-identical to the pure-Python oracle (tests/test_rank_identity).

Query grammar (reference UI semantics): whitespace-separated terms combine as
OR (Solr default q.op, schema.xml:1039-1041); a double-quoted string is a
positional phrase (UI phrase fq, solrTestLib_v2.js:43-53); `mode="AND"`
requires all terms. Analysis uses the index's tokenizer profile, query-time
chain (no catenated overlaps).

Serving-side state (postings cache) mirrors the reference's Solr caches
(filterCache/documentCache, solrconfig.xml:534-558) as a per-reader LRU.
"""

from __future__ import annotations

import heapq
import json
import os
from collections import OrderedDict
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import bm25
from .build import term_bucket_of
from .codec import decode_block, decode_block_positions, decode_postings
from .tokenize import tokenize_query


@dataclass
class TermPostings:
    """Fully merged postings of one term (all range buckets, doc-ascending)."""

    term: str
    df: int
    cf: int
    max_tf: int
    min_norm: int
    # per range-row raw pieces (kept encoded; decoded lazily per block)
    rows: list[dict]

    def decode_all(self) -> tuple[np.ndarray, np.ndarray]:
        docs_l, tfs_l = [], []
        for r in self.rows:
            d, t = decode_postings(r["blob"], r["block_off"], r["block_last"], r["df"])
            docs_l.append(d)
            tfs_l.append(t)
        if not docs_l:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(docs_l), np.concatenate(tfs_l)

    def decode_positions(self) -> dict[int, np.ndarray]:
        out: dict[int, np.ndarray] = {}
        for r in self.rows:
            nblocks = len(r["block_off"])
            for bi in range(nblocks):
                docs, _ = decode_block(
                    np.frombuffer(r["blob"], dtype=np.uint8),
                    r["block_off"],
                    r["block_last"],
                    bi,
                    r["df"],
                )
                plists = decode_block_positions(
                    r["pos_blob"], r["block_pos_off"], bi, r["df"]
                )
                for d, p in zip(docs, plists):
                    out[int(d)] = p
        return out


class IndexReader:
    """Loads a built index; serves top-k BM25 queries.

    Stateful by design — in a serving deployment this object lives inside a
    Ray actor pool (one reader per actor, `__init__` loads the manifest once;
    see pipelines.search_batch)."""

    def __init__(self, index_dir: str, cache_terms: int = 4096):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.cfg = self.manifest["config"]
        self.profile = self.cfg["profile"]
        self.n_docs = self.manifest["n_docs"]
        self.avgdl = float(self.manifest["avgdl"])
        self.params = bm25.BM25Params()
        self._k_table = bm25.norm_k_table(self.avgdl, self.params)
        self._term_cache: OrderedDict[str, TermPostings | None] = OrderedDict()
        self._cache_cap = cache_terms
        self._seg_files: dict[int, str] = {}
        seg_dir = os.path.join(index_dir, "segments")
        if os.path.isdir(seg_dir):
            for name in os.listdir(seg_dir):
                if name.startswith("bucket=") and name.endswith(".parquet"):
                    b = int(name[len("bucket=") : -len(".parquet")])
                    self._seg_files[b] = os.path.join(seg_dir, name)
        self._doc_offsets = np.asarray(self.manifest["doc_offsets"], dtype=np.int64)
        self._doc_counts = np.asarray(self.manifest["doc_counts"], dtype=np.int64)

    # ------------------------------------------------------------------
    # postings access
    # ------------------------------------------------------------------
    def postings(self, term: str) -> TermPostings | None:
        if term in self._term_cache:
            self._term_cache.move_to_end(term)
            return self._term_cache[term]
        bucket = term_bucket_of(term, self.cfg["num_term_buckets"])
        path = self._seg_files.get(bucket)
        tp: TermPostings | None = None
        if path is not None:
            tbl = pq.read_table(path, filters=[("term", "==", term)])
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
        return tp

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

    # ------------------------------------------------------------------
    # scoring helpers
    # ------------------------------------------------------------------
    def _clause_postings(self, terms: list[str]) -> list[TermPostings | None]:
        return [self.postings(t) for t in terms]

    def _norm_bytes_for(self, docs: np.ndarray) -> np.ndarray:
        # norm bytes are stored per doc in the docstore; for scoring we decode
        # them from posting metadata instead — but tf-only postings don't
        # carry them, so exhaustive scoring reads the docstore norm column
        # lazily (cached whole — it is 1 byte/doc).
        if not hasattr(self, "_norms"):
            parts = []
            for b in range(len(self._doc_offsets)):
                path = os.path.join(
                    self.index_dir, "docstore", f"bucket={b:05d}.parquet"
                )
                if os.path.exists(path):
                    t = pq.read_table(path, columns=["norm_byte"])
                    parts.append(np.asarray(t["norm_byte"]))
            self._norms = (
                np.concatenate(parts) if parts else np.empty(0, np.uint8)
            )
        return self._norms[docs]

    def _term_contrib(
        self, tp: TermPostings, docs: np.ndarray, tfs: np.ndarray
    ) -> np.ndarray:
        nb = self._norm_bytes_for(docs)
        return bm25.term_scores(
            tfs, nb, tp.df, self.n_docs, self.avgdl, self.params, self._k_table
        )

    # ------------------------------------------------------------------
    # search
    # ------------------------------------------------------------------
    @staticmethod
    def parse(query: str) -> tuple[str, str]:
        q = query.strip()
        if len(q) >= 2 and q.startswith('"') and q.endswith('"'):
            return "phrase", q[1:-1]
        return "terms", q

    def search(
        self,
        query: str,
        k: int = 10,
        mode: str = "OR",
        algorithm: str = "wand",
    ) -> list[tuple[int, float]]:
        """Top-k (doc_id, float32 score); ties broken by ascending doc_id.
        `algorithm`: "wand" (block-max) or "exhaustive" — rank-identical."""
        kind, body = self.parse(query)
        terms = tokenize_query(body, profile=self.profile)
        if not terms or k <= 0:
            return []
        if kind == "phrase":
            return self._search_phrase(terms, k)
        if algorithm == "exhaustive" or mode == "AND":
            return self._search_exhaustive(terms, k, mode)
        return self._search_wand(terms, k)

    def match_count(self, query: str, mode: str = "OR") -> int:
        """numFound analog (reference G3, corpus.cgi:409)."""
        kind, body = self.parse(query)
        terms = tokenize_query(body, profile=self.profile)
        if not terms:
            return 0
        if kind == "phrase":
            return len(self._phrase_candidates(terms))
        sets = []
        for tp in self._clause_postings(terms):
            docs = tp.decode_all()[0] if tp else np.empty(0, np.int64)
            sets.append(docs)
        if mode == "AND":
            cur = sets[0]
            for s in sets[1:]:
                cur = np.intersect1d(cur, s, assume_unique=True)
            return int(cur.size)
        return int(np.unique(np.concatenate(sets)).size) if sets else 0

    # -- exhaustive ----------------------------------------------------
    def _search_exhaustive(
        self, terms: list[str], k: int, mode: str = "OR"
    ) -> list[tuple[int, float]]:
        plist = self._clause_postings(terms)
        decoded = []
        for tp in plist:
            if tp is None:
                decoded.append((np.empty(0, np.int64), np.empty(0, np.int64)))
            else:
                decoded.append(tp.decode_all())
        all_docs = [d for d, _ in decoded if d.size]
        if not all_docs:
            return []
        union = np.unique(np.concatenate(all_docs))
        if mode == "AND":
            mask = np.ones(union.size, dtype=bool)
            for d, _ in decoded:
                mask &= np.isin(union, d, assume_unique=True)
            union = union[mask]
            if union.size == 0:
                return []
        acc = np.zeros(union.size, dtype=np.float32)
        for tp, (d, t) in zip(plist, decoded):
            if tp is None or d.size == 0:
                continue
            s = self._term_contrib(tp, d, t)
            idx = np.searchsorted(union, d)
            sel = (idx < union.size) & (union[np.minimum(idx, union.size - 1)] == d)
            acc[idx[sel]] += s[sel]
        order = np.lexsort((union, -acc))
        top = order[:k]
        return [(int(union[i]), float(acc[i])) for i in top]

    # -- phrase --------------------------------------------------------
    def _phrase_candidates(self, terms: list[str]) -> list[int]:
        plist = self._clause_postings(terms)
        if any(tp is None for tp in plist):
            return []
        docsets = [tp.decode_all()[0] for tp in plist]
        cur = docsets[0]
        for s in docsets[1:]:
            cur = np.intersect1d(cur, s, assume_unique=True)
        if cur.size == 0:
            return []
        posmaps = [tp.decode_positions() for tp in plist]
        out = []
        for d in cur.tolist():
            first = posmaps[0][d]
            ok = False
            for p in first.tolist():
                if all(
                    np.any(posmaps[i][d] == p + i) for i in range(1, len(terms))
                ):
                    ok = True
                    break
            if ok:
                out.append(d)
        return out

    def _search_phrase(self, terms: list[str], k: int) -> list[tuple[int, float]]:
        cand = np.asarray(self._phrase_candidates(terms), dtype=np.int64)
        if cand.size == 0:
            return []
        plist = self._clause_postings(terms)
        acc = np.zeros(cand.size, dtype=np.float32)
        for tp in plist:
            d, t = tp.decode_all()
            idx = np.searchsorted(d, cand)
            sel = (idx < d.size) & (d[np.minimum(idx, d.size - 1)] == cand)
            s = self._term_contrib(tp, d[idx[sel]], t[idx[sel]])
            acc[sel] += s
        order = np.lexsort((cand, -acc))
        top = order[:k]
        return [(int(cand[i]), float(acc[i])) for i in top]

    # -- block-max WAND ------------------------------------------------
    def _search_wand(self, terms: list[str], k: int) -> list[tuple[int, float]]:
        iters = []
        for ci, tp in enumerate(self._clause_postings(terms)):
            if tp is not None:
                iters.append(_PostingIterator(tp, ci, self))
        if not iters:
            return []
        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
        threshold = -np.inf
        while True:
            live = [it for it in iters if not it.exhausted]
            if not live:
                break
            live.sort(key=lambda it: it.doc)
            # find pivot: smallest prefix of sorted iterators whose UB sum
            # exceeds the threshold
            ub = np.float32(0.0)
            pivot = -1
            for i, it in enumerate(live):
                ub = np.float32(ub + it.term_ub)
                if ub > threshold:
                    pivot = i
                    break
            if pivot == -1:
                break  # no doc can beat the threshold any more
            pivot_doc = live[pivot].doc
            if live[0].doc == pivot_doc:
                # all iterators at or before pivot_doc are aligned -> check
                # block-level upper bound, then fully score
                doc = pivot_doc
                block_ub = np.float32(0.0)
                for it in live:
                    if it.doc == doc:
                        block_ub = np.float32(block_ub + it.block_ub())
                if block_ub > threshold:
                    contribs = []
                    for it in live:
                        if it.doc == doc:
                            contribs.append((it.clause_idx, it.score()))
                    contribs.sort()
                    score = np.float32(0.0)
                    for _, s in contribs:
                        score = np.float32(score + s)
                    if len(heap) < k:
                        heapq.heappush(heap, (float(score), -doc))
                        if len(heap) == k:
                            threshold = heap[0][0]
                    elif score > heap[0][0]:
                        heapq.heapreplace(heap, (float(score), -doc))
                        threshold = heap[0][0]
                for it in live:
                    if it.doc == doc:
                        it.advance(doc + 1)
            else:
                # advance the iterators before the pivot to pivot_doc
                for it in live[:pivot]:
                    it.advance(pivot_doc)
        out = sorted(heap, key=lambda x: (-x[0], -x[1]))
        return [(-d, s) for s, d in out]


class _PostingIterator:
    """Doc-at-a-time cursor over one term's encoded postings with block skip."""

    def __init__(self, tp: TermPostings, clause_idx: int, reader: IndexReader):
        self.tp = tp
        self.clause_idx = clause_idx
        self.reader = reader
        self.term_ub = bm25.term_upper_bound(
            tp.max_tf, tp.min_norm, tp.df, reader.n_docs, reader.avgdl, reader.params
        )
        # flatten (row, block) pairs in doc order
        self.blocks: list[tuple[dict, int]] = []
        for r in tp.rows:
            for bi in range(len(r["block_off"])):
                self.blocks.append((r, bi))
        self.block_lasts = np.asarray(
            [int(r["block_last"][bi]) for r, bi in self.blocks], dtype=np.int64
        )
        self.block_i = -1
        self.cur_docs = np.empty(0, np.int64)
        self.cur_tfs = np.empty(0, np.int64)
        self.pos = 0
        self.exhausted = False
        self._next_block()

    @property
    def doc(self) -> int:
        return int(self.cur_docs[self.pos])

    def _next_block(self) -> None:
        self.block_i += 1
        if self.block_i >= len(self.blocks):
            self.exhausted = True
            return
        r, bi = self.blocks[self.block_i]
        self.cur_docs, self.cur_tfs = decode_block(
            np.frombuffer(r["blob"], dtype=np.uint8),
            r["block_off"],
            r["block_last"],
            bi,
            r["df"],
            self.reader.cfg["block_size"],
        )
        self.pos = 0

    def block_ub(self) -> float:
        r, bi = self.blocks[self.block_i]
        return bm25.term_upper_bound(
            int(r["block_max_tf"][bi]),
            int(r["block_min_norm"][bi]),
            self.tp.df,
            self.reader.n_docs,
            self.reader.avgdl,
            self.reader.params,
        )

    def score(self) -> np.float32:
        tf = np.asarray([self.cur_tfs[self.pos]])
        doc = np.asarray([self.cur_docs[self.pos]])
        return self.reader._term_contrib(self.tp, doc, tf)[0]

    def advance(self, target: int) -> None:
        """Move to the first doc >= target. Skipped blocks are never decoded:
        the target block is located with one searchsorted over block_last (the
        skip-pointer array)."""
        if self.exhausted:
            return
        j = int(np.searchsorted(self.block_lasts, target))
        if j >= len(self.blocks):
            self.exhausted = True
            return
        if j != self.block_i:
            self.block_i = j - 1
            self._next_block()
        i = int(np.searchsorted(self.cur_docs[self.pos :], target) + self.pos)
        if i < self.cur_docs.size:
            self.pos = i
            return
        self._next_block()  # target fell past this block's docs (can't happen
        # when block_last >= target, but keep the guard for safety)
