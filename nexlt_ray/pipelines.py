"""sf_dir-parameterized pipelines: one per operator family in SURVEY.md §2,
runnable by the driver (``__ray_entry__.queries()``) and benchmarked by
bench.py. DuckDB-oracle-checkable pipelines keep outputs integer-exact (or
integer-scaled floats) so order-insensitive value hashes can't drift on
float associativity.

Conventions:
  * Ray is ALREADY initialised by the caller — nothing here calls ray.init().
  * Inputs stream from parquet with column pruning; aggregations are
    partial-per-batch before any groupby (combiner pattern).
  * Fixed query sets live here so oracle SQL can be generated from the same
    definitions (single source of truth).
"""

from __future__ import annotations

import os
from hashlib import sha256 as hashlib_sha256

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import dedup as dedup_ops
from . import normalize as norm_ops
from . import sampling as sampling_ops
from . import similarity as sim_ops
from . import textstats as ts_ops
from .corpus import corpus_path, n_docs_for_sf, reference_queries
from .tokenize import _offsets_of, tokenize_batch, tokenize_query

K1, B = 1.2, 0.75

# fixed query sets over the generic `documents` table (vocab-derived)
DOC_QUERIES = [
    "table scan",
    "query window agg",
    "hash join",
    "the value",
    "spark",
    "customer order line",
]
DOC_PHRASES = ["value table", "the part", "hash join", "window agg"]

LANG_NORMALIZE = {"en": "eng", "de": "deu", "fr": "fra", "es": "spa", "zh": "zho"}


def _documents(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def doc_query_terms() -> list[tuple[int, str]]:
    """(qid, term) clauses of DOC_QUERIES under the simple profile — the
    single source of truth shared with the generated oracle SQL."""
    out = []
    for qid, q in enumerate(DOC_QUERIES):
        for t in tokenize_query(q, profile="simple"):
            out.append((qid, t))
    return out


def _qterm_tf(tb, terms: list[str], n: int) -> np.ndarray:
    """(len(terms), n_docs) int64 term-frequency matrix for a SMALL query
    vocabulary: ONE pc.index_in pass over the batch's token stream (an
    Arrow hash probe) instead of a per-term full scan — O(tokens + hits)
    rather than O(len(terms) * tokens), and no per-occurrence unicode
    copy. The pattern stays flat as query batches grow."""
    out = np.zeros((len(terms), n), dtype=np.int64)
    if n == 0 or tb.terms.size == 0 or not terms:
        return out
    idx = pc.index_in(
        pa.array(tb.terms, pa.string()), value_set=pa.array(terms, pa.string())
    )
    codes = idx.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
    hit = codes >= 0
    if not hit.any():
        return out
    key = codes[hit] * np.int64(n) + tb.doc_idx[hit].astype(np.int64)
    return np.bincount(key, minlength=len(terms) * n).reshape(len(terms), n)


# ---------------------------------------------------------------------------
# inverted-index statistics over `documents` (G1/G2 analog, SQL-checkable)
# ---------------------------------------------------------------------------
def term_df_top100(sf_dir: str) -> pa.Table:
    """Top 100 terms by document frequency (df desc, term asc): the df/cf
    aggregation at the heart of the index build (SURVEY.md G1), with
    per-batch partial aggregation before the term groupby."""
    ds = _documents(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-side tokenize + dictionary_encode: term codes come straight
        # from the Arrow dictionary (no per-occurrence numpy U-dtype copy,
        # no string sort — the r2->r3 term_df regression was np.unique over
        # a fixed-width unicode materialization of every occurrence)
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        parts = pc.split_pattern_regex(pc.utf8_lower(text), pattern="[^a-z0-9]+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = parts.values
        empty_out = pa.table(
            {"term": pa.array([], pa.string()),
             "df_p": pa.array([], pa.int64()),
             "cf_p": pa.array([], pa.int64())}
        )
        if len(flat) == 0:
            return empty_out
        offs = _offsets_of(parts)
        doc_of = np.repeat(
            np.arange(len(batch), dtype=np.int64), np.diff(offs)
        )
        nonempty = pc.greater(pc.utf8_length(flat), 0)
        ne = nonempty.to_numpy(zero_copy_only=False).astype(bool)
        denc = pc.dictionary_encode(flat.filter(nonempty))
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        if len(denc) == 0:
            return empty_out
        codes = np.asarray(denc.indices, dtype=np.int64)
        doc_of = doc_of[ne]
        n_uniq = len(denc.dictionary)
        cf = np.bincount(codes, minlength=n_uniq)
        # distinct (doc, code) for df via one integer sort
        key = codes * len(batch) + doc_of
        df = np.bincount(np.unique(key) // len(batch), minlength=n_uniq)
        return pa.table(
            {
                "term": denc.dictionary,
                "df_p": pa.array(df.astype(np.int64)),
                "cf_p": pa.array(cf.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df_p", alias_name="df"), Sum("cf_p", alias_name="cf"))
    )

    # partial top-k discipline: each post-aggregate block holds each term at
    # most once, so per-block top-100 + a small driver merge is exact — the
    # driver never sees the full vocabulary (at real-corpus scale that is
    # 10^8-10^9 terms; a to_pandas() sort here would OOM the driver).
    def block_top100(batch: pa.Table) -> pa.Table:
        df = np.asarray(batch["df"])
        term = batch["term"].to_numpy(zero_copy_only=False)
        order = np.lexsort((term, -df))[:100]
        return batch.take(pa.array(order))

    parts = agg.map_batches(block_top100, batch_format="pyarrow").take_all()
    df = np.array([r["df"] for r in parts], dtype=np.int64)
    term = np.array([r["term"] for r in parts], dtype=object)
    cf = np.array([r["cf"] for r in parts], dtype=np.int64)
    order = np.lexsort((term, -df))[:100]
    return pa.table(
        {
            "term": pa.array(term[order].astype("U"), pa.string()),
            "df": pa.array(df[order], pa.int64()),
            "cf": pa.array(cf[order], pa.int64()),
        }
    )


def bigram_top50(sf_dir: str) -> pa.Table:
    """Top 50 corpus bigrams by occurrence count (n desc, bigram asc) —
    adjacent-token shingle statistics under the simple profile, the n-gram
    profiling step of corpus analysis. Same discipline as term_df_top100:
    per-batch partial counts (Arrow split + dictionary_encode + bincount,
    no per-row Python) -> bigram groupby Sum -> per-block exact top-k
    merge, so the driver never sees the full bigram vocabulary."""
    ds = _documents(sf_dir, ["doc_id", "text"])
    empty = pa.table(
        {"bigram": pa.array([], pa.string()), "n_p": pa.array([], pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        parts = pc.split_pattern_regex(pc.utf8_lower(text), pattern="[^a-z0-9]+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = parts.values
        if len(flat) == 0:
            return empty
        offs = _offsets_of(parts)
        doc_of = np.repeat(np.arange(len(batch), dtype=np.int64), np.diff(offs))
        ne = (
            pc.greater(pc.utf8_length(flat), 0)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        toks = flat.filter(pa.array(ne))
        d = doc_of[ne]
        if len(toks) < 2:
            return empty
        adj = np.flatnonzero(d[1:] == d[:-1])
        if adj.size == 0:
            return empty
        big = pc.binary_join_element_wise(
            toks.take(pa.array(adj)), toks.take(pa.array(adj + 1)), " "
        )
        denc = pc.dictionary_encode(big)
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        cnt = np.bincount(
            np.asarray(denc.indices, dtype=np.int64),
            minlength=len(denc.dictionary),
        )
        return pa.table(
            {"bigram": denc.dictionary, "n_p": pa.array(cnt.astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n_p", alias_name="n"))
    )

    def block_top50(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n"])
        t = batch["bigram"].to_numpy(zero_copy_only=False)
        return batch.take(pa.array(np.lexsort((t, -n))[:50]))

    rows = agg.map_batches(block_top50, batch_format="pyarrow").take_all()
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    t = np.array([r["bigram"] for r in rows], dtype=object)
    order = np.lexsort((t, -n))[:50]
    return pa.table(
        {
            "bigram": pa.array(t[order].astype("U"), pa.string()),
            "n": pa.array(n[order], pa.int64()),
        }
    )


#: co-occurrence window (forward tokens) for cooccur_top50
COOCCUR_WINDOW = 3


_COOCCUR_EMPTY = pa.table(
    {
        "t1": pa.array([], pa.string()),
        "t2": pa.array([], pa.string()),
        "n_p": pa.array([], pa.int64()),
    }
)


def _cooccur_pair_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial counts of unordered term pairs co-occurring
    within a forward window of COOCCUR_WINDOW tokens: shifted-index pair
    expansion + dictionary-encode bincount. Shared by cooccur_top50 and
    textrank_keywords (same edge definition, same oracle SQL shape)."""
    empty = _COOCCUR_EMPTY
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    parts = pc.split_pattern_regex(pc.utf8_lower(text), pattern="[^a-z0-9]+")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = parts.values
    if len(flat) == 0:
        return empty
    offs = _offsets_of(parts)
    doc_of = np.repeat(np.arange(len(batch), dtype=np.int64), np.diff(offs))
    ne = (
        pc.greater(pc.utf8_length(flat), 0)
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )
    toks = flat.filter(pa.array(ne))
    d = doc_of[ne]
    lidx, ridx = [], []
    for k in range(1, COOCCUR_WINDOW + 1):
        if len(toks) <= k:
            break
        same = np.flatnonzero(d[k:] == d[:-k])
        lidx.append(same)
        ridx.append(same + k)
    if not lidx:
        return empty
    left = toks.take(pa.array(np.concatenate(lidx)))
    right = toks.take(pa.array(np.concatenate(ridx)))
    # fold to unordered pairs: (min, max) by string order
    swap = pc.greater(left, right)
    t1 = pc.if_else(swap, right, left)
    t2 = pc.if_else(swap, left, right)
    denc = pc.dictionary_encode(pc.binary_join_element_wise(t1, t2, "\x00"))
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    cnt = np.bincount(
        np.asarray(denc.indices, dtype=np.int64),
        minlength=len(denc.dictionary),
    )
    both = pc.split_pattern(denc.dictionary, "\x00")
    return pa.table(
        {
            "t1": pc.list_element(both, 0),
            "t2": pc.list_element(both, 1),
            "n_p": pa.array(cnt.astype(np.int64)),
        }
    )


def cooccur_top50(sf_dir: str) -> pa.Table:
    """Top 50 unordered term pairs co-occurring within a forward window of
    COOCCUR_WINDOW tokens (n desc, t1 asc, t2 asc) — collocation /
    word-association statistics, the PMI-numerator pass of corpus
    profiling. Counts stay integers (SQL-exact); the log-ratio PMI is a
    trivial client-side map. Same partial-count discipline as
    bigram_top50: per-batch shifted-pair bincount -> pair groupby Sum ->
    per-block exact top-k merge."""
    ds = _documents(sf_dir, ["doc_id", "text"])

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(_cooccur_pair_partial, batch_format="pyarrow")
        .groupby(["t1", "t2"])
        .aggregate(Sum("n_p", alias_name="n"))
    )

    def block_top50(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n"])
        t1 = batch["t1"].to_numpy(zero_copy_only=False)
        t2 = batch["t2"].to_numpy(zero_copy_only=False)
        return batch.take(pa.array(np.lexsort((t2, t1, -n))[:50]))

    rows = agg.map_batches(block_top50, batch_format="pyarrow").take_all()
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    t1 = np.array([r["t1"] for r in rows], dtype=object)
    t2 = np.array([r["t2"] for r in rows], dtype=object)
    order = np.lexsort((t2, t1, -n))[:50]
    return pa.table(
        {
            "t1": pa.array(t1[order].astype("U"), pa.string()),
            "t2": pa.array(t2[order].astype("U"), pa.string()),
            "n": pa.array(n[order], pa.int64()),
        }
    )


def spellcheck_suggest(sf_dir: str) -> pa.Table:
    """Did-you-mean per misspelled base term: the df-max dictionary term
    within ONE edit (base itself excluded), Solr SpellCheckComponent /
    Lucene DirectSpellChecker semantics — the reference UI renders exactly
    this (solr/NeXLT/solr/collection1/conf/velocity/did_you_mean.vm reads
    spellcheck.suggestions.collation). One streaming pass: per-batch
    `_lev1_hits` candidate mask + distinct-doc partial df -> (base, term)
    groupby Sum -> tiny argmax on the driver (candidates only, never the
    vocabulary). Bases with no distance-1 candidate emit no row."""
    from ray.data.aggregate import Sum

    from .query import _lev1_hits

    ds = _documents(sf_dir, ["doc_id", "text"])
    empty = pa.table(
        {
            "base": pa.array([], pa.string()),
            "term": pa.array([], pa.string()),
            "df_p": pa.array([], pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        if tb.terms.size == 0:
            return empty
        n = len(batch)
        uniq, inv = np.unique(tb.terms.astype("U"), return_inverse=True)
        lens = np.char.str_len(uniq)
        out_b, out_t, out_d = [], [], []
        for base in DOC_FUZZY:
            hit = _lev1_hits(base, uniq, lens)
            hit &= uniq != base
            if not hit.any():
                continue
            tok_m = hit[inv]
            # distinct (term, doc) pairs -> per-term df within the batch
            key = inv[tok_m] * np.int64(n) + tb.doc_idx[tok_m].astype(np.int64)
            ukey = np.unique(key)
            codes = ukey // np.int64(n)
            cand, df_p = np.unique(codes, return_counts=True)
            out_b.append(np.full(cand.size, base, dtype=object))
            out_t.append(uniq[cand].astype(object))
            out_d.append(df_p.astype(np.int64))
        if not out_b:
            return empty
        return pa.table(
            {
                "base": pa.array(np.concatenate(out_b).astype("U"), pa.string()),
                "term": pa.array(np.concatenate(out_t).astype("U"), pa.string()),
                "df_p": pa.array(np.concatenate(out_d), pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["base", "term"])
        .aggregate(Sum("df_p", alias_name="df"))
        .take_all()
    )
    best: dict[str, tuple[int, str]] = {}
    for r in rows:
        cur = best.get(r["base"])
        cand = (-int(r["df"]), str(r["term"]))
        if cur is None or cand < cur:
            best[r["base"]] = cand
    bases = sorted(best)
    return pa.table(
        {
            "base": pa.array(bases, pa.string()),
            "suggestion": pa.array([best[b][1] for b in bases], pa.string()),
            "df": pa.array([-best[b][0] for b in bases], pa.int64()),
        }
    )


def prefix_dup_groups(sf_dir: str):
    """Truncation-duplicate clusters: docs sharing their first 10 tokens
    (the leading-shingle key), emitted as (doc_id, keep_id = min doc_id of
    the group) for every member of a group of size > 1 — catches
    prefix-identical near-dups (truncated rewrites, pagination copies)
    that exact-hash dedup misses. One shuffle on the prefix key; group
    kernel is a vectorized min + count."""
    ds = _documents(sf_dir, ["doc_id", "text"])
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "k10": pa.array([], pa.string())}
    )

    def keys(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        n = len(batch)
        if tb.terms.size == 0:
            return empty
        cnt = np.bincount(tb.doc_idx, minlength=n)
        sel = np.flatnonzero(cnt >= 10)
        if sel.size == 0:
            return empty
        starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        mat = [pa.array(tb.terms[starts[sel] + j].astype("U")) for j in range(10)]
        k10 = pc.binary_join_element_wise(*mat, " ")
        ids = np.asarray(batch["doc_id"], dtype=np.int64)[sel]
        return pa.table({"doc_id": pa.array(ids), "k10": k10})

    def emit(group: pa.Table) -> pa.Table:
        ids = np.asarray(group["doc_id"], dtype=np.int64)
        if ids.size < 2:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "keep_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {"doc_id": pa.array(ids),
             "keep_id": pa.array(np.full(ids.size, ids.min()))}
        )

    return (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("k10")
        .map_groups(emit, batch_format="pyarrow")
    )


def length_band_docs(sf_dir: str) -> pa.Table:
    """Docs inside the corpus's [p5, p95] token-count band — the
    length-outlier trim of pretraining curation, with EXACT distributed
    quantiles: token counts are small integers, so pass 1 is a per-batch
    partial bincount -> value groupby Sum (domain = #distinct lengths,
    tiny) and the thresholds come from the cumulative counts at integer
    ranks lo_rank = floor(5*(N-1)/100), hi_rank = ceil(95*(N-1)/100) of
    the sorted multiset — rank arithmetic an auditor can re-derive in SQL
    (no implementation-defined quantile interpolation). Pass 2 is a pure
    map filter."""
    from ray.data.aggregate import Sum

    ds = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        ts_ops.token_counts_batch, batch_format="pyarrow"
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch["n_tokens"], dtype=np.int64)
        if v.size == 0:
            return pa.table(
                {"v": pa.array([], pa.int64()), "c_p": pa.array([], pa.int64())}
            )
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uniq), "c_p": pa.array(cnt.astype(np.int64))})

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c_p", alias_name="c"))
        .take_all()
    )
    vs = np.array([r["v"] for r in hist], dtype=np.int64)
    cs = np.array([r["c"] for r in hist], dtype=np.int64)
    order = np.argsort(vs)
    vs, cs = vs[order], cs[order]
    cum = np.cumsum(cs)
    n_total = int(cum[-1])
    lo_rank = (5 * (n_total - 1)) // 100
    hi_rank = -(-(95 * (n_total - 1)) // 100)
    lo = int(vs[np.searchsorted(cum, lo_rank + 1)])
    hi = int(vs[np.searchsorted(cum, hi_rank + 1)])

    def band(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch["n_tokens"], dtype=np.int64)
        return batch.filter(pa.array((v >= lo) & (v <= hi))).select(
            ["doc_id", "n_tokens"]
        )

    return ds.map_batches(band, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# one-shot distributed BM25 over `documents` (SQL-parity scoring)
# ---------------------------------------------------------------------------
FILTER_LANGS = ("de", "en")  # fq for filtered_search_topk (reference fq shape)


def bm25_topk_docs(sf_dir: str) -> pa.Table:
    """Top-10 BM25 per DOC_QUERIES query over `documents`, scored in float64
    with true token-count doc lengths (SQL-parity twin of the Lucene-exact
    engine path; ranking key = (round(score,4) desc, doc_id asc)).

    Two STREAMING passes, nothing materialized (the previous shape pinned an
    (n_docs x n_query_terms) tf matrix in the object store and re-scanned it
    twice — a whole-dataset materialization that cannot survive 100 TB):
      pass 1: per-batch partial (n_docs, total_len, df per query term) ->
              one tiny Sum aggregate;
      pass 2: per-batch score + per-batch partial top-10 per query (a doc's
              score depends only on its own tfs + the broadcast globals, so
              block-local top-k is an exact combiner) -> small driver merge.
    """
    return _bm25_topk_impl(sf_dir, filter_langs=None)


def filtered_search_topk(sf_dir: str) -> pa.Table:
    """fq-composed scoring (the reference's actual query shape: BM25-ranked
    q + fielded filter queries, corpus.cgi:328-339 / solrTestLib_v2.js:38-102):
    top-10 BM25 per DOC_QUERIES query restricted to lang IN FILTER_LANGS,
    with BM25 statistics (n_docs, avgdl, df) computed over the FULL corpus —
    exactly Solr's fq semantics (filters select, they don't re-weight).
    SQL-parity twin of IndexReader.search(filters=...)."""
    return _bm25_topk_impl(sf_dir, filter_langs=FILTER_LANGS)


#: boosted / required boolean queries (Lucene `term^2`, `+term` syntax)
BOOST_QUERIES = ["table^2 scan", "+query window", "hash join^3",
                 "+value +the spark"]


def _boost_query_spec() -> list[tuple[int, str, float, bool]]:
    """(qid, term, weight, required) rows — the single source of truth
    shared with the generated oracle SQL."""
    from .query import IndexReader

    out = []
    for qid, q in enumerate(BOOST_QUERIES):
        clauses = IndexReader._parse_boolean_clauses(q) or [
            (c, 1.0, False) for c in q.split()
        ]
        for raw, w, req in clauses:
            for t in tokenize_query(raw, profile="simple"):
                out.append((qid, t, w, req))
    return out


def boosted_search_topk(sf_dir: str) -> pa.Table:
    """Top-10 BM25 per boosted/required boolean query (Lucene `term^2
    +term` syntax): score = sum of weight * contribution, docs missing any
    required term dropped. SQL-parity twin of the reader's
    `_search_boolean`; same two-streaming-pass shape as bm25_topk_docs."""
    from ray.data.aggregate import Sum

    spec = _boost_query_spec()
    terms = sorted({t for _, t, _, _ in spec})
    ds = _documents(sf_dir, ["doc_id", "text"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        n = len(batch)
        cols = {
            "n_p": pa.array([np.int64(n)]),
            "len_p": pa.array([np.int64(tb.doc_len.sum())]),
        }
        dfm = (_qterm_tf(tb, terms, n) > 0).sum(axis=1)
        for ti in range(len(terms)):
            cols[f"df_{ti}"] = pa.array([np.int64(dfm[ti])])
        return pa.table(cols)

    stats = ds.map_batches(stats_partial, batch_format="pyarrow").aggregate(
        Sum("n_p", alias_name="n_docs"),
        Sum("len_p", alias_name="total_len"),
        *[Sum(f"df_{ti}", alias_name=f"df_{ti}") for ti in range(len(terms))],
    )
    n_docs = stats["n_docs"]
    avgdl = stats["total_len"] / n_docs
    idf = {
        t: float(np.log(1.0 + (n_docs - stats[f"df_{ti}"] + 0.5)
                        / (stats[f"df_{ti}"] + 0.5)))
        for ti, t in enumerate(terms)
    }

    def score_topk(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        n = len(batch)
        dl = tb.doc_len.astype(np.float64)
        doc_id = np.asarray(batch["doc_id"])
        tfm = _qterm_tf(tb, terms, n).astype(np.float64)
        tfs = {t: tfm[ti] for ti, t in enumerate(terms)}
        denom_k = K1 * (1.0 - B + B * dl / avgdl)
        out_q, out_d, out_s = [], [], []
        for qid in range(len(BOOST_QUERIES)):
            rows = [(t, w, req) for q, t, w, req in spec if q == qid]
            s = np.zeros(n, dtype=np.float64)
            matched = np.zeros(n, dtype=bool)
            ok = np.ones(n, dtype=bool)
            for t, w, req in rows:
                tf = tfs[t]
                m = tf > 0
                s = s + np.where(
                    m, w * (idf[t] * tf * (K1 + 1.0) / (tf + denom_k)), 0.0
                )
                matched |= m
                if req:
                    ok &= m
            matched &= ok
            sr = np.round(s[matched], 4)
            d = doc_id[matched]
            order = np.lexsort((d, -sr))[:10]
            out_q.append(np.full(order.size, qid, dtype=np.int64))
            out_d.append(d[order])
            out_s.append(sr[order])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                "doc_id": pa.array(np.concatenate(out_d)),
                "score_r": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    parts = ds.map_batches(score_topk, batch_format="pyarrow").take_all()
    q = np.array([r["qid"] for r in parts], dtype=np.int64)
    d = np.array([r["doc_id"] for r in parts], dtype=np.int64)
    s = np.array([r["score_r"] for r in parts], dtype=np.float64)
    keep = []
    for qid in range(len(BOOST_QUERIES)):
        sel = np.flatnonzero(q == qid)
        order = np.lexsort((d[sel], -s[sel]))[:10]
        keep.append(sel[order])
    keep = np.concatenate(keep) if keep else np.empty(0, np.int64)
    return pa.table(
        {
            "qid": pa.array(q[keep]),
            "doc_id": pa.array(d[keep]),
            "score_r": pa.array(s[keep], pa.float64()),
        }
    )


#: fuzzy bases for the FuzzyQuery twin (typos of real corpus tokens)
DOC_FUZZY = ["tabel", "quer", "scann", "sparkk", "zzzzz"]


def fuzzy_match_count(sf_dir: str) -> pa.Table:
    """numFound per FuzzyQuery base at max_edits=1 — SQL-parity twin of
    `IndexReader.match_count("base~1")` (constant-score doc-set semantics;
    the oracle uses DuckDB's levenshtein()). Edit distance evaluates only
    on each batch's UNIQUE terms via the vectorized prefix+suffix
    max_edits=1 kernel (`query._lev1_hits`) — no per-term Python call."""
    from ray.data.aggregate import Sum

    from .query import _lev1_hits

    ds = _documents(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        n = len(batch)
        cols = {}
        if tb.terms.size:
            terms_u = tb.terms.astype("U")
            uniq, inv = np.unique(terms_u, return_inverse=True)
            lens = np.char.str_len(uniq)
        for i, base in enumerate(DOC_FUZZY):
            c = 0
            if tb.terms.size:
                m = _lev1_hits(base, uniq, lens)[inv]
                c = int((np.bincount(tb.doc_idx[m], minlength=n) > 0).sum())
            cols[f"c_{i}"] = pa.array([np.int64(c)])
        return pa.table(cols)

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(f"c_{i}", alias_name=f"c_{i}") for i in range(len(DOC_FUZZY))]
    )
    return pa.table(
        {
            "base": pa.array(DOC_FUZZY, pa.string()),
            "num_found": pa.array(
                [int(agg[f"c_{i}"]) for i in range(len(DOC_FUZZY))],
                pa.int64(),
            ),
        }
    )


#: (query, mm) specs for the minimum-should-match twin (Solr mm param)
MM_QUERIES = [
    ("table scan merge", 2), ("the value data row", 3),
    ("spark query window", 2), ("slow fast big small", 4)
]


def mm_match_count(sf_dir: str) -> pa.Table:
    """numFound per OR query under Solr's mm / Lucene
    minimumNumberShouldMatch — SQL-parity twin of
    `IndexReader.match_count(q, min_should_match=N)`: a doc matches iff it
    contains >= N distinct query terms (specs use distinct terms, so
    clause count == distinct-term count). One streaming pass: per-batch
    `_qterm_tf` membership matrix -> per-query count partials -> Sum."""
    from ray.data.aggregate import Sum

    ds = _documents(sf_dir, ["doc_id", "text"])
    specs = [(q.split(), mm) for q, mm in MM_QUERIES]

    def partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        n = len(batch)
        cols = {}
        for qi, (terms, mm) in enumerate(specs):
            c = 0
            if tb.terms.size:
                member = _qterm_tf(tb, terms, n) > 0
                c = int((member.sum(axis=0) >= mm).sum())
            cols[f"c_{qi}"] = pa.array([np.int64(c)])
        return pa.table(cols)

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(f"c_{i}", alias_name=f"c_{i}") for i in range(len(MM_QUERIES))]
    )
    return pa.table(
        {
            "query": pa.array([q for q, _ in MM_QUERIES], pa.string()),
            "mm": pa.array([m for _, m in MM_QUERIES], pa.int64()),
            "num_found": pa.array(
                [int(agg[f"c_{i}"]) for i in range(len(MM_QUERIES))],
                pa.int64(),
            ),
        }
    )


#: (phrase, slop) specs for the sloppy-phrase twin (Lucene `"a b"~N`)
SLOPPY_PHRASES = [
    ("value table", 1), ("hash join", 2), ("the part", 0), ("window agg", 3)
]


def sloppy_phrase_match_count(sf_dir: str) -> pa.Table:
    """numFound per sloppy PhraseQuery `"a b"~N` — SQL-parity twin of
    `IndexReader.match_count('"a b"~N')` (movement-cost semantics: a doc
    matches iff positions exist with |p_b - p_a - 1| <= slop, reordering
    included). Fully vectorized per batch: one packed (doc, pos)
    searchsorted window probe per spec — no per-doc Python."""
    from ray.data.aggregate import Sum

    ds = _documents(sf_dir, ["doc_id", "text"])
    max_slop = max(s for _, s in SLOPPY_PHRASES)

    def partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        cols = {}
        have = tb.terms.size > 0
        if have:
            terms_u = tb.terms.astype("U")
            d = tb.doc_idx.astype(np.int64)
            p = tb.positions.astype(np.int64)
            m_pack = np.int64(int(p.max()) + max_slop + 2)
        for qi, (phrase, slop) in enumerate(SLOPPY_PHRASES):
            c = 0
            if have:
                ta, tb_ = tokenize_query(phrase, profile="simple")
                ma = terms_u == ta
                mb = terms_u == tb_
                if ma.any() and mb.any():
                    key_a = d[ma] * m_pack + p[ma]
                    key_a.sort()
                    db, pb_ = d[mb], p[mb]
                    lo = db * m_pack + np.maximum(pb_ - 1 - slop, 0)
                    hi = db * m_pack + (pb_ - 1 + slop)
                    ex = np.searchsorted(key_a, lo, side="left") < (
                        np.searchsorted(key_a, hi, side="right")
                    )
                    c = int(np.unique(db[ex]).size)
            cols[f"c_{qi}"] = pa.array([np.int64(c)])
        return pa.table(cols)

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(f"c_{i}", alias_name=f"c_{i}") for i in range(len(SLOPPY_PHRASES))]
    )
    return pa.table(
        {
            "phrase": pa.array([p for p, _ in SLOPPY_PHRASES], pa.string()),
            "slop": pa.array([s for _, s in SLOPPY_PHRASES], pa.int64()),
            "num_found": pa.array(
                [int(agg[f"c_{i}"]) for i in range(len(SLOPPY_PHRASES))],
                pa.int64(),
            ),
        }
    )


FACET_PIVOT_TERM = "table"  # query for the pivot-facet twin


def facet_pivot_counts(sf_dir: str) -> pa.Table:
    """Two-level pivot facet (Solr facet.pivot=lang,source) over the docs
    matching FACET_PIVOT_TERM — SQL-parity twin of
    `IndexReader.facet_pivot`. One streaming pass of per-(lang, source)
    partial counts -> groupby Sum."""
    from ray.data.aggregate import Sum

    ds = _documents(sf_dir, ["doc_id", "text", "lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        n = len(batch)
        matched = np.zeros(n, dtype=bool)
        if tb.terms.size:
            m = tb.terms.astype("U") == FACET_PIVOT_TERM
            matched = np.bincount(tb.doc_idx[m], minlength=n) > 0
        if not matched.any():
            return pa.table(
                {"lang": pa.array([], pa.string()),
                 "source": pa.array([], pa.string()),
                 "n_p": pa.array([], pa.int64())}
            )
        langs = np.asarray(batch["lang"].to_pylist(), dtype="U")[matched]
        srcs = np.asarray(batch["source"].to_pylist(), dtype="U")[matched]
        u1, i1 = np.unique(langs, return_inverse=True)
        u2, i2 = np.unique(srcs, return_inverse=True)
        key = i1.astype(np.int64) * np.int64(u2.size) + i2
        ku, kc = np.unique(key, return_counts=True)
        return pa.table(
            {
                "lang": pa.array(u1[ku // u2.size], pa.string()),
                "source": pa.array(u2[ku % u2.size], pa.string()),
                "n_p": pa.array(kc.astype(np.int64)),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n_p", alias_name="n"))
        .to_pandas()
    )
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
        }
    )


#: (pos, neg) clause pairs for the MUST_NOT twin; last pair's neg never occurs
DOC_NOT_QUERIES = [("table", "scan"), ("query", "window"),
                   ("value", "the"), ("spark", "zzqq")]


def not_match_count(sf_dir: str) -> pa.Table:
    """numFound for `pos -neg` boolean queries (Lucene MUST_NOT): docs
    containing the positive term and not the prohibited one. SQL-parity twin
    of `IndexReader.match_count("pos -neg")`. One streaming pass: both
    clauses evaluate doc-locally per batch, partial counts -> one Sum."""
    from ray.data.aggregate import Sum

    ds = _documents(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        n = len(batch)
        vocab = sorted({t for pq_ in DOC_NOT_QUERIES for t in pq_})
        hm = _qterm_tf(tb, vocab, n) > 0
        hit = {t: hm[ti] for ti, t in enumerate(vocab)}
        cols = {}
        for i, (pos, neg) in enumerate(DOC_NOT_QUERIES):
            c = int((hit[pos] & ~hit[neg]).sum())
            cols[f"c_{i}"] = pa.array([np.int64(c)])
        return pa.table(cols)

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(f"c_{i}", alias_name=f"c_{i}")
          for i in range(len(DOC_NOT_QUERIES))]
    )
    return pa.table(
        {
            "qid": pa.array(range(len(DOC_NOT_QUERIES)), pa.int64()),
            "num_found": pa.array(
                [int(agg[f"c_{i}"]) for i in range(len(DOC_NOT_QUERIES))],
                pa.int64(),
            ),
        }
    )


def grouped_search_topk(sf_dir: str) -> pa.Table:
    """Field-collapse / result grouping (Solr group=true&group.field=lang):
    top-3 BM25 docs PER (query, lang) group, statistics corpus-global. The
    partial top-k runs per group inside each block, so only
    groups x 3 x blocks rows reach the merge."""
    return _bm25_topk_impl(sf_dir, filter_langs=None, k=3, group_field="lang")


def field_stats(sf_dir: str) -> pa.Table:
    """Solr StatsComponent analog (stats=true&stats.field=n_chars&
    stats.facet=lang): count/min/max/sum/mean of a numeric field over the
    docs matching each query, grouped by lang. One streaming pass of
    per-(qid, lang) integer partials; mean is the single exact division
    sum/count (hash-identical to the SQL oracle)."""
    from ray.data.aggregate import Max, Min, Sum

    qterms = doc_query_terms()
    terms = sorted({t for _, t in qterms})
    ds = _documents(sf_dir, ["doc_id", "text", "lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        n = len(batch)
        langs = np.asarray(batch["lang"].to_pylist(), dtype="U")
        nc = np.asarray(batch["n_chars"], dtype=np.int64)
        hm = _qterm_tf(tb, terms, n) > 0
        out_q, out_l, out_c, out_mn, out_mx, out_sm = [], [], [], [], [], []
        for qid in range(len(DOC_QUERIES)):
            qts = {t for q, t in qterms if q == qid}
            matched = np.zeros(n, dtype=bool)
            for ti, t in enumerate(terms):
                if t in qts:
                    matched |= hm[ti]
            if not matched.any():
                continue
            lu, lcode = np.unique(langs[matched], return_inverse=True)
            v = nc[matched]
            cnt = np.bincount(lcode)
            sm = np.bincount(lcode, weights=v).astype(np.int64)
            mn = np.full(lu.size, np.iinfo(np.int64).max)
            mx = np.full(lu.size, np.iinfo(np.int64).min)
            np.minimum.at(mn, lcode, v)
            np.maximum.at(mx, lcode, v)
            out_q.append(np.full(lu.size, qid, dtype=np.int64))
            out_l.append(lu)
            out_c.append(cnt.astype(np.int64))
            out_mn.append(mn)
            out_mx.append(mx)
            out_sm.append(sm)
        if not out_q:
            return pa.table(
                {"qid": pa.array([], pa.int64()),
                 "lang": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64()),
                 "mn": pa.array([], pa.int64()),
                 "mx": pa.array([], pa.int64()),
                 "sm": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                "lang": pa.array(np.concatenate(out_l), pa.string()),
                "cnt": pa.array(np.concatenate(out_c)),
                "mn": pa.array(np.concatenate(out_mn)),
                "mx": pa.array(np.concatenate(out_mx)),
                "sm": pa.array(np.concatenate(out_sm)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["qid", "lang"])
        .aggregate(
            Sum("cnt", alias_name="doc_count"),
            Min("mn", alias_name="min_chars"),
            Max("mx", alias_name="max_chars"),
            Sum("sm", alias_name="sum_chars"),
        )
        .to_pandas()
    )
    return pa.table(
        {
            "qid": pa.array(agg["qid"].to_numpy(np.int64)),
            "lang": pa.array(agg["lang"], pa.string()),
            "doc_count": pa.array(agg["doc_count"].to_numpy(np.int64)),
            "min_chars": pa.array(agg["min_chars"].to_numpy(np.int64)),
            "max_chars": pa.array(agg["max_chars"].to_numpy(np.int64)),
            "sum_chars": pa.array(agg["sum_chars"].to_numpy(np.int64)),
            "mean_chars": pa.array(
                agg["sum_chars"].to_numpy(np.float64)
                / agg["doc_count"].to_numpy(np.float64),
                pa.float64(),
            ),
        }
    )


FQ_RANGE = ("n_chars", 150, 320)  # numeric range fq for range_filtered_topk


def range_filtered_topk(sf_dir: str) -> pa.Table:
    """Numeric range fq (Solr `fq=n_chars:[150 TO 320]`, inclusive) composed
    with BM25: top-10 per DOC_QUERIES query restricted to docs in the range,
    statistics corpus-global (fq selects, never re-weights). SQL-parity twin
    of `IndexReader.search(filters={field: "[lo TO hi]"})`."""
    return _bm25_topk_impl(sf_dir, filter_langs=None, filter_range=FQ_RANGE)


FQ_PHRASE = "value table"  # query-valued fq for fq_phrase_search_topk


def fq_phrase_search_topk(sf_dir: str) -> pa.Table:
    """QUERY-valued fq (the reference UI's target-text box issues
    fq=<lang>:"<phrase>", solrTestLib_v2.js:50-53; every Solr fq is a full
    query): top-10 BM25 per DOC_QUERIES query restricted to docs containing
    the FQ_PHRASE as consecutive tokens. BM25 statistics stay corpus-global.
    SQL-parity twin of IndexReader.search(filters={"content": '"…"'})."""
    return _bm25_topk_impl(sf_dir, filter_langs=None, filter_phrase=FQ_PHRASE)


def _bm25_topk_impl(
    sf_dir: str,
    filter_langs: tuple | None,
    filter_phrase: str | None = None,
    k: int = 10,
    filter_range: tuple | None = None,
    group_field: str | None = None,
) -> pa.Table:
    qterms = doc_query_terms()
    terms = sorted({t for _, t in qterms})
    cols = ["doc_id", "text"] + (["lang"] if filter_langs else [])
    if filter_range:
        cols.append(filter_range[0])
    if group_field and group_field not in cols:
        cols.append(group_field)
    ds = _documents(sf_dir, cols)

    def stats_partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        n = len(batch)
        cols = {
            "n_p": pa.array([np.int64(n)]),
            "len_p": pa.array([np.int64(tb.doc_len.sum())]),
        }
        dfm = (_qterm_tf(tb, terms, n) > 0).sum(axis=1)
        for ti in range(len(terms)):
            cols[f"df_{ti}"] = pa.array([np.int64(dfm[ti])])
        return pa.table(cols)

    from ray.data.aggregate import Sum

    stats = ds.map_batches(stats_partial, batch_format="pyarrow").aggregate(
        Sum("n_p", alias_name="n_docs"),
        Sum("len_p", alias_name="total_len"),
        *[Sum(f"df_{ti}", alias_name=f"df_{ti}") for ti in range(len(terms))],
    )
    n_docs = stats["n_docs"]
    avgdl = stats["total_len"] / n_docs
    idf = {
        t: float(np.log(1.0 + (n_docs - stats[f"df_{ti}"] + 0.5)
                        / (stats[f"df_{ti}"] + 0.5)))
        for ti, t in enumerate(terms)
    }

    phrase_toks = (
        tokenize_query(filter_phrase, profile="simple") if filter_phrase else None
    )

    def _phrase_rows(tb, n: int) -> np.ndarray:
        """Boolean per batch row: token stream contains the consecutive
        phrase (simple profile: no overlaps, positions dense)."""
        L = len(phrase_toks)
        if tb.terms.size < L:
            return np.zeros(n, dtype=bool)
        order = np.lexsort((tb.positions, tb.doc_idx))
        t = tb.terms[order].astype("U")
        d = tb.doc_idx[order]
        p = tb.positions[order]
        m = t.size - L + 1
        ok = np.ones(m, dtype=bool)
        for i, pt in enumerate(phrase_toks):
            ok &= t[i : m + i] == pt
        ok &= d[:m] == d[L - 1 :]
        ok &= (p[L - 1 :] - p[:m]) == (L - 1)
        return np.bincount(d[:m][ok], minlength=n) > 0

    def score_topk(batch: pa.Table) -> pa.Table:
        # fq semantics: filter rows BEFORE scoring (stats already global)
        if filter_range:
            fcol, lo, hi = filter_range
            v = np.asarray(batch[fcol])
            batch = batch.filter(pa.array((v >= lo) & (v <= hi)))
        if filter_langs:
            batch = batch.filter(
                pc.is_in(batch["lang"], value_set=pa.array(filter_langs))
            )
        if phrase_toks:
            tb0 = tokenize_batch(batch["text"], profile="simple")
            batch = batch.filter(pa.array(_phrase_rows(tb0, len(batch))))
        tb = tokenize_batch(batch["text"], profile="simple")
        n = len(batch)
        dl = tb.doc_len.astype(np.float64)
        doc_id = np.asarray(batch["doc_id"])
        tfm = _qterm_tf(tb, terms, n).astype(np.float64)
        tfs = {t: tfm[ti] for ti, t in enumerate(terms)}
        denom_k = K1 * (1.0 - B + B * dl / avgdl)
        gvals = (
            np.asarray(batch[group_field].to_pylist(), dtype="U")
            if group_field
            else None
        )
        out_q, out_d, out_s, out_g = [], [], [], []
        for qid in range(len(DOC_QUERIES)):
            qts = [t for q, t in qterms if q == qid]
            s = np.zeros(n, dtype=np.float64)
            matched = np.zeros(n, dtype=bool)
            for t in qts:
                tf = tfs[t]
                m = tf > 0
                s = s + np.where(m, idf[t] * tf * (K1 + 1.0) / (tf + denom_k), 0.0)
                matched |= m
            sr = np.round(s[matched], 4)
            d = doc_id[matched]
            if group_field:
                # field-collapse (Solr group=true): partial top-k PER GROUP
                g = gvals[matched]
                _, gcodes = np.unique(g, return_inverse=True)
                order = np.lexsort((d, -sr, gcodes))
                runs = gcodes[order]
                starts = np.flatnonzero(
                    np.concatenate(([True], runs[1:] != runs[:-1]))
                )
                rank = np.arange(runs.size) - np.repeat(
                    starts, np.diff(np.concatenate((starts, [runs.size])))
                )
                order = order[rank < k]
            else:
                order = np.lexsort((d, -sr))[:k]  # block-local partial top-k
            out_q.append(np.full(order.size, qid, dtype=np.int64))
            out_d.append(d[order])
            out_s.append(sr[order])
            if group_field:
                out_g.append(gvals[matched][order])
        cols = {
            "qid": pa.array(np.concatenate(out_q)),
            "doc_id": pa.array(np.concatenate(out_d)),
            "score_r": pa.array(np.concatenate(out_s), pa.float64()),
        }
        if group_field:
            cols[group_field] = pa.array(
                np.concatenate(out_g) if out_g else np.empty(0, "U1"),
                pa.string(),
            )
        return pa.table(cols)

    parts = ds.map_batches(score_topk, batch_format="pyarrow").take_all()
    q = np.array([r["qid"] for r in parts], dtype=np.int64)
    d = np.array([r["doc_id"] for r in parts], dtype=np.int64)
    s = np.array([r["score_r"] for r in parts], dtype=np.float64)
    if group_field:
        gv = np.array([r[group_field] for r in parts], dtype="U")
        guniq, gcode = (
            np.unique(gv, return_inverse=True)
            if gv.size
            else (np.empty(0, "U1"), np.empty(0, np.int64))
        )
        key = q * np.int64(max(guniq.size, 1)) + gcode
        keep = []
        for kk in np.unique(key):
            sel = np.flatnonzero(key == kk)
            order = np.lexsort((d[sel], -s[sel]))[:k]
            keep.append(sel[order])
        keep = np.concatenate(keep) if keep else np.empty(0, np.int64)
        return pa.table(
            {
                "qid": pa.array(q[keep]),
                group_field: pa.array(gv[keep], pa.string()),
                "doc_id": pa.array(d[keep]),
                "score_r": pa.array(s[keep], pa.float64()),
            }
        ).to_pandas()
    keep = []
    for qid in range(len(DOC_QUERIES)):
        sel = np.flatnonzero(q == qid)
        order = np.lexsort((d[sel], -s[sel]))[:k]
        keep.append(sel[order])
    keep = np.concatenate(keep) if keep else np.empty(0, np.int64)
    return pa.table(
        {
            "qid": pa.array(q[keep]),
            "doc_id": pa.array(d[keep]),
            "score_r": pa.array(s[keep], pa.float64()),
        }
    ).to_pandas()


def match_count_or(sf_dir: str) -> pa.Table:
    """numFound per DOC_QUERIES query (OR semantics; reference G3)."""
    qterms = doc_query_terms()
    terms = sorted({t for _, t in qterms})
    tset = pa.array(terms, pa.string())
    ds = _documents(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        n = len(batch)
        hm = _qterm_tf(tb, terms, n) > 0
        hits = {t: hm[ti] for ti, t in enumerate(terms)}
        cols = {}
        for qid in range(len(DOC_QUERIES)):
            qts = [t for q, t in qterms if q == qid]
            any_hit = np.zeros(n, dtype=bool)
            for t in qts:
                any_hit |= hits[t]
            cols[f"q{qid}"] = pa.array(any_hit.sum(keepdims=True).astype(np.int64))
        return pa.table(cols)

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(f"q{qid}", alias_name=f"s{qid}") for qid in range(len(DOC_QUERIES))]
    )
    return pa.table(
        {
            "qid": pa.array(np.arange(len(DOC_QUERIES), dtype=np.int64)),
            "num_found": pa.array(
                [int(agg[f"s{q}"]) for q in range(len(DOC_QUERIES))], pa.int64()
            ),
        }
    )


def highlight_topk(sf_dir: str) -> pa.Table:
    """Positions-based highlighting over the BM25 top-10 (the reference
    declares a full HighlightComponent, solrconfig.xml:1144-1243; snippets
    here are token windows around the first match, the integer-exact analog
    of its fragment extraction). For each top (qid, doc) pair and each query
    term present in the doc: first token position (0-based) and a +-2-token
    snippet.

    Scale shape: the snippet pass streams over documents restricted to the
    top doc ids (broadcast, bounded by queries x k); per-batch work is one
    tokenize + one is_in mask; only first-occurrence rows (<= top_docs x
    query_terms) hit the small Python window-join at the end."""
    import ray

    top = bm25_topk_docs(sf_dir)  # pandas DataFrame (qid, doc_id, score_r)
    qterms = sorted(set(doc_query_terms()))
    term_set = sorted({t for _, t in qterms})
    top_docs = np.unique(top["doc_id"].to_numpy(dtype=np.int64))
    docs_ref = ray.put(pa.array(top_docs, pa.int64()))
    terms_ref = ray.put(pa.array(term_set, pa.string()))

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "first_pos": pa.array([], pa.int64()),
            "snippet": pa.array([], pa.string()),
        }
    )

    def snip(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["doc_id"], value_set=ray.get(docs_ref))
        b = batch.filter(mask)
        if b.num_rows == 0:
            return empty
        tb = tokenize_batch(b["text"], profile="simple")
        if tb.terms.size == 0:
            return empty
        hit = (
            pc.is_in(pa.array(tb.terms.astype("U")), value_set=ray.get(terms_ref))
            .to_numpy(zero_copy_only=False).astype(bool)
        )
        if not hit.any():
            return empty
        d = tb.doc_idx[hit].astype(np.int64)
        p = tb.positions[hit].astype(np.int64)
        t = tb.terms[hit].astype("U")
        codes = np.searchsorted(np.array(term_set, dtype="U"), t)
        order = np.lexsort((p, codes, d))
        d, p, codes = d[order], p[order], codes[order]
        first = np.concatenate(
            ([True], (d[1:] != d[:-1]) | (codes[1:] != codes[:-1]))
        )
        d, p, codes = d[first], p[first], codes[first]
        starts = np.concatenate(([0], np.cumsum(tb.doc_len.astype(np.int64))[:-1]))
        doc_ids = np.asarray(b["doc_id"])
        lens = tb.doc_len.astype(np.int64)
        snippets = []
        for di, pos in zip(d, p):
            a = max(0, int(pos) - 2)
            z = min(int(lens[di]) - 1, int(pos) + 2)
            snippets.append(
                " ".join(map(str, tb.terms[starts[di] + a : starts[di] + z + 1]))
            )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[d], pa.int64()),
                "term": pa.array(np.array(term_set, dtype=object)[codes], pa.string()),
                "first_pos": pa.array(p, pa.int64()),
                "snippet": pa.array(snippets, pa.string()),
            }
        )

    ds = _documents(sf_dir, ["doc_id", "text"])
    rows = ds.map_batches(snip, batch_format="pyarrow").to_pandas()

    import pandas as pd

    top_df = top[["qid", "doc_id"]]
    qt_df = pd.DataFrame(qterms, columns=["qid", "term"])
    out = top_df.merge(qt_df, on="qid").merge(rows, on=["doc_id", "term"])
    out = out.sort_values(["qid", "doc_id", "term"]).reset_index(drop=True)
    return pa.table(
        {
            "qid": pa.array(out["qid"].to_numpy(dtype=np.int64)),
            "doc_id": pa.array(out["doc_id"].to_numpy(dtype=np.int64)),
            "term": pa.array(out["term"].astype(str), pa.string()),
            "first_pos": pa.array(out["first_pos"].to_numpy(dtype=np.int64)),
            "snippet": pa.array(out["snippet"].astype(str), pa.string()),
        }
    )


def phrase_match_count(sf_dir: str) -> pa.Table:
    """Docs matching each DOC_PHRASES phrase (consecutive simple-profile
    tokens — equivalently the boundary regex the oracle SQL uses)."""
    ds = _documents(sf_dir, ["doc_id", "text"])
    phrase_terms = [tokenize_query(p, profile="simple") for p in DOC_PHRASES]

    def partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        terms = tb.terms.astype("U") if tb.terms.size else np.empty(0, "U1")
        cols = {}
        for pi, pts in enumerate(phrase_terms):
            cnt = 0
            if terms.size:
                # (doc, pos) sets per phrase term; shift-and-intersect
                ok_key = None
                for off, t in enumerate(pts):
                    m = terms == t
                    # +64 keeps the shifted position non-negative so the
                    # packed (doc, pos) key can't alias across docs
                    key = tb.doc_idx[m].astype(np.int64) * (2**32) + (
                        tb.positions[m].astype(np.int64) - off + 64
                    )
                    ok_key = key if ok_key is None else np.intersect1d(ok_key, key)
                if ok_key is not None and ok_key.size:
                    cnt = np.unique(ok_key >> 32).size
            cols[f"p{pi}"] = pa.array(np.array([cnt], dtype=np.int64))
        return pa.table(cols)

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(f"p{pi}", alias_name=f"s{pi}") for pi in range(len(DOC_PHRASES))]
    )
    return pa.table(
        {
            "qid": pa.array(np.arange(len(DOC_PHRASES), dtype=np.int64)),
            "num_found": pa.array(
                [int(agg[f"s{p}"]) for p in range(len(DOC_PHRASES))], pa.int64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------
def exact_dedup_docs(sf_dir: str):
    """Exact dedup of `documents` by sha256(text) (reference J2 uniqueKey
    upsert semantics): survivors with copy counts."""
    return dedup_ops.exact_dedup(_documents(sf_dir, ["doc_id", "text"]))


def dedup_collect_sources(sf_dir: str):
    """Exact dedup of `documents` that accumulates each duplicate group's
    distinct `source` values into a sorted list — the reference's multiValued
    productname atomic-add (parseJSON.pl:154-181) as a standalone query."""
    return dedup_ops.exact_dedup_collect(
        _documents(sf_dir, ["doc_id", "text", "source"]), collect_col="source"
    )


def jaccard_dup_pairs_docs(sf_dir: str):
    """Complete token-set Jaccard similarity join (tau=0.9), integer-exact."""
    return dedup_ops.jaccard_pairs(
        _documents(sf_dir, ["doc_id", "text"]), tau_num=9, tau_den=10
    )


def substring_dup_pairs_docs(sf_dir: str):
    """Exact substring-level dedup pairs over `documents`: all pairs sharing
    an exact common run of >= 40 chars (byte==char on this ASCII corpus) —
    Lee et al. ACL'22 substring dedup, winnowing candidates + exact verify
    (`dedup.substring_dup_pairs`)."""
    return dedup_ops.substring_dup_pairs(
        _documents(sf_dir, ["doc_id", "text"]), min_len=40, k=16
    )


#: reference prefixes for the PrefixQuery / terms-component twins ("zz"
#: exercises the zero-match row)
DOC_PREFIXES = ["ta", "qu", "val", "s", "zz"]


def prefix_match_count(sf_dir: str) -> pa.Table:
    """numFound per prefix query (Lucene PrefixQuery, q=val*): docs with any
    token starting with the prefix. SQL-parity twin of
    `IndexReader.match_count("<p>*")` (constant-score doc-set semantics).
    One streaming pass: per-batch doc counts per prefix -> one tiny Sum."""
    from ray.data.aggregate import Sum

    ds = _documents(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        n = len(batch)
        terms_u = tb.terms.astype("U") if tb.terms.size else None
        cols = {}
        for i, p in enumerate(DOC_PREFIXES):
            c = 0
            if terms_u is not None:
                m = np.char.startswith(terms_u, p)
                c = int((np.bincount(tb.doc_idx[m], minlength=n) > 0).sum())
            cols[f"c_{i}"] = pa.array([np.int64(c)])
        return pa.table(cols)

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(f"c_{i}", alias_name=f"c_{i}") for i in range(len(DOC_PREFIXES))]
    )
    return pa.table(
        {
            "prefix": pa.array(DOC_PREFIXES, pa.string()),
            "num_found": pa.array(
                [int(agg[f"c_{i}"]) for i in range(len(DOC_PREFIXES))],
                pa.int64(),
            ),
        }
    )


#: Lucene wildcard patterns (* = any run, ? = one char) incl. a
#: leading-wildcard and a zero-match case
DOC_WILDCARDS = ["v?lue", "qu*y", "*ble", "s?a*", "zz?*"]


def wildcard_match_count(sf_dir: str) -> pa.Table:
    """numFound per Lucene WildcardQuery — SQL-parity twin of
    `IndexReader.match_count("v?l*")` (constant-score doc-set semantics;
    the oracle rewrites * -> %% and ? -> _ for LIKE). Regexes match against
    the batch's UNIQUE terms only, then membership is vectorized."""
    import re as _re

    from ray.data.aggregate import Sum

    ds = _documents(sf_dir, ["doc_id", "text"])
    rxs = [
        _re.compile(
            "".join(
                ".*" if c == "*" else "." if c == "?" else _re.escape(c)
                for c in p
            )
            + r"\Z"
        )
        for p in DOC_WILDCARDS
    ]

    def partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        n = len(batch)
        cols = {}
        if tb.terms.size:
            terms_u = tb.terms.astype("U")
            uniq, inv = np.unique(terms_u, return_inverse=True)
        for i, rx in enumerate(rxs):
            c = 0
            if tb.terms.size:
                hit = np.fromiter(
                    (rx.match(t) is not None for t in uniq),
                    dtype=bool, count=uniq.size,
                )
                m = hit[inv]
                c = int((np.bincount(tb.doc_idx[m], minlength=n) > 0).sum())
            cols[f"c_{i}"] = pa.array([np.int64(c)])
        return pa.table(cols)

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(f"c_{i}", alias_name=f"c_{i}") for i in range(len(DOC_WILDCARDS))]
    )
    return pa.table(
        {
            "pattern": pa.array(DOC_WILDCARDS, pa.string()),
            "num_found": pa.array(
                [int(agg[f"c_{i}"]) for i in range(len(DOC_WILDCARDS))],
                pa.int64(),
            ),
        }
    )


def term_prefix_suggest(sf_dir: str) -> pa.Table:
    """Solr terms-component / autocomplete twin (`IndexReader.suggest`):
    top-10 (term, df) per prefix, df-desc then term-asc. Per-batch distinct
    (prefix, term, partial-df) -> one groupby Sum for global df -> per-batch
    partial top-10 -> tiny driver merge (only prefixes x 10 x blocks rows
    leave the aggregate)."""
    from ray.data.aggregate import Sum

    ds = _documents(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        t = dedup_ops.distinct_doc_terms(batch)
        terms = np.asarray(t["term"].to_pylist(), dtype="U")
        out_p, out_t, out_c = [], [], []
        for i, p in enumerate(DOC_PREFIXES):
            m = np.char.startswith(terms, p)
            if not m.any():
                continue
            tu, cnt = np.unique(terms[m], return_counts=True)
            out_p.append(np.full(tu.size, i, dtype=np.int64))
            out_t.append(tu)
            out_c.append(cnt.astype(np.int64))
        if not out_p:
            return pa.table(
                {"pid": pa.array([], pa.int64()),
                 "term": pa.array([], pa.string()),
                 "df_p": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "pid": pa.array(np.concatenate(out_p)),
                "term": pa.array(np.concatenate(out_t), pa.string()),
                "df_p": pa.array(np.concatenate(out_c)),
            }
        )

    df = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["pid", "term"])
        .aggregate(Sum("df_p", alias_name="df"))
    )

    def block_top(batch: pa.Table) -> pa.Table:
        pid = np.asarray(batch["pid"])
        term = np.asarray(batch["term"].to_pylist(), dtype="U")
        dfv = np.asarray(batch["df"])
        order = np.lexsort((term, -dfv, pid))
        g = pid[order]
        starts = np.flatnonzero(np.concatenate(([True], g[1:] != g[:-1])))
        rank = np.arange(g.size) - np.repeat(
            starts, np.diff(np.concatenate((starts, [g.size])))
        )
        keep = order[rank < 10]
        return pa.table(
            {
                "pid": pa.array(pid[keep], pa.int64()),
                "term": pa.array(term[keep], pa.string()),
                "df": pa.array(dfv[keep], pa.int64()),
            }
        )

    parts = df.map_batches(block_top, batch_format="pyarrow").to_pandas()
    pid = parts["pid"].to_numpy()
    term = parts["term"].to_numpy(dtype="U")
    dfv = parts["df"].to_numpy()
    keep = []
    for i in range(len(DOC_PREFIXES)):
        sel = np.flatnonzero(pid == i)
        order = np.lexsort((term[sel], -dfv[sel]))[:10]
        keep.append(sel[order])
    keep = np.concatenate(keep) if keep else np.empty(0, np.int64)
    return pa.table(
        {
            "prefix": pa.array(
                [DOC_PREFIXES[i] for i in pid[keep]], pa.string()
            ),
            "term": pa.array(term[keep], pa.string()),
            "df": pa.array(dfv[keep], pa.int64()),
        }
    )


def top_terms_docs(sf_dir: str):
    """Per-doc keyword extraction: top-3 terms by the integer-exact tf-idf
    ordering (tf DESC, df ASC, term ASC); df flows onto tf rows via the
    string-keyed partitioned hash join (`textstats.top_terms_per_doc`)."""
    return ts_ops.top_terms_per_doc(
        _documents(sf_dir, ["doc_id", "text"]), k_top=3
    )


#: per-language sampling rates (permille) for the rebalancing demo: halve the
#: dominant language, keep the rest — the standard multilingual-mix reweight
_SAMPLE_RATES = {"en": 500, "de": 900, "es": 900, "fr": 900, "zh": 900}


def stratified_sample_docs(sf_dir: str):
    """Deterministic per-language Bernoulli sample of `documents` (training-
    mix rebalancing): membership is a pure function of doc_id, reproducible
    and SQL-auditable (`sampling.stratified_sample`)."""
    return sampling_ops.stratified_sample(
        _documents(sf_dir, ["doc_id", "lang", "source"]), _SAMPLE_RATES
    )


def stratified_take_docs(sf_dir: str):
    """Exactly min(40, stratum size) docs per language by deterministic
    hash order — fixed-budget eval-set allocation
    (`sampling.stratified_take_n`)."""
    return sampling_ops.stratified_take_n(
        _documents(sf_dir, ["doc_id", "lang"]), n_per_stratum=40
    )


def weighted_sample_docs(sf_dir: str):
    """Quality-weighted Bernoulli sample: inclusion probability
    min(n_tokens * 10 / 1000, 1) — longer docs proportionally more likely,
    the data-mixing primitive (`sampling.weighted_sample`). n_tokens is
    computed in the same streaming pass (SQL-parity simple profile)."""
    ds = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        ts_ops.token_counts_batch, batch_format="pyarrow"
    ).map_batches(
        lambda b: b.select(["doc_id", "n_tokens"]), batch_format="pyarrow"
    )
    return sampling_ops.weighted_sample(ds, weight_col="n_tokens", num=10)


def balanced_sample_docs(sf_dir: str):
    """Language-balanced corpus: every lang deterministically downsampled
    to the smallest lang's doc count (`sampling.balanced_sample`) — the
    uniform-mix rebalancing primitive of pretraining data mixing. Pass 1
    is a key-column-pruned tiny groupby count (cardinality = #langs,
    broadcast into the filter closure); pass 2 a pure map filter."""
    counts = {
        r["lang"]: r["count()"]
        for r in _documents(sf_dir, ["lang"]).groupby("lang").count().take_all()
    }
    ds = _documents(sf_dir, ["doc_id", "lang", "source"])
    return sampling_ops.balanced_sample(ds, counts, key_col="lang")


def repetition_stats_docs(sf_dir: str):
    """Gopher-style repetition signals per doc (`textstats.
    repetition_stats_batch`): n_tokens / n_distinct / max_tf — the
    integer-exact inputs to the MassiveText "most common word fraction"
    filter."""
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        ts_ops.repetition_stats_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "n_tokens", "n_distinct", "max_tf"])


def packed_sequences(sf_dir: str):
    """GPT-style sequence packing over `documents` (B=128 tokens):
    per-doc (start_token, block_id, block_offset) in the concatenated
    doc_id-ordered stream, via the distributed exact prefix sum in
    `packing.pack_sequences`."""
    from .packing import pack_sequences

    return pack_sequences(
        _documents(sf_dir, ["doc_id", "text"]), block_tokens=128,
        bucket_shift=6,
    )


def decontaminated_docs(sf_dir: str) -> pa.Table:
    """Benchmark decontamination over `documents`: drop every doc sharing
    an exact >= 32-char run with the "eval set" (the 3 lowest-doc_id docs —
    which therefore also drop themselves). Broadcast eval fingerprints,
    pure-map filter, exact confirm (`dedup.decontaminate`)."""
    import pyarrow.parquet as pqt

    eval_tbl = pqt.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    order = np.argsort(np.asarray(eval_tbl["doc_id"]))[:3]
    eval_texts = [eval_tbl["text"][int(i)].as_py() for i in order]
    ds = dedup_ops.decontaminate(
        _documents(sf_dir, ["doc_id", "text"]), eval_texts, min_len=32
    )
    return ds.select_columns(["doc_id"])


def _sha_doc_id(batch: pa.Table) -> pa.Table:
    """Identity-derived int63 doc id (sha256 of the unique (repo, path,
    commit) identity) — stable across shards, batch sizes and scheduling; no
    driver-side id assignment, no shuffle (the same trick build.py plays
    with content-sha ranks, minus the dedup pass this query doesn't want:
    exact-dup CONTENT must keep distinct ids to surface as dup pairs)."""
    ids = [
        int.from_bytes(hashlib_sha256(k.encode("utf-8")).digest()[:8], "big") >> 1
        for k in (
            f"{r}\x1f{p}\x1f{c}"
            for r, p, c in zip(
                batch["repo"].to_pylist(),
                batch["path"].to_pylist(),
                batch["commit"].to_pylist(),
            )
        )
    ]
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": batch["content"]}
    )


def shingle_jaccard_pairs_docs(sf_dir: str):
    """n-gram (3-shingle) Jaccard similarity join at tau=0.8 — the
    order-sensitive near-dup variant (token-set Jaccard treats permuted
    docs as identical; shingles do not). Same exact prefix-filter +
    distributed-verify machinery, unit = consecutive-token 3-grams."""
    return dedup_ops.jaccard_pairs(
        _documents(sf_dir, ["doc_id", "text"]), tau_num=4, tau_den=5, shingle=3
    )


def minhash_pairs_corpus(sf_dir: str):
    """MinHash-LSH candidate pairs over the synthetic code corpus, verified
    with exact 3-shingle Jaccard >= 0.9 (integer-exact columns). Fully
    distributed: content-derived doc ids assigned in the pipeline, candidate
    generation via the banded LSH groupby, verification via
    dedup.verify_pairs_exact_ds — candidates stay a Dataset (no pandas hop).

    The LSH signature space MATCHES the verify space (3-token shingles,
    order-sensitive): the miss probability per true pair at J=0.9 is
    (1 - 0.9^4)^16 < 4e-8 with the default 64-perm/16-band scheme, which is
    why the driver can hold this output to an exact SQL oracle (the AllPairs
    prefix-filter plan in __ray_entry__._minhash_sql). Token-SET space is
    deliberately avoided here: unordered-set J=1 collisions among short
    docs make the true pair count quadratic on realistic corpora, while the
    shingle space keeps it proportional to genuine edit-duplication."""
    import ray.data

    path = corpus_path(n_docs_for_sf(sf_dir))
    ds = ray.data.read_parquet(
        path, columns=["repo", "path", "commit", "content"]
    ).map_batches(_sha_doc_id, batch_format="pyarrow")
    # signature pool sized to the session (sf0.1 = 200k docs; the old
    # fixed concurrency=4 left 28 cores idle in the minhash stage and
    # dominated the sf0.1 wall time)
    import ray as _ray

    pool = max(4, int(_ray.cluster_resources().get("CPU", 4)) // 2)
    cand = dedup_ops.minhash_lsh_pairs(ds, shingle=3, concurrency=pool)
    return dedup_ops.verify_pairs_exact_ds(ds, cand, 9, 10, shingle=3)


def simhash_docs(sf_dir: str):
    """64-bit SimHash sketch per document (deterministic)."""
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        dedup_ops.simhash_batch, batch_format="pyarrow"
    )


def dup_clusters_docs(sf_dir: str):
    """Duplicate-cluster resolution over the documents table: token-set
    Jaccard >= 0.9 pairs -> connected components -> per-doc canonical
    cluster_id (min reachable doc_id). The step that turns pairwise
    near-dup output into an actual KEEP/DROP decision for transitive
    chains; fully Dataset-native (dedup.dup_clusters label propagation)."""
    pairs = dedup_ops.jaccard_pairs(
        _documents(sf_dir, ["doc_id", "text"]), tau_num=9, tau_den=10
    )
    return dedup_ops.dup_clusters(pairs)


def simhash_pairs_docs(sf_dir: str):
    """Near-dup pairs by SimHash distance <= 3 (pigeonhole chunk buckets +
    in-group exact Hamming; EXACT for the distance budget)."""
    return dedup_ops.simhash_pairs(
        _documents(sf_dir, ["doc_id", "text"]), max_hamming=3
    )


# ---------------------------------------------------------------------------
# normalization / text analysis (M-ops + training-data analytics)
# ---------------------------------------------------------------------------
def normalize_text_docs(sf_dir: str):
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        norm_ops.normalize_documents_batch, batch_format="pyarrow"
    )


def quality_stats_docs(sf_dir: str):
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        ts_ops.quality_stats_batch, batch_format="pyarrow"
    )


def langid_docs(sf_dir: str):
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        ts_ops.langid_batch, batch_format="pyarrow"
    )


def lm_quality_docs(sf_dir: str, vocab_size: int = 20):
    """Unigram-LM statistical quality scores over `documents` (vocab capped
    small at test scale so the OOV path is exercised; production default is
    textstats.unigram_lm_scores' 10k)."""
    return ts_ops.unigram_lm_scores(
        _documents(sf_dir, ["doc_id", "text"]), vocab_size=vocab_size
    )


def bigram_lm_docs(sf_dir: str):
    """Bigram conditional-LM quality scores over `documents` — the
    CCNet-style n-gram statistical signal; counts flow back onto pair
    rows via partitioned hash joins (textstats.bigram_lm_scores)."""
    return ts_ops.bigram_lm_scores(_documents(sf_dir, ["doc_id", "text"]))


def pii_redact_docs(sf_dir: str):
    """PII redaction over `documents` — the standard training-data
    scrubbing pass (emails / phone numbers / IPv4 -> typed placeholders,
    normalize.pii_redact_batch). The synthetic corpus is PII-free word
    soup, so PII spans are first INJECTED deterministically from doc_id
    (same device as corpus_snapshot_diff: the oracle re-derives the
    augmented text in SQL, so the redaction kernel is verified end to end
    on non-vacuous input — at sf0.001 ~1/3 of docs gain an email, 1/5 a
    phone, 1/7 a dotted quad). Pure map: one vectorized count + replace
    pass per pattern, nothing shuffles."""

    def inject_and_redact(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        id_s = ids.astype("U")
        email = np.where(
            ids % 3 == 0,
            np.char.add(np.char.add(" contact user", id_s), "@example.com"),
            "",
        )
        phone = np.where(
            ids % 5 == 0,
            np.char.add(
                " call 415-555-", np.char.zfill((ids % 10000).astype("U"), 4)
            ),
            "",
        )
        ip = np.where(
            ids % 7 == 0,
            np.char.add(
                np.char.add(
                    np.char.add(" from 192.168.", (ids % 256).astype("U")), "."
                ),
                ((ids // 256) % 256).astype("U"),
            ),
            "",
        )
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        aug = pc.binary_join_element_wise(
            text, pa.array(email), pa.array(phone), pa.array(ip), ""
        )
        return norm_ops.pii_redact_batch(
            pa.table({"doc_id": batch["doc_id"], "text": aug})
        )

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        inject_and_redact, batch_format="pyarrow"
    )


def fingerprint_docs(sf_dir: str):
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        ts_ops.fingerprint_batch, batch_format="pyarrow"
    )


def lang_normalize_counts(sf_dir: str) -> pa.Table:
    """M7 dictionary-replace on the lang column + facet count."""
    ds = _documents(sf_dir, ["doc_id", "lang"])

    def norm(batch: pa.Table) -> pa.Table:
        ln = norm_ops.dict_replace(
            batch["lang"].combine_chunks()
            if isinstance(batch["lang"], pa.ChunkedArray)
            else batch["lang"],
            LANG_NORMALIZE,
        )
        return pa.table({"lang_norm": ln})

    from ray.data.aggregate import Count

    out = ds.map_batches(norm, batch_format="pyarrow").groupby("lang_norm").aggregate(
        Count(alias_name="n")
    )
    df = out.to_pandas()
    return pa.table(
        {
            "lang_norm": pa.array(df["lang_norm"], pa.string()),
            "n": pa.array(df["n"], pa.int64()),
        }
    )


def facet_counts_docs(sf_dir: str) -> pa.Table:
    """Facet counts over lang and source (reference G4 FacetComponent,
    solrconfig.xml:1104)."""
    from ray.data.aggregate import Count

    out = []
    for field in ("lang", "source"):
        ds = _documents(sf_dir, [field])
        agg = ds.groupby(field).aggregate(Count(alias_name="n")).to_pandas()
        for _, row in agg.iterrows():
            out.append((field, str(row[field]), int(row["n"])))
    out.sort()
    return pa.table(
        {
            "field": pa.array([o[0] for o in out], pa.string()),
            "value": pa.array([o[1] for o in out], pa.string()),
            "n": pa.array([o[2] for o in out], pa.int64()),
        }
    )


def range_facet_counts(sf_dir: str) -> pa.Table:
    """Solr facet.range analog (facet.range=n_chars&facet.range.gap=100)
    over the docs matching FACET_PIVOT_TERM: count per [lo, lo+100) bucket
    of n_chars. One streaming pass of per-batch (bucket -> partial count)
    before a tiny groupby Sum — the numeric-histogram twin of the field
    facets (reference G4 FacetComponent, solrconfig.xml:1104)."""
    from ray.data.aggregate import Sum

    ds = _documents(sf_dir, ["doc_id", "text", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        tf = _qterm_tf(tb, [FACET_PIVOT_TERM], len(batch))[0]
        nc = np.asarray(batch["n_chars"], dtype=np.int64)[tf > 0]
        if nc.size == 0:
            return pa.table(
                {"bucket_lo": pa.array([], pa.int64()),
                 "n_p": pa.array([], pa.int64())}
            )
        b, c = np.unique(nc // 100 * 100, return_counts=True)
        return pa.table(
            {"bucket_lo": pa.array(b), "n_p": pa.array(c.astype(np.int64))}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket_lo")
        .aggregate(Sum("n_p", alias_name="n"))
        .take_all()
    )
    rows = sorted((int(r["bucket_lo"]), int(r["n"])) for r in agg)
    return pa.table(
        {
            "bucket_lo": pa.array([r[0] for r in rows], pa.int64()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def vocab_stats_by_lang(sf_dir: str) -> pa.Table:
    """Per-language vocabulary statistics: exact distinct-term count and
    total token count (the JSON-facet `unique(field)` analog and the
    Heaps-law corpus profile). Stage 1 emits per-batch distinct
    (lang, term) pairs with partial token counts; stage 2 is the
    vocabulary-sized (lang, term) groupby Sum; stage 3 folds that to one
    row per lang (rows-per-lang count is exact because stage 2 leaves
    each pair exactly once). The driver only ever sees #langs rows."""
    from ray.data.aggregate import Sum

    ds = _documents(sf_dir, ["doc_id", "text", "lang"])
    empty = pa.table(
        {
            "lang": pa.array([], pa.string()),
            "term": pa.array([], pa.string()),
            "cf_p": pa.array([], pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        if tb.terms.size == 0:
            return empty
        langs = np.asarray(batch["lang"].to_pylist(), dtype="U")
        lang_u, lang_inv = np.unique(langs, return_inverse=True)
        term_u, term_inv = np.unique(tb.terms.astype("U"), return_inverse=True)
        key = lang_inv[tb.doc_idx] * np.int64(term_u.size) + term_inv
        ukey, cf = np.unique(key, return_counts=True)
        return pa.table(
            {
                "lang": pa.array(
                    lang_u[ukey // term_u.size].astype("U"), pa.string()
                ),
                "term": pa.array(
                    term_u[ukey % term_u.size].astype("U"), pa.string()
                ),
                "cf_p": pa.array(cf.astype(np.int64)),
            }
        )

    pairs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(Sum("cf_p", alias_name="cf"))
    )

    def fold(batch: pa.Table) -> pa.Table:
        langs = np.asarray(batch["lang"].to_pylist(), dtype="U")
        cf = np.asarray(batch["cf"], dtype=np.int64)
        lang_u, lang_inv = np.unique(langs, return_inverse=True)
        return pa.table(
            {
                "lang": pa.array(lang_u.astype("U"), pa.string()),
                "t_p": pa.array(np.bincount(lang_inv).astype(np.int64)),
                "n_p": pa.array(
                    np.bincount(lang_inv, weights=cf).astype(np.int64)
                ),
            }
        )

    agg = (
        pairs.map_batches(fold, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("t_p", alias_name="n_distinct_terms"),
            Sum("n_p", alias_name="n_tokens"),
        )
        .take_all()
    )
    rows = sorted(
        (str(r["lang"]), int(r["n_distinct_terms"]), int(r["n_tokens"]))
        for r in agg
    )
    return pa.table(
        {
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "n_distinct_terms": pa.array([r[1] for r in rows], pa.int64()),
            "n_tokens": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def path_prefix_counts(sf_dir: str) -> pa.Table:
    """Hierarchy-facet counts through the text_path chain
    (PathHierarchyTokenizer analog, schema.xml text_path): each doc's
    synthetic path source/lang/doc_id emits all its prefixes; docs are
    counted per prefix. Per-batch partial aggregation (prefix -> count)
    before the small groupby-sum; top-100 by (n desc, prefix asc).
    Oracle: UNION ALL of the three prefix levels in SQL."""
    from ray.data.aggregate import Sum

    from .tokenize import tokenize_batch

    ds = _documents(sf_dir, ["doc_id", "lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        paths = [
            f"{s}/{l}/{d}"
            for s, l, d in zip(
                batch["source"].to_pylist(),
                batch["lang"].to_pylist(),
                batch["doc_id"].to_pylist(),
            )
        ]
        tb = tokenize_batch(paths, profile="text_path")
        t = pa.table({"prefix": pa.array(tb.terms.astype("U"), pa.string())})
        g = pa.TableGroupBy(t, "prefix").aggregate([([], "count_all")])
        return g.rename_columns(["prefix", "n_p"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("prefix")
        .aggregate(Sum("n_p", alias_name="n"))
    ).to_pandas()
    agg = agg.sort_values(["n", "prefix"], ascending=[False, True]).head(100)
    return pa.table(
        {
            "prefix": pa.array(agg["prefix"], pa.string()),
            "n": pa.array(agg["n"].astype("int64"), pa.int64()),
        }
    )


def facet_drilldown_docs(sf_dir: str) -> pa.Table:
    """Facet drill-down (clicking a facet value adds an fq,
    ResultWidget.js:11-38): source-facet counts restricted to
    lang IN FILTER_LANGS. Partial per-batch aggregation, SQL-checked."""
    from ray.data.aggregate import Sum

    ds = _documents(sf_dir, ["lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        sel = batch.filter(
            pc.is_in(batch["lang"], value_set=pa.array(FILTER_LANGS))
        )
        g = pa.TableGroupBy(sel.select(["source"]), "source").aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["source", "n_p"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_p", alias_name="n"))
    )
    df = agg.to_pandas()
    return pa.table(
        {
            "source": pa.array(df["source"], pa.string()),
            "n": pa.array(df["n"].astype(np.int64)),
        }
    )


def srclc_sort_top100(sf_dir: str) -> pa.Table:
    """M12 lowercase sort key + O2 field sort + O3 pagination window.

    Top-100 by (srclc, doc_id) WITHOUT a global sort: per-batch partial
    top-100 + a tiny driver merge — a top-k over 100 TB needs no all-to-all
    shuffle (each block's local top-100 provably contains every global
    top-100 row present in that block)."""
    ds = _documents(sf_dir, ["doc_id", "text"])

    def partial_top(batch: pa.Table) -> pa.Table:
        srclc = norm_ops.lowercase_sort_key(
            batch["text"].combine_chunks()
            if isinstance(batch["text"], pa.ChunkedArray)
            else batch["text"]
        )
        keys = srclc.to_numpy(zero_copy_only=False)
        ids = np.asarray(batch["doc_id"])
        order = np.lexsort((ids, keys))[:100]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "srclc": pa.array(keys[order].astype("U"), pa.string()),
            }
        )

    parts = ds.map_batches(partial_top, batch_format="pyarrow").take_all()
    ids = np.array([r["doc_id"] for r in parts], dtype=np.int64)
    keys = np.array([r["srclc"] for r in parts], dtype=object)
    order = np.lexsort((ids, keys))[:100]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], pa.int64()),
            "srclc": pa.array(keys[order].astype("U"), pa.string()),
        }
    ).to_pandas()


MIN_TOKENS, MIN_CHARS = 5, 20  # curation thresholds (integer-exact)


def curated_docs(sf_dir: str) -> pa.Table:
    """End-to-end training-data curation (the composition a 100 TB corpus
    pipeline actually runs): quality filter (integer thresholds) ->
    near-duplicate removal at Jaccard >= 0.9 (which subsumes exact dedup:
    an exact pair has J = 1, and the kept side is the lower doc_id) ->
    surviving (doc_id, n_tokens). Every stage distributed: the near-dup
    pair set flows into ONE partitioned left-anti hash_join (keyed doc_id
    vs doc_b) — it never touches the driver, which matters because on a
    dup-heavy crawl the pair set is corpus-scale (quadratic in cluster
    sizes by the data's own semantics). DuckDB-oracled end to end."""
    from .joins import hash_join
    ds = _documents(sf_dir, ["doc_id", "text"])

    def quality_filter(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        n_chars = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False)
        keep = (tb.doc_len >= MIN_TOKENS) & (n_chars >= MIN_CHARS)
        out = batch.filter(pa.array(keep))
        return out.append_column(
            "n_tokens", pa.array(tb.doc_len[keep].astype(np.int64))
        )

    q_ds = ds.map_batches(quality_filter, batch_format="pyarrow")
    pairs = dedup_ops.jaccard_pairs(q_ds, tau_num=9, tau_den=10)

    def slim(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "n_tokens"])

    kept = hash_join(
        q_ds.map_batches(slim, batch_format="pyarrow"),
        pairs,
        "doc_id",
        "doc_b",
        how="left anti",
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("n_tokens", pa.int64())]
        ),
        right_schema=pa.schema(
            [
                ("doc_a", pa.int64()),
                ("doc_b", pa.int64()),
                ("inter", pa.int64()),
                ("union_", pa.int64()),
            ]
        ),
    )
    out = kept.to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"].to_numpy(dtype=np.int64)),
            "n_tokens": pa.array(out["n_tokens"].to_numpy(dtype=np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# events: tumbling-window aggregate (SURVEY.md §2.10 streaming analog)
# ---------------------------------------------------------------------------
def tumbling_window_events(sf_dir: str) -> pa.Table:
    """5-minute tumbling windows per event_type: count + value sum (integer
    cents). Partial aggregation per batch, then a small groupby."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type", "value"]
    )
    win_us = 300 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64())
        win = pc.divide(us, win_us)  # integer division; ts >= epoch so exact
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "window_id": win,
                "value": batch["value"],
            }
        )
        # Arrow-native partial aggregate: no per-batch pandas conversion
        g = pa.TableGroupBy(t, ["event_type", "window_id"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return g.rename_columns(["event_type", "window_id", "n_p", "v_p"])

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_id"])
        .aggregate(Sum("n_p", alias_name="n"), Sum("v_p", alias_name="v"))
    )
    df = agg.to_pandas()
    return pa.table(
        {
            "event_type": pa.array(df["event_type"], pa.string()),
            "window_id": pa.array(df["window_id"], pa.int64()),
            "n": pa.array(df["n"].astype(np.int64)),
            "value_cents": pa.array(
                np.round(df["v"].to_numpy() * 100).astype(np.int64)
            ),
        }
    )


# ---------------------------------------------------------------------------
# broadcast join (J1 analog) + aggregation over TPC-H-ish tables
# ---------------------------------------------------------------------------
def supplier_nation_agg(sf_dir: str) -> pa.Table:
    """supplier x nation x region via broadcast small sides (reference J1
    product-enrichment lookup), then grouped aggregate (integer cents)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    r_name = dict(
        zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist())
    )
    n_map = {
        k: (n, r_name[r])
        for k, n, r in zip(
            nation["n_nationkey"].to_pylist(),
            nation["n_name"].to_pylist(),
            nation["n_regionkey"].to_pylist(),
        )
    }
    n_ref = ray.put(n_map)

    class Enrich:
        def __init__(self, ref):
            # dense key -> (name, region) lookup arrays built ONCE per actor
            m = ray.get(ref)
            cap = max(m) + 1
            self.names = np.empty(cap, dtype=object)
            self.regions = np.empty(cap, dtype=object)
            for k, (n, r) in m.items():
                self.names[k] = n
                self.regions[k] = r

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = np.asarray(batch["s_nationkey"])
            t = pa.table(
                {
                    "n_name": pa.array(self.names[keys].astype("U"), pa.string()),
                    "r_name": pa.array(self.regions[keys].astype("U"), pa.string()),
                    "acctbal": batch["s_acctbal"],
                }
            )
            g = pa.TableGroupBy(t, ["n_name", "r_name"]).aggregate(
                [("acctbal", "count"), ("acctbal", "sum")]
            )
            return g.rename_columns(["n_name", "r_name", "n_p", "v_p"])

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_nationkey", "s_acctbal"]
    )
    agg = (
        ds.map_batches(
            Enrich, fn_constructor_args=(n_ref,), batch_format="pyarrow",
            concurrency=2, num_cpus=1
        )
        .groupby(["n_name", "r_name"])
        .aggregate(Sum("n_p", alias_name="n_suppliers"), Sum("v_p", alias_name="v"))
    )
    df = agg.to_pandas()
    return pa.table(
        {
            "n_name": pa.array(df["n_name"], pa.string()),
            "r_name": pa.array(df["r_name"], pa.string()),
            "n_suppliers": pa.array(df["n_suppliers"].astype(np.int64)),
            "acctbal_cents": pa.array(
                np.round(df["v"].to_numpy() * 100).astype(np.int64)
            ),
        }
    )


def order_lineitem_join_agg(sf_dir: str) -> pa.Table:
    """Large x large partitioned hash join (lineitem x orders on orderkey —
    both sides too big to broadcast at scale) followed by a grouped
    aggregate. Demonstrates the explicit bucketed-join pattern
    (nexlt_ray.joins.hash_join); integer-exact outputs."""
    import ray.data

    from .joins import hash_join

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    )
    joined = hash_join(li, orders, "l_orderkey", "o_orderkey", num_buckets=16)

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            batch.select(["o_orderpriority", "l_quantity"]), "o_orderpriority"
        ).aggregate([("l_quantity", "count"), ("l_quantity", "sum")])
        return g.rename_columns(["o_orderpriority", "n_p", "q_p"])

    from ray.data.aggregate import Sum

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_p", alias_name="n_items"), Sum("q_p", alias_name="q"))
    )
    df = agg.to_pandas()
    return pa.table(
        {
            "o_orderpriority": pa.array(df["o_orderpriority"], pa.string()),
            "n_items": pa.array(df["n_items"].astype(np.int64)),
            "qty_cents": pa.array(np.round(df["q"].to_numpy() * 100).astype(np.int64)),
        }
    )


PCTS = (0.5, 0.9, 0.99)


def value_percentiles_by_type(sf_dir: str) -> pa.Table:
    """EXACT distributed percentiles per event_type (p50/p90/p99 of integer
    cents) via the bounded-domain histogram trick: every batch emits a
    partial (event_type, cents)->count histogram, the groupby sums counts,
    and the percentile is read off the cumulative histogram — a constant
    per-key payload regardless of corpus size (the exact-sketch analog of
    t-digest for bounded integer domains). quantile_disc semantics: value at
    index floor((n-1)*q) of the sorted multiset (matches DuckDB)."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.round(np.asarray(batch["value"]) * 100).astype(np.int64)
        t = pa.table(
            {"event_type": batch["event_type"], "cents": pa.array(cents)}
        )
        g = pa.TableGroupBy(t, ["event_type", "cents"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "cents", "n_p"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("n_p", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("cents")
        counts = g["n"].to_numpy(dtype=np.int64)
        vals = g["cents"].to_numpy(dtype=np.int64)
        cum = np.cumsum(counts)
        total = int(cum[-1])
        for q in PCTS:
            pct = int(round(q * 100))
            # quantile_disc position = ceil(n*q) - 1, computed in integer
            # arithmetic (float ceil would overshoot on exact boundaries)
            idx = -((-pct * total) // 100) - 1
            v = vals[int(np.searchsorted(cum, idx + 1))]
            rows.append((str(et), pct, int(v)))
    rows.sort()
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "pct": pa.array([r[1] for r in rows], pa.int64()),
            "cents": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


HOP_US = 60 * 1_000_000              # hop: 1 minute
HOP_WIN_US = 5 * 60 * 1_000_000      # window width: 5 minutes


def hopping_window_events(sf_dir: str) -> pa.Table:
    """Hopping (sliding) window aggregate: 5-minute windows advancing every
    minute, count + integer-cent sum per (event_type, window). Each event
    belongs to width/hop = 5 windows — replicated per batch (constant
    factor), partial-aggregated before the small groupby; the hopping
    variant of tumbling_window_events."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type", "value"]
    )
    k = HOP_WIN_US // HOP_US  # windows per event

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        n = us.size
        last_win = us // HOP_US  # last hop index whose window contains ts
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        off = np.tile(np.arange(k, dtype=np.int64), n)
        win = last_win[idx] - off
        keep = win >= 0  # clip pre-epoch windows
        t = pa.table(
            {
                "event_type": batch["event_type"].take(pa.array(idx[keep])),
                "window_id": pa.array(win[keep]),
                "value": batch["value"].take(pa.array(idx[keep])),
            }
        )
        g = pa.TableGroupBy(t, ["event_type", "window_id"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return g.rename_columns(["event_type", "window_id", "n_p", "v_p"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_id"])
        .aggregate(Sum("n_p", alias_name="n"), Sum("v_p", alias_name="v"))
    )
    df = agg.to_pandas()
    return pa.table(
        {
            "event_type": pa.array(df["event_type"], pa.string()),
            "window_id": pa.array(df["window_id"].astype(np.int64)),
            "n": pa.array(df["n"].astype(np.int64)),
            "value_cents": pa.array(
                np.round(df["v"].to_numpy() * 100).astype(np.int64)
            ),
        }
    )


TOPK_PER_USER = 3


def top_purchases_per_user(sf_dir: str) -> pa.Table:
    """Grouped top-k: each user's 3 highest-value purchases (value desc,
    event_id asc tie-break) — per-batch partial top-k per group BEFORE the
    groupby (the combiner discipline: a group's global top-3 is contained
    in the union of its per-batch top-3s). Integer-cent values."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type", "value"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["event_type"], "purchase"))
        if b.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "event_id": pa.array([], pa.int64()),
                 "value_cents": pa.array([], pa.int64())}
            )
        uid = np.asarray(b["user_id"])
        eid = np.asarray(b["event_id"])
        cents = np.round(np.asarray(b["value"]) * 100).astype(np.int64)
        order = np.lexsort((eid, -cents, uid))  # group, value desc, id asc
        u_s, e_s, c_s = uid[order], eid[order], cents[order]
        first = np.concatenate(([True], u_s[1:] != u_s[:-1]))
        starts = np.flatnonzero(first)
        sizes = np.diff(np.concatenate((starts, [u_s.size])))
        rank = np.arange(u_s.size) - np.repeat(starts, sizes)
        keep = rank < TOPK_PER_USER
        return pa.table(
            {
                "user_id": pa.array(u_s[keep], pa.int64()),
                "event_id": pa.array(e_s[keep], pa.int64()),
                "value_cents": pa.array(c_s[keep], pa.int64()),
            }
        )

    def final(g: pa.Table) -> pa.Table:
        eid = np.asarray(g["event_id"])
        cents = np.asarray(g["value_cents"])
        order = np.lexsort((eid, -cents))[:TOPK_PER_USER]
        return pa.table(
            {
                "user_id": g["user_id"].take(pa.array(order)),
                "event_id": pa.array(eid[order], pa.int64()),
                "value_cents": pa.array(cents[order], pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(final, batch_format="pyarrow")
        .to_pandas()
    )
    out = out.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    return pa.table(
        {
            "user_id": pa.array(out["user_id"].to_numpy(dtype=np.int64)),
            "event_id": pa.array(out["event_id"].to_numpy(dtype=np.int64)),
            "value_cents": pa.array(out["value_cents"].to_numpy(dtype=np.int64)),
        }
    )


RANGE_WINDOW_US = 10 * 60 * 1_000_000  # ±10-minute proximity window


def purchase_near_error(sf_dir: str) -> pa.Table:
    """Banded range join over the events stream: every (purchase, error)
    pair for the same user within ±10 minutes. One co-partitioning shuffle
    with constant 3x banding replication; integer-exact signed gap.
    Oracle: DuckDB inequality join."""
    import ray.data

    from .joins import range_join

    ev = os.path.join(sf_dir, "events.parquet")
    cols = ["event_id", "ts", "user_id", "event_type"]

    def only(kind):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["event_type"], kind)).drop_columns(
                ["event_type"]
            )
        return f

    left = ray.data.read_parquet(ev, columns=cols).map_batches(
        only("purchase"), batch_format="pyarrow"
    )
    right = ray.data.read_parquet(ev, columns=cols).map_batches(
        only("error"), batch_format="pyarrow"
    )
    j = range_join(left, right, by="user_id", on="ts",
                   window=RANGE_WINDOW_US, num_buckets=8)

    def finish(b: pa.Table) -> pa.Table:
        # gap arithmetic stays in the pipeline (map_batches) — the driver
        # holds only the returned projection
        dt = pc.subtract(
            pc.cast(b["ts"], pa.int64()), pc.cast(b["r_ts"], pa.int64())
        )
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "error_event_id": pc.cast(b["r_event_id"], pa.int64()),
                "dt_us": pc.cast(dt, pa.int64()),
            }
        )

    df = j.map_batches(finish, batch_format="pyarrow").to_pandas()
    if len(df) == 0:
        return pa.table(
            {"event_id": pa.array([], pa.int64()),
             "error_event_id": pa.array([], pa.int64()),
             "dt_us": pa.array([], pa.int64())}
        )
    return pa.Table.from_pandas(df, preserve_index=False).sort_by(
        [("event_id", "ascending"), ("error_event_id", "ascending")]
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap
SESSION_CHUNK_US = 4 * 60 * 60 * 1_000_000  # pre-sessionization time chunk


def _chunk_sessionize(g: pa.Table, gap_us: int, chunk_us: int) -> pa.Table:
    """Phase 1: sessionize events WITHIN each (user, time-chunk) run,
    fully vectorized over however many keys share the group. Emits partial
    sessions (user_id, start_us, end_us, n_events)."""
    t = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    uid = np.asarray(g["user_id"], dtype=np.int64)
    chunk = t // chunk_us
    order = np.lexsort((t, chunk, uid))
    u, c, ts_ = uid[order], chunk[order], t[order]
    new_run = np.concatenate(
        ([True], (u[1:] != u[:-1]) | (c[1:] != c[:-1]))
    )
    new_sess = new_run | np.concatenate(([True], np.diff(ts_) > gap_us))
    sid = np.cumsum(new_sess) - 1
    n_events = np.bincount(sid)
    last = np.concatenate((new_sess[1:], [True]))
    return pa.table(
        {
            "user_id": pa.array(u[new_sess], pa.int64()),
            "start_us": pa.array(ts_[new_sess], pa.int64()),
            "end_us": pa.array(ts_[last], pa.int64()),
            "n_events": pa.array(n_events.astype(np.int64)),
        }
    )


def _merge_boundary_sessions(g: pa.Table, gap_us: int) -> pa.Table:
    """Phase 2: merge chunk-boundary-adjacent partial sessions per user —
    vectorized over all users in the group. Partial sessions of one user
    are time-disjoint (chunks partition time), so consecutive sessions in
    (user, start) order merge exactly when the inter-event gap across the
    boundary (next.start - prev.end) is within the session gap; chained
    merges collapse via one cumsum."""
    u = np.asarray(g["user_id"], dtype=np.int64)
    s = np.asarray(g["start_us"], dtype=np.int64)
    e = np.asarray(g["end_us"], dtype=np.int64)
    n = np.asarray(g["n_events"], dtype=np.int64)
    order = np.lexsort((s, u))
    u, s, e, n = u[order], s[order], e[order], n[order]
    new_user = np.concatenate(([True], u[1:] != u[:-1]))
    new_merged = new_user | np.concatenate(
        ([True], (s[1:] - e[:-1]) > gap_us)
    )
    mid = np.cumsum(new_merged) - 1
    n_events = np.bincount(mid, weights=n).astype(np.int64)
    starts = s[new_merged]
    ends = e[np.concatenate((new_merged[1:], [True]))]
    su = u[new_merged]
    # per-user session ordinal (sessions are user-then-start ordered)
    first = np.concatenate(([True], su[1:] != su[:-1]))
    idx = np.arange(su.size, dtype=np.int64)
    session_id = idx - np.maximum.accumulate(np.where(first, idx, 0))
    return pa.table(
        {
            "user_id": pa.array(su, pa.int64()),
            "session_id": pa.array(session_id, pa.int64()),
            "n_events": pa.array(n_events),
            "duration_us": pa.array((ends - starts).astype(np.int64)),
        }
    )


def sessionize(
    ds,
    gap_us: int = SESSION_GAP_US,
    chunk_us: int = SESSION_CHUNK_US,
    num_buckets: int = 32,
):
    """Gap-based session windows per user (the classic streaming
    sessionization Ray Data lacks natively), skew-safe: phase 1 groups by
    hash(user, time-chunk) — a hot user (bot) is split across time chunks,
    so NO group ever materializes one user's whole event history — and
    sessionizes within chunks vectorized; phase 2 groups the (much smaller)
    partial-session summaries by hash(user) and merges across chunk
    boundaries, one vectorized Python call per bucket, never per user.
    Returns a Dataset of (user_id, session_id, n_events, duration_us)."""

    def add_chunk_bucket(b: pa.Table) -> pa.Table:
        t = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        uid = np.asarray(b["user_id"], dtype=np.int64)
        chunk = t // chunk_us
        bk = (
            (uid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            ^ chunk.astype(np.uint64)
        ) % np.uint64(num_buckets)
        return b.append_column(
            "sess_bucket", pa.array(bk.astype(np.int64), pa.int64())
        )

    def add_user_bucket(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"], dtype=np.int64)
        bk = uid.astype(np.uint64) % np.uint64(num_buckets)
        return b.append_column(
            "user_bucket", pa.array(bk.astype(np.int64), pa.int64())
        )

    def phase1(g: pa.Table) -> pa.Table:
        return _chunk_sessionize(g, gap_us, chunk_us)

    def phase2(g: pa.Table) -> pa.Table:
        return _merge_boundary_sessions(g, gap_us)

    return (
        ds.map_batches(add_chunk_bucket, batch_format="pyarrow")
        .groupby("sess_bucket")
        .map_groups(phase1, batch_format="pyarrow")
        .map_batches(add_user_bucket, batch_format="pyarrow")
        .groupby("user_bucket")
        .map_groups(phase2, batch_format="pyarrow")
    )


def session_windows(sf_dir: str) -> pa.Table:
    """Session windows per user over the events stream; per session: event
    count + duration. Two bounded shuffles (hash by (user, time-chunk),
    then hash by user over session summaries), all integer-exact — see
    sessionize() for the skew guarantee. Oracle: DuckDB lag()/
    cumulative-sum window functions."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
    )
    out = sessionize(ds).to_pandas()
    out = out.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    return pa.table(
        {
            "user_id": pa.array(out["user_id"].to_numpy(dtype=np.int64)),
            "session_id": pa.array(out["session_id"].to_numpy(dtype=np.int64)),
            "n_events": pa.array(out["n_events"].to_numpy(dtype=np.int64)),
            "duration_us": pa.array(out["duration_us"].to_numpy(dtype=np.int64)),
        }
    )


def purchase_asof_signup(sf_dir: str) -> pa.Table:
    """As-of join over the events stream (SURVEY.md custom-operator class):
    each purchase matched to the user's LATEST signup at-or-before its
    timestamp. One co-partitioning shuffle; integer-exact output
    (microsecond gap). DuckDB ASOF JOIN is the oracle."""
    import ray.data

    from .joins import asof_join

    ev = os.path.join(sf_dir, "events.parquet")
    cols = ["event_id", "ts", "user_id", "event_type"]

    def only(kind):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["event_type"], kind)).drop_columns(
                ["event_type"]
            )
        return f

    left = ray.data.read_parquet(ev, columns=cols).map_batches(
        only("purchase"), batch_format="pyarrow"
    )
    right = ray.data.read_parquet(ev, columns=cols).map_batches(
        only("signup"), batch_format="pyarrow"
    )
    j = asof_join(left, right, by="user_id", on="ts", tiebreak="event_id",
                  num_buckets=8)

    def finish(b: pa.Table) -> pa.Table:
        # gap arithmetic stays in the pipeline (map_batches) — the driver
        # holds only the returned projection
        gap = pc.subtract(
            pc.cast(b["ts"], pa.int64()), pc.cast(b["r_ts"], pa.int64())
        )
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "asof_event_id": pc.cast(b["r_event_id"], pa.int64()),
                "gap_us": pc.cast(gap, pa.int64()),
            }
        )

    df = j.map_batches(finish, batch_format="pyarrow").to_pandas()
    if len(df) == 0:
        return pa.table(
            {"event_id": pa.array([], pa.int64()),
             "asof_event_id": pa.array([], pa.int64()),
             "gap_us": pa.array([], pa.int64())}
        )
    return pa.Table.from_pandas(df, preserve_index=False).sort_by("event_id")


BIG_ORDER_THRESHOLD = 400_000


def customers_without_orders(sf_dir: str) -> pa.Table:
    """Anti join via broadcast key set (reference set-difference analog,
    SURVEY.md §2.8): customers with no order above BIG_ORDER_THRESHOLD."""
    import pyarrow.parquet as pq
    import ray.data

    from .joins import broadcast_semi_anti_join

    ot = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )
    okeys = ot.filter(
        pc.greater(ot["o_totalprice"], BIG_ORDER_THRESHOLD)
    )["o_custkey"].to_pylist()
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    out = broadcast_semi_anti_join(cust, "c_custkey", okeys, anti=True).to_pandas()
    if out.empty:  # every customer ordered (small sf) -> empty typed result
        return pa.table(
            {"c_custkey": pa.array([], pa.int64()),
             "c_mktsegment": pa.array([], pa.string())}
        )
    out = out.sort_values("c_custkey").reset_index(drop=True)
    return pa.table(
        {
            "c_custkey": pa.array(out["c_custkey"].astype(np.int64)),
            "c_mktsegment": pa.array(out["c_mktsegment"], pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------
def _query_vectors(sf_dir: str, n: int = 5) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    vid = np.asarray(t["vec_id"])
    sel = np.argsort(vid)[:n]
    mat = np.asarray(t["embedding"].combine_chunks().values, dtype=np.float64).reshape(
        t.num_rows, -1
    )
    return vid[sel], mat[sel]


def embedding_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """Exact cosine top-k (default 10) of every vector against the first 5
    vectors (brute force, float64, ranking key = (round(sim*1e6) desc,
    vec_id))."""
    import ray.data

    qids, qvecs = _query_vectors(sf_dir)
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    out = sim_ops.brute_force_topk(
        ds, qvecs, k=k, concurrency=2, rank_scale=1e6
    ).to_pandas()
    qmap = {i: int(q) for i, q in enumerate(qids)}
    return pa.table(
        {
            "qid": pa.array([qmap[int(q)] for q in out["qid"]], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "sim_e6": pa.array(
                np.round(out["sim"].to_numpy() * 1e6).astype(np.int64)
            ),
        }
    )


def hybrid_rrf_topk(sf_dir: str, k_src: int = 20, k_out: int = 10,
                    rrf_k: int = 60) -> pa.Table:
    """Hybrid retrieval: BM25 lexical top-k_src fused with exact
    embedding-cosine top-k_src by reciprocal-rank fusion (Cormack/Clarke/
    Buettcher, SIGIR'09): rrf(d) = sum over sources of 1/(rrf_k + rank_s(d)),
    absent source contributes 0. Query pairing: DOC_QUERIES index i with
    query vector vec_id i (doc_id == vec_id is the synthetic-corpus
    contract). Output: top-k_out per qid by (rrf_e9 DESC, doc_id) with the
    fused score as round(rrf * 1e9) — both retrieval legs are themselves
    DuckDB-oracled, and the fusion arithmetic (two IEEE double divisions +
    one add) is expression-identical in the SQL oracle, so the hybrid is
    hash-checkable end to end.

    Scale shape: both legs are the existing streaming pipelines; fusion
    touches only the two top-k_src result sets (bounded by queries x k_src),
    never corpus-sized data."""
    import pandas as pd

    bm = _bm25_topk_impl(sf_dir, None, k=k_src)
    em = embedding_topk(sf_dir, k=k_src).to_pandas()
    em = em.rename(columns={"vec_id": "doc_id"})

    def with_rank(df: pd.DataFrame, score_col: str, neg: bool) -> pd.DataFrame:
        s = df[score_col].to_numpy()
        order = np.lexsort((df["doc_id"].to_numpy(), -s if neg else s,
                            df["qid"].to_numpy()))
        df = df.iloc[order].reset_index(drop=True)
        df["r"] = df.groupby("qid").cumcount() + 1
        return df[["qid", "doc_id", "r"]]

    bm_r = with_rank(bm, "score_r", neg=True)
    em_r = with_rank(em, "sim_e6", neg=True)
    f = bm_r.merge(em_r, on=["qid", "doc_id"], how="outer",
                   suffixes=("_bm", "_cos"))
    ra = f["r_bm"].to_numpy(dtype=np.float64)
    rb = f["r_cos"].to_numpy(dtype=np.float64)
    ta = np.where(np.isnan(ra), 0.0, 1.0 / (rrf_k + ra))
    tb = np.where(np.isnan(rb), 0.0, 1.0 / (rrf_k + rb))
    rrf_e9 = np.round((ta + tb) * 1e9).astype(np.int64)
    q = f["qid"].to_numpy(dtype=np.int64)
    d = f["doc_id"].to_numpy(dtype=np.int64)
    keep = []
    for qid in np.unique(q):
        sel = np.flatnonzero(q == qid)
        order = np.lexsort((d[sel], -rrf_e9[sel]))[:k_out]
        keep.append(sel[order])
    keep = np.concatenate(keep)
    return pa.table(
        {
            "qid": pa.array(q[keep], pa.int64()),
            "doc_id": pa.array(d[keep], pa.int64()),
            "rrf_e9": pa.array(rrf_e9[keep], pa.int64()),
        }
    )


def cosine_dup_pairs(sf_dir: str) -> pa.Table:
    """Embedding-cosine near-dup pairs, EXACT: every unordered pair with
    cosine >= 0.45 via blocked all-pairs matmul
    (similarity.exact_cosine_pairs — B*(B+1)/2 chunk-pair tasks over
    object-store chunks, no LSH recall caveat). Oracle: DuckDB self-join
    with list_cosine_similarity on DOUBLE[]. Driver holds only the pair
    result (bounded by the match count)."""
    import ray.data

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    out = sim_ops.exact_cosine_pairs(ds, tau=0.45).to_pandas()
    return pa.table(
        {
            "vec_a": pa.array(out["vec_a"], pa.int64()),
            "vec_b": pa.array(out["vec_b"], pa.int64()),
            "sim_e6": pa.array(np.round(out["sim"].to_numpy() * 1e6).astype(np.int64)),
        }
    )


def ann_ivf_topk(sf_dir: str) -> pa.Table:
    """IVF-quantized ANN variant of embedding_topk (k-means coarse cells,
    n_probe nearest cells scored) — the classic 100 TB path; recall vs brute
    force asserted in tests."""
    import ray.data

    qids, qvecs = _query_vectors(sf_dir)
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    out = sim_ops.ivf_topk(ds, qvecs, k=10, n_centroids=32, n_probe=8,
                           concurrency=2).to_pandas()
    qmap = {i: int(q) for i, q in enumerate(qids)}
    return pa.table(
        {
            "qid": pa.array([qmap[int(q)] for q in out["qid"]], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "sim_e6": pa.array(np.round(out["sim"].to_numpy() * 1e6).astype(np.int64)),
        }
    )


def ann_lsh_topk(sf_dir: str) -> pa.Table:
    """Approximate (LSH-bucketed) variant of embedding_topk — the scale
    path; recall vs brute force asserted in tests, not rank-identity."""
    import ray.data

    qids, qvecs = _query_vectors(sf_dir)
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    out = sim_ops.lsh_topk(ds, qvecs, k=10, nbits=10, multiprobe_bits=1,
                           concurrency=2).to_pandas()
    qmap = {i: int(q) for i, q in enumerate(qids)}
    return pa.table(
        {
            "qid": pa.array([qmap[int(q)] for q in out["qid"]], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "sim_e6": pa.array(np.round(out["sim"].to_numpy() * 1e6).astype(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# the flagship: inverted-index build + WAND search over the code corpus
# ---------------------------------------------------------------------------
def _corpus_index(sf_dir: str) -> str:
    """Build (once, cached) the index for the sf-appropriate synthetic
    corpus; returns index_dir."""
    from .build import BuildConfig, build_index

    n = n_docs_for_sf(sf_dir)
    path = corpus_path(n)
    index_dir = f"/tmp/nexlt_index/n{n}"
    build_index(path, index_dir, BuildConfig())
    return index_dir


def ir_eval_metrics(sf_dir: str) -> pa.Table:
    """Retrieval-quality evaluation harness (the trec_eval / Solr A/B
    tooling every search migration needs): MRR@10, recall@10 and P@10 of
    the SQL-parity BM25 ranking against deterministic qrels (a doc is
    relevant to a query iff it contains EVERY query term — conjunctive
    relevance, recomputable in SQL).

    Shape: the ranking is the bounded top-10 table (already streaming /
    oracled via bm25_topk_docs); relevance sweeps the corpus ONCE with a
    per-batch partial ((qid, n_rel, rank-bitmask-over-top-10)) — each doc
    lives in exactly one batch, so Sum doubles as bitwise-OR for the
    bitmask and the groupby stays one tiny row per qid. Fixed-point
    metrics use floor(x + 0.5) so the DuckDB oracle is expression-
    identical (round() half-away vs numpy banker's rounding never enters).
    DuckDB-oracled end to end (`ir_eval_metrics`)."""
    top = _bm25_topk_impl(sf_dir, None)
    if isinstance(top, pa.Table):
        top = top.to_pandas()
    tdf = top.sort_values(
        ["qid", "score_r", "doc_id"], ascending=[True, False, True]
    )
    tdf["rank"] = tdf.groupby("qid").cumcount() + 1
    top_by_qid = {
        int(qid): (g["doc_id"].to_numpy(np.int64), g["rank"].to_numpy(np.int64))
        for qid, g in tdf.groupby("qid")
    }
    need: dict[int, list[str]] = {}
    for qid, t in doc_query_terms():
        need.setdefault(qid, []).append(t)
    qids = sorted(need)
    ds = _documents(sf_dir, ["doc_id", "text"])

    def rel_partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        n = len(batch)
        doc_ids = np.asarray(batch["doc_id"], dtype=np.int64)
        terms_u = tb.terms.astype("U") if tb.terms.size else None
        out_q, out_n, out_bm = [], [], []
        for qid in qids:
            mask = np.ones(n, dtype=bool)
            for t in need[qid]:
                has = np.zeros(n, dtype=bool)
                if terms_u is not None:
                    has[tb.doc_idx[terms_u == t]] = True
                mask &= has
            rel = doc_ids[mask]
            bm = 0
            tdocs, tranks = top_by_qid.get(qid, (None, None))
            if tdocs is not None and rel.size:
                order = np.argsort(tdocs)
                pos = np.searchsorted(tdocs[order], rel)
                pos = np.clip(pos, 0, tdocs.size - 1)
                hit = tdocs[order][pos] == rel
                for r in tranks[order][pos[hit]]:
                    bm |= 1 << (int(r) - 1)
            out_q.append(qid)
            out_n.append(int(mask.sum()))
            out_bm.append(bm)
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "n_rel": pa.array(out_n, pa.int64()),
                "bitmask": pa.array(out_bm, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(rel_partial, batch_format="pyarrow")
        .groupby("qid")
        .aggregate(Sum("n_rel", alias_name="n_rel"),
                   Sum("bitmask", alias_name="bitmask"))
        .to_pandas()
        .set_index("qid")
    )
    rows = {"qid": [], "num_rel": [], "hits_at_10": [], "mrr_e6": [],
            "recall_e6": [], "p_at_10_e6": []}
    for qid in qids:
        n_rel = int(agg["n_rel"].get(qid, 0))
        bm = int(agg["bitmask"].get(qid, 0))
        hits = bin(bm).count("1")
        first = (bm & -bm).bit_length() if bm else 0
        rows["qid"].append(qid)
        rows["num_rel"].append(n_rel)
        rows["hits_at_10"].append(hits)
        rows["mrr_e6"].append(
            int(np.floor(1_000_000.0 / first + 0.5)) if first else 0
        )
        rows["recall_e6"].append(
            int(np.floor(1_000_000.0 * hits / n_rel + 0.5)) if n_rel else 0
        )
        rows["p_at_10_e6"].append(hits * 100_000)
    return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})


def quality_classifier_docs(sf_dir: str) -> pa.Table:
    """Train the CCNet-style quality classifier (weak labels: lang == 'en',
    the wiki-vs-crawl shape) on the documents table, score every doc, and
    report the per-lang confusion surface (n, n_pred_pos, sum_prob_e6) —
    all-integer outputs, deterministic under any partitioning because
    training uses int64 fixed-point gradient partials and scores round to
    int per doc BEFORE aggregation. Rows-only driver entry: the bit-exact
    training oracle (distributed == single-machine numpy replay, any
    block count) lives in tests/test_classifier.py; sigmoid/exp is not
    reproducible expression-identically in DuckDB."""
    from .classifier import score_logreg, train_logreg

    ds = _documents(sf_dir, ["doc_id", "text", "lang"])

    def with_label(batch: pa.Table) -> pa.Table:
        y = pc.equal(batch["lang"], "en")
        return batch.append_column("label", pc.cast(y, pa.int64()))

    labeled = ds.map_batches(with_label, batch_format="pyarrow")
    w = train_logreg(labeled, dim=1 << 14, iters=30, lr=2.0)
    scored = score_logreg(labeled, w)

    def partial(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch["prob_e6"], dtype=np.int64)
        return pa.table(
            {
                "lang": batch["lang"],
                "n": pa.array(np.ones(len(batch), np.int64)),
                "n_pred_pos": pa.array((p >= 500_000).astype(np.int64)),
                "sum_prob_e6": pa.array(p),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        scored.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_pred_pos", alias_name="n_pred_pos"),
            Sum("sum_prob_e6", alias_name="sum_prob_e6"),
        )
        .to_pandas()
        .sort_values("lang", ignore_index=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def index_selfcheck(sf_dir: str) -> pa.Table:
    """Full integrity check of the flagship corpus index (the Lucene
    CheckIndex analog, nexlt_ray/check.py): structure, decoded-postings
    invariants, block-max metadata, docstore sha identity, manifest totals.
    Rows-only driver entry — the corruption-detection oracle (each injected
    fault class caught) lives in tests/test_check_index.py."""
    from .check import check_index

    idx = _corpus_index(sf_dir)
    rep = check_index(idx)
    if not rep["ok"]:  # surface the first findings instead of a bare flag
        raise AssertionError(f"index integrity: {rep['errors'][:3]}")
    s = rep["stats"]
    return pa.table(
        {
            "ok": pa.array([True]),
            "n_docs": pa.array([s["n_docs"]], pa.int64()),
            "n_terms": pa.array([s["n_terms"]], pa.int64()),
            "n_postings": pa.array([s["n_postings"]], pa.int64()),
            "n_segment_files": pa.array([s["n_segment_files"]], pa.int64()),
        }
    )


def corpus_doc_meta(sf_dir: str) -> pa.Table:
    """Doc-meta table of the built index (FIXTURES.md F4): the per-row
    sha256 invariant surface."""
    import pyarrow.parquet as pq

    idx = _corpus_index(sf_dir)
    import json

    with open(os.path.join(idx, "manifest.json")) as f:
        m = json.load(f)
    t = pq.read_table(
        os.path.join(idx, "docstore"),
        columns=["doc_bucket", "local_rank", "repo", "path", "commit", "lang",
                 "content_sha256", "doc_len", "norm_byte"],
    )
    doc_id = (
        np.asarray(m["doc_offsets"])[np.asarray(t["doc_bucket"])]
        + np.asarray(t["local_rank"])
    )
    t = t.drop_columns(["doc_bucket", "local_rank"]).add_column(
        0, "doc_id", pa.array(doc_id, pa.int64())
    )
    return t.take(pa.array(np.argsort(doc_id)))


def corpus_bm25_topk(sf_dir: str) -> pa.Table:
    """Reference query set, top-10 via block-max WAND over the built index
    (Lucene-exact float32 BM25; scores scaled to int micro-units)."""
    from .query import IndexReader

    idx = _corpus_index(sf_dir)
    r = IndexReader(idx)
    qids, ranks, docs, scores = [], [], [], []
    for q in reference_queries():
        for rank, (d, s) in enumerate(r.search(q["query"], k=q["k"])):
            qids.append(q["qid"])
            ranks.append(rank)
            docs.append(d)
            scores.append(int(round(s * 1e6)))
    return pa.table(
        {
            "qid": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_e6": pa.array(scores, pa.int64()),
        }
    )


CORPUS_FILTER = {"lang": ["python", "c"]}


def corpus_filtered_topk(sf_dir: str) -> pa.Table:
    """Reference query set with an fq (lang filter) composed with WAND
    scoring over the built index — the reference's production query shape
    (q + fq, corpus.cgi:328-339). Rank identity vs filtered exhaustive is
    pinned in tests/test_filters.py."""
    from .query import IndexReader

    idx = _corpus_index(sf_dir)
    r = IndexReader(idx)
    qids, ranks, docs, scores = [], [], [], []
    for q in reference_queries():
        hits = r.search(q["query"], k=q["k"], filters=CORPUS_FILTER)
        for rank, (d, s) in enumerate(hits):
            qids.append(q["qid"])
            ranks.append(rank)
            docs.append(d)
            scores.append(int(round(s * 1e6)))
    return pa.table(
        {
            "qid": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_e6": pa.array(scores, pa.int64()),
        }
    )


def corpus_mlt_topk(sf_dir: str) -> pa.Table:
    """More-like-this over the built index: for the first 5 docs, the top-5
    similar docs (Lucene MLT term selection + BM25/WAND; exactness vs a
    hand-recomputed selection pinned in
    tests/test_query_features.py::test_more_like_this). Rows-only for the
    driver (WAND float32 scoring is not SQL-expressible)."""
    from .query import IndexReader

    idx = _corpus_index(sf_dir)
    r = IndexReader(idx)
    src_docs = [int(d) for d in r._all_docs()[:5]]
    srcs, ranks, docs, scores = [], [], [], []
    for s_id in src_docs:
        for rank, (d, s) in enumerate(r.more_like_this(s_id, k=5)):
            srcs.append(s_id)
            ranks.append(rank)
            docs.append(d)
            scores.append(int(round(s * 1e6)))
    return pa.table(
        {
            "src_doc": pa.array(srcs, pa.int64()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_e6": pa.array(scores, pa.int64()),
        }
    )


class SearchActor:
    """Actor-pool batch fn for distributed query serving: IndexReader loaded
    once per actor (reference T4 Solr-cache analog), batches of queries in,
    top-k rows out.

    `warm_queries` is the Solr firstSearcher QuerySenderListener analog
    (reference solrconfig.xml:671-677 declares one warming query): each
    actor runs them at construction, so its term/postings/norm caches are
    hot before the first real query lands."""

    def __init__(
        self, index_dir: str, k: int = 10,
        warm_queries: list[str] | None = None,
    ):
        from .query import IndexReader

        self.reader = IndexReader(index_dir)
        self.k = k
        for wq in warm_queries or []:
            self.reader.search(wq, k=k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, q in zip(batch["qid"].to_pylist(), batch["query"].to_pylist()):
            for rank, (d, s) in enumerate(self.reader.search(q, k=self.k)):
                qids.append(qid)
                ranks.append(rank)
                docs.append(d)
                scores.append(float(s))
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(docs, pa.int64()),
                "score": pa.array(scores, pa.float32()),
            }
        )


def search_batch(
    index_dir: str, queries: list[dict], k: int = 10, concurrency: int = 4,
    warm_queries: list[str] | None = None,
):
    """Distributed top-k for a batch of queries via an IndexReader actor
    pool. `warm_queries` = firstSearcher warming per actor (SearchActor)."""
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "qid": pa.array([q["qid"] for q in queries], pa.int64()),
                "query": pa.array([q["query"] for q in queries], pa.string()),
            }
        )
    )
    # from_arrow yields ONE block; split it or the whole pool serves from a
    # single actor (Ray schedules one task per block)
    ds = ds.repartition(max(concurrency * 4, 8))
    return ds.map_batches(
        SearchActor,
        fn_constructor_args=(index_dir, k, warm_queries),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# multimodal plumbing (decode stubbed; see multimodal.py)
# ---------------------------------------------------------------------------
def media_features(sf_dir: str):
    import ray.data

    from .multimodal import ImageFeatureExtractor, synthetic_media_table

    # from_arrow yields ONE block; split it or the whole actor pool serves
    # from a single actor (same fix as search_batch)
    ds = ray.data.from_arrow(synthetic_media_table(200)).repartition(8)
    return ds.map_batches(
        ImageFeatureExtractor,
        batch_format="pyarrow",
        batch_size=32,  # small: payloads are large binaries
        concurrency=2,
        num_cpus=1,
    )


def frame_samples(sf_dir: str):
    """Stride-sample frames from REAL Y4M video payloads (stdlib-only
    YUV4MPEG2 decode, multimodal.py): 1->N flat-map actor-pool stage,
    small batch_size because payloads are multi-frame binaries."""
    import ray.data

    from .multimodal import FrameSampler, synthetic_video_table

    ds = ray.data.from_arrow(synthetic_video_table(100)).repartition(8)
    return ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=16, concurrency=2, num_cpus=1
    )


# ---------------------------------------------------------------------------
# round-4 additions: token accounting, rollup aggregation, query elevation,
# cursor deep paging, contamination overlap accounting
# ---------------------------------------------------------------------------
# BPE-ish pre-tokenizer classes (GPT-2-style coarse split: letter runs,
# digit runs, non-alnum-non-space runs). Shared verbatim with the DuckDB
# oracle (both engines are RE2-based, so the class semantics agree).
PRETOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_count_stats(sf_dir: str):
    """Per-doc token accounting (SURVEY training-data ops: token counting —
    whitespace tokens + a BPE-ish regex pre-tokenizer). Pure vectorized
    counting: one `pc.count_substring_regex` pass per counter over the
    zero-copy Arrow batch; the pre-token stream itself is NEVER
    materialized (at 100 TB it would be ~10x the corpus bytes — counters
    keep the stage O(1) memory per doc)."""
    ds = _documents(sf_dir, ["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        text = batch["text"]

        def cnt(pat: str) -> pa.Array:
            return pc.cast(pc.count_substring_regex(text, pat), pa.int64())

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_ws_tokens": cnt(r"\S+"),
                "n_pretokens": cnt(PRETOKEN_PATTERN),
                "n_alpha_runs": cnt("[A-Za-z]+"),
                "n_digit_runs": cnt("[0-9]+"),
                "n_punct_runs": cnt(r"[^A-Za-z0-9\s]+"),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def rollup_counts(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP (lang, source): doc counts + char sums at all three
    levels — (lang, source), (lang), grand total — with 'ALL' as the
    rolled-up sentinel (hash-stable vs SQL NULLs). Classic combiner shape:
    each batch emits partial counts for ALL levels at once (3 rows per
    distinct group per batch, never per doc), then ONE small groupby sums
    partials — the shuffle carries #distinct-groups x 3 rows regardless of
    corpus size."""
    ds = _documents(sf_dir, ["doc_id", "lang", "source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_numpy(zero_copy_only=False),
                "source": batch["source"].to_numpy(zero_copy_only=False),
                "n_chars": np.asarray(batch["n_chars"], dtype=np.int64),
            }
        )
        outs = []
        for keys in ((["lang", "source"]), (["lang"]), ([])):
            if keys:
                g = df.groupby(keys, sort=False).agg(
                    n_p=("n_chars", "size"), chars_p=("n_chars", "sum")
                ).reset_index()
            else:
                g = pd.DataFrame(
                    {"n_p": [len(df)], "chars_p": [int(df["n_chars"].sum())]}
                )
            if "lang" not in g:
                g["lang"] = "ALL"
            if "source" not in g:
                g["source"] = "ALL"
            outs.append(g[["lang", "source", "n_p", "chars_p"]])
        out = pd.concat(outs, ignore_index=True)
        return pa.table(
            {
                "lang": pa.array(out["lang"], pa.string()),
                "source": pa.array(out["source"], pa.string()),
                "n_p": pa.array(out["n_p"].astype(np.int64)),
                "chars_p": pa.array(out["chars_p"].astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n_p", alias_name="n_docs"),
                   Sum("chars_p", alias_name="sum_chars"))
        .to_pandas()
    )
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
            "n_docs": pa.array(out["n_docs"], pa.int64()),
            "sum_chars": pa.array(out["sum_chars"], pa.int64()),
        }
    )


def contamination_overlap_docs(sf_dir: str):
    """Per-doc count of distinct eval 32-grams contained (companion to
    decontaminated_docs; same eval set = 3 lowest-doc_id docs)."""
    import pyarrow.parquet as pqt

    eval_tbl = pqt.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    order = np.argsort(np.asarray(eval_tbl["doc_id"]))[:3]
    eval_texts = [eval_tbl["text"][int(i)].as_py() for i in order]
    return dedup_ops.contamination_overlap_counts(
        _documents(sf_dir, ["doc_id", "text"]), eval_texts, min_len=32
    )


# Query-elevation spec (Solr QueryElevationComponent parity: reference
# declares conf/elevate.xml — query text -> pinned doc ids in editorial
# order + exclude="true" docs; solrconfig.xml:1351 references the QEC
# EditorialMarkerFactory). Keyed by DOC_QUERIES qid; ids exist at every sf
# (doc_id is dense from 0).
ELEVATE_SPEC: dict[int, tuple[tuple[int, ...], tuple[int, ...]]] = {
    0: ((7, 3), (12,)),   # pin 7 then 3, exclude 12
    2: ((42,), ()),       # pin 42
    4: ((5, 1), (9,)),    # pin 5 then 1, exclude 9
}


def elevated_search_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """BM25 top-k with editorial query elevation (Solr QEC semantics,
    forceElevation analog): per query, pinned docs come FIRST in spec
    order — included even when they don't match the query (score_r 0) —
    excluded docs are removed, and the remainder fills to k rows by
    (score desc, doc_id asc). Scoring is the standard two-streaming-pass
    shape (global stats, then per-block partial top-k); pinned docs are
    additionally force-emitted per block (a tiny doc_id `is_in` probe), so
    their exact scores surface even when they sit far outside the block
    top-k. Output (qid, rank, doc_id, score_r)."""
    qterms = doc_query_terms()
    terms = sorted({t for _, t in qterms})
    ds = _documents(sf_dir, ["doc_id", "text"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        n = len(batch)
        cols = {
            "n_p": pa.array([np.int64(n)]),
            "len_p": pa.array([np.int64(tb.doc_len.sum())]),
        }
        dfm = (_qterm_tf(tb, terms, n) > 0).sum(axis=1)
        for ti in range(len(terms)):
            cols[f"df_{ti}"] = pa.array([np.int64(dfm[ti])])
        return pa.table(cols)

    from ray.data.aggregate import Sum

    stats = ds.map_batches(stats_partial, batch_format="pyarrow").aggregate(
        Sum("n_p", alias_name="n_docs"),
        Sum("len_p", alias_name="total_len"),
        *[Sum(f"df_{ti}", alias_name=f"df_{ti}") for ti in range(len(terms))],
    )
    n_docs = stats["n_docs"]
    avgdl = stats["total_len"] / n_docs
    idf = {
        t: float(np.log(1.0 + (n_docs - stats[f"df_{ti}"] + 0.5)
                        / (stats[f"df_{ti}"] + 0.5)))
        for ti, t in enumerate(terms)
    }
    pinned_all = sorted({d for p, _ in ELEVATE_SPEC.values() for d in p})
    max_excl = max((len(x) for _, x in ELEVATE_SPEC.values()), default=0)
    k_blk = k + max_excl  # exclusions can evict at most max_excl of the top

    def score_topk(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        n = len(batch)
        dl = tb.doc_len.astype(np.float64)
        doc_id = np.asarray(batch["doc_id"])
        tfm = _qterm_tf(tb, terms, n).astype(np.float64)
        denom_k = K1 * (1.0 - B + B * dl / avgdl)
        force = np.isin(doc_id, pinned_all)
        out_q, out_d, out_s = [], [], []
        for qid in range(len(DOC_QUERIES)):
            qts = [t for q, t in qterms if q == qid]
            s = np.zeros(n, dtype=np.float64)
            matched = np.zeros(n, dtype=bool)
            for t in qts:
                tf = tfm[terms.index(t)]
                m = tf > 0
                s = s + np.where(m, idf[t] * tf * (K1 + 1.0) / (tf + denom_k), 0.0)
                matched |= m
            emit = matched | force
            sr = np.round(np.where(matched, s, 0.0)[emit], 4)
            d = doc_id[emit]
            fr = force[emit]
            # partial top-k_blk among matched rows, plus every pinned row
            order = np.lexsort((d, -sr))
            keep = order[(np.arange(order.size) < k_blk) | fr[order]]
            out_q.append(np.full(keep.size, qid, dtype=np.int64))
            out_d.append(d[keep])
            out_s.append(sr[keep])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                "doc_id": pa.array(np.concatenate(out_d)),
                "score_r": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    parts = ds.map_batches(score_topk, batch_format="pyarrow").take_all()
    q = np.array([r["qid"] for r in parts], dtype=np.int64)
    d = np.array([r["doc_id"] for r in parts], dtype=np.int64)
    s = np.array([r["score_r"] for r in parts], dtype=np.float64)
    rows_q, rows_r, rows_d, rows_s = [], [], [], []
    for qid in range(len(DOC_QUERIES)):
        pins, excl = ELEVATE_SPEC.get(qid, ((), ()))
        sel = np.flatnonzero(q == qid)
        smap = dict(zip(d[sel].tolist(), s[sel].tolist()))
        rank = 1
        for pid in pins:
            rows_q.append(qid); rows_r.append(rank)
            rows_d.append(pid); rows_s.append(smap.get(pid, 0.0))
            rank += 1
        drop = set(pins) | set(excl)
        rest = sel[~np.isin(d[sel], sorted(drop))] if drop else sel
        order = np.lexsort((d[rest], -s[rest]))[: k - len(pins)]
        for i in rest[order]:
            rows_q.append(qid); rows_r.append(rank)
            rows_d.append(int(d[i])); rows_s.append(float(s[i]))
            rank += 1
    return pa.table(
        {
            "qid": pa.array(rows_q, pa.int64()),
            "rank": pa.array(rows_r, pa.int64()),
            "doc_id": pa.array(rows_d, pa.int64()),
            "score_r": pa.array(rows_s, pa.float64()),
        }
    )


CURSOR_PAGE_SIZE = 20
CURSOR_PAGES = (0, 3, 7, 12)  # the deep pages a cursor walk returns


def cursor_page_docs(sf_dir: str) -> pa.Table:
    """cursorMark-style deep paging (Solr cursor semantics: sort must be a
    total order ending in the uniqueKey; each page is an independent query
    carrying a keyset cursor, NEVER an offset): order by (n_chars asc,
    doc_id asc), page size 20, walking to page 12. Each page fetch is one
    streaming pass — per block, a vectorized keyset mask
    (n_chars, doc_id) > cursor plus a partial 20-smallest, merged exactly
    on the driver (<= 20 rows per block partial). Deep page P costs the
    same as page 0 — the offset-paging O(P*rows) re-sort is exactly what
    cursors exist to avoid. Output (page, rank, doc_id, n_chars)."""
    ds = _documents(sf_dir, ["doc_id", "n_chars"])
    want = set(CURSOR_PAGES)
    cur_c, cur_d = -1, -1  # cursor: last (n_chars, doc_id) served
    rows_p, rows_r, rows_d, rows_c = [], [], [], []
    for page in range(max(CURSOR_PAGES) + 1):
        cc, cd = cur_c, cur_d

        def fetch(batch: pa.Table, cc=cc, cd=cd) -> pa.Table:
            nc = np.asarray(batch["n_chars"], dtype=np.int64)
            di = np.asarray(batch["doc_id"], dtype=np.int64)
            m = (nc > cc) | ((nc == cc) & (di > cd))
            nc, di = nc[m], di[m]
            order = np.lexsort((di, nc))[:CURSOR_PAGE_SIZE]
            return pa.table(
                {"doc_id": pa.array(di[order]), "n_chars": pa.array(nc[order])}
            )

        parts = ds.map_batches(fetch, batch_format="pyarrow").take_all()
        nc = np.array([r["n_chars"] for r in parts], dtype=np.int64)
        di = np.array([r["doc_id"] for r in parts], dtype=np.int64)
        order = np.lexsort((di, nc))[:CURSOR_PAGE_SIZE]
        if order.size == 0:
            break
        cur_c, cur_d = int(nc[order[-1]]), int(di[order[-1]])
        if page in want:
            rows_p.extend([page] * order.size)
            rows_r.extend(range(1, order.size + 1))
            rows_d.extend(di[order].tolist())
            rows_c.extend(nc[order].tolist())
    return pa.table(
        {
            "page": pa.array(rows_p, pa.int64()),
            "rank": pa.array(rows_r, pa.int64()),
            "doc_id": pa.array(rows_d, pa.int64()),
            "n_chars": pa.array(rows_c, pa.int64()),
        }
    )


# Query-side synonym expansion (reference schema.xml:295-307 applies
# SynonymFilter at QUERY time only, from conf/synonyms.txt — both its
# forms: equivalence groups `a,b,c` and explicit mappings `a => b`).
SYNONYM_GROUPS = (("row", "line"), ("agg", "group"), ("sort", "order"))
SYNONYM_MAP = {"quick": ("fast",)}
SYN_QUERIES = ("row table", "agg window", "quick merge", "sort key", "dup spark")


def synonym_expansions() -> list[tuple[int, str]]:
    """(qid, term) clauses of SYN_QUERIES after query-time synonym
    expansion — single source of truth shared with the oracle SQL."""
    cls: dict[str, tuple[str, ...]] = {}
    for g in SYNONYM_GROUPS:
        for t in g:
            cls[t] = tuple(g)
    out = []
    for qid, q in enumerate(SYN_QUERIES):
        seen: set[str] = set()
        for t in tokenize_query(q, profile="simple"):
            for e in cls.get(t) or SYNONYM_MAP.get(t) or (t,):
                if e not in seen:
                    seen.add(e)
                    out.append((qid, e))
    return out


def synonym_match_count(sf_dir: str) -> pa.Table:
    """numFound per synonym-expanded query (OR over the expanded clause
    set): same streaming partial-count shape as match_count_or — per batch
    one int per query, summed by a scalar aggregate."""
    qterms = synonym_expansions()
    terms = sorted({t for _, t in qterms})
    nq = len(SYN_QUERIES)
    ds = _documents(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        n = len(batch)
        hm = _qterm_tf(tb, terms, n) > 0
        cols = {}
        for qid in range(nq):
            any_hit = np.zeros(n, dtype=bool)
            for q, t in qterms:
                if q == qid:
                    any_hit |= hm[terms.index(t)]
            cols[f"q{qid}"] = pa.array(any_hit.sum(keepdims=True).astype(np.int64))
        return pa.table(cols)

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(f"q{qid}", alias_name=f"s{qid}") for qid in range(nq)]
    )
    return pa.table(
        {
            "qid": pa.array(np.arange(nq, dtype=np.int64)),
            "num_found": pa.array(
                [int(agg[f"s{q}"]) for q in range(nq)], pa.int64()
            ),
        }
    )


# Deterministic distributed k-means (clustering for corpus curation /
# semantic dedup; the reference ships a Carrot2 ClusteringComponent config
# under conf/clustering/). Init = embeddings of the K lowest vec_ids;
# KMEANS_ITERS Lloyd steps; ties to the lowest centroid id.
KMEANS_K, KMEANS_ITERS = 8, 2


def _kmeans_fit(sf_dir: str):
    """Returns (dataset, final centroids (K, dim) float64). Scale shape:
    centroids broadcast via ray.put (one object-store copy); each batch
    emits K partial (count, sum-vector) rows — never per-row data — so the
    driver reduces K x num_blocks tiny rows per iteration. No shuffle."""
    import pyarrow.parquet as pqt
    import ray
    import ray.data

    path = os.path.join(sf_dir, "embeddings.parquet")
    ids = pqt.read_table(path, columns=["vec_id"])["vec_id"].to_numpy()
    k_ids = np.sort(np.partition(ids, KMEANS_K - 1)[:KMEANS_K])
    seed = pqt.read_table(
        path, columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", k_ids.tolist())],
    )
    order = np.argsort(np.asarray(seed["vec_id"]))
    cent = np.stack(
        [np.asarray(seed["embedding"][int(i)].as_py(), dtype=np.float64)
         for i in order]
    )

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])

    def assign(V: np.ndarray, c: np.ndarray) -> np.ndarray:
        # squared distance via expansion; argmin takes the FIRST minimum,
        # i.e. ties break to the lowest centroid id (matches the oracle's
        # ORDER BY dist, cid)
        d2 = (
            (V * V).sum(axis=1, keepdims=True)
            - 2.0 * (V @ c.T)
            + (c * c).sum(axis=1)
        )
        return np.argmin(d2, axis=1)

    for _ in range(KMEANS_ITERS):
        ref = ray.put(cent)

        def partial(batch: pa.Table, ref=ref) -> pa.Table:
            import ray as _ray

            c = _ray.get(ref)
            V = np.stack(
                batch["embedding"].to_numpy(zero_copy_only=False)
            ).astype(np.float64)
            a = assign(V, c)
            cnt = np.bincount(a, minlength=KMEANS_K).astype(np.int64)
            sums = np.zeros((KMEANS_K, V.shape[1]), dtype=np.float64)
            np.add.at(sums, a, V)
            return pa.table(
                {
                    "cid": pa.array(np.arange(KMEANS_K, dtype=np.int64)),
                    "cnt": pa.array(cnt),
                    "vsum": pa.array(list(sums)),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
        cnt = np.zeros(KMEANS_K, dtype=np.int64)
        sums = np.zeros_like(cent)
        for r in parts:
            cnt[int(r["cid"])] += int(r["cnt"])
            sums[int(r["cid"])] += np.asarray(r["vsum"], dtype=np.float64)
        nz = cnt > 0
        # empty clusters keep their previous centroid (same convention as
        # the oracle's LEFT JOIN + coalesce)
        cent = np.where(nz[:, None], sums / np.maximum(cnt, 1)[:, None], cent)
    return ds, cent


def kmeans_clusters(sf_dir: str):
    """Per-vector cluster assignment after KMEANS_ITERS deterministic Lloyd
    steps over the embedding column. Output (vec_id, cluster)."""
    import ray

    ds, cent = _kmeans_fit(sf_dir)
    ref = ray.put(cent)

    def final_assign(batch: pa.Table) -> pa.Table:
        import ray as _ray

        c = _ray.get(ref)
        V = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        d2 = (
            (V * V).sum(axis=1, keepdims=True)
            - 2.0 * (V @ c.T)
            + (c * c).sum(axis=1)
        )
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "cluster": pa.array(np.argmin(d2, axis=1).astype(np.int64)),
            }
        )

    return ds.map_batches(final_assign, batch_format="pyarrow")


def cluster_label_purity(sf_dir: str) -> pa.Table:
    """Contingency counts (cluster, label, n_vecs) between the k-means
    assignment and the ground-truth label column — the purity/NMI input
    table for curation QA. The label lookup rides the same batch (no
    join): assignment and contingency count happen in one pass, partial
    counts summed by one tiny groupby."""
    import ray
    import ray.data

    _, cent = _kmeans_fit(sf_dir)
    ref = ray.put(cent)
    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding", "label"])

    def partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        c = _ray.get(ref)
        V = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        d2 = (
            (V * V).sum(axis=1, keepdims=True)
            - 2.0 * (V @ c.T)
            + (c * c).sum(axis=1)
        )
        a = np.argmin(d2, axis=1).astype(np.int64)
        lab = np.asarray(batch["label"], dtype=np.int64)
        key = a * (lab.max(initial=0) + 1) + lab
        uk, cnt = np.unique(key, return_counts=True)
        width = lab.max(initial=0) + 1
        return pa.table(
            {
                "cluster": pa.array(uk // width),
                "label": pa.array(uk % width),
                "n_p": pa.array(cnt.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["cluster", "label"])
        .aggregate(Sum("n_p", alias_name="n_vecs"))
        .to_pandas()
    )
    return pa.table(
        {
            "cluster": pa.array(out["cluster"], pa.int64()),
            "label": pa.array(out["label"], pa.int64()),
            "n_vecs": pa.array(out["n_vecs"], pa.int64()),
        }
    )


def customer_order_counts(sf_dir: str) -> pa.Table:
    """Left OUTER join surface: every customer with its order count and
    total spend in cents — zero-order customers kept with zeros (the SQL
    LEFT JOIN shape the inner/semi/anti family lacked). Orders are
    pre-aggregated per batch (combiner) before the per-custkey groupby, so
    the join's right side is one row per customer with orders; the join
    itself is the partitioned `hash_join(how="left outer")` — one tagged
    shuffle, Arrow-native group kernel, no broadcast of either side."""
    import ray.data

    from ray.data.aggregate import Sum

    from .joins import hash_join

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        ck = np.asarray(batch["o_custkey"], dtype=np.int64)
        cents = np.round(
            np.asarray(batch["o_totalprice"], dtype=np.float64) * 100
        ).astype(np.int64)
        uk, inv = np.unique(ck, return_inverse=True)
        return pa.table(
            {
                "o_custkey": pa.array(uk),
                "n_p": pa.array(np.bincount(inv).astype(np.int64)),
                "cents_p": pa.array(np.bincount(inv, weights=cents).astype(np.int64)),
            }
        )

    per_cust = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("n_p", alias_name="n_orders"),
                   Sum("cents_p", alias_name="total_cents"))
    )
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    out = hash_join(
        cust, per_cust, "c_custkey", "o_custkey", how="left outer",
        # per_cust is an unmaterialized aggregate; skip the schema probe
        # that would execute the orders aggregation once extra
        right_schema=pa.schema(
            [("o_custkey", pa.int64()), ("n_orders", pa.int64()),
             ("total_cents", pa.int64())]
        ),
    ).to_pandas()
    return pa.table(
        {
            "c_custkey": pa.array(out["c_custkey"].astype(np.int64)),
            "c_mktsegment": pa.array(out["c_mktsegment"], pa.string()),
            "n_orders": pa.array(
                out["n_orders"].fillna(0).astype(np.int64)
            ),
            "total_cents": pa.array(
                out["total_cents"].fillna(0).astype(np.int64)
            ),
        }
    )


def audio_features(sf_dir: str):
    """Audio decode + feature extraction over REAL PCM WAV payloads
    (StdlibDecodeBackend: stdlib wave module — no codec library needed)."""
    import ray.data

    from .multimodal import AudioFeatureExtractor, synthetic_audio_table

    ds = ray.data.from_arrow(synthetic_audio_table(200)).repartition(8)
    return ds.map_batches(
        AudioFeatureExtractor,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
        num_cpus=1,
    )


# Deterministic train/val/test split spec (hash-bucket ranges over denom
# 1000; leakage-safe: membership is a pure function of doc_id)
SPLIT_SPEC = {"train": (0, 900), "val": (900, 950), "test": (950, 1000)}


def train_val_split(sf_dir: str):
    """Per-doc split assignment via `sampling.hash_split` — the
    training-pipeline split step (same multiplicative id hash as
    stratified_sample, so splits and samples compose consistently)."""
    return sampling_ops.hash_split(
        _documents(sf_dir, ["doc_id", "lang"]), SPLIT_SPEC
    )


def approx_vocab_by_lang(sf_dir: str, p: int = 12) -> pa.Table:
    """Approximate per-language distinct-term counts via a mergeable
    HyperLogLog sketch (Flajolet et al. 2007) — the production answer to
    vocab_stats_by_lang's exact (lang, term) groupby when the vocabulary
    is 10^8-10^9 terms: the exact plan shuffles the full vocabulary; this
    plan ships one 2^p-byte register array per (lang, batch) and never
    shuffles a term. Per batch: hash terms (same splitmix64 string hash
    the joins use), max-fold into per-lang registers; driver max-merges
    #langs x #blocks tiny rows and estimates. Accuracy ~1.04/sqrt(2^p)
    (1.6% at p=12), verified in tests against the exact operator."""
    from .joins import _string_hashes
    from .textstats import hll_estimate, hll_registers

    ds = _documents(sf_dir, ["doc_id", "text", "lang"])
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch["text"], profile="simple")
        if tb.terms.size == 0:
            return pa.table(
                {"lang": pa.array([], pa.string()),
                 "regs": pa.array([], pa.binary())}
            )
        langs = np.asarray(batch["lang"].to_pylist(), dtype="U")
        h = _string_hashes(pa.array(tb.terms, pa.string()))
        tok_lang = langs[tb.doc_idx]
        lang_u, lang_inv = np.unique(tok_lang, return_inverse=True)
        out_l, out_r = [], []
        for li, lu in enumerate(lang_u):
            out_l.append(str(lu))
            out_r.append(hll_registers(h[lang_inv == li], p=p).tobytes())
        return pa.table(
            {"lang": pa.array(out_l, pa.string()),
             "regs": pa.array(out_r, pa.binary())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged: dict[str, np.ndarray] = {}
    for r in parts:
        regs = np.frombuffer(r["regs"], dtype=np.uint8)
        cur = merged.get(r["lang"])
        merged[r["lang"]] = regs if cur is None else np.maximum(cur, regs)
    langs = sorted(merged)
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "approx_distinct_terms": pa.array(
                [hll_estimate(merged[lg]) for lg in langs], pa.int64()
            ),
        }
    )


# Funnel analysis spec: ordered stages, each step within FUNNEL_WINDOW_US
# of SOME completion of the previous stage (existence semantics — pinned
# identically in the DuckDB oracle's step joins)
FUNNEL_STAGES = ("signup", "view", "purchase")
FUNNEL_WINDOW_US = 6 * 3600 * 1_000_000  # 6 hours


def funnel_counts(sf_dir: str) -> pa.Table:
    """Sequential-pattern (funnel) analysis over events: how many users
    complete each stage prefix signup -> view -> purchase, each step
    within 6 h of some completion of the previous stage. One shuffle
    (hash-partition by user), then a vectorized per-user DP: stage-k
    completion times = stage-k events with ANY stage-(k-1) completion in
    (t - W, t), found by two searchsorteds against the sorted previous-
    stage times — per-user work is O(events log events), never pairwise.
    Output (stage, n_users)."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    def keep_stages(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(
                batch["event_type"], value_set=pa.array(list(FUNNEL_STAGES))
            )
        )

    ds = ds.map_batches(keep_stages, batch_format="pyarrow")

    def user_stage(g: pa.Table) -> pa.Table:
        ts = (
            g["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        et = np.asarray(g["event_type"].to_pylist(), dtype="U16")
        order = np.argsort(ts, kind="stable")
        ts, et = ts[order], et[order]
        prev = np.sort(ts[et == FUNNEL_STAGES[0]])
        depth = 1 if prev.size else 0
        for k, stage in enumerate(FUNNEL_STAGES[1:], start=2):
            if prev.size == 0:
                break
            cand = np.sort(ts[et == stage])
            lo = np.searchsorted(prev, cand - FUNNEL_WINDOW_US, side="left")
            hi = np.searchsorted(prev, cand, side="left")
            prev = cand[hi > lo]
            if prev.size:
                depth = k
        return pa.table(
            {
                "user_id": pa.array([int(g["user_id"][0].as_py())], pa.int64()),
                "depth": pa.array([np.int64(depth)]),
            }
        )

    per_user = ds.groupby("user_id").map_groups(
        user_stage, batch_format="pyarrow"
    )

    def depth_hist(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["depth"], dtype=np.int64)
        counts = [
            np.int64((d >= s).sum()) for s in range(1, len(FUNNEL_STAGES) + 1)
        ]
        return pa.table(
            {f"s{s}": pa.array([c]) for s, c in zip(
                range(1, len(FUNNEL_STAGES) + 1), counts)}
        )

    from ray.data.aggregate import Sum

    agg = per_user.map_batches(depth_hist, batch_format="pyarrow").aggregate(
        *[Sum(f"s{s}", alias_name=f"n{s}")
          for s in range(1, len(FUNNEL_STAGES) + 1)]
    )
    return pa.table(
        {
            "stage": pa.array(
                np.arange(1, len(FUNNEL_STAGES) + 1, dtype=np.int64)
            ),
            "n_users": pa.array(
                [int(agg[f"n{s}"]) for s in range(1, len(FUNNEL_STAGES) + 1)],
                pa.int64(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# training-data chunking, sketch-accelerated top terms, cohort analytics
# ---------------------------------------------------------------------------
def chunked_docs(sf_dir: str):
    """Context-window chunk spans (window=32, stride=24 whitespace tokens)
    over `documents` -- the sliding-window pretraining layout. Pure map, no
    shuffle (see packing.chunk_spans)."""
    from .packing import chunk_spans

    return chunk_spans(_documents(sf_dir, ["doc_id", "text"]), 32, 24)


def heavy_hitters_terms(sf_dir: str) -> pa.Table:
    """Exact top-25 terms by collection frequency via the Misra-Gries
    bounded-width sketch + exact candidate recount (textstats.
    heavy_hitters_exact_topk): every batch ships <= sketch_k summary rows
    instead of one row per distinct term, and the recount pass makes the
    result exact (guarantee asserted). The scale path for term_df_top100's
    regime when the vocabulary itself is shuffle-dominant."""
    from .textstats import heavy_hitters_exact_topk

    return heavy_hitters_exact_topk(
        _documents(sf_dir, ["doc_id", "text"]), k_out=25, sketch_k=256
    )


def _events_week(sf_dir: str, columns):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=columns
    )


WEEK_US = 7 * 86400 * 1_000_000


def retention_cohorts(sf_dir: str) -> pa.Table:
    """Weekly cohort retention matrix over `events`: cohort = epoch-week of
    a user's first event; for every (cohort_week, week_offset) count the
    DISTINCT users from that cohort active that week. The standard
    large-scale product-analytics rollup.

    Scale plan: (1) per-batch partial min-week per user -> groupby min
    (first-touch table, one row per user, stays distributed); (2) per-batch
    DISTINCT (user, week) pairs -> groupby count (global pair dedup);
    (3) the two user-keyed Datasets meet in ONE partitioned hash_join (both
    sides large -- no broadcast of the user dimension); (4) per-batch
    partial counts per (cohort_week, offset) -> tiny final groupby. Every
    shuffle is user- or cell-keyed; nothing is corpus-sized on the driver.
    All-integer output."""
    from .joins import hash_join
    from ray.data.aggregate import Min, Sum

    ds = _events_week(sf_dir, ["ts", "user_id"])

    def week_pairs(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64())
        week = pc.divide(us, WEEK_US)
        t = pa.table({"user_id": batch["user_id"], "week": week})
        g = pa.TableGroupBy(t, ["user_id", "week"]).aggregate([([], "count_all")])
        return g.select(["user_id", "week"])

    pairs = (
        ds.map_batches(week_pairs, batch_format="pyarrow")
        .groupby(["user_id", "week"])
        .count()
        .select_columns(["user_id", "week"])
    )

    def first_partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch, "user_id").aggregate([("week", "min")])
        return g.rename_columns(["user_id", "w_p"])

    first = (
        pairs.map_batches(first_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("w_p", alias_name="cohort_week"))
    )

    # both sides are unmaterialized aggregates; explicit schemas keep the
    # join's probe from executing each aggregation once extra (the `first`
    # probe would run the `pairs` shuffle too — it aggregates over it)
    joined = hash_join(
        pairs, first, "user_id", "user_id",
        left_schema=pa.schema(
            [("user_id", pa.int64()), ("week", pa.int64())]
        ),
        right_schema=pa.schema(
            [("user_id", pa.int64()), ("cohort_week", pa.int64())]
        ),
    )

    def cell_partial(batch: pa.Table) -> pa.Table:
        cw = np.asarray(batch["cohort_week"], dtype=np.int64)
        off = np.asarray(batch["week"], dtype=np.int64) - cw
        t = pa.table(
            {"cohort_week": pa.array(cw), "week_offset": pa.array(off)}
        )
        g = pa.TableGroupBy(t, ["cohort_week", "week_offset"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["cohort_week", "week_offset", "n_p"])

    agg = (
        joined.map_batches(cell_partial, batch_format="pyarrow")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n_p", alias_name="n_users"))
    )
    df = agg.to_pandas()
    return pa.table(
        {
            "cohort_week": pa.array(df["cohort_week"].astype(np.int64)),
            "week_offset": pa.array(df["week_offset"].astype(np.int64)),
            "n_users": pa.array(df["n_users"].astype(np.int64)),
        }
    )


def window_distinct_users(sf_dir: str) -> pa.Table:
    """Distinct users per 1-hour tumbling window -- the windowed
    COUNT(DISTINCT) every streaming engine special-cases. Exact two-phase
    plan: per-batch DISTINCT (window, user) pairs (bounded partial), one
    pair-keyed groupby for global dedup, then per-batch partial counts per
    window + a window-keyed groupby sum. The shuffle carries deduped pairs,
    never raw events; nothing driver-sized until the final per-window rows."""
    from ray.data.aggregate import Sum

    ds = _events_week(sf_dir, ["ts", "user_id"])
    win_us = 3600 * 1_000_000

    def pair_partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64())
        win = pc.divide(us, win_us)
        t = pa.table({"window_id": win, "user_id": batch["user_id"]})
        g = pa.TableGroupBy(t, ["window_id", "user_id"]).aggregate(
            [([], "count_all")]
        )
        return g.select(["window_id", "user_id"])

    def count_partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch, "window_id").aggregate([([], "count_all")])
        return g.rename_columns(["window_id", "n_p"])

    agg = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["window_id", "user_id"])
        .count()
        .select_columns(["window_id", "user_id"])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("window_id")
        .aggregate(Sum("n_p", alias_name="n_users"))
    )
    df = agg.to_pandas()
    return pa.table(
        {
            "window_id": pa.array(df["window_id"].astype(np.int64)),
            "n_users": pa.array(df["n_users"].astype(np.int64)),
        }
    )


TEXTRANK_S0 = 1_000_000  # fixed-point starting score (x 1e6)
TEXTRANK_ITERS = 3


def textrank_keywords(
    sf_dir: str, k_out: int = 20, fast_path_max_edges: int = 2_000_000
) -> pa.Table:
    """Corpus-level TextRank keywords (Mihalcea & Tarau, EMNLP 2004):
    PageRank over the undirected term co-occurrence graph (same +-3-token
    window edges as cooccur_top50), d=0.85, run in INTEGER fixed-point so
    the result is partitioning-invariant and expression-identical in SQL:
    score'(t) = 0.15*S0 + sum over in-edges floor(score(u)*w*85 /
    (100*wdeg(u))) -- int64 floors and order-independent integer sums,
    never float accumulation. Nodes = terms with at least one edge
    (isolated single-token docs contribute no graph mass, standard
    TextRank).

    Scale plan: edge build reuses the partial-count discipline
    (per-batch pair bincount -> one pair groupby); wdeg is a groupby over
    the edge list; each iteration is ONE partitioned hash_join
    (vocabulary-keyed scores onto edges -- the score side is never
    broadcast) + per-batch partial sums + a term groupby. Iteration count
    is fixed (3), so the whole pipeline is a bounded chain of
    vocabulary-sized exchanges regardless of corpus size. Overflow
    headroom: score*w*85 stays < 2^63 while score_mass * max_edge_weight
    < ~1e17; rescale S0 down for pathological single-pair corpora."""
    from .joins import hash_join
    from ray.data.aggregate import Sum

    ds = _documents(sf_dir, ["doc_id", "text"])

    edges_u = (
        ds.map_batches(_cooccur_pair_partial, batch_format="pyarrow")
        .groupby(["t1", "t2"])
        .aggregate(Sum("n_p", alias_name="w"))
        .materialize()
    )

    # small-graph fast path (dup_clusters precedent): the AGGREGATED edge
    # list is vocabulary-sized, not corpus-sized; when it fits comfortably
    # in one task, 3 iterations of Ray joins are pure fixed overhead.
    # Identical integer arithmetic -> identical output on either path.
    if edges_u.count() <= fast_path_max_edges:
        import ray

        blocks = [b for b in ray.get(edges_u.to_arrow_refs()) if b.num_rows]
        if not blocks:
            # a zero-row aggregate has no blocks at all (concat would raise)
            return pa.table({"term": pa.array([], pa.string()),
                             "score": pa.array([], pa.int64())})
        tab = pa.concat_tables(blocks).combine_chunks()
        t1 = tab["t1"].to_numpy(zero_copy_only=False)
        t2 = tab["t2"].to_numpy(zero_copy_only=False)
        w2 = np.concatenate([np.asarray(tab["w"], dtype=np.int64)] * 2)
        nodes, codes = np.unique(np.concatenate([t1, t2]), return_inverse=True)
        src = codes[: len(t1)]
        dst = codes[len(t1):]
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
        n = len(nodes)
        wdeg = np.zeros(n, dtype=np.int64)
        np.add.at(wdeg, src, w2)
        s = np.full(n, TEXTRANK_S0, dtype=np.int64)
        base = 15 * TEXTRANK_S0 // 100
        for _ in range(TEXTRANK_ITERS):
            c = (s[src] * w2 * 85) // (100 * wdeg[src])
            s = np.full(n, base, dtype=np.int64)
            np.add.at(s, dst, c)
        order = np.lexsort((nodes, -s))[:k_out]
        return pa.table(
            {
                "term": pa.array(nodes[order].astype("U"), pa.string()),
                "score": pa.array(s[order], pa.int64()),
            }
        )

    def symmetrize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [batch["t1"].combine_chunks().cast(pa.string()),
                     batch["t2"].combine_chunks().cast(pa.string())]
                ),
                "dst": pa.concat_arrays(
                    [batch["t2"].combine_chunks().cast(pa.string()),
                     batch["t1"].combine_chunks().cast(pa.string())]
                ),
                "w": pa.concat_arrays(
                    [batch["w"].combine_chunks().cast(pa.int64())] * 2
                ),
            }
        )

    directed = edges_u.map_batches(symmetrize, batch_format="pyarrow")

    def deg_partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch, "src").aggregate([("w", "sum")])
        return g.rename_columns(["src", "d_p"])

    deg = (
        directed.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("src")
        .aggregate(Sum("d_p", alias_name="wdeg"))
    )
    # (src, dst, w, wdeg): join once, reuse across iterations. deg is an
    # unmaterialized aggregate — pass its schema so the join's probe does
    # not execute the degree aggregation once extra
    deg_schema = pa.schema([("src", pa.string()), ("wdeg", pa.int64())])
    edges = hash_join(
        directed, deg, "src", "src", right_schema=deg_schema
    ).materialize()

    def init_scores(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "term": batch["src"],
                "score": pa.array(
                    np.full(len(batch), TEXTRANK_S0, dtype=np.int64)
                ),
            }
        )

    scores = deg.map_batches(init_scores, batch_format="pyarrow")

    base = 15 * TEXTRANK_S0 // 100

    def contrib_partial(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["score"], dtype=np.int64)
        w = np.asarray(batch["w"], dtype=np.int64)
        wd = np.asarray(batch["wdeg"], dtype=np.int64)
        c = (s * w * 85) // (100 * wd)
        t = pa.table({"term": batch["dst"], "c_p": pa.array(c)})
        g = pa.TableGroupBy(t, "term").aggregate([("c_p", "sum")])
        return g.rename_columns(["term", "c_p"])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "term": batch["term"],
                "score": pc.add(batch["c"], base),
            }
        )

    # scores is a lazy per-iteration chain: probing its schema would
    # re-execute every prior iteration (quadratic); pass it explicitly
    scores_schema = pa.schema([("term", pa.string()), ("score", pa.int64())])
    for _ in range(TEXTRANK_ITERS):
        joined = hash_join(
            edges, scores, "src", "term", right_schema=scores_schema
        )
        scores = (
            joined.map_batches(contrib_partial, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("c_p", alias_name="c"))
            .map_batches(finish, batch_format="pyarrow")
        )

    def block_top(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["score"], dtype=np.int64)
        t = batch["term"].to_numpy(zero_copy_only=False)
        return batch.take(pa.array(np.lexsort((t, -s))[:k_out]))

    rows = scores.map_batches(block_top, batch_format="pyarrow").take_all()
    s = np.array([r["score"] for r in rows], dtype=np.int64)
    t = np.array([r["term"] for r in rows], dtype=object)
    order = np.lexsort((t, -s))[:k_out]
    return pa.table(
        {
            "term": pa.array(t[order].astype("U"), pa.string()),
            "score": pa.array(s[order], pa.int64()),
        }
    )


DD_ALPHA = 0.01
_DD_ZERO_BUCKET = np.int64(np.iinfo(np.int64).min)


def approx_value_percentiles(sf_dir: str) -> pa.Table:
    """Approximate p50/p90/p99 of events.value per event_type via DDSketch
    (textstats.dd_bucket_counts): relative error <= DD_ALPHA on the value,
    with a BIT-DETERMINISTIC result under any partitioning/merge order
    (the sketch is an exponential-bucket histogram; counts just add).
    The scale companion to value_percentiles_by_type: exact percentiles
    need a bounded integer domain, DDSketch covers unbounded positive
    doubles with a fixed-size shuffle (one row per (type, bucket) per
    batch, ~O(log range / alpha) buckets). Rows-only driver entry; the
    relative-error and merge-invariance guarantees are pytest-oracled."""
    import ray.data
    from ray.data.aggregate import Sum
    from .textstats import dd_bucket_counts, dd_quantile

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        vals = np.asarray(batch["value"], dtype=np.float64)
        types, codes = np.unique(et, return_inverse=True)
        out_t, out_b, out_n = [], [], []
        for ti, t in enumerate(types):
            idx, cnt, n_zero = dd_bucket_counts(vals[codes == ti], DD_ALPHA)
            out_t.append(np.full(len(idx), t, dtype=object))
            out_b.append(idx)
            out_n.append(cnt)
            if n_zero:
                out_t.append(np.array([t], dtype=object))
                out_b.append(np.array([_DD_ZERO_BUCKET]))
                out_n.append(np.array([n_zero], dtype=np.int64))
        if not out_t:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int64()),
                             "n_p": pa.array([], pa.int64())})
        return pa.table(
            {
                "event_type": pa.array(
                    np.concatenate(out_t).astype("U"), pa.string()
                ),
                "bucket": pa.array(np.concatenate(out_b), pa.int64()),
                "n_p": pa.array(np.concatenate(out_n), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .aggregate(Sum("n_p", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for t, grp in agg.groupby("event_type", sort=True):
        b = grp["bucket"].to_numpy()
        n = grp["n"].to_numpy().astype(np.int64)
        zero_mask = b == _DD_ZERO_BUCKET
        n_zero = int(n[zero_mask].sum())
        bi, ni = b[~zero_mask], n[~zero_mask]
        qs = [dd_quantile(bi, ni, n_zero, q, DD_ALPHA) for q in (0.5, 0.9, 0.99)]
        rows.append((t, *[int(round(q * 1e6)) for q in qs]))
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "p50_e6": pa.array([r[1] for r in rows], pa.int64()),
            "p90_e6": pa.array([r[2] for r in rows], pa.int64()),
            "p99_e6": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def parts_without_bulk_orders(sf_dir: str):
    """Parts never ordered in bulk (no lineitem with l_quantity >= 48):
    a PARTITIONED anti join where both sides are large -- the scale
    complement to customers_without_orders' broadcast anti join
    (broadcast dies once the key set outgrows the object store; the
    reference's new-product diff, tr2solr.sh:76, is the same set
    difference). The right side is filtered at the read and ships only
    its key column through the single tagged-union shuffle
    (joins.hash_join how="left anti")."""
    import ray.data
    from .joins import hash_join

    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"]
    )
    bulk = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity"],
    ).map_batches(
        lambda b: b.filter(pc.greater_equal(b["l_quantity"], 48)).select(
            ["l_partkey"]
        ),
        batch_format="pyarrow",
    )
    return hash_join(part, bulk, "p_partkey", "l_partkey", how="left anti")


def length_percentile_docs(sf_dir: str) -> pa.Table:
    """Per-doc token-length percentile rank in basis points:
    pct_bp = (10000 * count_of_strictly_shorter_docs) // (N - 1) -- the
    curriculum-ordering / length-normalization signal. Value-determined
    (all docs with equal n_tokens share a rank), hence partitioning-
    invariant, unlike ntile's arbitrary tie splits. Same two-pass shape as
    length_band_docs: tiny per-value histogram (partial bincount + value
    groupby), broadcast cumulative counts into a pure map. SQL-exact:
    rank() OVER (ORDER BY n_tokens) is 1 + strictly-less count."""
    from ray.data.aggregate import Sum

    ds = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        ts_ops.token_counts_batch, batch_format="pyarrow"
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch["n_tokens"], dtype=np.int64)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {"v": pa.array(uniq), "c_p": pa.array(cnt.astype(np.int64))}
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c_p", alias_name="c"))
        .take_all()
    )
    vs = np.array([r["v"] for r in hist], dtype=np.int64)
    cs = np.array([r["c"] for r in hist], dtype=np.int64)
    order = np.argsort(vs)
    vs, cs = vs[order], cs[order]
    less = np.concatenate([[0], np.cumsum(cs)[:-1]])  # strictly-less counts
    n_total = int(cs.sum())
    denom = max(n_total - 1, 1)

    def rank_map(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch["n_tokens"], dtype=np.int64)
        idx = np.searchsorted(vs, v)
        pct = (10000 * less[idx]) // denom
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(v),
                "pct_bp": pa.array(pct.astype(np.int64)),
            }
        )

    return ds.map_batches(rank_map, batch_format="pyarrow")


# deterministic synthetic "v2" of the corpus for the snapshot-diff op:
# doc_id % 17 == 0 removed, doc_id % 23 == 0 edited, and one added doc
# per removed id (id + 10^9) -- both sides derivable in SQL
_DIFF_RM, _DIFF_ED, _DIFF_ADD_BASE = 17, 23, 1_000_000_000


def corpus_snapshot_diff(sf_dir: str) -> pa.Table:
    """Snapshot diff between corpus v1 and v2 (the CDC / incremental-ingest
    accounting op: which docs were added, removed, or changed between two
    crawls). v2 is derived deterministically from v1 (see _DIFF_* rules) so
    the oracle can re-derive both sides. Plan: ONE full-outer hash_join on
    doc_id comparing content shas -- left-only = removed, right-only =
    added, sha mismatch = changed; unchanged rows are filtered OUT before
    the join ships them... they can't be (membership unknown until the
    join), so instead the join ships (doc_id, sha) pairs ONLY (never text)
    and emits one status row per non-identical doc; the output is
    diff-sized for reporting while the shuffle is id+sha-sized."""
    from .joins import hash_join

    v1 = _documents(sf_dir, ["doc_id", "text"])

    def sha_v1(batch: pa.Table) -> pa.Table:
        import hashlib

        shas = [
            hashlib.sha256(t.encode()).hexdigest()[:16]
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "sha1_": pa.array(shas, pa.string())}
        )

    def sha_v2(batch: pa.Table) -> pa.Table:
        import hashlib

        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        texts = batch["text"].to_pylist()
        out_id, out_sha = [], []
        for i, t in zip(ids.tolist(), texts):
            if i % _DIFF_RM == 0:
                # removed from v2; an added doc takes a fresh id
                out_id.append(i + _DIFF_ADD_BASE)
                out_sha.append(
                    hashlib.sha256(f"added:{i}".encode()).hexdigest()[:16]
                )
                continue
            body = ("edited:" + t) if i % _DIFF_ED == 0 else t
            out_id.append(i)
            out_sha.append(hashlib.sha256(body.encode()).hexdigest()[:16])
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "sha2_": pa.array(out_sha, pa.string()),
            }
        )

    s1 = v1.map_batches(sha_v1, batch_format="pyarrow")
    s2 = v1.map_batches(sha_v2, batch_format="pyarrow")
    joined = hash_join(s1, s2, "doc_id", "doc_id", how="full outer")

    def status(batch: pa.Table) -> pa.Table:
        a = batch["sha1_"].to_numpy(zero_copy_only=False)
        b = batch["sha2_"].to_numpy(zero_copy_only=False)
        st = np.where(
            pd_isna_vec(a), "added",
            np.where(pd_isna_vec(b), "removed",
                     np.where(a == b, "unchanged", "changed")),
        )
        keep = st != "unchanged"
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(pa.array(keep)),
                "status": pa.array(st[keep].astype("U"), pa.string()),
            }
        )

    return joined.map_batches(status, batch_format="pyarrow")


def pd_isna_vec(a: np.ndarray) -> np.ndarray:
    import pandas as pd

    return np.asarray(pd.isna(a), dtype=bool)


PROFILE_COLS = ("event_id", "user_id", "ts_us", "value_cents")


def table_profile_events(sf_dir: str) -> pa.Table:
    """Per-column statistics profile of `events` (the warehouse
    ANALYZE-TABLE / data-profiling op): row count, null count, EXACT
    distinct count, min, max for each numeric-encodable column (ts ->
    epoch micros, value -> cents; all-integer so the DuckDB oracle is
    expression-identical). Two passes: (1) one streaming pass emits a
    single partial row per column per batch (n/nulls/min/max fold in the
    batch); (2) distinct counts use the pair-dedup idiom -- per-batch
    DISTINCT (column, value) pairs, one pair-keyed groupby, per-batch
    partial counts, tiny column groupby. The shuffle carries deduped
    (column, value) pairs; at 100 TB swap the exact pass for the HLL
    registers (textstats) per column when approximate suffices."""
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )

    def encode(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
                "value_cents": pa.array(
                    np.round(
                        np.asarray(batch["value"], dtype=np.float64) * 100
                    ).astype(np.int64)
                ),
            }
        )

    enc = ds.map_batches(encode, batch_format="pyarrow")

    def stat_partial(batch: pa.Table) -> pa.Table:
        rows = {"col": [], "n_p": [], "null_p": [], "min_p": [], "max_p": []}
        for c in PROFILE_COLS:
            col = batch[c]
            valid = col.drop_null()
            rows["col"].append(c)
            rows["n_p"].append(len(col))
            rows["null_p"].append(col.null_count)
            # empty-valid batches keep identity elements
            rows["min_p"].append(
                pc.min(valid).as_py() if len(valid) else np.iinfo(np.int64).max
            )
            rows["max_p"].append(
                pc.max(valid).as_py() if len(valid) else np.iinfo(np.int64).min
            )
        return pa.table(
            {
                "col": pa.array(rows["col"], pa.string()),
                "n_p": pa.array(rows["n_p"], pa.int64()),
                "null_p": pa.array(rows["null_p"], pa.int64()),
                "min_p": pa.array(rows["min_p"], pa.int64()),
                "max_p": pa.array(rows["max_p"], pa.int64()),
            }
        )

    stats = (
        enc.map_batches(stat_partial, batch_format="pyarrow")
        .groupby("col")
        .aggregate(
            Sum("n_p", alias_name="n"),
            Sum("null_p", alias_name="n_null"),
            Min("min_p", alias_name="min_i"),
            Max("max_p", alias_name="max_i"),
        )
        .to_pandas()
        .set_index("col")
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        cols, vals = [], []
        for c in PROFILE_COLS:
            u = pc.unique(batch[c].drop_null())
            cols.append(np.full(len(u), c, dtype=object))
            vals.append(np.asarray(u, dtype=np.int64))
        return pa.table(
            {
                "col": pa.array(np.concatenate(cols).astype("U"), pa.string()),
                "value": pa.array(np.concatenate(vals), pa.int64()),
            }
        )

    def count_partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch, "col").aggregate([([], "count_all")])
        return g.rename_columns(["col", "d_p"])

    distinct = (
        enc.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["col", "value"])
        .count()
        .select_columns(["col", "value"])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("col")
        .aggregate(Sum("d_p", alias_name="n_distinct"))
        .to_pandas()
        .set_index("col")
    )

    cols = sorted(PROFILE_COLS)
    return pa.table(
        {
            "col": pa.array(cols, pa.string()),
            "n": pa.array([int(stats.loc[c, "n"]) for c in cols], pa.int64()),
            "n_null": pa.array(
                [int(stats.loc[c, "n_null"]) for c in cols], pa.int64()
            ),
            "n_distinct": pa.array(
                [int(distinct.loc[c, "n_distinct"]) for c in cols], pa.int64()
            ),
            "min_i": pa.array(
                [int(stats.loc[c, "min_i"]) for c in cols], pa.int64()
            ),
            "max_i": pa.array(
                [int(stats.loc[c, "max_i"]) for c in cols], pa.int64()
            ),
        }
    )


def semdedup_clusters(sf_dir: str) -> pa.Table:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate CLUSTERS over
    the embedding column — exact cosine>=0.45 pair graph (the same
    all-pairs blocked matmul that backs cosine_dup_pairs) resolved into
    connected components (dedup.dup_clusters min-label propagation), so
    transitive chains collapse to one canonical vec per cluster (keep
    cluster_id == vec_id). Composition of two independently-oracled
    operators; the oracle recomputes the closure with a recursive CTE."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    pairs = sim_ops.exact_cosine_pairs(ds, tau=0.45).map_batches(
        lambda b: pa.table(
            {
                "doc_a": b["vec_a"].combine_chunks().cast(pa.int64()),
                "doc_b": b["vec_b"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    out = dedup_ops.dup_clusters(pairs)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas() if not isinstance(out, pa.Table) else out.to_pandas()
    return pa.table(
        {
            "vec_id": pa.array(out["doc_id"].to_numpy().astype(np.int64)),
            "cluster_id": pa.array(
                out["cluster_id"].to_numpy().astype(np.int64)
            ),
        }
    )


def value_decile_histogram(sf_dir: str) -> pa.Table:
    """Equi-depth decile histogram of events.value (integer cents) -- the
    optimizer-statistics companion to table_profile_events. Buckets are
    VALUE-DETERMINED: decile(v) = (10 * count_strictly_less(v)) // N, so
    ties land in one bucket and the result is partitioning-invariant
    (rank() arithmetic in SQL, no implementation-defined ntile splits).
    One streaming pass builds the per-value count histogram (domain-sized
    partials, tiny groupby); the decile rollup is driver arithmetic over
    that histogram, never a second data pass."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["value"]
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = np.round(
            np.asarray(batch["value"], dtype=np.float64) * 100
        ).astype(np.int64)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {"v": pa.array(uniq), "c_p": pa.array(cnt.astype(np.int64))}
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c_p", alias_name="c"))
        .take_all()
    )
    vs = np.array([r["v"] for r in hist], dtype=np.int64)
    cs = np.array([r["c"] for r in hist], dtype=np.int64)
    order = np.argsort(vs)
    vs, cs = vs[order], cs[order]
    n_total = int(cs.sum())
    less = np.concatenate([[0], np.cumsum(cs)[:-1]])
    dec = (10 * less) // n_total
    rows = []
    for d in np.unique(dec):
        m = dec == d
        rows.append((int(d), int(cs[m].sum()), int(vs[m].min()), int(vs[m].max())))
    return pa.table(
        {
            "decile": pa.array([r[0] for r in rows], pa.int64()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "lo_cents": pa.array([r[2] for r in rows], pa.int64()),
            "hi_cents": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def gopher_filter_docs(sf_dir: str):
    """Gopher-style rule filter (Rae et al. 2021, Table A1 shape): per doc,
    keep/drop plus the FIRST failing rule code -- the canonical pretraining
    curation gate, with reason codes for the rejection-analysis report.
    All-integer rules over vectorized counters (no floats, so the DuckDB
    oracle is expression-identical):
      1: n_tokens >= 20            (too short)
      2: mean word length in [3, 5] (100 * n_alnum // n_tokens in [300,500])
      3: >= 2 English stopword hits (the Gopher 'stop word' rule)
      4: punct chars <= 20% of chars
    Pure map, one pass, no shuffle."""
    from .textstats import PUNCT_CLASS, STOPWORDS_EN

    stop = pa.array(sorted(STOPWORDS_EN), pa.string())
    ds = _documents(sf_dir, ["doc_id", "text"])

    def rules(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        low = pc.utf8_lower(text)
        n_chars = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n_tokens = pc.cast(
            pc.count_substring_regex(low, "[a-z0-9]+"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        n_alnum = pc.cast(
            pc.utf8_length(pc.replace_substring_regex(low, "[^a-z0-9]", "")),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        n_punct = (
            n_chars
            - pc.cast(
                pc.utf8_length(
                    pc.replace_substring_regex(text, PUNCT_CLASS, "")
                ),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
        )
        parts = pc.split_pattern_regex(low, pattern="[^a-z0-9]+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = parts.values
        offs = np.asarray(parts.offsets, dtype=np.int64)
        doc_of = np.repeat(
            np.arange(len(batch), dtype=np.int64), np.diff(offs)
        )
        is_stop = pc.is_in(flat, value_set=stop).to_numpy(
            zero_copy_only=False
        ).astype(bool)
        n_stop = np.bincount(doc_of[is_stop], minlength=len(batch)).astype(
            np.int64
        )

        nt = np.maximum(n_tokens, 1)  # rule 1 catches the zero case first
        mean_wl_e2 = (100 * n_alnum) // nt
        fail = np.zeros(len(batch), dtype=np.int64)
        r4 = 100 * n_punct > 20 * np.maximum(n_chars, 1)
        fail = np.where(r4, 4, fail)
        fail = np.where(n_stop < 2, 3, fail)
        fail = np.where((mean_wl_e2 < 300) | (mean_wl_e2 > 500), 2, fail)
        fail = np.where(n_tokens < 20, 1, fail)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "keep": pa.array((fail == 0).astype(np.int64)),
                "fail_code": pa.array(fail),
            }
        )

    return ds.map_batches(rules, batch_format="pyarrow")


def props_field_stats(sf_dir: str) -> pa.Table:
    """Semi-structured field extraction + aggregate: pull the integer `k`
    field out of the JSON `props` column with ONE vectorized regex pass
    (pc.extract_regex -- the columnar analog of the reference's
    incremental JSON ingest parse, parseJSON.pl; no per-row json.loads)
    and roll up n / sum / min / max per event_type with the usual
    per-batch partial + tiny groupby. RE2 regex on both sides keeps the
    DuckDB oracle expression-identical (regexp_extract)."""
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "props"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(batch["props"], pattern=r'"k": (?P<k>[0-9]+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        t = pa.table({"event_type": batch["event_type"], "k": k})
        t = t.filter(pc.is_valid(t["k"]))
        g = pa.TableGroupBy(t, "event_type").aggregate(
            [("k", "count"), ("k", "sum"), ("k", "min"), ("k", "max")]
        )
        return g.rename_columns(["event_type", "n_p", "s_p", "mn_p", "mx_p"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_p", alias_name="n"),
            Sum("s_p", alias_name="k_sum"),
            Min("mn_p", alias_name="k_min"),
            Max("mx_p", alias_name="k_max"),
        )
    )
    df = agg.to_pandas()
    return pa.table(
        {
            "event_type": pa.array(df["event_type"], pa.string()),
            "n": pa.array(df["n"].astype(np.int64)),
            "k_sum": pa.array(df["k_sum"].astype(np.int64)),
            "k_min": pa.array(df["k_min"].astype(np.int64)),
            "k_max": pa.array(df["k_max"].astype(np.int64)),
        }
    )


def event_transition_counts(sf_dir: str) -> pa.Table:
    """Per-user event-type transition counts (the clickstream Markov
    matrix): order each user's events by (ts, event_id) and count adjacent
    (from_type, to_type) pairs corpus-wide. One user-keyed groupby
    co-locates each user's history; the per-group kernel is a vectorized
    sort + shift (no Python over rows); transition partials then fold in a
    tiny pair groupby. SQL-exact vs lag() OVER (PARTITION BY user ORDER BY
    ts, event_id)."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def per_user(g: pa.Table) -> pa.Table:
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = np.asarray(g["event_id"], dtype=np.int64)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us))
        et = et[order]
        if len(et) < 2:
            return pa.table(
                {
                    "from_type": pa.array([], pa.string()),
                    "to_type": pa.array([], pa.string()),
                    "n_p": pa.array([], pa.int64()),
                }
            )
        # \x1f separator: numpy U-dtype strips trailing NULs, so \x00 keys
        # collapse (see test_distinct_doc_terms_digit_leading_tokens)
        pair = np.char.add(
            np.char.add(et[:-1].astype("U"), "\x1f"), et[1:].astype("U")
        )
        uniq, cnt = np.unique(pair, return_counts=True)
        both = np.char.partition(uniq, "\x1f")
        return pa.table(
            {
                "from_type": pa.array(both[:, 0], pa.string()),
                "to_type": pa.array(both[:, 2], pa.string()),
                "n_p": pa.array(cnt.astype(np.int64)),
            }
        )

    agg = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n_p", alias_name="n"))
    )
    df = agg.to_pandas()
    return pa.table(
        {
            "from_type": pa.array(df["from_type"], pa.string()),
            "to_type": pa.array(df["to_type"], pa.string()),
            "n": pa.array(df["n"].astype(np.int64)),
        }
    )


TOKEN_BUDGET_PER_SOURCE = 800


def token_budget_sample(sf_dir: str):
    """Token-quota mixing: keep each source's docs (in doc_id order) until
    the source's cumulative whitespace-token count reaches
    TOKEN_BUDGET_PER_SOURCE -- the 'sample N tokens per source' step of
    building a pretraining mixture, where quotas are over TOKENS, not doc
    counts (balanced_sample's regime). Deterministic: the kept set is a
    pure function of (source, doc_id, n_tokens).

    Same distributed EXACT prefix sum as pack_sequences, partitioned by
    source: (1) per-batch partial token sums per (source, id-range bucket)
    -> tiny groupby -> driver exclusive scan per source (rows = #sources x
    #buckets, never corpus-sized); (2) bucket-atomic map_groups adds the
    broadcast base to a local cumsum and applies the quota. SQL-exact vs
    SUM OVER (PARTITION BY source ORDER BY doc_id)."""
    from ray.data.aggregate import Sum

    shift = 6  # 64-doc id ranges; raise at corpus scale (packing.py note)
    ds = _documents(sf_dir, ["doc_id", "source", "text"])

    def tok(batch: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(batch["text"], r"\S+"), pa.int64()
        )
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "n_tokens": n,
                "__bucket": pa.array(ids >> shift),
            }
        )

    toks = ds.map_batches(tok, batch_format="pyarrow")

    def bucket_partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch, ["source", "__bucket"]).aggregate(
            [("n_tokens", "sum")]
        )
        return g.rename_columns(["source", "__bucket", "s_p"])

    totals = (
        toks.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby(["source", "__bucket"])
        .aggregate(Sum("s_p", alias_name="s"))
        .to_pandas()
        .sort_values(["source", "__bucket"])
    )
    base: dict[tuple, int] = {}
    for src, grp in totals.groupby("source", sort=False):
        run = 0
        for b, sv in zip(grp["__bucket"], grp["s"]):
            base[(src, int(b))] = run
            run += int(sv)

    def scan_bucket(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["doc_id"], dtype=np.int64)
        n = np.asarray(g["n_tokens"], dtype=np.int64)
        order = np.argsort(ids)
        src = g["source"][0].as_py()
        b = int(g["__bucket"][0].as_py())
        cum = np.empty_like(n)
        cum[order] = np.cumsum(n[order]) + base[(src, b)]
        keep = cum <= TOKEN_BUDGET_PER_SOURCE
        return pa.table(
            {
                "doc_id": g["doc_id"].filter(pa.array(keep)),
                "source": g["source"].filter(pa.array(keep)),
                "n_tokens": g["n_tokens"].filter(pa.array(keep)),
                "cum_tokens": pa.array(cum[keep]),
            }
        )

    return toks.groupby(["source", "__bucket"]).map_groups(
        scan_bucket, batch_format="pyarrow"
    )


def kmeans_medoids(sf_dir: str) -> pa.Table:
    """Per-cluster representative selection after k-means: the vector
    closest to each final centroid (euclidean, vec_id tie-break) -- the
    cluster-pruning / diverse-exemplar step of embedding-based curation
    (pick one representative per semantic cluster). One streaming pass:
    assign + per-batch best-candidate per cluster (K rows per batch), then
    a trivial driver reduce over K x #batches rows. Output
    (cluster, medoid_vec_id), all-integer."""
    import ray

    ds, cent = _kmeans_fit(sf_dir)
    ref = ray.put(cent)

    def best_partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        c = _ray.get(ref)
        V = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        ids = np.asarray(batch["vec_id"], dtype=np.int64)
        d2 = (
            (V * V).sum(axis=1, keepdims=True)
            - 2.0 * (V @ c.T)
            + (c * c).sum(axis=1)
        )
        assign = np.argmin(d2, axis=1)
        # recompute the assigned distance with the direct formula (matches
        # the oracle's sum((a-b)^2) rounding more closely than the
        # expansion used for the argmin scan)
        d = ((V - c[assign]) ** 2).sum(axis=1)
        out_c, out_id, out_d = [], [], []
        for cl in np.unique(assign):
            m = assign == cl
            order = np.lexsort((ids[m], d[m]))
            out_c.append(int(cl))
            out_id.append(int(ids[m][order[0]]))
            out_d.append(float(d[m][order[0]]))
        return pa.table(
            {
                "cluster": pa.array(out_c, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "d": pa.array(out_d, pa.float64()),
            }
        )

    rows = ds.map_batches(best_partial, batch_format="pyarrow").take_all()
    best: dict[int, tuple] = {}
    for r in rows:
        key = (r["d"], r["vec_id"])
        if r["cluster"] not in best or key < best[r["cluster"]]:
            best[r["cluster"]] = key
    cl = sorted(best)
    return pa.table(
        {
            "cluster": pa.array(cl, pa.int64()),
            "medoid_vec_id": pa.array([best[c][1] for c in cl], pa.int64()),
        }
    )


def dedup_weights(sf_dir: str):
    """Duplication-aware training weights: after near-dup clustering
    (token-set Jaccard >= 0.9, same graph as dup_clusters), keep ONE
    canonical doc per cluster (cluster_id == doc_id) carrying the cluster
    size as its weight -- the 'dedup but preserve the duplication count'
    accounting used when duplication frequency should inform sampling
    rather than silently vanish. Docs outside any dup pair keep weight 1.

    Plan: cluster labels are bounded by the PAIR GRAPH (not the corpus),
    so the weight table and member set broadcast; the corpus pass is a
    pure map that drops non-canonical members and attaches weights."""
    import ray

    clusters = dup_clusters_docs(sf_dir)
    if hasattr(clusters, "to_pandas"):
        cdf = clusters.to_pandas()
    else:
        cdf = clusters
    sizes = cdf.groupby("cluster_id").size()
    canon = cdf[cdf["doc_id"] == cdf["cluster_id"]]
    canon_ids = canon["doc_id"].to_numpy().astype(np.int64)
    order = np.argsort(canon_ids)
    canon_ids = canon_ids[order]
    canon_w = sizes.loc[canon["cluster_id"]].to_numpy().astype(np.int64)[order]
    members_arr = np.sort(cdf["doc_id"].to_numpy().astype(np.int64))
    w_ref = ray.put((canon_ids, canon_w, members_arr))

    class Weigh:
        def __init__(self):
            self.canon_ids, self.canon_w, self.members = ray.get(w_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            # fully vectorized: sorted-array membership + weight gather
            ids = np.asarray(batch["doc_id"], dtype=np.int64)
            in_members = np.isin(ids, self.members, assume_unique=False)
            if len(self.canon_ids):
                pos = np.searchsorted(self.canon_ids, ids)
                pos_c = np.minimum(pos, len(self.canon_ids) - 1)
                is_canon = self.canon_ids[pos_c] == ids
            else:
                is_canon = np.zeros(len(ids), dtype=bool)
            keep = ~in_members | is_canon
            kept = ids[keep]
            w = np.ones(len(kept), dtype=np.int64)
            kc = is_canon[keep]
            w[kc] = self.canon_w[
                np.searchsorted(self.canon_ids, kept[kc])
            ]
            return pa.table(
                {"doc_id": pa.array(kept), "weight": pa.array(w)}
            )

    return _documents(sf_dir, ["doc_id"]).map_batches(
        Weigh, batch_format="pyarrow", concurrency=(1, 8)
    )


def heavy_hitters_by_lang(sf_dir: str) -> pa.Table:
    """Exact top-5 terms per language via the stratified Misra-Gries
    sketch + per-stratum exact recount (textstats.
    heavy_hitters_by_group_exact_topk; per-group guarantee asserted)."""
    from .textstats import heavy_hitters_by_group_exact_topk

    return heavy_hitters_by_group_exact_topk(
        _documents(sf_dir, ["doc_id", "lang", "text"]),
        group_col="lang", k_out=5, sketch_k=128,
    )


def whitened_embeddings(sf_dir: str):
    """PCA-whitened embedding column (similarity.pca_whiten): decorrelated
    unit-variance vectors for downstream ANN / clustering. Rows-only driver
    entry (float output); the transform's correctness -- identity
    covariance of the result, agreement with a single-matrix numpy
    reference -- is pytest-oracled."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    out, _ = sim_ops.pca_whiten(ds)
    return out


def approx_window_distinct_users(sf_dir: str, p: int = 12) -> pa.Table:
    """Approximate distinct users per 1-hour tumbling window via mergeable
    HyperLogLog — the flat-scale companion to window_distinct_users: the
    exact plan's shuffle carries the (window, user) pair cardinality
    (measured ~event-sized at 2M events), while this ships one 2^p-byte
    register row per (window, batch) and never shuffles a user id.
    Same register max-merge as approx_vocab_by_lang. Rows-only driver
    entry; accuracy vs the exact operator is pytest-verified."""
    from .textstats import hll_estimate, hll_registers
    from .joins import _mix64

    ds = _events_week(sf_dir, ["ts", "user_id"])
    win_us = 3600 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        win = us // win_us
        h = _mix64(np.asarray(batch["user_id"], dtype=np.int64))
        win_u, win_inv = np.unique(win, return_inverse=True)
        out_w, out_r = [], []
        for wi, wv in enumerate(win_u):
            out_w.append(int(wv))
            out_r.append(hll_registers(h[win_inv == wi], p=p).tobytes())
        return pa.table(
            {"window_id": pa.array(out_w, pa.int64()),
             "regs": pa.array(out_r, pa.binary())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged: dict[int, np.ndarray] = {}
    for r in parts:
        regs = np.frombuffer(r["regs"], dtype=np.uint8)
        cur = merged.get(r["window_id"])
        merged[r["window_id"]] = regs if cur is None else np.maximum(cur, regs)
    wins = sorted(merged)
    return pa.table(
        {
            "window_id": pa.array(wins, pa.int64()),
            "approx_users": pa.array(
                [hll_estimate(merged[w]) for w in wins], pa.int64()
            ),
        }
    )


def compression_ratio_docs(sf_dir: str):
    """Per-doc zlib compression-ratio quality signal (textstats.
    compression_ratio_batch): pure map, rows-only (the ratio depends on
    the zlib encoder, not SQL-recomputable); ordering/monotonicity
    properties are pytest-oracled."""
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        ts_ops.compression_ratio_batch, batch_format="pyarrow"
    )


def bpe_merge_rules(sf_dir: str) -> pa.Table:
    """Learn 20 BPE merge rules from `documents` (bpe.bpe_learn — tokenizer
    induction, Sennrich et al. 2016): the corpus reduces to its
    distinct-word histogram distributedly; the merge loop is a pure
    function of that bounded table. Rows-only driver entry (the merge
    procedure is not SQL-expressible); pytest-oracled against an
    independent textbook implementation."""
    from .bpe import bpe_learn

    return bpe_learn(_documents(sf_dir, ["doc_id", "text"]), n_merges=20)


def bpe_token_counts_docs(sf_dir: str):
    """Exact per-doc BPE token accounting under the corpus's own learned
    rules (20 merges): learn distributedly (bpe.bpe_learn), then one pure
    map applies the rules — each batch's DISTINCT words are encoded once
    and counts scatter back per doc (bpe.bpe_token_counts). This is the
    real-tokenizer replacement for token_count_stats's whitespace/regex
    proxies (reference analyzer-chain role, schema.xml:273-308). DuckDB
    oracle: an independently-implemented pure-Python BPE (learn + encode,
    no nexlt_ray code) computes the word -> token-count map at
    oracle-generation time and ships it as a VALUES join (pinned to the
    driver's sf0.01 corpus like minhash_pairs_corpus; sf-matched variants
    in tests/test_bpe.py)."""
    from .bpe import bpe_learn, bpe_token_counts

    rules = bpe_learn(_documents(sf_dir, ["doc_id", "text"]), n_merges=20)
    return bpe_token_counts(_documents(sf_dir, ["doc_id", "text"]), rules)


def bpe_encoded_docs(sf_dir: str):
    """Full BPE encode of `documents` under the corpus's own 20 learned
    rules: (doc_id, token_ids, n_bpe_tokens) with token_ids the
    space-joined id sequence — the actual trainer feed (bpe.bpe_encode_docs).
    DuckDB oracle: the independent pure-Python BPE emits a per-word
    id-SEQUENCE VALUES map and SQL reassembles each doc's sequence with an
    order-preserving list_transform((x,i) -> struct) unnest + string_agg
    (pinned to sf0.01; sf-matched variant in tests)."""
    from .bpe import bpe_encode_docs as _enc
    from .bpe import bpe_learn

    rules = bpe_learn(_documents(sf_dir, ["doc_id", "text"]), n_merges=20)
    return _enc(_documents(sf_dir, ["doc_id", "text"]), rules)


def bpe_packed_sequences(sf_dir: str):
    """Sequence packing under EXACT BPE token counts (B=128): the
    composition VERDICT r4 asked for — pack_sequences's distributed exact
    prefix sum with bpe_count_kernel plugged in as the token counter, so
    (start_token, block_id, block_offset) reflect what the trainer's
    tokenizer will actually emit. Same independent VALUES-map oracle as
    bpe_token_counts, composed with the window-sum packing oracle."""
    from .bpe import bpe_count_kernel, bpe_learn
    from .packing import pack_sequences

    rules = bpe_learn(_documents(sf_dir, ["doc_id", "text"]), n_merges=20)
    return pack_sequences(
        _documents(sf_dir, ["doc_id", "text"]),
        block_tokens=128,
        bucket_shift=6,
        token_counter=bpe_count_kernel(rules),
    )


COOCCUR_TRIANGLE_MIN = 120


def cooccur_triangles(sf_dir: str, fast_path_max_edges: int = 2_000_000):
    """Triangle enumeration in the term co-occurrence graph (edges =
    unordered +-3-token pairs with count >= COOCCUR_TRIANGLE_MIN) — the
    graph-analytics benchmark op, completing the graph family alongside
    connected components (dup_clusters) and PageRank (textrank). The
    standard two-join distributed plan over ordered edges (t1 < t2, so
    every triangle enumerates exactly once as a < b < c):
      wedges   = edges(a,b) |x| edges(b,c)        -- one partitioned join
      triangles = wedges semi-join edges on (a,c) -- closing-edge check
    Both joins are the existing single-shuffle hash_join (the semi mode
    ships only the edge keys). Output (t1, t2, t3); oracle = the same
    three-way self-join in DuckDB. Small-graph fast path (same precedent
    as dup_clusters/textrank): the AGGREGATED edge list is
    vocabulary-sized, so below `fast_path_max_edges` the enumeration runs
    as one numpy adjacency-intersection task — identical output by
    construction, join path kept for vocabulary-scale graphs."""
    from .joins import hash_join
    from ray.data.aggregate import Sum

    ds = _documents(sf_dir, ["doc_id", "text"])
    edges = (
        ds.map_batches(_cooccur_pair_partial, batch_format="pyarrow")
        .groupby(["t1", "t2"])
        .aggregate(Sum("n_p", alias_name="n"))
        .map_batches(
            # simple-graph semantics: drop self-loops (a token co-occurring
            # with itself within the window) — degenerate "triangles"
            # through (x,x) edges are not triangles
            lambda b: b.filter(
                pc.and_(
                    pc.greater_equal(b["n"], COOCCUR_TRIANGLE_MIN),
                    pc.not_equal(b["t1"], b["t2"]),
                )
            ).select(["t1", "t2"]),
            batch_format="pyarrow",
        )
        .materialize()
    )

    if edges.count() <= fast_path_max_edges:
        import ray
        import ray.data

        tri_schema = pa.schema(
            [("t1", pa.string()), ("t2", pa.string()), ("t3", pa.string())]
        )
        blocks = [b for b in ray.get(edges.to_arrow_refs()) if b.num_rows]
        if not blocks:
            # no qualifying co-occurrence edges at all -> no triangles
            return ray.data.from_arrow(tri_schema.empty_table())
        tab = pa.concat_tables(blocks).combine_chunks()
        t1 = tab["t1"].to_numpy(zero_copy_only=False)
        t2 = tab["t2"].to_numpy(zero_copy_only=False)
        nodes, codes = np.unique(np.concatenate([t1, t2]), return_inverse=True)
        a, b2 = codes[: len(t1)], codes[len(t1):]
        # forward adjacency (a < b by string order of the folded pairs)
        order = np.lexsort((b2, a))
        a_s, b_s = a[order], b2[order]
        starts = np.searchsorted(a_s, np.arange(len(nodes)))
        ends = np.searchsorted(a_s, np.arange(len(nodes)) + 1)
        out1, out2, out3 = [], [], []
        for i in range(len(a_s)):
            x, y = a_s[i], b_s[i]
            # triangles x<y<z: z in adj(x) ∩ adj(y)
            zx = b_s[starts[x]:ends[x]]
            zy = b_s[starts[y]:ends[y]]
            z = np.intersect1d(zx[zx > y], zy, assume_unique=True)
            if z.size:
                out1.append(np.full(z.size, x))
                out2.append(np.full(z.size, y))
                out3.append(z)
        if not out1:
            return pa.table({c: pa.array([], pa.string())
                             for c in ("t1", "t2", "t3")})
        return pa.table(
            {
                "t1": pa.array(nodes[np.concatenate(out1)].astype("U")),
                "t2": pa.array(nodes[np.concatenate(out2)].astype("U")),
                "t3": pa.array(nodes[np.concatenate(out3)].astype("U")),
            }
        )

    e_ab = edges.map_batches(
        lambda b: pa.table({"a": b["t1"], "b": b["t2"]}),
        batch_format="pyarrow",
    )
    e_bc = edges.map_batches(
        lambda b: pa.table({"bb": b["t1"], "c": b["t2"]}),
        batch_format="pyarrow",
    )
    wedges = hash_join(e_ab, e_bc, "b", "bb")
    closed = hash_join(
        wedges, edges, ["a", "c"], ["t1", "t2"], how="left semi",
        # wedges is the (lazy) first join's output: without the explicit
        # schema the semi join's probe would execute that whole join shuffle
        # once extra
        left_schema=pa.schema(
            [("a", pa.string()), ("b", pa.string()), ("c", pa.string())]
        ),
    )
    return closed.map_batches(
        lambda b: pa.table(
            {"t1": b["a"], "t2": b["b"], "t3": b["c"]}
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# distributed (sharded) engine-path queries — the SolrCloud analog
# (nexlt_ray/cluster.py). These run the REAL engine, doc-partitioned over
# CLUSTER_SHARDS shards with two-phase exact global stats, against the sf
# `documents` table mapped to the corpus schema — and are DuckDB-oracled,
# so the driver checks the distributed path end to end (the monolith-vs-
# cluster bit-identity contract is additionally pytest-verified in
# tests/test_cluster.py).
# ---------------------------------------------------------------------------
CLUSTER_SHARDS = 4


def _docs_cluster(sf_dir: str) -> str:
    """Build (once, /tmp-cached per corpus size) a CLUSTER_SHARDS-shard
    index cluster over `documents` in corpus schema (content=text,
    repo=source, path=str(doc_id), commit=''); profile 'simple' matches the
    oracle SQL tokenizer. Staging streams through Ray Data (no driver
    materialization); the shard build is cluster.build_sharded_index
    (routing spill + per-shard build_index, all resumable)."""
    import shutil

    import ray.data

    from .build import BuildConfig
    from .cluster import build_sharded_index

    n = n_docs_for_sf(sf_dir)
    root = f"/tmp/nexlt_cluster/n{n}"
    staged = os.path.join(root, "corpus")
    if not os.path.isdir(staged):
        os.makedirs(root, exist_ok=True)
        tmp = staged + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)

        def to_corpus(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "repo": b["source"],
                    "path": pc.cast(b["doc_id"], pa.string()),
                    "commit": pa.array([""] * len(b), pa.string()),
                    "lang": b["lang"],
                    "content": b["text"],
                }
            )

        _documents(sf_dir, ["doc_id", "text", "lang", "source"]).map_batches(
            to_corpus, batch_format="pyarrow"
        ).write_parquet(tmp)
        os.rename(tmp, staged)
    cdir = os.path.join(root, "cluster")
    build_sharded_index(
        staged,
        cdir,
        CLUSTER_SHARDS,
        BuildConfig(profile="simple", num_doc_buckets=16, num_term_buckets=8),
    )
    return cdir


def cluster_match_counts(sf_dir: str) -> pa.Table:
    """Distributed numFound per DOC_QUERIES query (OR semantics): every
    count is a fan-out to CLUSTER_SHARDS ShardWorkers summed by the
    coordinator. The index dedups by content sha, so the oracle counts
    DISTINCT text."""
    from .cluster import DistributedSearcher

    s = DistributedSearcher(_docs_cluster(sf_dir))
    try:
        counts = [int(s.match_count(q)) for q in DOC_QUERIES]
    finally:
        s.shutdown()
    return pa.table(
        {
            "qid": pa.array(range(len(DOC_QUERIES)), pa.int64()),
            "num_found": pa.array(counts, pa.int64()),
        }
    )


def cluster_suggest_terms(sf_dir: str) -> pa.Table:
    """Distributed terms-component suggest: per DOC_PREFIXES prefix, the
    EXACT global top-10 (term, summed df) — shards contribute their whole
    prefix slice, the coordinator merges (no Solr refinement
    approximation). df counts deduped docs (distinct texts)."""
    from .cluster import DistributedSearcher

    s = DistributedSearcher(_docs_cluster(sf_dir))
    pid, term, df = [], [], []
    try:
        for i, p in enumerate(DOC_PREFIXES):
            for t, d in s.suggest(p, n=10):
                pid.append(i)
                term.append(t)
                df.append(int(d))
    finally:
        s.shutdown()
    return pa.table(
        {
            "pid": pa.array(pid, pa.int64()),
            "term": pa.array(term, pa.string()),
            "df": pa.array(df, pa.int64()),
        }
    )


def cluster_facet_lang_counts(sf_dir: str) -> pa.Table:
    """Distributed facet merge: per DOC_QUERIES query, (lang, count) over
    all matching docs — per-shard facet dicts summed by the coordinator
    (exact: shards return full value lists). The surviving lang of a
    deduped doc is the lexicographically-first (repo, path, commit) row's
    (BucketWriter discipline), which the oracle reproduces with a window
    rank over (source, CAST(doc_id AS VARCHAR))."""
    from .cluster import DistributedSearcher

    s = DistributedSearcher(_docs_cluster(sf_dir))
    qid, lang, cnt = [], [], []
    try:
        for i, q in enumerate(DOC_QUERIES):
            for v, c in s.facets(q, ["lang"])["lang"]:
                qid.append(i)
                lang.append(v)
                cnt.append(int(c))
    finally:
        s.shutdown()
    return pa.table(
        {
            "qid": pa.array(qid, pa.int64()),
            "lang": pa.array(lang, pa.string()),
            "cnt": pa.array(cnt, pa.int64()),
        }
    )


def cluster_sort_page(sf_dir: str) -> pa.Table:
    """Distributed match-all browse page (the reference UI's default view:
    q=*:* + a meta-field sort, solrTestLib_v2.js:83-96), through the
    4-shard engine: DistributedSearcher.search_sorted(sort=lang asc,
    start=10, rows=25) — each shard contributes a bounded sorted-candidate
    page, the coordinator merges. Returns (rank, path, lang); `path`
    (= the original doc_id string) identifies the dedup survivor, and the
    doc-id tie-break equals sha order, which the oracle reproduces with
    ORDER BY lang, sha256(text)."""
    from .cluster import DistributedSearcher

    s = DistributedSearcher(_docs_cluster(sf_dir))
    try:
        page = s.search_sorted("*:*", "lang", True, start=10, rows=25)
    finally:
        s.shutdown()
    n = page.num_rows
    return pa.table(
        {
            "rank": pa.array(range(10, 10 + n), pa.int64()),
            "path": page["path"],
            "lang": page["lang"],
        }
    )


LINE_DEDUP_HEADER = "copyright example corp all rights reserved"
LINE_DEDUP_FOOTER = "generated by nexlt export tool"
LINE_DEDUP_WRAP = 12
LINE_DEDUP_MIN_DOCS = 10
LINE_DEDUP_GLOBAL_FOOTER = "shared footer text"
LINE_DEDUP_SRC_MIN_DOCS = 8


def _reflow_body(batch: pa.Table) -> pa.Array:
    """Reflow single-line word-soup text into LINE_DEDUP_WRAP-token lines.
    Fully vectorized: one flat token pass — separator per token ('\n' at
    every WRAP boundary, '' at doc end) + one pc.binary_join over the
    doc-offset list layout; no per-row Python."""
    txt = batch["text"]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    toks = pc.split_pattern(txt, " ")
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offs)
    flat = toks.values.slice(int(offs[0]), int(offs[-1] - offs[0]))
    n_tok = int(offs[-1] - offs[0])
    pos = np.arange(n_tok, dtype=np.int64) - np.repeat(offs[:-1] - offs[0], counts)
    sep = np.where((pos + 1) % LINE_DEDUP_WRAP == 0, "\n", " ").astype(object)
    last = (offs[1:] - offs[0] - 1)[counts > 0]
    sep[last] = ""
    glued = pc.binary_join_element_wise(
        flat, pa.array(sep, pa.string()), pa.array([""] * n_tok, pa.string())
    )
    la = pa.ListArray.from_arrays(
        pa.array((offs - offs[0]).astype(np.int32)), glued
    )
    return pc.binary_join(la, "")


def _inject_lines(batch: pa.Table) -> pa.Table:
    """Deterministic line structure for `line_dedup_docs` (the synthetic
    corpus is single-line word soup): reflow each doc's body into
    LINE_DEDUP_WRAP-token lines and attach a boilerplate header to every
    doc_id % 3 == 0 and a footer to every doc_id % 4 == 0 — same device as
    pii_redact_docs (the oracle re-derives the augmented text in SQL, so
    the operator is verified on non-vacuous input)."""
    ids = np.asarray(batch["doc_id"], dtype=np.int64)
    body = _reflow_body(batch)
    header = np.where(ids % 3 == 0, LINE_DEDUP_HEADER + "\n", "").astype(object)
    footer = np.where(ids % 4 == 0, "\n" + LINE_DEDUP_FOOTER, "").astype(object)
    aug = pc.binary_join_element_wise(
        pa.array(header, pa.string()), body, pa.array(footer, pa.string()), ""
    )
    return pa.table({"doc_id": batch["doc_id"], "text": aug})


def _inject_lines_by_source(batch: pa.Table) -> pa.Table:
    """Per-group variant for `line_dedup_by_source`: every doc_id % 2 == 0
    gains a SOURCE-SPECIFIC banner line ('site banner <source>' — the
    per-domain navbar), and every doc_id % 7 == 0 a GLOBAL footer shared
    across all sources (7 is coprime with the source assignment's modulus,
    so the footer spreads evenly: per-source df ~4). With per-source
    frequency scoping the banners are boilerplate (per-source df ~12 of
    25) while the global footer is NOT (per-source df ~4 < threshold
    despite a global df of ~n/7) — the exact semantic difference vs
    corpus-global line dedup."""
    ids = np.asarray(batch["doc_id"], dtype=np.int64)
    body = _reflow_body(batch)
    src = batch["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    banner = pc.binary_join_element_wise(
        pa.array(np.where(ids % 2 == 0, "site banner ", "").astype(object),
                 pa.string()),
        pc.if_else(pa.array(ids % 2 == 0), src, ""),
        pc.if_else(pa.array(ids % 2 == 0), "\n", ""),
        "",
    )
    footer = np.where(ids % 7 == 0, "\n" + LINE_DEDUP_GLOBAL_FOOTER, "").astype(
        object
    )
    aug = pc.binary_join_element_wise(
        banner, body, pa.array(footer, pa.string()), ""
    )
    return pa.table(
        {"doc_id": batch["doc_id"], "source": src, "text": aug}
    )


def line_dedup_docs(sf_dir: str):
    """Inter-document line-level boilerplate removal over `documents`
    (RefinedWeb line dedup / CCNet paragraph dedup): lines appearing in
    >= LINE_DEDUP_MIN_DOCS distinct docs are stripped from all docs and
    the text reassembled in order (dedup.line_dedup — line-df groupby +
    partitioned anti join + bucket-vectorized reassembly; the line
    frequency table is corpus-sized and never broadcast or driver-held).
    Boilerplate lines are injected deterministically from doc_id so the
    pass is non-vacuous (~1/3 of docs gain a header, 1/4 a footer) and the
    DuckDB oracle re-derives the identical input."""
    from .dedup import line_dedup

    ds = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        _inject_lines, batch_format="pyarrow"
    )
    return line_dedup(ds, min_docs=LINE_DEDUP_MIN_DOCS)


def dsir_weights(sf_dir: str):
    """DSIR data-selection importance weights over `documents` (Xie et
    al., NeurIPS 2023): per-doc log importance ratio between a unigram LM
    fit on the TARGET subset (lang='en' — stand-in for the paper's
    high-quality target distribution) and one fit on the whole raw corpus
    (sampling.dsir_logratio_weights, int64 fixed point, SQL-exact).
    Composes with `weighted_sample` for the resampling step."""
    from .sampling import dsir_logratio_weights

    ds = _documents(sf_dir, ["doc_id", "text", "lang"])

    def is_en(batch: pa.Table) -> np.ndarray:
        return pc.equal(batch["lang"], "en").to_numpy(zero_copy_only=False)

    return dsir_logratio_weights(ds, is_en)


PMI_MIN_N = 20


def pmi_top50(sf_dir: str) -> pa.Table:
    """Top-50 collocations by pointwise mutual information over the same
    windowed co-occurrence events as `cooccur_top50` (completing that
    docstring's promised log-ratio step): PMI(a,b) = ln(n_ab * T /
    (m_a * m_b)) with T = total pair events and m_t = events containing t,
    restricted to pairs with n >= PMI_MIN_N (the standard support floor —
    bare PMI otherwise surfaces hapax pairs). Fixed point
    floor(ln(exact int64 rational) * 1e4 + 0.5); valid while
    n*T and m_a*m_b < 2^63 (split the ln into a log difference past that).

    Distributed shape: pair counts come from the shared per-batch partial
    + ONE pair-keyed groupby; marginals are a second tiny Sum groupby OVER
    THE PAIR TABLE (never re-tokenizes); both marginals flow back onto the
    support-filtered candidates via two term-keyed partitioned hash_joins;
    the top-50 is a per-block partial + driver merge of block winners
    (bounded by 50 rows per block)."""
    from ray.data.aggregate import Sum

    from .joins import hash_join, join_out_schema

    ds = _documents(sf_dir, ["doc_id", "text"])

    pairs = (
        ds.map_batches(_cooccur_pair_partial, batch_format="pyarrow")
        .groupby(["t1", "t2"])
        .aggregate(Sum("n_p", alias_name="n"))
        .materialize()  # consumers: T scalar, marginals, candidate filter
    )
    pairs_schema = pa.schema(
        [("t1", pa.string()), ("t2", pa.string()), ("n", pa.int64())]
    )
    total = int(pairs.sum("n") or 0)

    def marg_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "term": pa.concat_arrays(
                    [
                        batch["t1"].combine_chunks()
                        if isinstance(batch["t1"], pa.ChunkedArray)
                        else batch["t1"],
                        batch["t2"].combine_chunks()
                        if isinstance(batch["t2"], pa.ChunkedArray)
                        else batch["t2"],
                    ]
                ),
                "m_p": pa.concat_arrays(
                    [
                        pa.array(np.asarray(batch["n"], dtype=np.int64)),
                        pa.array(np.asarray(batch["n"], dtype=np.int64)),
                    ]
                ),
            }
        )
        g = pa.TableGroupBy(t, "term").aggregate([("m_p", "sum")])
        return g.rename_columns(["term", "m_p"])

    marg = (
        pairs.map_batches(marg_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("m_p", alias_name="m"))
    )
    marg_schema = pa.schema([("term", pa.string()), ("m", pa.int64())])

    def support(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["n"], PMI_MIN_N))

    cand = pairs.map_batches(support, batch_format="pyarrow")

    j1 = hash_join(
        cand, marg, "t1", "term",
        left_schema=pairs_schema, right_schema=marg_schema,
    )
    j1_schema = join_out_schema(pairs_schema, marg_schema, "t1", "term")

    def rename_m1(batch: pa.Table) -> pa.Table:
        names = ["m1" if c == "m" else c for c in batch.column_names]
        return batch.rename_columns(names)

    j1r = j1.map_batches(rename_m1, batch_format="pyarrow")
    j1r_schema = pa.schema(
        [(("m1" if f.name == "m" else f.name), f.type) for f in j1_schema]
    )
    j2 = hash_join(
        j1r, marg, "t2", "term",
        left_schema=j1r_schema, right_schema=marg_schema,
    )

    def block_top(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n"], dtype=np.int64)
        m1 = np.asarray(batch["m1"], dtype=np.int64)
        m2 = np.asarray(batch["m"], dtype=np.int64)
        num = (n * np.int64(total)).astype(np.float64)
        den = (m1 * m2).astype(np.float64)
        pmi = np.floor(np.log(num / den) * 10_000 + 0.5).astype(np.int64)
        t1 = batch["t1"].to_numpy(zero_copy_only=False)
        t2 = batch["t2"].to_numpy(zero_copy_only=False)
        keep = np.lexsort((t2, t1, -pmi))[:50]
        return pa.table(
            {
                "t1": pa.array(t1[keep].astype("U"), pa.string()),
                "t2": pa.array(t2[keep].astype("U"), pa.string()),
                "n": pa.array(n[keep]),
                "pmi_e4": pa.array(pmi[keep]),
            }
        )

    rows = j2.map_batches(block_top, batch_format="pyarrow").take_all()
    t1 = np.array([r["t1"] for r in rows], dtype=object)
    t2 = np.array([r["t2"] for r in rows], dtype=object)
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    pmi = np.array([r["pmi_e4"] for r in rows], dtype=np.int64)
    order = np.lexsort((t2, t1, -pmi))[:50]
    return pa.table(
        {
            "t1": pa.array(t1[order].astype("U"), pa.string()),
            "t2": pa.array(t2[order].astype("U"), pa.string()),
            "n": pa.array(n[order], pa.int64()),
            "pmi_e4": pa.array(pmi[order], pa.int64()),
        }
    )


def line_dedup_by_source(sf_dir: str):
    """Per-domain line-level boilerplate removal (RefinedWeb's actual
    scoping): a line is stripped when it reaches LINE_DEDUP_SRC_MIN_DOCS
    distinct docs WITHIN ONE source (dedup.line_dedup(group_col='source')
    — the df groupby and the anti join key on (source, line) composites).
    The injection plants source-specific banners (removed: per-source df
    ~12) and one globally-common footer (KEPT: per-source df ~5 despite a
    global df of ~n/5) — demonstrating exactly what per-group scoping
    changes vs `line_dedup_docs`."""
    from .dedup import line_dedup

    ds = _documents(sf_dir, ["doc_id", "text", "source"]).map_batches(
        _inject_lines_by_source, batch_format="pyarrow"
    )
    return line_dedup(
        ds, min_docs=LINE_DEDUP_SRC_MIN_DOCS, group_col="source"
    )


def dup_ngram_docs(sf_dir: str):
    """Per-doc inter-document duplicate 5-gram accounting over `documents`
    (textstats.dup_ngram_stats — the Lee et al. ACL'22 duplication-report
    statistic at doc granularity); DuckDB-oracled."""
    from .textstats import dup_ngram_stats

    return dup_ngram_stats(_documents(sf_dir, ["doc_id", "text"]))


Q3_CUTOFF_US = int(np.datetime64("1998-01-01", "us").astype(np.int64))


def q3_shipping_priority(sf_dir: str) -> pa.Table:
    """TPC-H Q3 analog — the canonical 3-table chained join: customers of
    one market segment -> their orders before a cutoff -> revenue of those
    orders' line items shipped after it; top-10 orders by revenue.
    Exercises hash_join composition (a left-semi customer filter feeding
    an inner orderkey join) with integer-exact revenue: rev_u =
    floor(price*100 + 0.5) * (10000 - floor(discount*10000 + 0.5))
    (micro-cents x basis points — one floor per double on both oracle
    sides, no float accumulation).

    Scale shape: the segment-filtered customer side ships ONLY its key
    column through the semi join (no broadcast assumption); lineitem
    pre-aggregates revenue per orderkey per batch BEFORE the join
    (combiner — the join left side is bounded by distinct orderkeys per
    batch, not line items); the top-10 is per-block partial + driver
    merge of block winners."""
    import ray.data
    from ray.data.aggregate import Max, Sum

    from .joins import hash_join, join_out_schema

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )

    def seg_only(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.equal(b["c_mktsegment"], "BUILDING")
        ).select(["c_custkey"])

    cust_k = cust.map_batches(seg_only, batch_format="pyarrow")

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def ord_filter(b: pa.Table) -> pa.Table:
        dt = pc.cast(b["o_orderdate"], pa.int64())
        keep = pc.less(dt, Q3_CUTOFF_US)
        t = pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_custkey": b["o_custkey"],
                "o_date_us": dt,
            }
        ).filter(keep)
        return t

    o_f = orders.map_batches(ord_filter, batch_format="pyarrow")
    o_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
         ("o_date_us", pa.int64())]
    )
    o_b = hash_join(
        o_f, cust_k, "o_custkey", "c_custkey", how="left semi",
        left_schema=o_schema,
        right_schema=pa.schema([("c_custkey", pa.int64())]),
    )

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def li_partial(b: pa.Table) -> pa.Table:
        keep = pc.greater(pc.cast(b["l_shipdate"], pa.int64()), Q3_CUTOFF_US)
        t = b.filter(keep)
        price = np.asarray(t["l_extendedprice"], dtype=np.float64)
        disc = np.asarray(t["l_discount"], dtype=np.float64)
        rev = (
            np.floor(price * 100 + 0.5).astype(np.int64)
            * (10000 - np.floor(disc * 10000 + 0.5).astype(np.int64))
        )
        pt = pa.table(
            {"l_orderkey": t["l_orderkey"], "rev_p": pa.array(rev)}
        )
        g = pa.TableGroupBy(pt, "l_orderkey").aggregate([("rev_p", "sum")])
        return g.rename_columns(["l_orderkey", "rev_p"])

    li_pre = li.map_batches(li_partial, batch_format="pyarrow")
    li_schema = pa.schema([("l_orderkey", pa.int64()), ("rev_p", pa.int64())])

    j = hash_join(
        li_pre, o_b, "l_orderkey", "o_orderkey",
        left_schema=li_schema, right_schema=o_schema,
    )

    agg = j.groupby("l_orderkey").aggregate(
        Sum("rev_p", alias_name="revenue_u"),
        Max("o_date_us", alias_name="o_date_us"),
    )

    def block_top(b: pa.Table) -> pa.Table:
        rev = np.asarray(b["revenue_u"], dtype=np.int64)
        dt = np.asarray(b["o_date_us"], dtype=np.int64)
        ok = np.asarray(b["l_orderkey"], dtype=np.int64)
        keep = np.lexsort((ok, dt, -rev))[:10]
        return pa.table(
            {
                "l_orderkey": pa.array(ok[keep]),
                "revenue_u": pa.array(rev[keep]),
                "o_date_us": pa.array(dt[keep]),
            }
        )

    rows = agg.map_batches(block_top, batch_format="pyarrow").take_all()
    ok = np.array([r["l_orderkey"] for r in rows], dtype=np.int64)
    rev = np.array([r["revenue_u"] for r in rows], dtype=np.int64)
    dt = np.array([r["o_date_us"] for r in rows], dtype=np.int64)
    order = np.lexsort((ok, dt, -rev))[:10]
    return pa.table(
        {
            "l_orderkey": pa.array(ok[order], pa.int64()),
            "revenue_u": pa.array(rev[order], pa.int64()),
            "o_date_us": pa.array(dt[order], pa.int64()),
        }
    )
