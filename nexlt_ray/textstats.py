"""Text-analysis operators for large-scale training-data pipelines:
language-ID (n-gram/stopword heuristic), quality counters, token counting,
document fingerprinting (rolling hash + winnowing).

All are vectorized batch fns for `ds.map_batches(..., batch_format="pyarrow")`
(fingerprinting is numpy over a flattened char buffer). The reference has no
analytics beyond facets; these extend the engine per the graft brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .tokenize import tokenize_batch

# tiny per-language stopword profiles (public common-word lists)
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the a of to and in is it for on with as at by this that".split()),
    "de": frozenset("der die das und ist ein eine zu mit von für auf nicht den im".split()),
    "fr": frozenset("le la les et de un une est pour dans que sur avec ne pas".split()),
    "es": frozenset("el la los las y de un una es para en que no con por se".split()),
}

STOPWORDS_EN = _LANG_PROFILES["en"]
PUNCT_CLASS = "[.,;:!?]"


def token_counts_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace+regex token count per doc (simple profile; SQL-parity:
    len(list_filter(string_split_regex(lower(t),'[^a-z0-9]+'), x -> x<>''))."""
    tb = tokenize_batch(batch[text_col], profile="simple")
    return batch.append_column("n_tokens", pa.array(tb.doc_len.astype(np.int64)))


def quality_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality counters per doc (all exact integers, SQL-checkable):
    n_chars, n_tokens, n_stopwords (EN list), n_punct."""
    text = batch[text_col]
    tb = tokenize_batch(text, profile="simple")
    n_docs = len(batch)
    stop = pa.array(sorted(STOPWORDS_EN), pa.string())
    if tb.terms.size:
        is_stop = pc.is_in(pa.array(tb.terms.astype("U")), value_set=stop)
        stop_mask = is_stop.to_numpy(zero_copy_only=False).astype(bool)
        n_stop = np.bincount(tb.doc_idx[stop_mask], minlength=n_docs)
    else:
        n_stop = np.zeros(n_docs, dtype=np.int64)
    n_chars = pc.utf8_length(text)
    no_punct = pc.replace_substring_regex(text, pattern=PUNCT_CLASS, replacement="")
    n_punct = pc.subtract(n_chars, pc.utf8_length(no_punct))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_tokens": pa.array(tb.doc_len.astype(np.int64)),
            "n_stopwords": pa.array(n_stop.astype(np.int64)),
            "n_punct": pc.cast(n_punct, pa.int64()),
        }
    )


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic language ID: argmax over per-language stopword hit-rates
    (deterministic tie-break by language code). Returns doc_id, lang_pred,
    lang_score (hits of best lang, integer)."""
    tb = tokenize_batch(batch[text_col], profile="simple")
    n_docs = len(batch)
    langs = sorted(_LANG_PROFILES)
    scores = np.zeros((len(langs), n_docs), dtype=np.int64)
    if tb.terms.size:
        terms_u = pa.array(tb.terms.astype("U"))
        for li, lang in enumerate(langs):
            vs = pa.array(sorted(_LANG_PROFILES[lang]), pa.string())
            hit = pc.is_in(terms_u, value_set=vs).to_numpy(zero_copy_only=False)
            scores[li] = np.bincount(
                tb.doc_idx[hit.astype(bool)], minlength=n_docs
            )
    best = np.argmax(scores, axis=0)  # first max wins -> lang-code order
    pred = np.array(langs, dtype=object)[best]
    none = scores.sum(axis=0) == 0
    pred[none] = "und"
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array(pred.astype("U"), pa.string()),
            "lang_score": pa.array(scores[best, np.arange(n_docs)].astype(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# Fingerprinting: Rabin-Karp rolling hash + winnowing (Schleimer et al. 2003)
# ---------------------------------------------------------------------------
_B = np.uint64(1000003)
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _rolling_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """k-gram Rabin-Karp hashes of a uint8 sequence (vectorized, mod 2^64)."""
    n = data.size
    if n < k:
        return np.empty(0, dtype=np.uint64)
    h = np.zeros(n - k + 1, dtype=np.uint64)
    # h[i] = sum_{j<k} data[i+j] * B^(k-1-j)
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = (acc * _B + data[j : j + n - k + 1].astype(np.uint64)) & _MASK
    h = acc
    return h


def fingerprint_batch(
    batch: pa.Table, text_col: str = "text", k: int = 8, window: int = 4
) -> pa.Table:
    """Winnowed fingerprints per doc: min hash in each sliding window of
    rolling k-gram hashes. Returns doc_id, n_grams, n_fingerprints,
    min_fp/max_fp (as int64 via signed view) — deterministic.

    Batch-vectorized: all docs' bytes hash in ONE flat pass; per-doc gram /
    window spans are contiguous slices of the flat arrays, so winnowing,
    dedup and min/max all run as global sorts + segment reductions — no
    per-doc Python loop."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    byte_parts = [np.frombuffer(t.encode("utf-8"), dtype=np.uint8) for t in texts]
    lens = np.array([p.size for p in byte_parts], dtype=np.int64)
    n_grams = np.maximum(lens - k + 1, 0)
    empty = np.zeros(n, dtype=np.int64)
    out = {
        "doc_id": batch["doc_id"],
        "n_grams": pa.array(n_grams),
        "n_fingerprints": pa.array(empty.copy()),
        "min_fp": pa.array(empty.copy()),
        "max_fp": pa.array(empty.copy()),
    }
    if int(n_grams.sum()) == 0:
        return pa.table(out)
    flat = np.concatenate(byte_parts) if byte_parts else np.empty(0, np.uint8)
    h_all = _rolling_hashes(flat, k)
    offs = np.concatenate(([0], np.cumsum(lens)))
    # doc i's grams live at flat positions [offs[i], offs[i] + n_grams[i])
    doc_sel = np.flatnonzero(n_grams > 0)
    g_doc = np.repeat(doc_sel, n_grams[doc_sel])
    g_idx = _expand_ranges(offs[doc_sel], n_grams[doc_sel])

    # per-window minima: window w starts at gram j of its doc when the doc
    # has >= window grams; docs with fewer grams emit one global min
    few = doc_sel[n_grams[doc_sel] <= window]
    many = doc_sel[n_grams[doc_sel] > window]
    fp_doc_l, fp_val_l = [], []
    if few.size:
        # min over each short doc's grams: reduceat over the gathered gram
        # stream at per-doc segment starts, then keep the short docs
        seg_starts = np.concatenate(([0], np.cumsum(n_grams[doc_sel])[:-1]))
        mins = np.minimum.reduceat(h_all[g_idx], seg_starts)
        keep = np.isin(doc_sel, few)
        fp_doc_l.append(doc_sel[keep])
        fp_val_l.append(mins[keep])
    if many.size:
        wmins = np.lib.stride_tricks.sliding_window_view(h_all, window).min(axis=1)
        n_win = n_grams[many] - window + 1
        w_doc = np.repeat(many, n_win)
        w_idx = _expand_ranges(offs[many], n_win)
        fp_doc_l.append(w_doc)
        fp_val_l.append(wmins[w_idx])
    fp_doc = np.concatenate(fp_doc_l)
    fp_val = np.concatenate(fp_val_l)
    # per-doc dedup + stats via one global sort
    order = np.lexsort((fp_val, fp_doc))
    d_s, v_s = fp_doc[order], fp_val[order]
    uniq = np.concatenate(([True], (d_s[1:] != d_s[:-1]) | (v_s[1:] != v_s[:-1])))
    d_u, v_u = d_s[uniq], v_s[uniq]
    n_fps = np.bincount(d_u, minlength=n).astype(np.int64)
    seg = np.flatnonzero(np.concatenate(([True], d_u[1:] != d_u[:-1])))
    present = d_u[seg]
    vs_signed = v_u.view(np.int64)
    min_fp = np.zeros(n, dtype=np.int64)
    max_fp = np.zeros(n, dtype=np.int64)
    min_fp[present] = np.minimum.reduceat(vs_signed, seg)
    max_fp[present] = np.maximum.reduceat(vs_signed, seg)
    out["n_fingerprints"] = pa.array(n_fps)
    out["min_fp"] = pa.array(min_fp)
    out["max_fp"] = pa.array(max_fp)
    return pa.table(out)


def _expand_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Indices concatenating ranges [starts[i], starts[i]+counts[i])."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    of = np.repeat(np.arange(starts.size, dtype=np.int64), counts)
    base = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return starts[of] + (np.arange(total, dtype=np.int64) - base[of])


def winnow_doc_fps(
    batch: pa.Table, text_col: str = "text", k: int = 16, window: int = 25
) -> pa.Table:
    """Distinct winnowed fingerprint VALUES per doc as (doc_id, fp) rows.

    Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS scheme): take
    Rabin-Karp hashes of all k-byte grams, then keep the minimum hash of each
    sliding window of `window` consecutive gram hashes. Guarantee: any two
    documents sharing an exact byte run of length >= window + k - 1 share at
    least one selected fingerprint VALUE (the min-hash gram of a window fully
    inside the shared run is the same gram in both docs). Only fp values are
    used downstream, so min-position tie-breaks are irrelevant.

    Docs with fewer than `window` grams (byte length < window + k - 1) emit
    nothing — they cannot contain a run of the guaranteed length. Density is
    ~2/(window+1) of all grams, the winnowing lower bound. Vectorized exactly
    like `fingerprint_batch`: one flat hash pass, per-doc contiguous slices,
    one global lexsort for the per-doc distinct.
    """
    texts = batch[text_col].to_pylist()
    ids = np.asarray(batch["doc_id"], dtype=np.int64)
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "fp": pa.array([], pa.int64())}
    )
    if not texts:
        return empty
    byte_parts = [np.frombuffer(t.encode("utf-8"), dtype=np.uint8) for t in texts]
    lens = np.array([p.size for p in byte_parts], dtype=np.int64)
    n_grams = np.maximum(lens - k + 1, 0)
    many = np.flatnonzero(n_grams >= window)
    if many.size == 0:
        return empty
    flat = np.concatenate(byte_parts)
    h_all = _rolling_hashes(flat, k)
    offs = np.concatenate(([0], np.cumsum(lens)))
    wmins = np.lib.stride_tricks.sliding_window_view(h_all, window).min(axis=1)
    n_win = n_grams[many] - window + 1
    fp_doc = np.repeat(many, n_win)
    fp_val = wmins[_expand_ranges(offs[many], n_win)]
    order = np.lexsort((fp_val, fp_doc))
    d_s, v_s = fp_doc[order], fp_val[order]
    uniq = np.concatenate(
        ([True], (d_s[1:] != d_s[:-1]) | (v_s[1:] != v_s[:-1]))
    )
    return pa.table(
        {
            "doc_id": pa.array(ids[d_s[uniq]], pa.int64()),
            "fp": pa.array(v_s[uniq].view(np.int64)),
        }
    )


def doc_term_tf(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-(doc, term) term frequencies (simple SQL-parity profile), fully
    vectorized: one tokenize pass, one np.unique over (doc, term-code)."""
    tb = tokenize_batch(batch[text_col], profile="simple")
    if tb.terms.size == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "term": pa.array([], pa.string()),
             "tf": pa.array([], pa.int64())}
        )
    uniq, inv = np.unique(tb.terms.astype("U"), return_inverse=True)
    key = tb.doc_idx.astype(np.int64) * np.int64(uniq.size) + inv
    pairs, counts = np.unique(key, return_counts=True)
    d = pairs // uniq.size
    t = pairs % uniq.size
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(batch["doc_id"])[d], pa.int64()),
            "term": pa.array(uniq[t], pa.string()),
            "tf": pa.array(counts.astype(np.int64)),
        }
    )


def top_terms_per_doc(docs, k_top: int = 3, text_col: str = "text"):
    """Per-doc keyword extraction: the k_top terms ranked by
    (tf DESC, df ASC, term ASC) — highest-frequency rarest-first terms, the
    integer-exact tf-idf ordering (for fixed tf, ascending df IS descending
    idf, with the term itself as the total tiebreak). Output
    (doc_id, term, tf, df).

    Distributed shape: tf rows stream out of one tokenize pass; global df
    per term is a partial-count + Sum groupby over those rows (docs never
    re-tokenized); df flows back onto the tf rows via the string-keyed
    partitioned `hash_join` (vocabulary may be corpus-sized — never a
    broadcast); the per-doc top-k runs as a per-batch partial top-k and a
    final per-doc groupby, so nothing beyond k * docs rows reaches the last
    stage."""
    from ray.data.aggregate import Sum

    from .joins import hash_join

    tf = docs.map_batches(
        lambda b: doc_term_tf(b, text_col=text_col), batch_format="pyarrow"
    )

    def df_partial(batch: pa.Table) -> pa.Table:
        terms, counts = np.unique(
            np.asarray(batch["term"].to_pylist(), dtype="U"), return_counts=True
        )
        return pa.table(
            {"term": pa.array(terms, pa.string()),
             "df_part": pa.array(counts.astype(np.int64))}
        )

    df = (
        tf.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df_part", alias_name="df"))
    )

    # df is an unmaterialized aggregate: without the explicit schema the
    # join's .schema() probe would execute the WHOLE df aggregation (and
    # its tokenize pass) once extra just to learn the column types
    joined = hash_join(
        tf, df, "term", "term", num_buckets=32,
        right_schema=pa.schema([("term", pa.string()), ("df", pa.int64())]),
    )

    def partial_top(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["doc_id"])
        t = np.asarray(batch["term"].to_pylist(), dtype="U")
        tfv = np.asarray(batch["tf"])
        dfv = np.asarray(batch["df"])
        order = np.lexsort((t, dfv, -tfv, d))
        g = d[order]
        starts = np.flatnonzero(np.concatenate(([True], g[1:] != g[:-1])))
        rank = np.arange(g.size) - np.repeat(starts, np.diff(np.concatenate((starts, [g.size]))))
        keep = order[rank < k_top]
        return pa.table(
            {
                "doc_id": pa.array(d[keep], pa.int64()),
                "term": pa.array(t[keep], pa.string()),
                "tf": pa.array(tfv[keep], pa.int64()),
                "df": pa.array(dfv[keep], pa.int64()),
            }
        )

    def final_top(g: pa.Table) -> pa.Table:
        t = np.asarray(g["term"].to_pylist(), dtype="U")
        tfv = np.asarray(g["tf"])
        dfv = np.asarray(g["df"])
        keep = np.lexsort((t, dfv, -tfv))[:k_top]
        keep.sort()
        idx = pa.array(keep)
        return pa.table(
            {
                "doc_id": g["doc_id"].take(idx),
                "term": g["term"].take(idx),
                "tf": g["tf"].take(idx),
                "df": g["df"].take(idx),
            }
        )

    return (
        joined.map_batches(partial_top, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(final_top, batch_format="pyarrow")
    )


def repetition_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1, the
    MassiveText repetition filters), integer-exact per doc: n_tokens,
    n_distinct tokens, max_tf (the most frequent token's count — its ratio
    to n_tokens is the "fraction of tokens in the most common word" rule).
    One tokenize pass + one np.unique over (doc, term-code) pairs — no
    per-doc loop."""
    tb = tokenize_batch(batch[text_col], profile="simple")
    n = len(batch)
    n_tokens = tb.doc_len.astype(np.int64)
    n_distinct = np.zeros(n, dtype=np.int64)
    max_tf = np.zeros(n, dtype=np.int64)
    if tb.terms.size:
        uniq, inv = np.unique(tb.terms.astype("U"), return_inverse=True)
        key = tb.doc_idx.astype(np.int64) * np.int64(uniq.size) + inv
        pairs, counts = np.unique(key, return_counts=True)
        d = (pairs // uniq.size).astype(np.int64)
        n_distinct = np.bincount(d, minlength=n).astype(np.int64)
        np.maximum.at(max_tf, d, counts.astype(np.int64))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens),
            "n_distinct": pa.array(n_distinct),
            "max_tf": pa.array(max_tf),
        }
    )


# ---------------------------------------------------------------------------
# Statistical quality scoring: corpus-fit unigram language model
# ---------------------------------------------------------------------------

def _simple_tokens_encoded(text_col):
    """SQL-parity 'simple' tokenization of an Arrow string column, returned
    dictionary-encoded: (dictionary: StringArray of unique terms, codes:
    int64 per occurrence, doc_of: int64 per occurrence). Per-occurrence work
    stays integer-coded — no fixed-width unicode materialization (the cost
    that grows with token width at corpus scale)."""
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    parts = pc.split_pattern_regex(pc.utf8_lower(text_col), pattern="[^a-z0-9]+")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = parts.values
    n_docs = len(text_col)
    if len(flat) == 0:
        return pa.array([], pa.string()), np.empty(0, np.int64), np.empty(0, np.int64)
    offs = np.asarray(parts.offsets, dtype=np.int64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
    nonempty = pc.greater(pc.utf8_length(flat), 0)
    ne = nonempty.to_numpy(zero_copy_only=False).astype(bool)
    denc = pc.dictionary_encode(flat.filter(nonempty))
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    if len(denc) == 0:
        return pa.array([], pa.string()), np.empty(0, np.int64), np.empty(0, np.int64)
    return (
        denc.dictionary,
        np.asarray(denc.indices, dtype=np.int64),
        doc_of[ne],
    )


def bigram_pair_rows(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch pre-aggregated adjacent-token pair rows:
    (doc_id, bigram "w1 w2", w1, w2, k). Integer-coded throughout — the
    unique() runs over composite int64 keys, never unicode arrays."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "bigram": pa.array([], pa.string()),
            "w1": pa.array([], pa.string()),
            "w2": pa.array([], pa.string()),
            "k": pa.array([], pa.int64()),
        }
    )
    dictionary, codes, doc_of = _simple_tokens_encoded(batch[text_col])
    if codes.size < 2:
        return empty
    adj = np.flatnonzero(doc_of[1:] == doc_of[:-1])
    if adj.size == 0:
        return empty
    nd = np.int64(len(dictionary))
    key = (doc_of[adj] * nd + codes[adj]) * nd + codes[adj + 1]
    uk, counts = np.unique(key, return_counts=True)
    kd = uk // (nd * nd)
    rem = uk % (nd * nd)
    k1 = pa.array(rem // nd)
    k2 = pa.array(rem % nd)
    w1 = dictionary.take(k1)
    w2 = dictionary.take(k2)
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(batch["doc_id"])[kd], pa.int64()),
            "bigram": pc.binary_join_element_wise(w1, w2, " "),
            "w1": w1,
            "w2": w2,
            "k": pa.array(counts.astype(np.int64)),
        }
    )


def bigram_lm_scores(docs, text_col: str = "text", scale: int = 10_000):
    """Corpus-fit BIGRAM-LM quality scoring — the conditional-transition
    complement to `unigram_lm_scores` (the CCNet/Wenzek-et-al shape:
    score text by an n-gram LM; here the LM is the corpus itself, so low
    scores flag documents whose token TRANSITIONS are atypical). Model:
    add-one-smoothed conditional p(w2|w1) = (c12 + 1) / (c1 + V) with
    c12 = corpus count of the pair, c1 = corpus count of w1 as a pair
    context, V = number of distinct second-tokens.

    Fixed-point contract: each pair contributes
    floor(ln((c12+1)/(c1+V)) * scale + 0.5) as int64 — both oracle sides
    evaluate one ln on the same exact rational, and the e4 grid leaves
    ~5e-5 headroom to any last-ulp difference between numpy's vectorized
    log and libm's, so the floor cannot flip; per-doc results are int64
    SUMS — order- and partitioning-independent.

    Distributed shape (100-TB discipline): one tokenize pass emits
    per-batch pre-aggregated pair rows (materialized once for its three
    consumers); c12/c1 are Sum groupbys (vocabulary-sized, NEVER
    broadcast — unlike the unigram scorer's top-V cap, the full bigram
    table can exceed worker memory, so counts flow back onto the pair
    rows via two string-keyed partitioned hash_joins); V derives from
    the already-shuffled c12 table; the per-doc reduce is one groupby.
    Docs with fewer than two tokens have no pairs and are absent.

    Returns a Dataset of (doc_id, n_pairs, logprob_sum_e4)."""
    from ray.data.aggregate import Count, Sum

    from .joins import hash_join, join_out_schema

    rows_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("bigram", pa.string()),
            ("w1", pa.string()),
            ("w2", pa.string()),
            ("k", pa.int64()),
        ]
    )
    rows = docs.map_batches(
        lambda b: bigram_pair_rows(b, text_col=text_col),
        batch_format="pyarrow",
    ).materialize()  # three consumers: c12 groupby, c1 groupby, join left

    def proj(cols):
        return lambda b: b.select(cols)

    c12 = (
        rows.map_batches(proj(["bigram", "k"]), batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("k", alias_name="c12"))
        .materialize()  # two consumers: the join and the V derivation
    )
    c1 = (
        rows.map_batches(proj(["w1", "k"]), batch_format="pyarrow")
        .groupby("w1")
        .aggregate(Sum("k", alias_name="c1"))
    )

    def w2_of(batch: pa.Table) -> pa.Table:
        big = batch["bigram"]
        if isinstance(big, pa.ChunkedArray):
            big = big.combine_chunks()
        w2 = pc.list_element(pc.split_pattern(big, " "), 1)
        u = pc.unique(w2)
        return pa.table({"w2": u})

    n_v = (
        c12.map_batches(w2_of, batch_format="pyarrow")
        .groupby("w2")
        .aggregate(Count(alias_name="n"))
        .count()
    )

    c12_schema = pa.schema([("bigram", pa.string()), ("c12", pa.int64())])
    j1 = hash_join(
        rows, c12, "bigram", "bigram",
        left_schema=rows_schema, right_schema=c12_schema,
    )
    j2 = hash_join(
        j1, c1, "w1", "w1",
        left_schema=join_out_schema(rows_schema, c12_schema, "bigram", "bigram"),
        right_schema=pa.schema([("w1", pa.string()), ("c1", pa.int64())]),
    )

    def score(batch: pa.Table) -> pa.Table:
        kk = np.asarray(batch["k"], dtype=np.int64)
        cc12 = np.asarray(batch["c12"], dtype=np.float64)
        cc1 = np.asarray(batch["c1"], dtype=np.float64)
        ilog = np.floor(
            np.log((cc12 + 1.0) / (cc1 + float(n_v))) * scale + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_p": pa.array(kk),
                "lp": pa.array(kk * ilog),
            }
        )

    return (
        j2.map_batches(score, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_p", alias_name="n_pairs"),
            Sum("lp", alias_name="logprob_sum_e4"),
        )
    )


def unigram_lm_scores(
    docs,
    vocab_size: int = 10_000,
    text_col: str = "text",
    concurrency: int = 4,
    round_digits: int = 4,
):
    """Corpus-fit unigram-LM quality scoring (the statistical complement to
    the heuristic Gopher counters): fit p(term) = cnt(term)/total on the
    corpus itself, cap the model at the `vocab_size` most frequent terms
    (cnt DESC, term ASC — deterministic boundary), then score every doc with
    the mean ln p over its IN-VOCAB tokens plus an exact OOV count. Low mean
    logprob = unusual token mix; high oov_rate = vocabulary the corpus LM
    has never seen — both standard pretraining-data quality signals.

    Distributed shape (100-TB discipline): pass 1 is a dictionary-encoded
    per-batch partial count + one Sum groupby (the only shuffle); the FULL
    vocabulary table is never collected — the top-V cut runs as per-block
    partial top-V (exact: post-groupby blocks hold a term once) and only
    V rows reach the driver, which broadcasts (terms, logp) once via
    ray.put. Pass 2 is a stateful actor pool: each actor reads the broadcast
    once in __init__, and per batch matches the batch DICTIONARY (unique
    terms, not occurrences) against the sorted vocab with searchsorted.

    Returns a Dataset of (doc_id, n_tokens, n_oov, lm_logprob) — lm_logprob
    rounded to `round_digits` (np.round matches DuckDB round at 4 digits,
    the repo's float-oracle convention), null when a doc has no in-vocab
    token.
    """
    import ray
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        dictionary, codes, _ = _simple_tokens_encoded(batch[text_col])
        if len(dictionary) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "cnt_p": pa.array([], pa.int64())}
            )
        cnt = np.bincount(codes, minlength=len(dictionary))
        return pa.table(
            {"term": dictionary, "cnt_p": pa.array(cnt.astype(np.int64))}
        )

    counts = (
        docs.map_batches(count_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cnt_p", alias_name="cnt"))
        .materialize()  # two consumers below; count pass runs once
    )
    total = counts.aggregate(Sum("cnt", alias_name="t"))["t"] or 0

    def block_top(batch: pa.Table) -> pa.Table:
        cnt = np.asarray(batch["cnt"])
        term = batch["term"].to_numpy(zero_copy_only=False)
        order = np.lexsort((term, -cnt))[:vocab_size]
        return batch.take(pa.array(order))

    parts = counts.map_batches(block_top, batch_format="pyarrow").take_all()
    cnt = np.array([r["cnt"] for r in parts], dtype=np.int64)
    term = np.array([r["term"] for r in parts], dtype=object)
    order = np.lexsort((term, -cnt))[:vocab_size]
    vterms = term[order].astype("U")
    vlogp = np.log(cnt[order].astype(np.float64) / float(total)) if total else np.empty(0)
    vorder = np.argsort(vterms, kind="stable")  # searchsorted needs term order
    ref = ray.put((vterms[vorder], vlogp[vorder]))

    class Score:
        def __init__(self):
            self.vterms, self.vlogp = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = len(batch)
            dictionary, codes, doc_of = _simple_tokens_encoded(batch[text_col])
            n_tokens = np.bincount(doc_of, minlength=n) if doc_of.size else np.zeros(n, np.int64)
            dterms = dictionary.to_numpy(zero_copy_only=False).astype("U")
            pos = np.searchsorted(self.vterms, dterms)
            pos_c = np.minimum(pos, max(len(self.vterms) - 1, 0))
            in_vocab_d = (
                (self.vterms[pos_c] == dterms)
                if len(self.vterms)
                else np.zeros(dterms.size, dtype=bool)
            )
            dlogp = np.where(in_vocab_d, self.vlogp[pos_c] if len(self.vterms) else 0.0, 0.0)
            occ_in = in_vocab_d[codes] if codes.size else np.zeros(0, bool)
            n_in = np.bincount(doc_of[occ_in], minlength=n) if codes.size else np.zeros(n, np.int64)
            sum_lp = (
                np.bincount(doc_of[occ_in], weights=dlogp[codes[occ_in]], minlength=n)
                if codes.size
                else np.zeros(n, np.float64)
            )
            with np.errstate(invalid="ignore", divide="ignore"):
                mean_lp = np.round(sum_lp / n_in, round_digits)
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_tokens": pa.array(n_tokens.astype(np.int64)),
                    "n_oov": pa.array((n_tokens - n_in).astype(np.int64)),
                    "lm_logprob": pa.array(
                        np.where(n_in > 0, mean_lp, 0.0),
                        pa.float64(),
                        mask=(n_in == 0),  # no in-vocab token -> null
                    ),
                }
            )

    # autoscaling pool (1, N): a fixed pool of N can reserve every CPU of a
    # small cluster and starve the upstream read tasks (observed as a hang
    # in the 4-CPU test session)
    return docs.map_batches(
        Score, batch_format="pyarrow", concurrency=(1, concurrency), num_cpus=1
    )


# ---------------------------------------------------------------------------
# HyperLogLog approximate distinct (Flajolet-Fuchs-Gandouet-Meunier 2007)
# ---------------------------------------------------------------------------
def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (successive halving, exact — no
    float log2, which loses integers past 2^53)."""
    x = x.copy()
    bl = np.zeros(x.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        x[big] >>= np.uint64(s)
    bl[x > 0] += 1
    return bl


def hll_registers(hashes: np.ndarray, p: int = 12) -> np.ndarray:
    """One HLL register array (2^p uint8) from 64-bit hashes: bucket = top
    p bits, rank = leading-zeros-of-suffix + 1. Mergeable by elementwise
    max — the property that makes the sketch a pure per-batch partial."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if hashes.size == 0:
        return regs
    bucket = (hashes >> np.uint64(64 - p)).astype(np.int64)
    w = hashes & ((np.uint64(1) << np.uint64(64 - p)) - np.uint64(1))
    rank = (64 - p) - _bit_length_u64(w) + 1  # w == 0 -> (64-p)+1
    np.maximum.at(regs, bucket, rank.astype(np.uint8))
    return regs


def hll_estimate(regs: np.ndarray) -> int:
    """Cardinality estimate with the standard small-range (linear
    counting) correction."""
    m = regs.size
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if e <= 2.5 * m:
        v = int(np.count_nonzero(regs == 0))
        if v > 0:
            e = m * np.log(m / v)
    return int(round(e))


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (Misra & Gries 1982; mergeable per Agarwal et
# al., "Mergeable Summaries", PODS 2012) + exact recount verification.
# Scale rationale: the exact top-k-by-frequency plan (term_df_top100) must
# shuffle one partial row per DISTINCT TERM PER BATCH -- at 100 TB the term
# shuffle is vocabulary-sized. The MG summary caps every batch's
# contribution at `sketch_k` rows regardless of vocabulary, and the final
# exact recount touches only the provably-sufficient candidate set, so the
# output is EXACT (asserted), not approximate.
# ---------------------------------------------------------------------------
def mg_truncate(terms, counts: np.ndarray, k: int):
    """Truncate an exact (terms, counts) frequency table to a Misra-Gries
    summary of <= k counters: subtract the (k+1)-th largest count `d` from
    every counter and keep the strictly-positive ones. Returns
    (terms, counts, d). Invariants: every surviving count is a LOWER bound
    on the input count; any dropped term's input count is <= d; summing a
    term's counts across summaries under-estimates its true total by at
    most the sum of all `d`s (the mergeable-summaries bound)."""
    counts = np.asarray(counts, dtype=np.int64)
    if len(counts) <= k:
        return terms, counts, 0
    d = int(np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1])
    keep = counts > d
    return terms.filter(pa.array(keep)), counts[keep] - d, d

ERR_SENTINEL = ""  # the simple tokenizer never emits an empty term


def heavy_hitters_exact_topk(
    docs, k_out: int = 25, sketch_k: int = 256, text_col: str = "text"
) -> pa.Table:
    """Exact global top-`k_out` terms by collection frequency via a
    bounded-width Misra-Gries sketch + exact candidate recount.

    Plan: (1) per-batch exact counts truncated to `sketch_k` MG counters
    (error mass carried as an ERR_SENTINEL row, so the whole summary is
    one mergeable Arrow table); (2) groupby-sum merge, then a per-block
    re-truncation keeps the merged summary bounded at any corpus size;
    (3) candidate set R = terms whose upper bound (count + total error)
    could reach rank k_out; (4) one more streaming pass recounts R exactly
    (pc.index_in against the broadcast candidate list -- rows per batch
    <= |R|); (5) the MG guarantee `exact k-th count > total error` is
    ASSERTED, making the returned top-k exact, not approximate.
    Reference seam: the TermsComponent-style term report
    (solrconfig.xml /terms) at vocabularies where the exact shuffle is
    the bottleneck."""
    def partial(batch: pa.Table) -> pa.Table:
        vocab, codes, _ = _simple_tokens_encoded(batch[text_col])
        cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        terms, cnts, d = mg_truncate(vocab, cnt, sketch_k)
        return pa.table(
            {
                "term": pa.concat_arrays(
                    [terms.cast(pa.string()), pa.array([ERR_SENTINEL], pa.string())]
                ),
                "c_p": pa.array(np.concatenate([cnts, [d]]), pa.int64()),
            }
        )

    def retruncate(batch: pa.Table) -> pa.Table:
        # keep the merged summary <= sketch_k rows per block: hierarchical
        # MG merge (summaries of summaries stay summaries)
        is_err = pc.equal(batch["term"], ERR_SENTINEL)
        err = pc.sum(batch.filter(is_err)["c"]).as_py() or 0
        rest = batch.filter(pc.invert(is_err))
        terms, cnts, d = mg_truncate(
            rest["term"].combine_chunks(),
            rest["c"].to_numpy(zero_copy_only=False),
            sketch_k,
        )
        return pa.table(
            {
                "term": pa.concat_arrays(
                    [terms.cast(pa.string()), pa.array([ERR_SENTINEL], pa.string())]
                ),
                "c_p": pa.array(np.concatenate([cnts, [err + d]]), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    merged = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c_p", alias_name="c"))
        .map_batches(retruncate, batch_format="pyarrow")
        .to_pandas()
    )
    err_total = int(merged.loc[merged["term"] == ERR_SENTINEL, "c_p"].sum())
    cand = merged[merged["term"] != ERR_SENTINEL]
    if len(cand) == 0:
        return pa.table({"term": pa.array([], pa.string()),
                         "cf": pa.array([], pa.int64())})
    lb = cand["c_p"].to_numpy()
    k_eff = min(k_out, len(cand))
    l_k = np.partition(lb, len(lb) - k_eff)[len(lb) - k_eff]
    r_terms = cand.loc[lb + err_total >= l_k, "term"].tolist()

    cand_arr = pa.array(sorted(r_terms), pa.string())

    def recount(batch: pa.Table) -> pa.Table:
        vocab, codes, _ = _simple_tokens_encoded(batch[text_col])
        cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        ridx = pc.index_in(vocab, value_set=cand_arr)
        rcodes = ridx.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        hit = rcodes >= 0
        out = np.zeros(len(cand_arr), dtype=np.int64)
        np.add.at(out, rcodes[hit], cnt[hit])
        nz = out > 0
        return pa.table(
            {"term": cand_arr.filter(pa.array(nz)), "c_p": pa.array(out[nz])}
        )

    exact = (
        docs.map_batches(recount, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c_p", alias_name="cf"))
        .to_pandas()
    )
    exact = exact.sort_values(["cf", "term"], ascending=[False, True]).head(k_out)
    kth = int(exact["cf"].iloc[-1])
    # MG exactness guarantee: any term outside R has true cf <= err_total
    # (absent) or cf < l_k <= kth (present-but-pruned upper bound)
    assert kth > err_total, (
        f"MG guarantee violated (kth={kth} <= err={err_total}): "
        f"raise sketch_k={sketch_k} for this distribution"
    )
    return pa.table(
        {
            "term": pa.array(exact["term"].tolist(), pa.string()),
            "cf": pa.array(exact["cf"].to_numpy().astype(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# DDSketch approximate quantiles (Masson, Lee & Rim, VLDB 2019): log-gamma
# exponential buckets with counts. Unlike KLL/t-digest, the sketch is a
# plain histogram -- ORDER-INDEPENDENT and bit-deterministic under any
# merge order (bucket counts just add), which makes it a pure per-batch
# partial + groupby-sum in Ray Data. Guarantee: the value returned for any
# quantile q is within relative error alpha of the true q-quantile value.
# Completes the mergeable-sketch trio: HLL (distinct), Misra-Gries (heavy
# hitters), DDSketch (quantiles).
# ---------------------------------------------------------------------------
def dd_gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def dd_bucket_counts(values: np.ndarray, alpha: float = 0.01):
    """Bucket a batch of non-negative values: idx = ceil(ln v / ln gamma)
    for v > 0 (int64), zeros counted separately. Returns (idx array,
    count array, n_zero). Vectorized; negative values are rejected (the
    two-store variant is a trivial extension, the synthetic domain is
    non-negative)."""
    v = np.asarray(values, dtype=np.float64)
    assert (v >= 0).all(), "DDSketch store expects non-negative values"
    n_zero = int((v == 0).sum())
    pos = v[v > 0]
    if pos.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64), n_zero
    idx = np.ceil(np.log(pos) / np.log(dd_gamma(alpha))).astype(np.int64)
    u, cnt = np.unique(idx, return_counts=True)
    return u, cnt.astype(np.int64), n_zero


def dd_quantile(bucket_idx: np.ndarray, counts: np.ndarray, n_zero: int,
                q: float, alpha: float = 0.01) -> float:
    """q-quantile estimate from merged bucket counts (rank = floor(q*(n-1))
    over the value-sorted multiset; bucket estimate 2*gamma^i/(gamma+1),
    the point whose relative distance to every value in the bucket is
    <= alpha)."""
    order = np.argsort(bucket_idx)
    bucket_idx, counts = bucket_idx[order], counts[order]
    n = int(counts.sum()) + n_zero
    assert n > 0
    rank = int(np.floor(q * (n - 1)))
    if rank < n_zero:
        return 0.0
    cum = n_zero + np.cumsum(counts)
    j = int(np.searchsorted(cum, rank + 1))
    g = dd_gamma(alpha)
    return float(2.0 * g ** int(bucket_idx[j]) / (g + 1.0))


def heavy_hitters_by_group_exact_topk(
    docs,
    group_col: str = "lang",
    k_out: int = 5,
    sketch_k: int = 128,
    text_col: str = "text",
) -> pa.Table:
    """Stratified Misra-Gries: exact top-`k_out` terms per `group_col`
    stratum. Same sketch-then-recount plan as heavy_hitters_exact_topk,
    with every stage keyed by (group, term) and the error mass tracked PER
    GROUP (each stratum gets its own guarantee assertion). Per-batch cost
    is <= sketch_k rows per group present in the batch."""
    def partial(batch: pa.Table) -> pa.Table:
        groups = batch[group_col].to_numpy(zero_copy_only=False)
        out_g, out_t, out_c = [], [], []
        for g in np.unique(groups):
            sub = batch.filter(pa.array(groups == g))
            vocab, codes, _ = _simple_tokens_encoded(sub[text_col])
            cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
            terms, cnts, d = mg_truncate(vocab, cnt, sketch_k)
            out_g.append(np.full(len(terms) + 1, g, dtype=object))
            out_t.append(
                np.concatenate([np.asarray(terms.cast(pa.string())), [ERR_SENTINEL]])
            )
            out_c.append(np.concatenate([cnts, [d]]))
        if not out_g:
            return pa.table({"g": pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "c_p": pa.array([], pa.int64())})
        return pa.table(
            {
                "g": pa.array(np.concatenate(out_g).astype("U"), pa.string()),
                "term": pa.array(
                    np.concatenate(out_t).astype("U"), pa.string()
                ),
                "c_p": pa.array(np.concatenate(out_c).astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    merged = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["g", "term"])
        .aggregate(Sum("c_p", alias_name="c"))
        .to_pandas()
    )
    results = []
    for g, grp in merged.groupby("g", sort=True):
        err_total = int(grp.loc[grp["term"] == ERR_SENTINEL, "c"].sum())
        cand = grp[grp["term"] != ERR_SENTINEL]
        if len(cand) == 0:
            continue
        lb = cand["c"].to_numpy()
        k_eff = min(k_out, len(cand))
        l_k = np.partition(lb, len(lb) - k_eff)[len(lb) - k_eff]
        r_terms = sorted(cand.loc[lb + err_total >= l_k, "term"].tolist())
        results.append((g, r_terms, err_total))

    cand_map = {g: pa.array(terms, pa.string()) for g, terms, _ in results}
    err_map = {g: e for g, _, e in results}

    def recount(batch: pa.Table) -> pa.Table:
        groups = batch[group_col].to_numpy(zero_copy_only=False)
        out_g, out_t, out_c = [], [], []
        for g in np.unique(groups):
            ca = cand_map.get(g)
            if ca is None or len(ca) == 0:
                continue
            sub = batch.filter(pa.array(groups == g))
            vocab, codes, _ = _simple_tokens_encoded(sub[text_col])
            cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
            ridx = pc.index_in(vocab, value_set=ca)
            rc = ridx.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
            hit = rc >= 0
            out = np.zeros(len(ca), dtype=np.int64)
            np.add.at(out, rc[hit], cnt[hit])
            nz = out > 0
            out_g.append(np.full(int(nz.sum()), g, dtype=object))
            out_t.append(np.asarray(ca.filter(pa.array(nz))))
            out_c.append(out[nz])
        if not out_g:
            return pa.table({"g": pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "c_p": pa.array([], pa.int64())})
        return pa.table(
            {
                "g": pa.array(np.concatenate(out_g).astype("U"), pa.string()),
                "term": pa.array(np.concatenate(out_t).astype("U"), pa.string()),
                "c_p": pa.array(np.concatenate(out_c).astype(np.int64)),
            }
        )

    exact = (
        docs.map_batches(recount, batch_format="pyarrow")
        .groupby(["g", "term"])
        .aggregate(Sum("c_p", alias_name="cf"))
        .to_pandas()
    )
    rows = []
    for g, grp in exact.groupby("g", sort=True):
        top = grp.sort_values(["cf", "term"], ascending=[False, True]).head(k_out)
        kth = int(top["cf"].iloc[-1])
        assert kth > err_map[g], (g, kth, err_map[g], "raise sketch_k")
        rows.extend((g, t, int(c)) for t, c in zip(top["term"], top["cf"]))
    return pa.table(
        {
            group_col: pa.array([r[0] for r in rows], pa.string()),
            "term": pa.array([r[1] for r in rows], pa.string()),
            "cf": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def compression_ratio_batch(
    batch: pa.Table, text_col: str = "text", level: int = 6
) -> pa.Table:
    """Per-doc zlib compression ratio — the repetitiveness signal used by
    web-curation pipelines alongside the n-gram counters (a highly
    compressible doc is boilerplate/repetition; an incompressible one is
    noise/binary). ratio_e4 = 10000 * compressed_len // raw_len (integer;
    0 for empty docs). The zlib call is per-row C work on the UTF-8
    buffer, same regime as the build's per-doc sha256."""
    import zlib

    texts = batch[text_col].to_pylist()
    raw = np.array([len(t.encode("utf-8")) for t in texts], dtype=np.int64)
    comp = np.array(
        [len(zlib.compress(t.encode("utf-8"), level)) for t in texts],
        dtype=np.int64,
    )
    ratio = np.where(raw > 0, (10000 * comp) // np.maximum(raw, 1), 0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "raw_bytes": pa.array(raw),
            "compressed_bytes": pa.array(comp),
            "ratio_e4": pa.array(ratio.astype(np.int64)),
        }
    )


def dup_ngram_stats(
    docs,
    n: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-document inter-corpus duplication accounting (the Lee et al.
    ACL'22 'fraction of data duplicated' report, at doc granularity):
    for every doc, the number of its DISTINCT n-token shingles that also
    appear in at least `min_docs - 1` OTHER docs. High dup_shingles /
    n_shingles flags boilerplate-heavy docs BEFORE any dedup decision —
    the accounting companion to line_dedup / substring dedup.

    Distributed shape (the line_dedup discipline at shingle granularity):
    distinct (shingle, doc) rows stream out of one tokenize pass with
    per-batch partials that are doc-atomic, so the shingle-df Sum groupby
    is exact; shingles with df >= min_docs flow back onto the rows via a
    partitioned `left semi` hash_join keyed by the shingle string (the
    df table is corpus-sized — never broadcast, never on the driver);
    per-doc counts are one groupby of per-batch partial sums. Output
    (doc_id, n_shingles, dup_shingles) for docs with >= n tokens; the
    fraction is a trivial client-side division."""
    from ray.data.aggregate import Sum

    from .joins import hash_join
    from .tokenize import tokenize_batch

    def shingle_rows(batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch[text_col], profile="simple")
        ids = np.asarray(batch[id_col], dtype=np.int64)
        empty = pa.table(
            {id_col: pa.array([], pa.int64()),
             "g": pa.array([], pa.string())}
        )
        if tb.terms.size == 0:
            return empty
        order = np.lexsort((tb.positions, tb.doc_idx))
        d = tb.doc_idx[order].astype(np.int64)
        toks = tb.terms.astype("U")[order]
        if d.size < n:
            return empty
        cnt = d.size - (n - 1)
        valid = d[:cnt] == d[n - 1 :]
        if not valid.any():
            return empty
        starts = np.flatnonzero(valid)
        # join n consecutive tokens per window start (vectorized char add)
        g = toks[starts].astype(object)
        for j in range(1, n):
            g = np.char.add(np.char.add(g.astype("U"), " "), toks[starts + j])
        rows = pa.table(
            {
                id_col: pa.array(ids[d[starts]], pa.int64()),
                "g": pa.array(g.astype(object), pa.string()),
            }
        )
        # distinct per (doc, shingle) — doc-atomic within the batch
        gb = pa.TableGroupBy(rows, [id_col, "g"]).aggregate([([], "count_all")])
        return gb.select([id_col, "g"])

    rows = docs.map_batches(shingle_rows, batch_format="pyarrow").materialize()
    rows_schema = pa.schema([(id_col, pa.int64()), ("g", pa.string())])

    def df_partial(batch: pa.Table) -> pa.Table:
        gb = pa.TableGroupBy(batch.select(["g"]), "g").aggregate(
            [([], "count_all")]
        )
        return gb.rename_columns(["g", "df_p"])

    df = (
        rows.map_batches(df_partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("df_p", alias_name="df"))
    )

    def dup_only(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch["df"], min_docs)
        ).select(["g"])

    dup_g = df.map_batches(dup_only, batch_format="pyarrow")

    dup_rows = hash_join(
        rows, dup_g, "g", "g", how="left semi",
        left_schema=rows_schema,
        right_schema=pa.schema([("g", pa.string())]),
    )

    def count_partial(col: str):
        def f(batch: pa.Table) -> pa.Table:
            gb = pa.TableGroupBy(batch.select([id_col]), id_col).aggregate(
                [([], "count_all")]
            )
            return gb.rename_columns([id_col, col])

        return f

    totals = (
        rows.map_batches(count_partial("t_p"), batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("t_p", alias_name="n_shingles"))
    )
    dups = (
        dup_rows.map_batches(count_partial("d_p"), batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("d_p", alias_name="dup_shingles"))
    )

    out = hash_join(
        totals, dups, id_col, id_col, how="left outer",
        left_schema=pa.schema([(id_col, pa.int64()),
                               ("n_shingles", pa.int64())]),
        right_schema=pa.schema([(id_col, pa.int64()),
                                ("dup_shingles", pa.int64())]),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col],
                "n_shingles": batch["n_shingles"],
                "dup_shingles": pc.cast(
                    pc.fill_null(batch["dup_shingles"], 0), pa.int64()
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")
