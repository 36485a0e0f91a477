"""Distributed BPE vocabulary learning (Sennrich, Haddow & Birch, ACL 2016).

Tokenizer induction is a corpus-scale job a training-data engine must run
before any token accounting: learn the top-N merge rules from the data
itself. The key scale property (from the paper): BPE learning only needs
the DISTINCT-WORD HISTOGRAM, not the corpus — so stage 1 reduces 100 TB of
text to a vocabulary-sized (word, count) Dataset with the usual per-batch
partial + one groupby, and the merge loop then iterates over that bounded
table: per iteration, ONE vectorized pair-count pass (weighted by word
count, partial-aggregated before a tiny pair groupby), a driver-side
argmax over pair totals (pairs are vocabulary-bounded), and ONE broadcast
merge-application map. No stage ever materializes the corpus; the loop
state (symbol lists per distinct word) lives in the object store between
iterations.

Determinism: the winning pair each round is (count DESC, left id ASC,
right id ASC); greedy left-to-right within-word merge order matches the
reference algorithm (overlapping matches resolve by run parity). The
whole procedure is a pure function of the word histogram.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _word_histogram(docs, text_col: str = "text"):
    """Distinct pre-token (lowercased [a-z0-9]+ run) histogram: per-batch
    partial counts, one word-keyed groupby. Returns a Dataset of
    (word, n)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        parts = pc.split_pattern_regex(pc.utf8_lower(text), pattern="[^a-z0-9]+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = parts.values
        nonempty = pc.greater(pc.utf8_length(flat), 0)
        denc = pc.dictionary_encode(flat.filter(nonempty))
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        if len(denc) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "n_p": pa.array([], pa.int64())})
        cnt = np.bincount(
            np.asarray(denc.indices, dtype=np.int64),
            minlength=len(denc.dictionary),
        )
        return pa.table(
            {"word": denc.dictionary.cast(pa.string()),
             "n_p": pa.array(cnt.astype(np.int64))}
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n_p", alias_name="n"))
    )


def _encode_words(words: list[str]):
    """Initial symbolization: one int32 id per character, '</w>' appended
    (id = 256 + ord is NOT used — ids are byte values 0-255 plus the
    end-of-word marker 256; merges allocate 257, 258, ...). Returns
    (flat int32 symbols, int64 offsets)."""
    bufs = [np.frombuffer(w.encode("utf-8"), dtype=np.uint8).astype(np.int32)
            for w in words]
    lens = np.array([b.size + 1 for b in bufs], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    flat = np.empty(int(offs[-1]), dtype=np.int32)
    for i, b in enumerate(bufs):
        flat[offs[i]:offs[i] + b.size] = b
        flat[offs[i + 1] - 1] = 256  # </w>
    return flat, offs


def _pair_counts(flat: np.ndarray, offs: np.ndarray, wcount: np.ndarray):
    """Weighted adjacent-pair counts within word boundaries: one
    vectorized pass. Returns (pair_keys uint64 = a<<32|b, counts int64)."""
    n = flat.size
    if n < 2:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    word_of = np.repeat(
        np.arange(len(wcount), dtype=np.int64), np.diff(offs)
    )
    same = word_of[1:] == word_of[:-1]
    a = flat[:-1][same].astype(np.uint64)
    b = flat[1:][same].astype(np.uint64)
    w = wcount[word_of[:-1][same]]
    key = (a << np.uint64(32)) | b
    uniq, inv = np.unique(key, return_inverse=True)
    cnt = np.bincount(inv, weights=w.astype(np.float64)).astype(np.int64)
    return uniq, cnt


def _apply_merge(flat: np.ndarray, offs: np.ndarray, a: int, b: int,
                 new_id: int):
    """Greedy left-to-right replacement of adjacent (a, b) with new_id
    inside word boundaries — vectorized: within each run of consecutive
    match positions (the only way matches interact), keep even-ranked
    ones (left-to-right greedy), then contract the flat buffer."""
    n = flat.size
    word_of = np.repeat(np.arange(offs.size - 1, dtype=np.int64),
                        np.diff(offs))
    m = np.flatnonzero(
        (flat[:-1] == a) & (flat[1:] == b) & (word_of[:-1] == word_of[1:])
    )
    if m.size == 0:
        return flat, offs, 0
    # runs of consecutive positions: greedy keeps rank-0,2,4,... of each run
    run_start = np.concatenate([[True], m[1:] != m[:-1] + 1])
    run_id = np.cumsum(run_start) - 1
    rank = np.arange(m.size) - np.concatenate(
        [[0], np.flatnonzero(run_start)[1:]]
    )[run_id]
    keep = m[rank % 2 == 0]
    out = flat.copy()
    out[keep] = np.int32(new_id)
    drop = np.zeros(n, dtype=bool)
    drop[keep + 1] = True
    # new offsets: each word loses its number of merged pairs
    merged_per_word = np.bincount(word_of[keep], minlength=offs.size - 1)
    new_offs = offs - np.concatenate(
        [[0], np.cumsum(merged_per_word)]
    )
    return out[~drop], new_offs, int(keep.size)


def bpe_learn(
    docs, n_merges: int = 20, text_col: str = "text", shards: int | None = None
) -> pa.Table:
    """Learn `n_merges` BPE merge rules from a docs Dataset. Returns
    (rank, left_id, right_id, new_id, pair_count) — all-integer, a pure
    function of the corpus's word histogram.

    The histogram reduction is fully distributed; with the default
    shards=None the merge loop runs single-node over the DISTINCT-WORD
    symbol table (bounded by vocabulary size — the Sennrich formulation's
    point). At 10^8+ distinct words pass `shards`: the symbol table
    becomes a Dataset of list<int32> rows and each iteration runs
    _pair_counts as a map_batches partial + a pair groupby (the driver
    only ever sees per-pair TOTALS, which are alphabet²+merges-bounded) —
    bit-identical rules to the single-node path under any partitioning
    (tests/test_bpe.py) because partial sums are order-invariant and the
    argmax tie-break (count DESC, left ASC, right ASC) is global."""
    if shards is not None:
        return _bpe_learn_sharded(docs, n_merges, text_col, shards)
    hist = _word_histogram(docs, text_col).to_pandas()
    hist = hist.sort_values("word").reset_index(drop=True)
    words = hist["word"].tolist()
    wcount = hist["n"].to_numpy().astype(np.int64)
    if not words:
        return pa.table(
            {c: pa.array([], pa.int64())
             for c in ("rank", "left_id", "right_id", "new_id", "pair_count")}
        )
    flat, offs = _encode_words(words)
    rules = []
    next_id = 257
    for r in range(n_merges):
        keys, cnts = _pair_counts(flat, offs, wcount)
        if keys.size == 0:
            break
        best = int(cnts.max())
        cand = keys[cnts == best]
        key = int(cand.min())  # (left ASC, right ASC) among count ties
        a, b = key >> 32, key & 0xFFFFFFFF
        flat, offs, _ = _apply_merge(flat, offs, a, b, next_id)
        rules.append((r, a, b, next_id, best))
        next_id += 1
    return _rules_table(rules)


def _rules_table(rules: list[tuple]) -> pa.Table:
    return pa.table(
        {
            "rank": pa.array([x[0] for x in rules], pa.int64()),
            "left_id": pa.array([x[1] for x in rules], pa.int64()),
            "right_id": pa.array([x[2] for x in rules], pa.int64()),
            "new_id": pa.array([x[3] for x in rules], pa.int64()),
            "pair_count": pa.array([x[4] for x in rules], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# sharded merge loop (the 10^8+-distinct-words path)
# ---------------------------------------------------------------------------


def _syms_to_table(words, wcount, flat, offs) -> pa.Table:
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    if not isinstance(words, pa.Array):
        words = pa.array(words, pa.string())
    return pa.table(
        {
            "word": words,
            "n": pa.array(np.asarray(wcount, dtype=np.int64)),
            "syms": pa.LargeListArray.from_arrays(
                pa.array(np.asarray(offs, dtype=np.int64)),
                pa.array(flat, pa.int32()),
            ),
        }
    )


def _table_syms(batch: pa.Table):
    syms = batch["syms"]
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    offs = syms.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = syms.values.slice(
        offs[0], int(offs[-1] - offs[0])
    ).to_numpy(zero_copy_only=False).astype(np.int32)
    return flat, offs - offs[0], np.asarray(batch["n"], dtype=np.int64)


def _bpe_learn_sharded(docs, n_merges: int, text_col: str, shards: int):
    """Per-iteration: map_batches partial pair counts + a tiny pair
    groupby; state (the distinct-word symbol table, ~vocabulary-sized)
    lives as a materialized Dataset between iterations — the corpus is
    read exactly once (for the histogram), and the driver holds only
    per-pair totals."""
    from ray.data.aggregate import Sum

    def symbolize(batch: pa.Table) -> pa.Table:
        words = batch["word"].to_pylist()
        flat, offs = _encode_words(words)
        return _syms_to_table(words, np.asarray(batch["n"]), flat, offs)

    state = (
        _word_histogram(docs, text_col)
        .repartition(shards)
        .map_batches(symbolize, batch_format="pyarrow")
        .materialize()
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        flat, offs, n = _table_syms(batch)
        keys, cnts = _pair_counts(flat, offs, n)
        return pa.table(
            {
                "pair": pa.array(keys.view(np.int64)),
                "c_p": pa.array(cnts),
            }
        )

    rules = []
    next_id = 257
    for r in range(n_merges):
        tot = (
            state.map_batches(pair_partial, batch_format="pyarrow")
            .groupby("pair")
            .aggregate(Sum("c_p", alias_name="c"))
            .to_pandas()
        )
        if not len(tot):
            break
        keys = tot["pair"].to_numpy(dtype=np.int64).view(np.uint64)
        cnts = tot["c"].to_numpy(dtype=np.int64)
        best = int(cnts.max())
        key = int(keys[cnts == best].min())
        a, b = key >> 32, key & 0xFFFFFFFF

        def apply_batch(batch: pa.Table, a=a, b=b, nid=next_id) -> pa.Table:
            flat, offs, n = _table_syms(batch)
            nf, no, _ = _apply_merge(flat, offs, a, b, nid)
            return _syms_to_table(batch["word"], n, nf, no)

        state = state.map_batches(
            apply_batch, batch_format="pyarrow"
        ).materialize()
        rules.append((r, a, b, next_id, best))
        next_id += 1
    return _rules_table(rules)


# ---------------------------------------------------------------------------
# encode: apply learned merge rules (the analyzer-chain analog for the
# training-data path — reference schema.xml:273-308 is the per-record
# heavy transform; here it is rank-order merge application, Sennrich §2)
# ---------------------------------------------------------------------------


def encode_distinct_words(words: list[str], rules: pa.Table):
    """Encode distinct words by applying the merge rules in rank order
    (greedy left-to-right within each rank — identical semantics to the
    learning loop, so learning then encoding the same corpus yields the
    same symbol sequences). Returns (flat int32 token ids, int64 offsets):
    word i's tokens are flat[offs[i]:offs[i+1]]. Vectorized: one
    _apply_merge pass per rule over the whole distinct-word buffer."""
    flat, offs = _encode_words(words)
    order = np.argsort(np.asarray(rules["rank"], dtype=np.int64))
    la = np.asarray(rules["left_id"], dtype=np.int64)[order]
    rb = np.asarray(rules["right_id"], dtype=np.int64)[order]
    ni = np.asarray(rules["new_id"], dtype=np.int64)[order]
    for i in range(la.size):
        flat, offs, _ = _apply_merge(flat, offs, int(la[i]), int(rb[i]), int(ni[i]))
    return flat, offs


def bpe_token_counts(
    docs,
    rules: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document EXACT BPE token count under `rules` (learned by
    bpe_learn): the real-tokenizer accounting that replaces the whitespace
    proxy in budget math. Returns a Dataset of (id, n_bpe_tokens). A
    word's count includes its (possibly merged-away) `</w>` end-of-word
    symbol — the symbol stream the merge rules actually operate on.

    Scale shape: the rules table is tiny (n_merges rows) and ships by
    closure; per batch the text is split with the SAME pre-token regex as
    learning, dictionary-encoded so each DISTINCT word in the batch is
    encoded ONCE (the word-histogram bound from the paper, applied at
    encode time), then counts scatter back per doc with one bincount.
    Pure map — no shuffle, no driver state."""
    kernel = bpe_count_kernel(rules, text_col)

    def count(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col],
                "n_bpe_tokens": pa.array(kernel(batch)),
            }
        )

    return docs.map_batches(count, batch_format="pyarrow")


def bpe_encode_docs(
    docs,
    rules: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Encode every document into its BPE token-id sequence under `rules`
    — the actual trainer feed, not just the count. Returns a Dataset of
    (id, token_ids, n_bpe_tokens) where token_ids is the space-joined
    decimal id sequence (exchange-friendly and hashable by the driver's
    column-sorted value hash; a trainer shard writer would emit the same
    ids as int32 lists).

    Same scale shape as bpe_token_counts: pure map, rules by closure, each
    batch's DISTINCT words encoded once; the per-doc sequence assembles
    with one take + one pc.binary_join over rebuilt list offsets — no
    per-row Python in the hot path beyond the per-DISTINCT-word id-string
    render (vocabulary-bounded per batch)."""

    def encode(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        parts = pc.split_pattern_regex(pc.utf8_lower(text), pattern="[^a-z0-9]+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        l_offs = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        l_offs = l_offs - l_offs[0]
        flat_words = parts.values
        nonempty = pc.greater(pc.utf8_length(flat_words), 0).to_numpy(
            zero_copy_only=False
        )
        n_docs = len(batch)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(l_offs))
        denc = flat_words.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        if len(denc) == 0 or not nonempty.any():
            return pa.table(
                {
                    id_col: batch[id_col],
                    "token_ids": pa.array([""] * n_docs, pa.string()),
                    "n_bpe_tokens": pa.array(np.zeros(n_docs, np.int64)),
                }
            )
        words = denc.dictionary.to_pylist()
        tok_flat, tok_offs = encode_distinct_words(words, rules)
        tok_per_word = np.diff(tok_offs)
        # one id-string per DISTINCT word (vocab-bounded)
        word_strs = pa.array(
            [
                " ".join(map(str, tok_flat[tok_offs[i]:tok_offs[i + 1]]))
                for i in range(len(words))
            ],
            pa.string(),
        )
        idx = np.asarray(denc.indices, dtype=np.int64)
        keep = np.flatnonzero(nonempty)
        per_doc = np.bincount(doc_of[keep], minlength=n_docs)
        offs2 = np.concatenate([[0], np.cumsum(per_doc)]).astype(np.int64)
        seq = word_strs.take(pa.array(idx[keep]))
        la = pa.LargeListArray.from_arrays(pa.array(offs2), seq)
        joined = pc.binary_join(la, " ")
        counts = np.bincount(
            doc_of[keep], weights=tok_per_word[idx[keep]], minlength=n_docs
        ).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "token_ids": joined,
                "n_bpe_tokens": pa.array(counts),
            }
        )

    return docs.map_batches(encode, batch_format="pyarrow")


def bpe_count_kernel(rules: pa.Table, text_col: str = "text"):
    """batch -> int64 ndarray of per-doc BPE token counts (the pluggable
    `token_counter` shape packing.pack_sequences accepts). The rules table
    is tiny (n_merges rows) and ships by closure."""

    def kernel(batch: pa.Table) -> np.ndarray:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        parts = pc.split_pattern_regex(pc.utf8_lower(text), pattern="[^a-z0-9]+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        l_offs = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        l_offs = l_offs - l_offs[0]
        flat_words = parts.values
        nonempty = pc.greater(pc.utf8_length(flat_words), 0).to_numpy(
            zero_copy_only=False
        )
        doc_of = np.repeat(np.arange(len(batch), dtype=np.int64), np.diff(l_offs))
        denc = flat_words.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        n_docs = len(batch)
        out = np.zeros(n_docs, dtype=np.int64)
        if len(denc) and nonempty.any():
            words = denc.dictionary.to_pylist()
            _, offs = encode_distinct_words(words, rules)
            tok_per_word = np.diff(offs)
            idx = np.asarray(denc.indices, dtype=np.int64)
            contrib = np.where(nonempty, tok_per_word[idx], 0)
            out = np.bincount(doc_of, weights=contrib, minlength=n_docs).astype(
                np.int64
            )
        return out

    return kernel
