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


def bpe_learn(docs, n_merges: int = 20, text_col: str = "text") -> pa.Table:
    """Learn `n_merges` BPE merge rules from a docs Dataset. Returns
    (rank, left_id, right_id, new_id, pair_count) — all-integer, a pure
    function of the corpus's word histogram.

    The histogram reduction is fully distributed; the merge loop here runs
    single-node over the DISTINCT-WORD symbol table (bounded by vocabulary
    size — the Sennrich formulation's point). At 10^8+ distinct words,
    shard the symbol table into a Dataset and make _pair_counts a
    map_batches partial + pair groupby per iteration (same kernels,
    per-shard offsets) — the loop structure is unchanged; the driver only
    ever sees per-pair totals."""
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
    return pa.table(
        {
            "rank": pa.array([x[0] for x in rules], pa.int64()),
            "left_id": pa.array([x[1] for x in rules], pa.int64()),
            "right_id": pa.array([x[2] for x in rules], pa.int64()),
            "new_id": pa.array([x[3] for x in rules], pa.int64()),
            "pair_count": pa.array([x[4] for x in rules], pa.int64()),
        }
    )
