"""Sequence packing for LLM pretraining: concatenate documents in a
deterministic order and cut the stream into fixed-size token blocks (the
GPT-style pack-and-split layout). The operator assigns every document its
exact position in the packed stream — (start_token, block_id, block_offset)
— which is all a downstream shard writer needs to materialize blocks.

The core primitive is a DISTRIBUTED EXACT PREFIX SUM over an ordered key:
  stage 1: one streaming pass emits (range_bucket, partial token sum);
  stage 2: a tiny groupby + driver-side exclusive scan over the ~N/2^shift
           bucket totals yields each bucket's base offset (broadcast);
  stage 3: each bucket sorts its docs by id and cumsums locally, adding the
           base — every stage is bounded by the bucket, never the corpus.

Deterministic and partitioning-invariant: the packed layout depends only on
(id, n_tokens), never on batch or block boundaries. All-integer output, so
the DuckDB oracle (a SUM ... OVER (ORDER BY id) window) matches exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .tokenize import tokenize_batch


def pack_sequences(
    docs,
    block_tokens: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_shift: int = 10,
    token_counter=None,
):
    """Returns a Dataset of (id, n_tokens, start_token, block_id,
    block_offset): doc `id`'s tokens occupy [start_token, start_token +
    n_tokens) of the concatenated stream; it begins in block `block_id` at
    offset `block_offset` (docs spill across block boundaries — the
    standard pretraining packing; block count = ceil(total/B)).

    `bucket_shift`: docs group by id >> bucket_shift for the scan; at
    10^12 docs pick ~20 (1M-doc ranges -> 1M bucket totals, still a
    trivially small driver scan relative to the data).

    `token_counter`: optional batch -> int64 ndarray of per-doc token
    counts, replacing the default whitespace-profile proxy — pass a real
    tokenizer's accounting (e.g. bpe.bpe_token_counts's kernel) so the
    packed layout matches what the trainer will actually see."""
    import ray
    from ray.data.aggregate import Sum

    def counts(batch: pa.Table) -> pa.Table:
        if token_counter is not None:
            n = np.asarray(token_counter(batch), dtype=np.int64)
        else:
            n = tokenize_batch(batch[text_col], profile="simple").doc_len
        ids = np.asarray(batch[id_col], dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids),
                "n_tokens": pa.array(n.astype(np.int64)),
                "__bucket": pa.array(ids >> bucket_shift),
            }
        )

    tok = docs.map_batches(counts, batch_format="pyarrow")

    def bucket_partial(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch["__bucket"])
        t = np.asarray(batch["n_tokens"])
        u, inv = np.unique(b, return_inverse=True)
        return pa.table(
            {
                "__bucket": pa.array(u),
                "t_p": pa.array(np.bincount(inv, weights=t).astype(np.int64)),
            }
        )

    totals = (
        tok.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("__bucket")
        .aggregate(Sum("t_p", alias_name="t"))
        .to_pandas()
        .sort_values("__bucket")
    )
    buckets = totals["__bucket"].to_numpy(dtype=np.int64)
    sums = totals["t"].to_numpy(dtype=np.int64)
    bases = np.concatenate(([0], np.cumsum(sums)[:-1]))
    base_ref = ray.put((buckets, bases))

    def scan_bucket(g: pa.Table) -> pa.Table:
        import ray as _ray

        bks, bss = _ray.get(base_ref)
        ids = np.asarray(g[id_col])
        t = np.asarray(g["n_tokens"])
        order = np.argsort(ids)
        ids, t = ids[order], t[order]
        base = int(bss[np.searchsorted(bks, int(g["__bucket"][0].as_py()))])
        start = base + np.concatenate(([0], np.cumsum(t)[:-1]))
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(t, pa.int64()),
                "start_token": pa.array(start, pa.int64()),
                "block_id": pa.array(start // block_tokens, pa.int64()),
                "block_offset": pa.array(start % block_tokens, pa.int64()),
            }
        )

    return tok.groupby("__bucket").map_groups(
        scan_bucket, batch_format="pyarrow"
    )


def chunk_spans(
    docs,
    window: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Context-window chunking with overlap (the other standard pretraining
    layout, complementing pack_sequences): each document is cut into spans
    of `window` whitespace tokens starting every `stride` tokens, the last
    span clipped to the doc end. Emits (id, chunk_idx, start_tok, end_tok,
    n_chunk_tokens) -- a doc with n tokens yields
    1 + ceil(max(n - window, 0) / stride) chunks (n > 0).

    Pure map, no shuffle: the span arithmetic is a per-batch numpy
    repeat/arange expansion over the vectorized token counts (the token
    stream itself is never materialized), so the stage streams at any
    corpus size. All-integer output (DuckDB oracle: generate_series over
    the same count expression)."""
    import pyarrow.compute as pc

    # overlap semantics: stride > window would skip tokens AND emit an
    # empty trailing span (hypothesis-found edge, n=2/W=1/S=2)
    assert 0 < stride <= window

    def expand(batch: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(batch[text_col], r"\S+"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        k = np.where(
            n > 0, 1 + (np.maximum(n - window, 0) + stride - 1) // stride, 0
        ).astype(np.int64)
        doc_of = np.repeat(np.arange(len(n), dtype=np.int64), k)
        # chunk_idx within each doc: global arange minus each doc's base
        base = np.concatenate([[0], np.cumsum(k)[:-1]])
        cidx = np.arange(int(k.sum()), dtype=np.int64) - base[doc_of]
        start = cidx * stride
        end = np.minimum(start + window, n[doc_of])
        return pa.table(
            {
                id_col: pa.array(ids[doc_of], pa.int64()),
                "chunk_idx": pa.array(cidx),
                "start_tok": pa.array(start),
                "end_tok": pa.array(end),
                "n_chunk_tokens": pa.array(end - start),
            }
        )

    return docs.map_batches(expand, batch_format="pyarrow")
