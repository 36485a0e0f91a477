"""Deduplication operators for large-scale training-data pipelines.

  * exact dedup by content hash      — the reference's semantics (md5-derived
    Solr uniqueKey upsert, parseJSON.pl:330 + schema.xml:1030-1033) as a
    hash-partitioned groupby + keep-first;
  * n-gram Jaccard similarity join   — complete (no candidate loss): distinct
    (doc, token) pairs -> groupby(token) pair generation -> integer-exact
    jaccard threshold test (2*inter >= union for tau=0.5 etc.). SQL-checkable.
  * MinHash + LSH near-dup           — shingle -> minhash -> band -> bucket
    groupby -> candidate pairs -> exact-jaccard verification;
  * SimHash                          — 64-bit sketch + Hamming-ball buckets;
  * embedding-cosine near-dup        — see similarity.py (shared kernels).

Scale notes (documented per north rule): every pair-generating groupby is
bounded by the hottest key. For Jaccard the candidate stage uses PREFIX
FILTERING (AllPairs/PPJoin discipline): each doc emits only the first
|d| - ceil(tau*|d|) + 1 of its tokens under a global (df asc, term asc)
order, and any pair with J >= tau provably shares its globally-smallest
common token inside BOTH prefixes — exact completeness with stopword-like
tokens pushed out of every prefix, so no term group blows up O(df^2).
MinHash bands bound the same blow-up probabilistically.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .tokenize import tokenize_batch

# ---------------------------------------------------------------------------
# shared pair-stream reduction
# ---------------------------------------------------------------------------


def pair_reduce(
    pairs_ds,
    mode: str,
    value_col: str | None = None,
    out_col: str | None = None,
    carry_cols: tuple = (),
    num_buckets: int = 256,
):
    """Per-(doc_a, doc_b) reduction of a pair Dataset via ONE single-int
    bucket shuffle + a vectorized per-bucket segment reduce (lexsort +
    first-of-run / reduceat). Replaces
    `groupby(["doc_a","doc_b"]).aggregate(...)` on pair streams: Ray
    Data's composite-key aggregate materializes the same result ~100x
    slower once the stream reaches millions of rows (same-window A/B at
    sf0.1, 3.69M distinct pairs from a ~22M-row emission: 282.8 s
    composite aggregate vs 2.8 s bucketed reduce, identical output —
    BENCH/round5_pair_aggregate_ab.json). `num_buckets` is the shuffle
    fan-out knob: size so a bucket's pair rows fit a worker (at 100 TB
    raise it with the corpus; the reduce itself is O(n log n) per bucket).

    mode:
      'first' — distinct pairs; `carry_cols` taken from the pair's first
                occurrence (correct when they are functions of the pair,
                e.g. per-doc prefix sizes);
      'count' — occurrence count per pair -> `out_col`;
      'min'   — segment min of `value_col` -> `out_col`.
    """
    assert mode in ("first", "count", "min")

    def add_bucket(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["doc_a"], dtype=np.int64).view(np.uint64)
        b = np.asarray(batch["doc_b"], dtype=np.int64).view(np.uint64)
        h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ (
            b * np.uint64(0xC2B2AE3D27D4EB4F)
        )
        return batch.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    def reduce_bucket(g: pa.Table) -> pa.Table:
        a = np.asarray(g["doc_a"], dtype=np.int64)
        b = np.asarray(g["doc_b"], dtype=np.int64)
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        first = np.concatenate(
            ([True], (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1]))
        )
        starts = np.flatnonzero(first)
        cols = {"doc_a": pa.array(a_s[first]), "doc_b": pa.array(b_s[first])}
        if mode == "first":
            for c in carry_cols:
                cols[c] = pa.array(np.asarray(g[c], dtype=np.int64)[order][first])
        elif mode == "count":
            seg = np.diff(np.concatenate((starts, [a_s.size])))
            cols[out_col] = pa.array(seg.astype(np.int64))
        else:  # min
            v = np.asarray(g[value_col], dtype=np.int64)[order]
            cols[out_col] = pa.array(np.minimum.reduceat(v, starts))
        return pa.table(cols)

    return (
        pairs_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(reduce_bucket, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_text_sha(batch: pa.Table, text_col: str = "text") -> pa.Table:
    shas = [
        hashlib.sha256(t.encode("utf-8")).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column("text_sha256", pa.array(shas, pa.string()))


def exact_dedup(
    ds, text_col: str = "text", id_col: str = "doc_id", num_buckets: int = 64
):
    """Keep the min-id row per content sha; returns a Dataset of
    (doc_id, text_sha256, n_copies).

    Scale shape (same discipline as the build path's BucketWriter,
    build.py): rows hash-partition into `num_buckets` sha-range buckets and
    each bucket deduplicates VECTORIZED — lexsort by (sha, id), then
    first-of-run + run lengths. One Python call per bucket, never one per
    unique document (a per-sha map_groups UDF is ~9x slower and at 10^9
    groups becomes the pipeline)."""
    ds = ds.map_batches(
        lambda b: add_text_sha(b, text_col), batch_format="pyarrow"
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        sha = np.asarray(b["text_sha256"].to_pylist(), dtype="U64")
        bk = (
            np.array([int(s[:8], 16) for s in sha.tolist()], dtype=np.int64)
            % num_buckets
        )
        return b.append_column("dedup_bucket", pa.array(bk, pa.int64()))

    def bucket_dedup(g: pa.Table) -> pa.Table:
        sha = np.asarray(g["text_sha256"].to_pylist(), dtype="U64")
        ids = np.asarray(g[id_col], dtype=np.int64)
        order = np.lexsort((ids, sha))
        sha_s, ids_s = sha[order], ids[order]
        starts = np.flatnonzero(
            np.concatenate(([True], sha_s[1:] != sha_s[:-1]))
        )
        counts = np.diff(np.append(starts, sha_s.size))
        return pa.table(
            {
                "doc_id": pa.array(ids_s[starts], pa.int64()),
                "text_sha256": pa.array(sha_s[starts], pa.string()),
                "n_copies": pa.array(counts, pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("dedup_bucket")
        .map_groups(bucket_dedup, batch_format="pyarrow")
    )


def exact_dedup_collect(
    ds,
    collect_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
):
    """exact_dedup that also ACCUMULATES the sorted distinct values of
    `collect_col` across each duplicate group into a list column
    `{collect_col}s` — the query-path form of the reference's multiValued
    productname atomic-add (parseJSON.pl:154-181: the same segment arriving
    from another product appends that product's name to the shared doc).
    Same sha-range-partitioned vectorized shape as exact_dedup: one Python
    call per bucket, list assembly via lexsort + run boundaries, never a
    per-group UDF."""
    ds = ds.map_batches(
        lambda b: add_text_sha(b, text_col), batch_format="pyarrow"
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        sha = np.asarray(b["text_sha256"].to_pylist(), dtype="U64")
        bk = (
            np.array([int(s[:8], 16) for s in sha.tolist()], dtype=np.int64)
            % num_buckets
        )
        return b.append_column("dedup_bucket", pa.array(bk, pa.int64()))

    def bucket_collect(g: pa.Table) -> pa.Table:
        sha = np.asarray(g["text_sha256"].to_pylist(), dtype="U64")
        ids = np.asarray(g[id_col], dtype=np.int64)
        vals = g[collect_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sha))
        sha_s, ids_s = sha[order], ids[order]
        starts = np.flatnonzero(
            np.concatenate(([True], sha_s[1:] != sha_s[:-1]))
        )
        counts = np.diff(np.append(starts, sha_s.size))
        gi = np.cumsum(np.concatenate(([True], sha_s[1:] != sha_s[:-1]))) - 1
        # sorted distinct values per group
        o2 = np.lexsort((vals[order], gi))
        v2, g2 = vals[order][o2], gi[o2]
        uniq = np.concatenate(
            ([True], (g2[1:] != g2[:-1]) | (v2[1:] != v2[:-1]))
        )
        v2, g2 = v2[uniq], g2[uniq]
        offs = np.concatenate(
            ([0], np.cumsum(np.bincount(g2, minlength=starts.size)))
        )
        lists = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(v2, pa.string())
        )
        return pa.table(
            {
                "doc_id": pa.array(ids_s[starts], pa.int64()),
                "text_sha256": pa.array(sha_s[starts], pa.string()),
                "n_copies": pa.array(counts, pa.int64()),
                collect_col + "s": lists,
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("dedup_bucket")
        .map_groups(bucket_collect, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# token-set Jaccard similarity join (complete; SQL-checkable)
# ---------------------------------------------------------------------------


def distinct_doc_terms(
    batch: pa.Table, text_col: str = "text", shingle: int = 1
) -> pa.Table:
    """Explode to distinct (doc_id, term) rows (simple profile). With
    shingle > 1 the unit is a w-shingle of consecutive tokens (space-joined,
    position order) — the n-gram Jaccard variant; docs with fewer than
    `shingle` tokens contribute nothing."""
    tb = tokenize_batch(batch[text_col], profile="simple")
    if tb.terms.size == 0 or (shingle > 1 and tb.terms.size < shingle):
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "term": pa.array([], pa.string())}
        )
    if shingle > 1:
        order = np.lexsort((tb.positions, tb.doc_idx))
        t = tb.terms[order]
        d = tb.doc_idx[order]
        cnt = t.size - (shingle - 1)
        valid = np.flatnonzero(d[:cnt] == d[shingle - 1 :])
        if valid.size == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "term": pa.array([], pa.string())}
            )
        sh = np.array(
            [" ".join(map(str, t[i : i + shingle])) for i in valid], dtype=object
        )
        doc_ids = np.asarray(batch["doc_id"])[d[valid]]
        uniq, inv = np.unique(sh.astype("U"), return_inverse=True)
        key = d[valid].astype(np.int64) * np.int64(uniq.size) + inv
        _, first = np.unique(key, return_index=True)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[first], pa.int64()),
                "term": pa.array(sh[first].astype("U"), pa.string()),
            }
        )
    doc_ids = np.asarray(batch["doc_id"])[tb.doc_idx]
    terms = tb.terms.astype("U")
    # integer pair key (batch-local row, term code). NOT a string
    # concatenation: numpy's fixed-width U dtype strips trailing NULs, so a
    # '\x00' separator vanishes and (doc 1, term '2foo') collides with
    # (doc 12, term 'foo').
    uniq, inv = np.unique(terms, return_inverse=True)
    key = tb.doc_idx.astype(np.int64) * np.int64(uniq.size) + inv
    _, first = np.unique(key, return_index=True)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[first], pa.int64()),
            "term": pa.array(terms[first], pa.string()),
        }
    )


def _empty_pairs() -> pa.Table:
    return pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "size_a": pa.array([], pa.int64()),
            "size_b": pa.array([], pa.int64()),
        }
    )


def hot_term_dfs(ds, text_col: str = "text", hot_df_min: int = 32,
                 shingle: int = 1) -> dict[str, int]:
    """Global df of every term with df >= hot_df_min (the broadcast-small
    side of the prefix ordering). Bounded: at most total_tokens/hot_df_min
    entries, regardless of corpus size."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = distinct_doc_terms(batch, text_col, shingle)
        if t.num_rows == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "df_p": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(
            t["term"].to_numpy(zero_copy_only=False).astype("U"), return_counts=True
        )
        return pa.table(
            {
                "term": pa.array(uniq, pa.string()),
                "df_p": pa.array(counts.astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df_p", alias_name="df"))
    )

    def only_hot(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return batch.filter(_pc.greater_equal(batch["df"], hot_df_min))

    hot = agg.map_batches(only_hot, batch_format="pyarrow").take_all()
    return {r["term"]: int(r["df"]) for r in hot}


def prefix_candidate_pairs(
    ds,
    tau_num: int,
    tau_den: int,
    text_col: str = "text",
    hot_df_min: int = 32,
    shingle: int = 1,
):
    """Candidate pairs via AllPairs prefix filtering (Bayardo et al., WWW'07
    semantics; public algorithm). Exact-complete for token-set Jaccard >=
    tau_num/tau_den:

    Under ANY fixed global token order, if |a∩b| >= alpha then the
    (|x|-alpha+1)-prefixes of both docs contain the globally-smallest common
    token; J >= tau implies |a∩b| >= ceil(tau*|x|) for BOTH sides, so emitting
    the first |x| - ceil(tau*|x|) + 1 tokens per doc and pairing within term
    groups loses nothing. The order is (df asc, term asc) with df taken from
    the broadcast hot-term table (everything below hot_df_min ties at 0 and
    orders by term) — rare tokens land in prefixes, stopword-like tokens
    provably cannot, so no term group is O(df^2) in the corpus.

    Returns a Dataset of (doc_a, doc_b, size_a, size_b), deduped.
    """
    import ray

    hot = hot_term_dfs(ds, text_col, hot_df_min, shingle)
    hot_ref = ray.put(hot)

    def prefix_tokens(batch: pa.Table) -> pa.Table:
        hot_map = ray.get(hot_ref)
        t = distinct_doc_terms(batch, text_col, shingle)
        if t.num_rows == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "size": pa.array([], pa.int64()),
                }
            )
        doc = np.asarray(t["doc_id"])
        terms = t["term"].to_numpy(zero_copy_only=False).astype("U")
        uniq, inv = np.unique(terms, return_inverse=True)
        df_key = np.array([hot_map.get(u, 0) for u in uniq], dtype=np.int64)
        # rows sorted by (doc, df, term): uniq codes are term-lexicographic
        order = np.lexsort((inv, df_key[inv], doc))
        d_s, i_s = doc[order], inv[order]
        new_doc = np.concatenate(([True], d_s[1:] != d_s[:-1]))
        first_idx = np.flatnonzero(new_doc)
        sizes = np.diff(np.concatenate((first_idx, [d_s.size])))
        rank = np.arange(d_s.size) - np.repeat(first_idx, sizes)
        size_of_row = np.repeat(sizes, sizes)
        alpha = (tau_num * size_of_row + tau_den - 1) // tau_den
        keep = rank < (size_of_row - alpha + 1)
        return pa.table(
            {
                "term": pa.array(uniq[i_s[keep]], pa.string()),
                "doc_id": pa.array(d_s[keep], pa.int64()),
                "size": pa.array(size_of_row[keep], pa.int64()),
            }
        )

    def pairs_of_group(g: pa.Table) -> pa.Table:
        doc = np.asarray(g["doc_id"])
        size = np.asarray(g["size"])
        order = np.argsort(doc)
        doc, size = doc[order], size[order]
        if doc.size < 2:
            return _empty_pairs()
        a, b = np.triu_indices(doc.size, k=1)
        # size filter (PPJoin length bound): J >= tau forces
        # tau*|b| <= |a| when |a| <= |b|
        keep = tau_den * size[a] >= tau_num * size[b]
        keep &= tau_den * size[b] >= tau_num * size[a]
        a, b = a[keep], b[keep]
        return pa.table(
            {
                "doc_a": pa.array(doc[a], pa.int64()),
                "doc_b": pa.array(doc[b], pa.int64()),
                "size_a": pa.array(size[a], pa.int64()),
                "size_b": pa.array(size[b], pa.int64()),
            }
        )

    # distinct pairs via the bucketed reduce — sizes are per-doc constants,
    # so first-occurrence carry is exact (the old composite-key Max
    # aggregate computed the identical table ~100x slower; see pair_reduce)
    return pair_reduce(
        ds.map_batches(prefix_tokens, batch_format="pyarrow")
        .groupby("term")
        .map_groups(pairs_of_group, batch_format="pyarrow"),
        "first",
        carry_cols=("size_a", "size_b"),
    )


def verify_pairs_exact(
    ds,
    cand_pairs: pa.Table,
    tau_num: int,
    tau_den: int,
    text_col: str = "text",
    shingle: int = 1,
):
    """Distributed exact-Jaccard verification of candidate pairs: one
    streaming pass over `ds` restricted (pc.is_in) to candidate docs,
    per-term pair counting restricted to the candidate pair set, then the
    integer threshold test. Driver/broadcast state is bounded by the
    CANDIDATE set (pairs + docs), never by the corpus.

    Returns a Dataset of (doc_a, doc_b, inter, union_)."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    a = np.asarray(cand_pairs["doc_a"], dtype=np.int64)
    b = np.asarray(cand_pairs["doc_b"], dtype=np.int64)
    if a.size == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "inter": pa.array([], pa.int64()),
                    "union_": pa.array([], pa.int64()),
                }
            )
        )
    cand_docs = np.unique(np.concatenate((a, b))) if a.size else np.empty(0, np.int64)
    m = int(cand_docs.size)
    pair_keys = np.unique(
        np.searchsorted(cand_docs, a) * np.int64(max(m, 1))
        + np.searchsorted(cand_docs, b)
    )
    docs_ref = ray.put(pa.array(cand_docs, pa.int64()))
    keys_ref = ray.put(pair_keys)

    def cand_doc_terms(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["doc_id"], value_set=ray.get(docs_ref))
        return distinct_doc_terms(batch.filter(mask), text_col, shingle)

    # materialize: consumed TWICE below (size aggregate + term groupby) —
    # unmaterialized, each consumer re-runs the full corpus read+tokenize
    # pass; the table is bounded by the CANDIDATE docs' term volume (object
    # store spills if large), so pinning it halves the verify cost
    dt = ds.map_batches(cand_doc_terms, batch_format="pyarrow").materialize()

    def size_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_p": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(np.asarray(batch["doc_id"]), return_counts=True)
        return pa.table(
            {"doc_id": pa.array(uniq, pa.int64()),
             "n_p": pa.array(counts.astype(np.int64))}
        )

    # per-doc token-set sizes for candidate docs only: m rows, bounded by
    # the candidate set
    sizes = np.zeros(max(m, 1), dtype=np.int64)
    for r in (
        dt.map_batches(size_partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n_p", alias_name="n"))
        .take_all()
    ):
        sizes[int(np.searchsorted(cand_docs, r["doc_id"]))] = int(r["n"])
    sizes_ref = ray.put(sizes)

    def pairs_of_group(g: pa.Table) -> pa.Table:
        cdocs = np.asarray(ray.get(docs_ref))
        keys = ray.get(keys_ref)
        ids = np.unique(np.asarray(g["doc_id"]))
        if ids.size < 2:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        i, j = np.triu_indices(ids.size, k=1)
        c = np.searchsorted(cdocs, ids)
        k = c[i] * np.int64(max(m, 1)) + c[j]
        idx = np.searchsorted(keys, k)
        hit = (idx < keys.size) & (keys[np.minimum(idx, keys.size - 1)] == k)
        return pa.table(
            {
                "doc_a": pa.array(ids[i[hit]], pa.int64()),
                "doc_b": pa.array(ids[j[hit]], pa.int64()),
            }
        )

    inter_counts = pair_reduce(
        dt.groupby("term").map_groups(pairs_of_group, batch_format="pyarrow"),
        "count",
        out_col="count()",
    )

    def finish(batch: pa.Table) -> pa.Table:
        cdocs = np.asarray(ray.get(docs_ref))
        sz = np.asarray(ray.get(sizes_ref))
        da = np.asarray(batch["doc_a"])
        db = np.asarray(batch["doc_b"])
        inter = np.asarray(batch["count()"]).astype(np.int64)
        na = sz[np.searchsorted(cdocs, da)]
        nb = sz[np.searchsorted(cdocs, db)]
        union = na + nb - inter
        keep = tau_den * inter >= tau_num * union
        return pa.table(
            {
                "doc_a": pa.array(da[keep], pa.int64()),
                "doc_b": pa.array(db[keep], pa.int64()),
                "inter": pa.array(inter[keep]),
                "union_": pa.array(union[keep]),
            }
        )

    return inter_counts.map_batches(finish, batch_format="pyarrow")


def verify_pairs_exact_ds(
    ds,
    cand,
    tau_num: int,
    tau_den: int,
    text_col: str = "text",
    shingle: int = 1,
    broadcast_pairs_cap: int = 8_000_000,
):
    """Dataset-native exact-Jaccard verification: `cand` is a Dataset of
    (doc_a, doc_b) candidate pairs — it never round-trips through pandas on
    the driver.

    Two regimes, chosen by the (metadata-cheap) candidate count after one
    object-store materialization:

    - `n <= broadcast_pairs_cap` (the common case — candidates track the
      true near-dup count): zero-copy Arrow concat of the materialized
      blocks + the broadcast verification of `verify_pairs_exact`. Driver
      state is one int64 pair table, bounded by the cap (~128 MB at the
      default — well inside any worker heap, and measured ~10x faster
      than the distributed plan right up to the cap: same-window A/B at
      sf0.1 with 3.69M candidates, 6.3 s broadcast vs 59.7 s
      distributed, identical 964,854 verified pairs).
    - above the cap (dup-heavy crawls where the candidate set itself is
      corpus-scale and no single process should hold it): a
      fully-distributed plan with NO driver data path — semi-join doc
      terms to candidate docs, count pair intersections via a
      composite-key partitioned join, join sizes back, threshold. Five
      bucketed exchanges, each streaming and bounded by the candidate term
      volume; the pair set never exists in one process.
    """
    import ray

    cand = cand.materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return verify_pairs_exact(
            ds,
            pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64())}),
            tau_num, tau_den, text_col=text_col, shingle=shingle,
        )
    if n_cand <= broadcast_pairs_cap:
        blocks = [b for b in ray.get(cand.to_arrow_refs()) if b.num_rows]
        tbl = pa.concat_tables(b.select(["doc_a", "doc_b"]) for b in blocks)
        return verify_pairs_exact(ds, tbl, tau_num, tau_den,
                                  text_col=text_col, shingle=shingle)

    from .joins import hash_join, join_out_schema

    def project(b: pa.Table) -> pa.Table:
        return b.select(["doc_a", "doc_b"])

    cand = cand.map_batches(project, batch_format="pyarrow")

    def both_ids(b: pa.Table) -> pa.Table:
        ids = pa.concat_arrays(
            [b["doc_a"].combine_chunks(), b["doc_b"].combine_chunks()]
        )
        return pa.table({"doc_id": ids})

    cand_docs = (
        cand.map_batches(both_ids, batch_format="pyarrow")
        .groupby("doc_id").count().drop_columns(["count()"])
    )

    def doc_terms(b: pa.Table) -> pa.Table:
        return distinct_doc_terms(b, text_col, shingle)

    dt_all = ds.map_batches(doc_terms, batch_format="pyarrow")
    # semi-join to candidate docs (right side carries only the key), then
    # materialize: reused by the size aggregate and both pair joins, and
    # bounded by the candidate docs' term volume
    dt = hash_join(
        dt_all, cand_docs, "doc_id", "doc_id",
        # cand_docs is a lazy distinct over the candidate ids: schema passed
        # so the probe doesn't run that groupby once extra
        right_schema=pa.schema([("doc_id", pa.int64())]),
    ).materialize()

    from ray.data.aggregate import Count

    sizes = dt.groupby("doc_id").aggregate(Count(alias_name="n"))

    def rename(cols: dict):
        def f(b: pa.Table) -> pa.Table:
            return b.select(list(cols)).rename_columns(list(cols.values()))
        return f

    dt_a = dt.map_batches(rename({"doc_id": "doc_a", "term": "term"}),
                          batch_format="pyarrow")
    dt_b = dt.map_batches(rename({"doc_id": "doc_b", "term": "term"}),
                          batch_format="pyarrow")
    # explicit schemas through the chain: probing a lazy join/aggregate
    # output's schema executes that whole stage once extra (j1 for j2's
    # probe, j2+groupby for with_a's, the sizes aggregation for sz_a's)
    i64, s = pa.int64(), pa.string()
    pair_schema = pa.schema([("doc_a", i64), ("doc_b", i64)])
    dta_schema = pa.schema([("doc_a", i64), ("term", s)])
    dtb_schema = pa.schema([("doc_b", i64), ("term", s)])
    j1 = hash_join(cand, dt_a, "doc_a", "doc_a",
                   left_schema=pair_schema, right_schema=dta_schema)
    j2 = hash_join(
        j1, dt_b, ["doc_b", "term"], ["doc_b", "term"],
        left_schema=join_out_schema(pair_schema, dta_schema,
                                    "doc_a", "doc_a"),
        right_schema=dtb_schema,
    )
    def pair_only(b: pa.Table) -> pa.Table:
        return b.select(["doc_a", "doc_b"])

    inter = pair_reduce(
        j2.map_batches(pair_only, batch_format="pyarrow"),
        "count",
        out_col="count()",
    )
    inter_schema = pa.schema(
        [("doc_a", i64), ("doc_b", i64), ("count()", i64)]
    )
    sz_a = sizes.map_batches(rename({"doc_id": "doc_a", "n": "n_a"}),
                             batch_format="pyarrow")
    sz_b = sizes.map_batches(rename({"doc_id": "doc_b", "n": "n_b"}),
                             batch_format="pyarrow")
    sza_schema = pa.schema([("doc_a", i64), ("n_a", i64)])
    szb_schema = pa.schema([("doc_b", i64), ("n_b", i64)])
    with_a = hash_join(inter, sz_a, "doc_a", "doc_a",
                       left_schema=inter_schema, right_schema=sza_schema)
    with_b = hash_join(
        with_a, sz_b, "doc_b", "doc_b",
        left_schema=join_out_schema(inter_schema, sza_schema,
                                    "doc_a", "doc_a"),
        right_schema=szb_schema,
    )

    def finish(batch: pa.Table) -> pa.Table:
        inter_c = np.asarray(batch["count()"]).astype(np.int64)
        na = np.asarray(batch["n_a"]).astype(np.int64)
        nb = np.asarray(batch["n_b"]).astype(np.int64)
        union = na + nb - inter_c
        keep = tau_den * inter_c >= tau_num * union
        return pa.table(
            {
                "doc_a": pa.array(np.asarray(batch["doc_a"])[keep], pa.int64()),
                "doc_b": pa.array(np.asarray(batch["doc_b"])[keep], pa.int64()),
                "inter": pa.array(inter_c[keep]),
                "union_": pa.array(union[keep]),
            }
        )

    return with_b.map_batches(finish, batch_format="pyarrow")


def jaccard_pairs(
    ds,
    tau_num: int = 9,
    tau_den: int = 10,
    text_col: str = "text",
    hot_df_min: int = 32,
    shingle: int = 1,
):
    """All doc pairs with token-set Jaccard >= tau_num/tau_den — EXACT
    (prefix-filter candidates, complete by construction; distributed
    exact-count verification). Emits (doc_a, doc_b, inter, union_) and
    filters on tau_den*inter >= tau_num*union_ — no float comparisons, no
    O(df^2) term group, no corpus-sized driver state: candidates flow to
    verification as a Dataset (verify_pairs_exact_ds), never via pandas.
    """
    cand = prefix_candidate_pairs(
        ds, tau_num, tau_den, text_col=text_col, hot_df_min=hot_df_min,
        shingle=shingle,
    )
    return verify_pairs_exact_ds(ds, cand, tau_num, tau_den,
                                 text_col=text_col, shingle=shingle)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def _mod_p61(x: np.ndarray) -> np.ndarray:
    """x (< 2^64) mod 2^61-1 via Mersenne folding."""
    x = (x & _MERSENNE) + (x >> np.uint64(61))
    return np.where(x >= _MERSENNE, x - _MERSENNE, x)


def _mulmod_p61(a: np.ndarray, h: np.ndarray) -> np.ndarray:
    """a*h mod 2^61-1 with a, h < 2^61, using 32-bit split multiplication so
    no intermediate wraps mod 2^64 (a naive uint64 a*h overflows and silently
    breaks the universal-hash family's pairwise independence)."""
    mask32 = np.uint64(0xFFFFFFFF)
    a_lo, a_hi = a & mask32, a >> np.uint64(32)   # a_hi < 2^29
    h_lo, h_hi = h & mask32, h >> np.uint64(32)   # h_hi < 2^29
    t0 = a_lo * h_lo                               # < 2^64
    t1 = _mod_p61(a_hi * h_lo + a_lo * h_hi)       # cross terms sum < 2^62
    t2 = a_hi * h_hi                               # < 2^58
    # t1 * 2^32 mod p: split t1 = m_hi*2^29 + m_lo; 2^61 === 1 (mod p)
    m_lo = t1 & np.uint64((1 << 29) - 1)
    m_hi = t1 >> np.uint64(29)
    mid = _mod_p61((m_lo << np.uint64(32)) + m_hi)
    return _mod_p61(_mod_p61(t0) + mid + _mod_p61(t2 << np.uint64(3)))


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain constant schedule)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


_SHINGLE_SEED = np.uint64(0x243F6A8885A308D3)


def _token_hashes(terms: np.ndarray) -> np.ndarray:
    """Stable 64-bit hash per token: little-endian lower 8 bytes of md5
    (cross-process safe, and bit-identical to DuckDB's md5_number_lower so
    the SimHash sketch itself is SQL-oracle-able — the driver recomputes the
    full sketch in DuckDB, not just a rows-count)."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode()).digest()[8:16], "little")
            for t in terms
        ),
        dtype=np.uint64,
        count=len(terms),
    )


class MinHasher:
    """Actor-pool batch fn: per doc, MinHash signature over token shingles,
    exploded to (band_id, band_hash, doc_id) rows for the LSH groupby.

    Fully vectorized: shingle hashes are an order-sensitive splitmix64 chain
    over per-token blake2b hashes (token hashes cached per actor across
    batches), permutation minima computed batch-wide with
    np.minimum.reduceat over doc segments — no per-doc Python loop in the
    hot path."""

    def __init__(self, num_perm: int = 64, num_bands: int = 16, shingle: int = 3,
                 text_col: str = "text", perm_chunk: int = 16):
        assert num_perm % num_bands == 0
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.rows_per_band = num_perm // num_bands
        self.shingle = shingle
        self.text_col = text_col
        self.perm_chunk = perm_chunk
        self.a, self.b = _minhash_params(num_perm)
        self._hash_cache: dict[str, int] = {}

    # -- hashing helpers ------------------------------------------------
    def _hashes_of(self, uniq_terms: np.ndarray) -> np.ndarray:
        """Per-unique-token 64-bit hashes, memoized across batches."""
        cache = self._hash_cache
        out = np.empty(uniq_terms.size, dtype=np.uint64)
        for i, t in enumerate(uniq_terms):
            t = str(t)
            v = cache.get(t)
            if v is None:
                v = int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
                )
                cache[t] = v
            out[i] = v
        return out

    @staticmethod
    def _chain(token_hashes: np.ndarray) -> np.uint64:
        acc = _SHINGLE_SEED
        for h in token_hashes:
            acc = _mix64(np.uint64(acc) ^ np.uint64(h))
        return np.uint64(acc)

    def _perm_min(self, hs: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
        """(num_perm, n_segments) minima of (a*h+b) mod p over doc segments
        of the doc-sorted shingle-hash array `hs`."""
        n_seg = seg_starts.size
        sig = np.empty((self.num_perm, n_seg), dtype=np.uint64)
        hm = hs & _MERSENNE
        for lo in range(0, self.num_perm, self.perm_chunk):
            hi = min(lo + self.perm_chunk, self.num_perm)
            prod = _mulmod_p61(
                np.broadcast_to(self.a[lo:hi, None], (hi - lo, hs.size)),
                np.broadcast_to(hm[None, :], (hi - lo, hs.size)),
            )
            vals = _mod_p61(prod + self.b[lo:hi, None])
            sig[lo:hi] = np.minimum.reduceat(vals, seg_starts, axis=1)
        return sig

    def signature(self, tokens: list[str]) -> np.ndarray:
        """MinHash signature of one doc's token shingles (reference path;
        identical to the batch path's per-doc result)."""
        th = self._hashes_of(np.array(tokens, dtype=object)) if tokens else None
        if not tokens:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        if len(tokens) < self.shingle:
            hs = np.array([self._chain(th)], dtype=np.uint64)
        else:
            hs = np.array(
                [
                    self._chain(th[i : i + self.shingle])
                    for i in range(len(tokens) - self.shingle + 1)
                ],
                dtype=np.uint64,
            )
        hs = np.unique(hs)
        return self._perm_min(hs, np.array([0], dtype=np.int64))[:, 0]

    def _band_hashes(self, sig: np.ndarray) -> np.ndarray:
        """(num_bands, n_docs) int64 bucket hashes: splitmix chain down each
        band's rows."""
        bands = sig.reshape(self.num_bands, self.rows_per_band, -1)
        acc = np.full(bands.shape[::2], _SHINGLE_SEED, dtype=np.uint64)
        for r in range(self.rows_per_band):
            acc = _mix64(acc ^ bands[:, r, :])
        return (acc >> np.uint64(1)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch[self.text_col], profile="simple")
        doc_ids = np.asarray(batch["doc_id"])
        n = len(batch)
        k = self.shingle
        sig = np.full((self.num_perm, n), np.iinfo(np.uint64).max, dtype=np.uint64)
        if tb.terms.size:
            order = np.lexsort((tb.positions, tb.doc_idx))
            d = tb.doc_idx[order].astype(np.int64)
            uniq, inv = np.unique(tb.terms.astype("U"), return_inverse=True)
            th = self._hashes_of(uniq)[inv[order]]
            doc_len = np.bincount(d, minlength=n)
            # shingles for docs with >= k tokens: chained hash at every
            # window start whose end stays in the same doc
            if d.size >= k:
                cnt = d.size - (k - 1)
                acc = np.full(cnt, _SHINGLE_SEED, dtype=np.uint64)
                for j in range(k):
                    acc = _mix64(acc ^ th[j : j + cnt])
                valid = d[: cnt] == d[k - 1 :]
                sh_doc, sh_hash = d[:cnt][valid], acc[valid]
            else:
                sh_doc = np.empty(0, np.int64)
                sh_hash = np.empty(0, np.uint64)
            # short docs (0 < len < k): one shingle = chain over all tokens
            short = np.flatnonzero((doc_len > 0) & (doc_len < k))
            if short.size:
                starts = np.searchsorted(d, short)
                s_hash = np.array(
                    [
                        self._chain(th[s : s + doc_len[sd]])
                        for s, sd in zip(starts, short)
                    ],
                    dtype=np.uint64,
                )
                sh_doc = np.concatenate((sh_doc, short))
                sh_hash = np.concatenate((sh_hash, s_hash))
            if sh_doc.size:
                # dedupe (doc, shingle-hash), sort by doc for reduceat
                o2 = np.lexsort((sh_hash, sh_doc))
                sh_doc, sh_hash = sh_doc[o2], sh_hash[o2]
                keep = np.concatenate(
                    ([True], (sh_doc[1:] != sh_doc[:-1]) | (sh_hash[1:] != sh_hash[:-1]))
                )
                sh_doc, sh_hash = sh_doc[keep], sh_hash[keep]
                seg_starts = np.flatnonzero(
                    np.concatenate(([True], sh_doc[1:] != sh_doc[:-1]))
                )
                present = sh_doc[seg_starts]
                sig[:, present] = self._perm_min(sh_hash, seg_starts)
        bh = self._band_hashes(sig)
        band_ids = np.repeat(np.arange(self.num_bands, dtype=np.int32), n)
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(bh.ravel(), pa.int64()),
                "doc_id": pa.array(np.tile(doc_ids, self.num_bands), pa.int64()),
            }
        )


def minhash_lsh_pairs(
    ds,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle: int = 3,
    text_col: str = "text",
    concurrency: int = 4,
):
    """Candidate near-dup pairs via MinHash LSH: shingle -> minhash -> band
    -> bucket groupby -> distinct pairs. Verification against exact Jaccard
    is the caller's second stage (see pipelines.near_dup_pairs)."""
    bands = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, num_bands=num_bands, shingle=shingle, text_col=text_col
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )

    def pairs_of_bucket(g: pa.Table) -> pa.Table:
        ids = np.unique(np.asarray(g["doc_id"]))
        if ids.size < 2:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        a, b = np.triu_indices(ids.size, k=1)
        return pa.table(
            {
                "doc_a": pa.array(ids[a], pa.int64()),
                "doc_b": pa.array(ids[b], pa.int64()),
            }
        )

    return pair_reduce(
        bands.groupby(["band_id", "band_hash"]).map_groups(
            pairs_of_bucket, batch_format="pyarrow"
        ),
        "first",
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit SimHash per doc over simple-profile tokens weighted by tf.
    Deterministic; returns (doc_id, simhash:int64 bit-reinterpreted)."""
    tb = tokenize_batch(batch[text_col], profile="simple")
    n = len(batch)
    out = np.zeros(n, dtype=np.uint64)
    if tb.terms.size:
        uniq, inv = np.unique(tb.terms.astype("U"), return_inverse=True)
        th = _token_hashes(uniq)[inv]  # hash per token occurrence
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        contrib = np.where(bits == 1, 1, -1)
        acc = np.zeros((n, 64), dtype=np.int64)
        np.add.at(acc, tb.doc_idx, contrib)
        has_tokens = tb.doc_len > 0
        bits_out = (acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]
        out = np.where(has_tokens, bits_out.sum(axis=1), np.uint64(0))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array(out.view(np.int64)),
        }
    )


def _simhash_num_tables(d: int, k: int) -> int:
    from math import comb

    return comb(k, k - d)


def _simhash_block_keys(
    h: np.ndarray, d: int, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Bucket keys for the block-permutation scheme: split each 64-bit
    sketch into k blocks and, for every (k-d)-block subset, fold that
    subset's block values into one uint64 key. Returns (table_id int32 of
    shape [C(k,d)*n], keys uint64 same shape) — table t's keys occupy the
    t-th length-n slice. Completeness: a pair with Hamming <= d differs in
    at most d blocks, so at least k-d blocks match exactly, so the subset
    consisting of k-d matching blocks yields equal keys in its table."""
    from itertools import combinations

    widths = [64 // k + (1 if c < 64 % k else 0) for c in range(k)]
    shifts = np.cumsum([0] + widths[:-1]).astype(np.uint64)
    masks = np.array([(1 << w) - 1 for w in widths], dtype=np.uint64)
    h = np.asarray(h).view(np.uint64)
    n = h.size
    vals = [(h >> shifts[c]) & masks[c] for c in range(k)]
    keys = []
    for sub in combinations(range(k), k - d):
        key = np.zeros(n, dtype=np.uint64)
        for c in sub:
            key = (key << np.uint64(widths[c])) | vals[c]
        keys.append(key)
    tid = np.repeat(np.arange(len(keys), dtype=np.int32), n)
    return tid, np.concatenate(keys) if keys else np.empty(0, np.uint64)


def simhash_pairs(
    ds,
    max_hamming: int = 3,
    text_col: str = "text",
    num_blocks: int | None = None,
):
    """Near-dup pairs by SimHash sketch distance: all (doc_a, doc_b) with
    Hamming(simhash_a, simhash_b) <= max_hamming.

    Block-permutation bucketing (Manku et al. WWW'07, the production
    design): split the 64-bit sketch into `num_blocks` > max_hamming
    blocks; a pair within the distance budget differs in at most
    max_hamming blocks, so SOME (num_blocks - max_hamming)-block subset is
    identical on both sides — bucket on every such subset's concatenated
    block values and run the exact Hamming check in-group. With the default
    num_blocks = max_hamming + 3 the bucket key is ~64·(1 - d/k) >= 32
    bits (vs ~16 bits for the naive d+1-chunk split, where at 10^9+ docs
    RANDOM collisions put ~N/65k docs in every bucket and the in-group
    all-pairs check goes quadratic with no true dups). Cost of the wider
    key: C(num_blocks, max_hamming) emitted rows per doc (20 for d=3)
    instead of d+1 — a constant-factor shuffle-volume trade for bounded
    bucket sizes, the same trade Manku's sorted permuted tables make.

    Returns a Dataset of (doc_a, doc_b, hamming).
    """
    d = max_hamming
    k = num_blocks if num_blocks is not None else min(d + 3, 64)
    if not (d < k <= 64):
        raise ValueError(f"need max_hamming < num_blocks <= 64, got {d=} {k=}")
    n_tables = _simhash_num_tables(d, k)

    def sketch_chunks(batch: pa.Table) -> pa.Table:
        t = simhash_batch(batch, text_col)
        h = np.asarray(t["simhash"]).view(np.uint64)
        doc = np.asarray(t["doc_id"])
        tid, keys = _simhash_block_keys(h, d, k)
        return pa.table(
            {
                "chunk_id": pa.array(tid),
                "chunk_val": pa.array(keys.view(np.int64)),
                "doc_id": pa.array(np.tile(doc, n_tables), pa.int64()),
                "simhash": pa.array(np.tile(h.view(np.int64), n_tables)),
            }
        )

    def pairs_of_bucket(g: pa.Table) -> pa.Table:
        doc = np.asarray(g["doc_id"])
        h = np.asarray(g["simhash"])
        order = np.argsort(doc)
        doc, h = doc[order], h[order]
        keep = np.concatenate(([True], doc[1:] != doc[:-1]))
        doc, h = doc[keep], h[keep]
        if doc.size < 2:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "h_p": pa.array([], pa.int64()),
                }
            )
        i, j = np.triu_indices(doc.size, k=1)
        dist = hamming_distance(h[i], h[j])
        hit = dist <= max_hamming
        return pa.table(
            {
                "doc_a": pa.array(doc[i[hit]], pa.int64()),
                "doc_b": pa.array(doc[j[hit]], pa.int64()),
                "h_p": pa.array(dist[hit], pa.int64()),
            }
        )

    return pair_reduce(
        ds.map_batches(sketch_chunks, batch_format="pyarrow")
        .groupby(["chunk_id", "chunk_val"])
        .map_groups(pairs_of_bucket, batch_format="pyarrow"),
        "min",
        value_col="h_p",
        out_col="hamming",
    )


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a).view(np.uint64)) ^ (np.asarray(b).view(np.uint64))
    return np.bitwise_count(x).astype(np.int64) if hasattr(np, "bitwise_count") else np.array(
        [bin(int(v)).count("1") for v in x], dtype=np.int64
    )


def decontaminate(
    docs,
    eval_texts: list[str],
    min_len: int = 32,
    text_col: str = "text",
):
    """Benchmark decontamination (GPT-3 appendix-C style, Brown et al.
    2020; Lee et al. ACL'22 §6): drop every document sharing an exact run
    of >= min_len bytes with ANY eval-set text.

    The eval set is small by definition, so its full min_len-gram
    fingerprint set broadcasts via ray.put (one object-store copy, zero-copy
    reads in every task) and the check is a pure map — no shuffle, no
    candidate pass: per batch, rolling-hash every doc's min_len-grams once
    (one flat vectorized pass) and probe the broadcast set; hash hits are
    confirmed against the actual eval substrings before a doc is dropped,
    so the filter is exact, not probabilistic. Returns the clean dataset.
    """
    import ray

    from .textstats import _rolling_hashes

    grams: set[str] = set()
    for t in eval_texts:
        for p in range(len(t) - min_len + 1):
            grams.add(t[p : p + min_len])
    hs = (
        np.unique(
            np.concatenate(
                [
                    _rolling_hashes(
                        np.frombuffer(g.encode("utf-8"), dtype=np.uint8),
                        min_len,
                    )
                    for g in sorted(grams)
                ]
            )
        )
        if grams
        else np.empty(0, np.uint64)
    )
    ref = ray.put((hs, frozenset(g.encode("utf-8") for g in grams)))

    def clean(batch: pa.Table) -> pa.Table:
        import ray as _ray

        hset, gset = _ray.get(ref)
        n = batch.num_rows
        if hset.size == 0 or n == 0:
            return batch
        # one flat rolling-hash pass over the batch's utf-8 buffer, straight
        # from the Arrow layout (no to_pylist, no per-doc Python loop);
        # windows crossing doc boundaries hash too but are rejected by the
        # within-doc position check below
        col = batch[text_col]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if arr.type == pa.string():
            arr = arr.cast(pa.large_string())
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset : arr.offset + n + 1
        ]
        data = (
            np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            if arr.buffers()[2] is not None
            else np.empty(0, np.uint8)
        )
        base = int(offs[0])
        flat = data[base : int(offs[-1])]
        keep = np.ones(n, dtype=bool)
        h_all = _rolling_hashes(flat, min_len)
        if h_all.size:
            idx = np.searchsorted(hset, h_all)
            idx_safe = np.minimum(idx, hset.size - 1)
            hit_pos = np.flatnonzero((idx < hset.size) & (hset[idx_safe] == h_all))
            # probe hits are rare (contamination + collisions); each is
            # mapped to its doc and exact-confirmed against the gram bytes
            for p in hit_pos:
                g_start = base + int(p)
                doc = int(np.searchsorted(offs, g_start, side="right")) - 1
                if not keep[doc]:
                    continue
                if g_start + min_len <= int(offs[doc + 1]):
                    if data[g_start : g_start + min_len].tobytes() in gset:
                        keep[doc] = False
        return batch.filter(pa.array(keep))

    return docs.map_batches(clean, batch_format="pyarrow")


def substring_dup_pairs(
    docs,
    min_len: int = 40,
    k: int = 16,
    text_col: str = "text",
    num_buckets: int = 32,
):
    """Pairs of documents sharing an EXACT common substring of >= `min_len`
    bytes (Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL'22 — substring-level dedup; their suffix-array pass is
    replaced by a shuffle-native winnowing pass).

    Shape (all stages stream):
      1. `winnow_doc_fps` per batch with window = min_len - k + 1, so any
         shared run of >= min_len bytes shares a selected fingerprint VALUE
         (the winnowing guarantee) — candidates are complete, no false
         negatives.
      2. groupby(fp) -> within-group pairs; a fingerprint shared by g docs
         emits g*(g-1)/2 candidates, which is also the lower bound on the
         true output for that shared run, so the fan-out is inherent to the
         operator's semantics, not a sketch artifact.
      3. distinct pairs via groupby((doc_a, doc_b)).
      4. exact verification: two partitioned `hash_join`s fetch both texts,
         then a vectorized-per-pair check intersects the pair's min_len-gram
         sets (Python str hashing, O(len * min_len) per pair, short-circuit
         on first hit). Only true pairs survive — output is exact, not
         approximate.

    On ASCII corpora byte semantics == character semantics (the DuckDB
    oracle enumerates character substrings). Returns (doc_a, doc_b) int64.
    """
    from .joins import hash_join
    from .textstats import winnow_doc_fps

    if k >= min_len:
        raise ValueError("k-gram must be shorter than min_len")
    window = min_len - k + 1

    def fps(batch: pa.Table) -> pa.Table:
        return winnow_doc_fps(batch, text_col=text_col, k=k, window=window)

    def pairs_of_group(g: pa.Table) -> pa.Table:
        doc = np.unique(np.asarray(g["doc_id"]))
        if doc.size < 2:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()),
                 "doc_b": pa.array([], pa.int64())}
            )
        a, b = np.triu_indices(doc.size, k=1)
        return pa.table(
            {"doc_a": pa.array(doc[a], pa.int64()),
             "doc_b": pa.array(doc[b], pa.int64())}
        )

    cand = (
        pair_reduce(
            docs.map_batches(fps, batch_format="pyarrow")
            .groupby("fp")
            .map_groups(pairs_of_group, batch_format="pyarrow"),
            "first",
        )
        # distinct candidate pairs are bounded (near-dup count, not corpus
        # size); materialize ONCE so the two text joins don't re-run the
        # winnowing shuffle, and so the zero-candidate case is detectable
        .materialize()
    )
    cand_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    if cand.count() == 0:
        # a clean corpus has no candidates at all; Ray gives an all-empty
        # shuffle output ZERO blocks (schema None, to_pandas loses the
        # columns), so return a typed empty dataset instead
        import ray.data

        return ray.data.from_arrow(cand_schema.empty_table())

    # Candidate docs are typically a tiny fraction of the corpus, but the
    # two text-fetch joins below would ship EVERY doc's text through the
    # tagged-union shuffle. A Bloom filter over the candidate ids (built in
    # one streaming pass over the materialized cand, broadcast once) drops
    # proven non-candidates map-side; false positives just ride the inner
    # join and fall out — exactness is untouched, shuffled text bytes drop
    # from corpus volume to ~candidate volume.
    import ray

    from .joins import bloom_build, bloom_might_contain

    def cand_ids(b: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pa.concat_arrays(
                [b["doc_a"].combine_chunks(), b["doc_b"].combine_chunks()]
            )}
        )

    _M_BITS = 1 << 23
    bloom_ref = ray.put(bloom_build(
        cand.map_batches(cand_ids, batch_format="pyarrow"),
        "doc_id", _M_BITS,
    ))

    def only_candidates(b: pa.Table) -> pa.Table:
        # plain task fn, not an actor pool: ray.get of the broadcast bloom
        # is a zero-copy local read after the first touch per node
        keep = bloom_might_contain(ray.get(bloom_ref), b["doc_id"], _M_BITS)
        return b.filter(pa.array(keep))

    texts = docs.select_columns(["doc_id", text_col]).map_batches(
        only_candidates, batch_format="pyarrow"
    )

    def rename(id_name: str, txt_name: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({id_name: b["doc_id"], txt_name: b[text_col]})
        return f

    # explicit schemas: cand is an unmaterialized aggregate output (probing
    # it would execute the whole candidate shuffle once just for the schema,
    # and a zero-candidate corpus has no schema at all), and the chained
    # second join would re-execute the first for the same probe
    from .joins import join_out_schema

    dschema = docs.schema()  # Ray Data Schema wrapper: only .names/.types
    tcol = dict(zip(dschema.names, dschema.types))[text_col]
    ra_schema = pa.schema([("doc_a", pa.int64()), ("text_a", tcol)])
    rb_schema = pa.schema([("doc_b", pa.int64()), ("text_b", tcol)])
    j = hash_join(
        cand,
        texts.map_batches(rename("doc_a", "text_a"), batch_format="pyarrow"),
        "doc_a", "doc_a", num_buckets=num_buckets,
        left_schema=cand_schema, right_schema=ra_schema,
    )
    j = hash_join(
        j,
        texts.map_batches(rename("doc_b", "text_b"), batch_format="pyarrow"),
        "doc_b", "doc_b", num_buckets=num_buckets,
        left_schema=join_out_schema(cand_schema, ra_schema, "doc_a", "doc_a"),
        right_schema=rb_schema,
    )

    def verify(batch: pa.Table) -> pa.Table:
        # Measured constraint (2026-08-19, same-window A/B at 400 pairs x
        # 3 KB): this CPython str-slice gram set (300 ms) beats a per-pair
        # numpy rolling-hash intersect (440 ms; sort dominates) and a
        # batch-level salted-hash sort-merge (1.26 s) — str hashing is
        # C-speed and the `any` short-circuits on true pairs. Don't
        # "vectorize" this without beating that A/B.
        ta = batch["text_a"].to_pylist()
        tb = batch["text_b"].to_pylist()
        keep = np.zeros(len(ta), dtype=bool)
        for i, (A, B) in enumerate(zip(ta, tb)):
            if len(A) > len(B):
                A, B = B, A
            if len(A) < min_len:
                continue
            grams = {A[p : p + min_len] for p in range(len(A) - min_len + 1)}
            keep[i] = any(
                B[p : p + min_len] in grams
                for p in range(len(B) - min_len + 1)
            )
        return pa.table(
            {
                "doc_a": batch["doc_a"].filter(pa.array(keep)),
                "doc_b": batch["doc_b"].filter(pa.array(keep)),
            }
        )

    return j.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Duplicate-cluster resolution (connected components over dup pairs)
# ---------------------------------------------------------------------------


def dup_clusters(pairs, max_iters: int = 50, fast_path_max_edges: int = 2_000_000):
    """Connected components over a (doc_a, doc_b) dup-pair Dataset: per doc,
    `cluster_id` = the minimum doc_id reachable through dup edges — the
    canonical-doc resolution step after ANY near-dup pass (keep the doc with
    cluster_id == doc_id, drop the rest; without it a transitive chain
    a~b~c keeps b AND c if only pairwise drops are applied).

    Min-label propagation, Dataset-native: each round is one partitioned
    hash_join (labels onto edge sources) + one Min groupby; rounds needed =
    graph diameter, and verified dup clusters are near-cliques, so 2-3
    rounds in practice. Each round's label table is materialized (bounded
    by the node count of the PAIR graph, not the corpus) so lineage doesn't
    re-run prior rounds; the driver sees only a per-round convergence
    scalar (sum of labels, strictly decreasing until fixpoint).

    Partitioning invariant: the label table is repartitioned to a FIXED
    block count before each materialize. Without this, blocks(labels)
    doubles per round — the sort-shuffle groupby emits one block per input
    block, and the round's input is labels ∪ msgs where msgs itself carries
    labels' block count through the join — so per-round cost grows ~4×
    (observed: 1.6 → 3.9 → 14.4 → 66 s at sf0.01 before the pin).

    Fast path: the pair graph is bounded by the VERIFIED dup-pair count —
    orders of magnitude smaller than the corpus — so when it has at most
    `fast_path_max_edges` directed edges (~30 MB at the default) the whole
    resolution runs as ONE remote task: repartition(1) + an in-memory
    vectorized min-label loop over compacted node ids (np.minimum.at per
    round, diameter rounds, microseconds each). No driver data path either
    way; the distributed rounds remain the path for boilerplate-heavy crawls
    whose pair graph exceeds a worker.

    Returns a Dataset of (doc_id, cluster_id) for every doc in some pair.
    """
    import ray.data
    from ray.data.aggregate import Min, Sum

    from .joins import hash_join

    def both_dirs(b: pa.Table) -> pa.Table:
        src = pa.concat_arrays(
            [b["doc_a"].combine_chunks(), b["doc_b"].combine_chunks()]
        )
        dst = pa.concat_arrays(
            [b["doc_b"].combine_chunks(), b["doc_a"].combine_chunks()]
        )
        return pa.table({"src": src, "dst": dst})

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()
    if edges.num_blocks() > 32:
        # upstream pair pipelines can emit hundreds of tiny blocks; each
        # round's join cost is linear in edge blocks, so bound it once
        edges = edges.repartition(32).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "cluster_id": pa.array([], pa.int64())})
        )

    if n_edges <= fast_path_max_edges:
        def resolve_in_task(b: pa.Table) -> pa.Table:
            src = np.asarray(b["src"], dtype=np.int64)
            dst = np.asarray(b["dst"], dtype=np.int64)
            nodes, inv = np.unique(np.concatenate((src, dst)),
                                   return_inverse=True)
            s, d = inv[: src.size], inv[src.size:]
            lab = np.arange(nodes.size, dtype=np.int64)
            while True:
                prev = lab.copy()
                np.minimum.at(lab, d, lab[s])
                # path-compress: chase labels to their current roots so
                # rounds ~ log(diameter), not diameter
                lab = np.minimum(lab, lab[lab])
                if np.array_equal(lab, prev):
                    break
            return pa.table({"doc_id": pa.array(nodes),
                             "cluster_id": pa.array(nodes[lab])})

        return edges.repartition(1).map_batches(
            resolve_in_task, batch_format="pyarrow", batch_size=None
        )

    def init_labels(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["src"], "label": b["src"]})

    n_parts = max(2, min(32, edges.num_blocks()))
    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node").aggregate(Min("label", alias_name="label"))
        .repartition(n_parts)
        .materialize()
    )
    prev_sum = None
    for _ in range(max_iters):
        lab_src = labels.map_batches(
            lambda b: pa.table({"src": b["node"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        msgs = hash_join(edges, lab_src, "src", "src").map_batches(
            lambda b: pa.table({"node": b["dst"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(msgs)
            .groupby("node").aggregate(Min("label", alias_name="label"))
            .repartition(n_parts)
            .materialize()
        )
        cur = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if cur == prev_sum:
            break
        prev_sum = cur

    return labels.map_batches(
        lambda b: pa.table({"doc_id": b["node"], "cluster_id": b["label"]}),
        batch_format="pyarrow",
    )


def contamination_overlap_counts(
    docs,
    eval_texts: list[str],
    min_len: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-doc contamination ACCOUNTING: for every document, the number of
    DISTINCT eval-set `min_len`-grams it contains (the report-side
    companion to `decontaminate`, which only drops — GPT-3 appendix C
    reports exactly this overlap statistic per benchmark). Same shape as
    `decontaminate`: broadcast eval fingerprints once via ray.put, one flat
    rolling-hash pass per batch straight off the Arrow buffers, exact
    confirmation of rare probe hits against the gram bytes. Emits
    (doc_id, n_overlaps) for ALL docs (zeros included) — a pure map,
    no shuffle."""
    import ray

    from .textstats import _rolling_hashes

    grams: set[str] = set()
    for t in eval_texts:
        for p in range(len(t) - min_len + 1):
            grams.add(t[p : p + min_len])
    gsorted = sorted(g.encode("utf-8") for g in grams)
    hs = (
        np.unique(
            np.concatenate(
                [
                    _rolling_hashes(np.frombuffer(g, dtype=np.uint8), min_len)
                    for g in gsorted
                ]
            )
        )
        if gsorted
        else np.empty(0, np.uint64)
    )
    ref = ray.put((hs, {g: i for i, g in enumerate(gsorted)}))

    def count(batch: pa.Table) -> pa.Table:
        import ray as _ray

        hset, gidx = _ray.get(ref)
        n = batch.num_rows
        ids = np.asarray(batch[id_col], dtype=np.int64)
        counts = np.zeros(n, dtype=np.int64)
        if hset.size == 0 or n == 0:
            return pa.table({"doc_id": pa.array(ids), "n_overlaps": pa.array(counts)})
        col = batch[text_col]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if arr.type == pa.string():
            arr = arr.cast(pa.large_string())
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset : arr.offset + n + 1
        ]
        data = (
            np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            if arr.buffers()[2] is not None
            else np.empty(0, np.uint8)
        )
        base = int(offs[0])
        flat = data[base : int(offs[-1])]
        h_all = _rolling_hashes(flat, min_len)
        pairs = []
        if h_all.size:
            idx = np.searchsorted(hset, h_all)
            idx_safe = np.minimum(idx, hset.size - 1)
            hit_pos = np.flatnonzero((idx < hset.size) & (hset[idx_safe] == h_all))
            # hits are rare; each maps to (doc, gram-id) and is exact-confirmed
            for p in hit_pos:
                g_start = base + int(p)
                doc = int(np.searchsorted(offs, g_start, side="right")) - 1
                if g_start + min_len <= int(offs[doc + 1]):
                    gi = gidx.get(data[g_start : g_start + min_len].tobytes())
                    if gi is not None:
                        pairs.append((doc, gi))
        if pairs:
            key = np.unique(
                np.array([d * len(gidx) + g for d, g in pairs], dtype=np.int64)
            )
            counts = np.bincount(key // len(gidx), minlength=n).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids), "n_overlaps": pa.array(counts)})

    return docs.map_batches(count, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# inter-document line-level boilerplate removal (RefinedWeb / CCNet line dedup)
# ---------------------------------------------------------------------------


def _doc_bucket(ids: np.ndarray, num_buckets: int) -> np.ndarray:
    """Fibonacci-mix doc ids into shuffle buckets. Runs in uint64 (wrapping
    multiply): the same expression on an int64 array with an out-of-range
    Python int silently promotes to float64 on numpy 1.x — where every
    product is a multiple of 2048 and `% num_buckets` collapses ALL ids to
    bucket 0 — and raises OverflowError on numpy>=2 under NEP 50."""
    return (
        (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        % np.uint64(num_buckets)
    ).astype(np.int64)


def line_dedup(
    ds,
    min_docs: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 32,
    group_col: str | None = None,
    group_type: pa.DataType | None = None,
):
    """Line-level boilerplate removal across documents: every line whose
    document frequency (number of DISTINCT docs containing it) reaches
    `min_docs` is dropped from every document, and each document's text is
    reassembled from its surviving lines in original order. This is the
    inter-document line/paragraph dedup pass of the public web-curation
    pipelines (CCNet paragraph-hash dedup, RefinedWeb line-level dedup) —
    the step that strips navigation bars, cookie banners and license
    headers repeated across a crawl.

    `group_col` scopes the frequency: with e.g. group_col='source' a line
    is boilerplate when it reaches `min_docs` distinct docs WITHIN ONE
    group — RefinedWeb's actual per-domain semantics (a navbar repeated
    across one site is boilerplate even if globally rare, and a common
    phrase shared across sites is NOT). The df groupby and the anti join
    then key on (group, line) composites; everything else is unchanged.

    Returns a Dataset of (doc_id, clean_text, n_lines, n_removed) with one
    row per input document (a fully-boilerplate doc keeps its row with
    clean_text='' and n_removed = n_lines).

    Scale shape (100 TB honest): the line-frequency table is corpus-sized,
    so it is NEVER broadcast and never touches the driver — the boilerplate
    decision meets the exploded line rows in ONE partitioned `left anti`
    hash_join keyed by the line string (the right side ships only its key
    column). Reassembly is a doc-bucket groupby whose groups are processed
    as whole buckets with vectorized numpy/Arrow kernels (lexsort + offset
    scan + pc.binary_join), never per-row Python. Three shuffles total
    (line-df groupby, anti-join exchange, doc-bucket regroup), each keyed
    to bound skew: the df groupby pre-aggregates per batch so a hot
    boilerplate line contributes one partial row per batch, not one row
    per occurrence."""
    from ray.data.aggregate import Sum

    from .joins import hash_join

    # Resolve the grouping column's type for the declared join schemas:
    # prefer the caller's explicit `group_type`, else the input schema when
    # it is known without executing anything (fetch_if_missing=False — a
    # .schema() probe on an unmaterialized lineage would run the stage),
    # else default to string and verify per batch below.
    grp_type = group_type
    if group_col is not None and grp_type is None:
        known = ds.schema(fetch_if_missing=False)
        if known is not None:
            base = getattr(known, "base_schema", known)
            if group_col in base.names:
                grp_type = base.field(group_col).type
    if group_col is not None and grp_type is None:
        grp_type = pa.string()

    def explode(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        lines = pc.split_pattern(txt, "\n")
        offs = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        doc_rep = np.repeat(ids, counts)
        idx = np.arange(offs[-1] - offs[0], dtype=np.int64) - np.repeat(
            offs[:-1] - offs[0], counts
        )
        flat = lines.values.slice(offs[0], int(offs[-1] - offs[0]))
        cols = {
            id_col: pa.array(doc_rep),
            "idx": pa.array(idx),
            "line": flat,
        }
        if group_col is not None:
            grp = batch[group_col]
            if isinstance(grp, pa.ChunkedArray):
                grp = grp.combine_chunks()
            if not grp.type.equals(grp_type):
                raise TypeError(
                    f"line_dedup: group_col {group_col!r} is {grp.type}, "
                    f"declared {grp_type}; pass group_type= explicitly"
                )
            cols[group_col] = grp.take(
                pa.array(np.repeat(np.arange(len(batch)), counts))
            )
        return pa.table(cols)

    lines = ds.map_batches(explode, batch_format="pyarrow")
    lines_fields = [
        (id_col, pa.int64()), ("idx", pa.int64()), ("line", pa.string())
    ]
    if group_col is not None:
        lines_fields.append((group_col, grp_type))
    lines_schema = pa.schema(lines_fields)
    freq_keys = ["line"] if group_col is None else [group_col, "line"]

    # per-doc line totals: each source row lives in exactly one batch, so
    # this is a pure map (no groupby) — one row per doc
    def totals(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        n = pc.add(pc.count_substring(txt, "\n"), 1)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_lines": pc.cast(n, pa.int64()),
            }
        )

    tot = ds.map_batches(totals, batch_format="pyarrow")

    # line document frequency: DISTINCT (line, doc) partials computed in
    # the SAME pass as explode — a document is one source row, so it can
    # never straddle a map_batches batch here, making the per-batch
    # distinct-doc counts disjoint across batches and their Sum the exact
    # global distinct-doc count. (Deriving partials from the re-batched
    # `lines` Dataset instead would split a doc's lines across batches and
    # overcount.)
    def df_partial(batch: pa.Table) -> pa.Table:
        ex = explode(batch)
        g = pa.TableGroupBy(
            ex.select(freq_keys + [id_col]), freq_keys + [id_col]
        ).aggregate([([], "count_all")])
        g2 = pa.TableGroupBy(g.select(freq_keys), freq_keys).aggregate(
            [([], "count_all")]
        )
        return g2.rename_columns(freq_keys + ["df_p"])

    df = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby(freq_keys if group_col is not None else "line")
        .aggregate(Sum("df_p", alias_name="df"))
    )

    def boiler_only(batch: pa.Table) -> pa.Table:
        mask = pc.greater_equal(batch["df"], min_docs)
        return batch.filter(mask).select(freq_keys)

    boiler = df.map_batches(boiler_only, batch_format="pyarrow")

    kept = hash_join(
        lines,
        boiler,
        freq_keys,
        freq_keys,
        how="left anti",
        num_buckets=num_buckets,
        left_schema=lines_schema,
        right_schema=pa.schema(
            [(k, grp_type if k == group_col else pa.string()) for k in freq_keys]
        ),
    )

    # reassembly: doc-bucket groupby, whole-bucket vectorized kernel
    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        return batch.append_column(
            "__bucket", pa.array(_doc_bucket(ids, num_buckets))
        )

    def reassemble(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col], dtype=np.int64)
        idx = np.asarray(group["idx"], dtype=np.int64)
        order = np.lexsort((idx, ids))
        ids_s = ids[order]
        lines_s = group["line"].combine_chunks().take(pa.array(order))
        starts = np.flatnonzero(np.r_[True, ids_s[1:] != ids_s[:-1]])
        # int64 offsets via LargeListArray: a bucket group can exceed 2^31
        # lines at full scale, where int32 offsets would wrap negative.
        offsets = np.r_[starts, ids_s.size].astype(np.int64)
        la = pa.LargeListArray.from_arrays(pa.array(offsets), lines_s)
        joined = pc.binary_join(la, "\n")
        n_kept = np.diff(offsets)
        return pa.table(
            {
                id_col: pa.array(ids_s[starts]),
                "clean_text": joined,
                "n_kept": pa.array(n_kept),
            }
        )

    reasm = (
        kept.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(reassemble, batch_format="pyarrow")
    )

    out = hash_join(
        tot,
        reasm,
        id_col,
        id_col,
        how="left outer",
        num_buckets=num_buckets,
        left_schema=pa.schema([(id_col, pa.int64()), ("n_lines", pa.int64())]),
        right_schema=pa.schema(
            [
                (id_col, pa.int64()),
                ("clean_text", pa.string()),
                ("n_kept", pa.int64()),
            ]
        ),
    )

    def finish(batch: pa.Table) -> pa.Table:
        n_lines = np.asarray(batch["n_lines"], dtype=np.int64)
        n_kept = np.asarray(
            pc.fill_null(batch["n_kept"], 0), dtype=np.int64
        )
        clean = pc.fill_null(batch["clean_text"], "")
        return pa.table(
            {
                id_col: batch[id_col],
                "clean_text": clean,
                "n_lines": pa.array(n_lines),
                "n_removed": pa.array(n_lines - n_kept),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# incremental MinHash-LSH near-dup maintenance
# ---------------------------------------------------------------------------

_SIG_PARAMS_FILE = "minhash_params.json"


def minhash_signature_table(
    ds,
    out_dir: str,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle: int = 3,
    text_col: str = "text",
    concurrency: int = 4,
) -> str:
    """Persist a corpus's LSH band-signature table — (band_id, band_hash,
    doc_id) rows — as a parquet directory plus a params manifest. This is
    the reusable dedup STATE for incremental maintenance: when a new shard
    arrives, its near-dups against the whole existing corpus resolve by
    joining the new shard's band rows against this table (the old corpus
    is never re-read or re-tokenized). Size: num_bands rows per doc,
    3 ints each — ~0.1% of a text corpus."""
    import json as _json

    import ray.data  # noqa: F401

    bands = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, num_bands=num_bands, shingle=shingle,
            text_col=text_col,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    bands.write_parquet(out_dir)
    with open(os.path.join(out_dir, _SIG_PARAMS_FILE), "w") as f:
        _json.dump(
            {"num_perm": num_perm, "num_bands": num_bands,
             "shingle": shingle}, f,
        )
    return out_dir


def extend_signature_table(
    new_docs, sig_dir: str, text_col: str = "text", concurrency: int = 4
) -> str:
    """Append a new shard's band rows to an existing signature table (same
    params, read from the table's manifest) so the NEXT increment sees this
    shard as part of the corpus."""
    import json as _json

    with open(os.path.join(sig_dir, _SIG_PARAMS_FILE)) as f:
        p = _json.load(f)
    bands = new_docs.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(text_col=text_col, **p),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    bands.write_parquet(sig_dir)
    return sig_dir


def minhash_incremental_pairs(
    new_docs, sig_dir: str, text_col: str = "text", concurrency: int = 4
):
    """Candidate near-dup pairs of a NEW shard against an EXISTING corpus,
    via its persisted signature table: new-shard band rows join the stored
    (band_id, band_hash) buckets in ONE composite-key partitioned
    hash_join (new-vs-old candidates) plus a bucket groupby over the new
    rows alone (new-vs-new candidates). The existing corpus contributes
    only its signature table — no old text is read, tokenized or hashed
    again, which is the point: per-shard cost is O(shard), not O(corpus).
    Returns the same (doc_a < doc_b) distinct candidate schema as
    `minhash_lsh_pairs`; feed to `verify_pairs_exact_ds` over the union
    docstore for the exact stage. Equivalence to running the full LSH over
    old+new (minus old-vs-old pairs) is pytest-pinned."""
    import json as _json

    import ray.data

    from .joins import hash_join

    with open(os.path.join(sig_dir, _SIG_PARAMS_FILE)) as f:
        p = _json.load(f)
    new_bands = new_docs.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(text_col=text_col, **p),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    ).materialize()  # consumers: the old-join and the new-new buckets
    bands_schema = pa.schema(
        [("band_id", pa.int32()), ("band_hash", pa.int64()),
         ("doc_id", pa.int64())]
    )

    # the params manifest lives inside the dir; restrict the scan to the
    # signature shards
    old = ray.data.read_parquet(sig_dir, file_extensions=["parquet"])

    def rename_old(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            ["band_id", "band_hash", "old_doc_id"]
        )

    old_r = old.map_batches(rename_old, batch_format="pyarrow")
    j = hash_join(
        new_bands, old_r,
        ["band_id", "band_hash"], ["band_id", "band_hash"],
        left_schema=bands_schema,
        right_schema=pa.schema(
            [("band_id", pa.int32()), ("band_hash", pa.int64()),
             ("old_doc_id", pa.int64())]
        ),
    )

    def cross_pairs(b: pa.Table) -> pa.Table:
        new_id = np.asarray(b["doc_id"], dtype=np.int64)
        old_id = np.asarray(b["old_doc_id"], dtype=np.int64)
        keep = new_id != old_id
        a = np.minimum(new_id[keep], old_id[keep])
        bb = np.maximum(new_id[keep], old_id[keep])
        t = pa.table({"doc_a": pa.array(a), "doc_b": pa.array(bb)})
        g = pa.TableGroupBy(t, ["doc_a", "doc_b"]).aggregate([([], "count_all")])
        return g.select(["doc_a", "doc_b"])

    cross = j.map_batches(cross_pairs, batch_format="pyarrow")

    def pairs_of_bucket(g: pa.Table) -> pa.Table:
        ids = np.unique(np.asarray(g["doc_id"]))
        if ids.size < 2:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()),
                 "doc_b": pa.array([], pa.int64())}
            )
        a, b = np.triu_indices(ids.size, k=1)
        return pa.table(
            {"doc_a": pa.array(ids[a], pa.int64()),
             "doc_b": pa.array(ids[b], pa.int64())}
        )

    new_new = new_bands.groupby(["band_id", "band_hash"]).map_groups(
        pairs_of_bucket, batch_format="pyarrow"
    )

    return pair_reduce(cross.union(new_new), "first")
