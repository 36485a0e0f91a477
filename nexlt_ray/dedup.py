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
bounded by the hottest key. For Jaccard the unit is a token — ubiquitous
tokens generate O(df^2) pairs, so `max_df` prunes tokens whose selectivity is
nil (a token in >50% of docs cannot discriminate dups at tau>=0.5 on its own;
completeness is preserved whenever every surviving pair still shares >=1
unpruned token — guaranteed for tau > max_df_frac). MinHash bands bound the
same blow-up probabilistically.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .tokenize import tokenize_batch

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_text_sha(batch: pa.Table, text_col: str = "text") -> pa.Table:
    shas = [
        hashlib.sha256(t.encode("utf-8")).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column("text_sha256", pa.array(shas, pa.string()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Hash-partition by content sha; keep the min-id row per group.
    Returns a Dataset of (doc_id, text_sha256, n_copies)."""
    ds = ds.map_batches(
        lambda b: add_text_sha(b, text_col), batch_format="pyarrow"
    )

    def keep_first(g: pa.Table) -> pa.Table:
        ids = np.asarray(g[id_col])
        return pa.table(
            {
                "doc_id": pa.array([int(ids.min())], pa.int64()),
                "text_sha256": pa.array([g["text_sha256"][0].as_py()], pa.string()),
                "n_copies": pa.array([len(g)], pa.int64()),
            }
        )

    return ds.groupby("text_sha256").map_groups(keep_first, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# token-set Jaccard similarity join (complete; SQL-checkable)
# ---------------------------------------------------------------------------


def distinct_doc_terms(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Explode to distinct (doc_id, term) rows (simple profile)."""
    tb = tokenize_batch(batch[text_col], profile="simple")
    if tb.terms.size == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "term": pa.array([], pa.string())}
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


def jaccard_pairs(
    ds,
    tau_num: int = 9,
    tau_den: int = 10,
    text_col: str = "text",
    max_df: int | None = None,
):
    """All doc pairs with token-set Jaccard >= tau_num/tau_den.

    Integer-exact: emits (doc_a, doc_b, inter, union_) and filters on
    tau_den*inter >= tau_num*union_ — no float comparisons. Complete as long
    as every qualifying pair shares at least one token with df <= max_df
    (always true when max_df is None).
    """
    pairs_src = ds.map_batches(
        lambda b: distinct_doc_terms(b, text_col), batch_format="pyarrow"
    )
    # doc set sizes (broadcast later): small aggregate
    sizes_ds = pairs_src.groupby("doc_id").count()
    sizes_df = sizes_ds.to_pandas()
    sizes = dict(zip(sizes_df["doc_id"], sizes_df["count()"]))

    def pairs_of_group(g: pa.Table) -> pa.Table:
        ids = np.sort(np.asarray(g["doc_id"]))
        if max_df is not None and ids.size > max_df:
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

    pair_counts = (
        pairs_src.groupby("term")
        .map_groups(pairs_of_group, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .count()
    )

    def finish(batch: pa.Table) -> pa.Table:
        da = np.asarray(batch["doc_a"])
        db = np.asarray(batch["doc_b"])
        inter = np.asarray(batch["count()"])
        na = np.array([sizes[int(x)] for x in da], dtype=np.int64)
        nb = np.array([sizes[int(x)] for x in db], dtype=np.int64)
        union = na + nb - inter
        keep = tau_den * inter >= tau_num * union
        return pa.table(
            {
                "doc_a": pa.array(da[keep], pa.int64()),
                "doc_b": pa.array(db[keep], pa.int64()),
                "inter": pa.array(inter[keep].astype(np.int64)),
                "union_": pa.array(union[keep].astype(np.int64)),
            }
        )

    return pair_counts.map_batches(finish, batch_format="pyarrow")


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


def _token_hashes(terms: np.ndarray) -> np.ndarray:
    """Stable 64-bit hash per token (blake2b-8byte; cross-process safe)."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
            for t in terms
        ),
        dtype=np.uint64,
        count=len(terms),
    )


class MinHasher:
    """Actor-pool batch fn: per doc, MinHash signature over token shingles,
    exploded to (band_id, band_hash, doc_id) rows for the LSH groupby."""

    def __init__(self, num_perm: int = 64, num_bands: int = 16, shingle: int = 3,
                 text_col: str = "text"):
        assert num_perm % num_bands == 0
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.rows_per_band = num_perm // num_bands
        self.shingle = shingle
        self.text_col = text_col
        self.a, self.b = _minhash_params(num_perm)
        self._hash_cache: dict[str, int] = {}

    def signature(self, tokens: list[str]) -> np.ndarray:
        """MinHash signature of one doc's token shingles."""
        if len(tokens) < self.shingle:
            shingles = [" ".join(tokens)] if tokens else []
        else:
            shingles = [
                " ".join(tokens[i : i + self.shingle])
                for i in range(len(tokens) - self.shingle + 1)
            ]
        if not shingles:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        hs = np.unique(_token_hashes(np.array(sorted(set(shingles)), dtype=object)))
        # (a*h + b) mod p, min over shingles, per permutation — overflow-safe
        # split multiply (see _mulmod_p61)
        prod = _mulmod_p61(
            np.broadcast_to(self.a[:, None], (self.num_perm, hs.size)),
            np.broadcast_to(hs[None, :] & _MERSENNE, (self.num_perm, hs.size)),
        )
        vals = _mod_p61(prod + self.b[:, None])
        return vals.min(axis=1).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tb = tokenize_batch(batch[self.text_col], profile="simple")
        doc_ids = np.asarray(batch["doc_id"])
        per_doc: list[list[str]] = [[] for _ in range(len(batch))]
        order = np.argsort(tb.positions, kind="stable")
        for i in order:
            per_doc[tb.doc_idx[i]].append(str(tb.terms[i]))
        band_ids, band_hashes, out_docs = [], [], []
        for row, toks in enumerate(per_doc):
            sig = self.signature(toks)
            bands = sig.reshape(self.num_bands, self.rows_per_band)
            for bi in range(self.num_bands):
                h = hashlib.blake2b(bands[bi].tobytes(), digest_size=8).digest()
                band_ids.append(bi)
                band_hashes.append(int.from_bytes(h, "big") >> 1)  # fit int64
                out_docs.append(int(doc_ids[row]))
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.int64()),
                "doc_id": pa.array(out_docs, pa.int64()),
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

    pairs = (
        bands.groupby(["band_id", "band_hash"])
        .map_groups(pairs_of_bucket, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .count()
        .drop_columns(["count()"])
    )
    return pairs


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


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a).view(np.uint64)) ^ (np.asarray(b).view(np.uint64))
    return np.bitwise_count(x).astype(np.int64) if hasattr(np, "bitwise_count") else np.array(
        [bin(int(v)).count("1") for v in x], dtype=np.int64
    )
