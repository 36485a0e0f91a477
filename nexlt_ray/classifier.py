"""Distributed quality-classifier training — the fastText/CCNet-style
linear classifier that large-scale curation pipelines train on weak labels
and sweep over the corpus (CCNet trains fastText on Wikipedia-vs-crawl;
GPT-3 appendix A uses a logistic classifier the same way). The reference
has no training op (its quality gates are rule tables, parseJSON.pl); this
is a brief-mandated training-data extension, like dedup/packing.

Model: logistic regression over hashed bag-of-tokens features
(feature hashing a la Weinberger et al. 2009; 1/sqrt(n_tokens)-scaled
occurrences) with prior-logit bias init, trained full-batch: each iteration is ONE streaming pass computing exact
per-batch gradient partials, summed on the driver (a gradient is
dim+1 float — tiny vs the corpus), then a dense weight step. No per-row
Python in the pass: terms dictionary-encode per batch, only the unique
vocabulary is hashed, and the per-doc sigmoid/gradient math is pure numpy
over CSR-like arrays.

Determinism (the property every oracle here leans on): per-doc gradient
contributions are ROUNDED TO INT64 fixed point (GRAD_SCALE) before
summation, so partials are associative/commutative integers and the
learned weights are BIT-IDENTICAL under any partitioning / batch size /
cluster size — same discipline as the repo's PageRank/k-means oracles
(int sums are order-independent; float accumulation is not). The pytest
oracle replays training single-machine in numpy and asserts exact weight
equality; a partition-invariance test re-trains under different block
counts.

Scale notes: the broadcast weight vector and each partial are (dim+1)
float64/int64 — at the default dim 2^18 that is 2 MB, put once per
iteration via ray.put; partials stream back one per block (driver memory
bounded by #blocks × 2 MB, and a tree-sum stage can cap that if blocks
ever number in the thousands). Iterations are sequential full passes by
design (full-batch GD); wall time = iters × one corpus scan at full
cluster parallelism.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

GRAD_SCALE = float(1 << 32)  # per-doc gradient fixed-point scale
PROB_SCALE = 1_000_000       # score output fixed point (prob_e6)


def _hash_terms(vocab: np.ndarray, dim: int, seed: int) -> np.ndarray:
    """crc32 feature hashing of the UNIQUE terms only (vocab-sized loop —
    the batch maps through dictionary indices)."""
    salt = f"#{seed}".encode()
    return np.fromiter(
        (zlib.crc32(t.encode("utf-8") + salt) % dim for t in vocab),
        dtype=np.int64,
        count=len(vocab),
    )


def featurize_batch(
    texts, dim: int, seed: int = 0, profile: str = "simple",
    word_ngrams: int = 1,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Hashed L2-ish-normalized bag-of-tokens: returns CSR-ish
    (indptr, col_idx, values, n_docs), each occurrence valued
    1/sqrt(n_tokens) (unit L2 norm when tokens are distinct — the standard
    text-LR scaling; the L1 alternative 1/n shrinks gradients by another
    1/sqrt(n) and needs ~10x the iterations to outgrow the class-prior
    bias). Duplicate hash collisions within a doc are NOT pre-summed (the
    dot/scatter ops below handle repeats)."""
    from .tokenize import tokenize_batch

    tb = tokenize_batch(texts, profile=profile)
    n = tb.n_docs
    counts = np.bincount(tb.doc_idx, minlength=n).astype(np.int64)
    if tb.terms.size == 0:
        indptr = np.concatenate(([0], np.cumsum(counts)))
        return indptr, np.empty(0, np.int64), np.empty(0, np.float64), n
    # doc-major order for contiguous per-doc slices (stable: within-doc
    # positional order is preserved, which the bigram pairing relies on)
    order = np.argsort(tb.doc_idx, kind="stable")
    feats = tb.terms[order].astype("U")
    doc_of = tb.doc_idx[order].astype(np.int64)
    if word_ngrams >= 2 and feats.size > 1:
        # fastText word-ngrams: adjacent within-doc token pairs, hashed as
        # one feature string (the \x1f joiner cannot occur in tokens)
        same = doc_of[1:] == doc_of[:-1]
        bigrams = np.char.add(np.char.add(feats[:-1], "\x1f"), feats[1:])[same]
        bdoc = doc_of[1:][same]
        feats = np.concatenate((feats, bigrams))
        doc_of = np.concatenate((doc_of, bdoc))
        order2 = np.argsort(doc_of, kind="stable")
        feats = feats[order2]
        counts = np.bincount(doc_of, minlength=n).astype(np.int64)
    indptr = np.concatenate(([0], np.cumsum(counts)))
    denc = pa.array(feats).dictionary_encode()
    col = _hash_terms(
        denc.dictionary.to_numpy(zero_copy_only=False), dim, seed
    )[np.asarray(denc.indices, dtype=np.int64)]
    vals = 1.0 / np.sqrt(np.repeat(counts, counts).astype(np.float64))
    return indptr, col, vals, n


def _doc_margins(
    w: np.ndarray, indptr: np.ndarray, col: np.ndarray, vals: np.ndarray
) -> np.ndarray:
    """w·x per doc (+bias, w[-1]) via segment sums."""
    if col.size == 0:
        return np.full(indptr.size - 1, w[-1], dtype=np.float64)
    contrib = w[col] * vals
    # clamp trailing-empty-doc starts (reduceat needs indices < size); the
    # empty-doc mask zeroes whatever the clamped segment produced
    starts = np.minimum(indptr[:-1], contrib.size - 1)
    sums = np.add.reduceat(contrib, starts)
    sums[np.diff(indptr) == 0] = 0.0
    return sums + w[-1]


def _grad_partial_int(
    w: np.ndarray,
    labels: np.ndarray,
    indptr: np.ndarray,
    col: np.ndarray,
    vals: np.ndarray,
    dim: int,
) -> np.ndarray:
    """Int64 fixed-point gradient partial for one batch: per-doc residual
    r_d = sigmoid(w·x_d) - y_d; each nonzero contribution r_d * x_{d,j}
    rounds to int64 INDEPENDENTLY of batching, so any partition of the
    corpus sums to the same total."""
    m = _doc_margins(w, indptr, col, vals)
    p = 1.0 / (1.0 + np.exp(-m))
    r = p - labels.astype(np.float64)
    out = np.zeros(dim + 1, dtype=np.int64)
    if col.size:
        per_doc = np.diff(indptr)
        r_rep = np.repeat(r, per_doc)
        q = np.rint(r_rep * vals * GRAD_SCALE).astype(np.int64)
        np.add.at(out, col, q)
    out[-1] = int(np.rint(r * GRAD_SCALE).astype(np.int64).sum())
    return out


def _prior_bias(n_pos: int, n_total: int) -> float:
    """Bias init at the class-prior logit (smoothed) — the standard trick
    that removes the imbalance component from the gradient so the first
    iterations spend on MARGINS, not the base rate. A pure function of two
    exact integer counts, so the partition-invariance contract holds."""
    return float(np.log((n_pos + 0.5) / (n_total - n_pos + 0.5)))


def train_logreg(
    ds,
    text_col: str = "text",
    label_col: str = "label",
    dim: int = 1 << 18,
    iters: int = 30,
    lr: float = 1.0,
    l2: float = 1e-6,
    seed: int = 0,
    profile: str = "simple",
    word_ngrams: int = 1,
) -> np.ndarray:
    """Full-batch logistic regression over a Ray Dataset; returns the
    (dim+1) weight vector (last entry = bias). Bit-identical under any
    partitioning (int64 fixed-point partials; the driver update is a pure
    float64 function of their exact sum)."""
    import ray

    from ray.data.aggregate import Sum

    n_total = ds.count()
    if n_total == 0:
        raise ValueError("empty training set")
    n_pos = int(ds.aggregate(Sum(label_col, alias_name="s"))["s"] or 0)
    w = np.zeros(dim + 1, dtype=np.float64)
    w[-1] = _prior_bias(n_pos, n_total)
    for _ in range(iters):
        wref = ray.put(w)

        def partial(batch: pa.Table, _wref=wref) -> pa.Table:
            wv = ray.get(_wref)
            indptr, col, vals, _ = featurize_batch(
                batch[text_col], dim, seed, profile, word_ngrams
            )
            labels = np.asarray(batch[label_col], dtype=np.int64)
            g = _grad_partial_int(wv, labels, indptr, col, vals, dim)
            return pa.table({"g": pa.array([g.tobytes()], pa.binary())})

        parts = ds.map_batches(
            partial, batch_format="pyarrow", num_cpus=1
        ).take_all()
        g_int = np.zeros(dim + 1, dtype=np.int64)
        for row in parts:
            g_int += np.frombuffer(row["g"], dtype=np.int64)
        grad = g_int.astype(np.float64) / (GRAD_SCALE * n_total)
        grad[:-1] += l2 * w[:-1]  # bias unregularized
        w = w - lr * grad
    return w


def train_logreg_local(
    texts: list[str],
    labels: np.ndarray,
    dim: int = 1 << 18,
    iters: int = 30,
    lr: float = 1.0,
    l2: float = 1e-6,
    seed: int = 0,
    profile: str = "simple",
    word_ngrams: int = 1,
) -> np.ndarray:
    """Single-machine reference with the identical fixed-point discipline —
    the pytest oracle for train_logreg (must match BIT-EXACTLY)."""
    indptr, col, vals, n = featurize_batch(pa.array(texts), dim, seed,
                                           profile, word_ngrams)
    labels = np.asarray(labels, dtype=np.int64)
    w = np.zeros(dim + 1, dtype=np.float64)
    w[-1] = _prior_bias(int(labels.sum()), n)
    for _ in range(iters):
        g_int = _grad_partial_int(w, labels, indptr, col, vals, dim)
        grad = g_int.astype(np.float64) / (GRAD_SCALE * n)
        grad[:-1] += l2 * w[:-1]
        w = w - lr * grad
    return w


def score_logreg(
    ds,
    w: np.ndarray,
    text_col: str = "text",
    dim: int | None = None,
    seed: int = 0,
    profile: str = "simple",
    out_col: str = "prob_e6",
    word_ngrams: int = 1,
):
    """Broadcast-score: adds an int64 fixed-point probability column
    (round(sigmoid(w·x) * 1e6) — per-doc deterministic, so downstream
    aggregates stay order-independent)."""
    import ray

    dim = (w.size - 1) if dim is None else dim
    wref = ray.put(np.asarray(w, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        wv = ray.get(wref)
        indptr, col, vals, _ = featurize_batch(batch[text_col], dim, seed,
                                               profile, word_ngrams)
        m = _doc_margins(wv, indptr, col, vals)
        p = 1.0 / (1.0 + np.exp(-m))
        e6 = np.rint(p * PROB_SCALE).astype(np.int64)
        return batch.append_column(out_col, pa.array(e6, pa.int64()))

    return ds.map_batches(score, batch_format="pyarrow", num_cpus=1)
