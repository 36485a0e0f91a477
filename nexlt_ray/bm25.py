"""Lucene-compatible BM25 scoring (k1=1.2, b=0.75) with SmallFloat norm decode.

The reference pins DefaultSimilarity (TF-IDF) in its schema
(/root/reference/solr/NeXLT/solr/collection1/conf/schema.xml:1088); per the
graft north rule the similarity is overridden to Lucene-compatible BM25 with
the same one-byte doc-length-norm discipline. The exact arithmetic spec this
engine (and its pure-Python oracle, and the WAND evaluator) all follow:

  dl(d)      = SmallFloat.byte4ToInt(norm_byte(d))      (lossy decoded length)
  avgdl      = sum(true doc_len) / N                    (float64)
  idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))      (float64)
  K(d)       = k1 * (1 - b + b * dl(d) / avgdl)         (float64)
  s(t, d)    = float32( idf * (k1+1) * tf / (tf + K) )  (per-term cast to f32)
  score(q,d) = float32 sum of s(t_i, d) in query-clause order
               (duplicate query terms are separate clauses, like Lucene
               BooleanQuery SHOULD clauses)
  ties       = broken by ascending docID (Lucene collector discipline)

Pure NumPy, no Ray.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .codec import NORM_DECODE_TABLE


@dataclass(frozen=True)
class BM25Params:
    k1: float = 1.2
    b: float = 0.75


def idf(df: int, n_docs: int) -> float:
    """Lucene BM25 idf (float64)."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def norm_k_table(avgdl: float, params: BM25Params = BM25Params()) -> np.ndarray:
    """256-entry cache: norm byte -> K = k1*(1-b+b*dl/avgdl) (float64).

    The analog of Lucene BM25Similarity's per-segment norm cache.

    avgdl == 0 means the corpus has zero tokens total, so no posting exists
    and K is never consulted; pin the divisor to 1.0 to keep the table finite
    (same convention as the pure-Python oracle, which never reaches its
    division in that case).
    """
    dl = NORM_DECODE_TABLE.astype(np.float64)
    return params.k1 * (1.0 - params.b + params.b * dl / (avgdl or 1.0))


def term_scores(
    tfs: np.ndarray,
    norm_bytes: np.ndarray,
    df: int,
    n_docs: int,
    avgdl: float,
    params: BM25Params = BM25Params(),
    k_table: np.ndarray | None = None,
) -> np.ndarray:
    """Per-posting float32 BM25 contributions for one term."""
    if k_table is None:
        k_table = norm_k_table(avgdl, params)
    k = k_table[np.asarray(norm_bytes, dtype=np.int64)]
    tf = np.asarray(tfs, dtype=np.float64)
    w = idf(df, n_docs) * (params.k1 + 1.0)
    return (w * tf / (tf + k)).astype(np.float32)


def term_upper_bound(
    max_tf: int,
    min_norm_byte: int,
    df: int,
    n_docs: int,
    avgdl: float,
    params: BM25Params = BM25Params(),
) -> float:
    """Upper bound on s(t, d) over a posting range described by its block-max
    metadata (max tf, min norm byte). Valid because BM25 is increasing in tf
    and decreasing in dl: s <= s(max_tf, min_dl)."""
    dl = float(NORM_DECODE_TABLE[min_norm_byte])
    k = params.k1 * (1.0 - params.b + params.b * dl / (avgdl or 1.0))
    w = idf(df, n_docs) * (params.k1 + 1.0)
    # float32-cast like real contributions, then nudge up one ulp so the bound
    # stays >= any float32 contribution after rounding
    ub = np.float32(w * max_tf / (max_tf + k))
    return float(np.nextafter(ub, np.float32(np.inf), dtype=np.float32))


def term_upper_bounds(
    max_tfs: np.ndarray,
    min_norm_bytes: np.ndarray,
    df: int,
    n_docs: int,
    avgdl: float,
    params: BM25Params = BM25Params(),
) -> np.ndarray:
    """Vectorized `term_upper_bound` over per-block metadata arrays
    (float32, nudged up one ulp)."""
    dl = NORM_DECODE_TABLE[np.asarray(min_norm_bytes, dtype=np.int64)].astype(
        np.float64
    )
    k = params.k1 * (1.0 - params.b + params.b * dl / (avgdl or 1.0))
    w = idf(df, n_docs) * (params.k1 + 1.0)
    tf = np.asarray(max_tfs, dtype=np.float64)
    ub = (w * tf / (tf + k)).astype(np.float32)
    return np.nextafter(ub, np.float32(np.inf), dtype=np.float32)
