"""Independent pure-Python reference implementation (the test oracle).

Implements exhaustive BM25 top-k over plain Python dicts, following the same
arithmetic spec as nexlt_ray.bm25 (documented there) but sharing no scoring /
index code with the engine: postings are dicts, scores are computed with
`math` + explicit numpy.float32 casts, top-k is a full sort. Mirrors the
reference's test strategy of one trusted golden path
(/root/reference/tools/test.sh:5-8) extended with rank-identity checking per
SURVEY.md §5.

Only the tokenizer is shared — tokenization is the *definition* of the text
model, not part of the machinery under test (the reference likewise shares
Solr's analyzer between index and golden queries).
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from .codec import small_float_byte4_to_int, small_float_int_to_byte4
from .tokenize import tokenize_batch, tokenize_query


class OracleIndex:
    """Exhaustive in-memory index over a list of (doc_id, content) pairs."""

    def __init__(
        self,
        docs: list[tuple[int, str]],
        profile: str = "code",
        k1: float = 1.2,
        b: float = 0.75,
        langs: list[str] | None = None,
        synonyms: dict[str, list[str]] | None = None,
    ):
        self.profile = profile
        self.k1 = k1
        self.b = b
        self.synonyms = {k: list(v) for k, v in (synonyms or {}).items()}
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)  # term -> doc -> tf
        self.positions: dict[str, dict[int, list[int]]] = defaultdict(dict)
        self.doc_len: dict[int, int] = {}
        self.norm_byte: dict[int, int] = {}
        ids = [d for d, _ in docs]
        if profile == "auto":
            from .tokenize import tokenize_by_lang

            assert langs is not None
            tb = tokenize_by_lang([c for _, c in docs], langs)
        else:
            tb = tokenize_batch([c for _, c in docs], profile=profile)
        for row, (did, _) in enumerate(docs):
            self.doc_len[did] = int(tb.doc_len[row])
            self.norm_byte[did] = int(small_float_int_to_byte4(int(tb.doc_len[row]))[0])
        for t, p, r in zip(tb.terms, tb.positions, tb.doc_idx):
            did = ids[r]
            t = str(t)
            self.postings[t][did] = self.postings[t].get(did, 0) + 1
            self.positions[t].setdefault(did, []).append(int(p))
        for t in self.positions:
            for did in self.positions[t]:
                self.positions[t][did].sort()
        self.n_docs = len(docs)
        self.total_len = sum(self.doc_len.values())
        self.avgdl = self.total_len / self.n_docs if self.n_docs else 0.0

    # -- scoring ----------------------------------------------------------
    def _idf(self, df: int) -> float:
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def _term_score(self, term: str, did: int) -> np.float32:
        post = self.postings.get(term, {})
        tf = post.get(did, 0)
        if tf == 0:
            return np.float32(0.0)
        df = len(post)
        dl = float(small_float_byte4_to_int(self.norm_byte[did])[0])
        k = self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        return np.float32(self._idf(df) * (self.k1 + 1.0) * tf / (tf + k))

    def search(self, query: str, k: int = 10, lang: str | None = None) -> list[tuple[int, float]]:
        """Top-k (doc_id, score) for an OR query / quoted phrase, scores in
        float32, ties broken by ascending doc_id."""
        phrase = query.startswith('"') and query.endswith('"') and len(query) > 1
        prof = self.profile
        if prof == "auto":
            from .tokenize import profile_for_lang

            prof = profile_for_lang(lang or "", "code")
        terms = tokenize_query(query.strip('"'), profile=prof)
        if not phrase and self.synonyms:
            terms = [x for t in terms for x in (t, *self.synonyms.get(t, []))]
        if not terms:
            return []
        if phrase:
            cand = self._phrase_docs(terms)
        else:
            cand = set()
            for t in terms:
                cand |= set(self.postings.get(t, {}))
        scored = []
        for did in cand:
            acc = np.float32(0.0)
            for t in terms:  # clause order = query order; dups stay separate
                acc = np.float32(acc + self._term_score(t, did))
            scored.append((did, float(acc)))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def _phrase_docs(self, terms: list[str]) -> set[int]:
        """Docs where the terms appear at consecutive positions."""
        if not terms:
            return set()
        docs = set(self.positions.get(terms[0], {}))
        for t in terms[1:]:
            docs &= set(self.positions.get(t, {}))
        out = set()
        for did in docs:
            first = self.positions[terms[0]][did]
            ok = False
            for p in first:
                if all((p + i) in self.positions[t][did] for i, t in enumerate(terms[1:], 1)):
                    ok = True
                    break
            if ok:
                out.add(did)
        return out

    def match_count(self, query: str) -> int:
        """numFound analog (reference G3, corpus.cgi:409)."""
        phrase = query.startswith('"') and query.endswith('"')
        terms = tokenize_query(query.strip('"'), profile=self.profile)
        if not terms:
            return 0
        if phrase:
            return len(self._phrase_docs(terms))
        cand = set()
        for t in terms:
            cand |= set(self.postings.get(t, {}))
        return len(cand)

    def term_stats(self) -> dict[str, tuple[int, int]]:
        """term -> (df, cf)."""
        return {
            t: (len(p), sum(p.values())) for t, p in self.postings.items()
        }
