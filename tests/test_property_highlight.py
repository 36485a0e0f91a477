"""Property test: highlight snippets vs re-analysis of stored content.

The highlighter reads each term's FIRST position from the positional
postings; the reference here recomputes term positions independently by
re-analyzing the stored content (`IndexReader.analyze` — the same chain the
indexer ran). Invariants for random term queries:

  * exactly one (doc, term) row per top-k doc x analyzed query term PRESENT
    in that doc — no misses, no extras;
  * first_pos equals the re-analysis' minimum position for that term
    (postings positions == analyzer positions);
  * the snippet window contains the term's rendered token.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_TERMS = ["def", "return", "import", "http", "the", "config", "zzz_absent"]


@pytest.fixture(scope="module")
def hl_rig(ray_session):
    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.corpus import corpus_path
    from nexlt_ray.query import IndexReader

    idx = os.path.join(tempfile.mkdtemp(prefix="hl_idx_"), "idx")
    build_index(
        corpus_path(200), idx, BuildConfig(num_doc_buckets=4, num_term_buckets=4)
    )
    return IndexReader(idx)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(terms=st.lists(st.sampled_from(_TERMS), min_size=1, max_size=3,
                      unique=True))
def test_highlight_matches_reanalysis(hl_rig, terms):
    r = hl_rig
    q = " ".join(terms)
    top = [d for d, _ in r.search(q, k=10, use_cache=False)]
    hl = r.highlight(q, k=10)

    qterms = sorted({t for t, _ in r.analyze(q, query_time=True)})
    expected = {}
    if top:
        fields = r.doc_fields(sorted(top), ["content", "lang"])
        for did, ctext, dlang in zip(
            fields["doc_id"].to_pylist(),
            fields["content"].to_pylist(),
            fields["lang"].to_pylist(),
        ):
            pos_by_term: dict[str, int] = {}
            for tok, pos in r.analyze(ctext, lang=dlang):
                if tok in qterms and (
                    tok not in pos_by_term or pos < pos_by_term[tok]
                ):
                    pos_by_term[tok] = int(pos)
            for t, p in pos_by_term.items():
                expected[(int(did), t)] = p

    got = {
        (int(d), t): int(p)
        for d, t, p in zip(
            hl["doc_id"].to_pylist(),
            hl["term"].to_pylist(),
            hl["first_pos"].to_pylist(),
        )
    }
    assert got == expected, q
    for t, snip in zip(hl["term"].to_pylist(), hl["snippet"].to_pylist()):
        assert t in snip.lower(), (t, snip)
