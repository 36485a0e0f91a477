"""Property test: min_should_match vs brute-force clause counting.

For random OR queries (duplicate terms = separate SHOULD clauses, Lucene
BooleanQuery discipline) and every mm in 0..5: the result set must be the
plain-OR ranking restricted to docs satisfying >= mm clauses (a clause is
satisfied when its term's postings contain the doc; duplicate clauses are
satisfied together), with scores unchanged — mm selects, it never
re-weights. match_count must agree.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_TERMS = ["def", "return", "import", "http", "the", "zzz_absent"]


@pytest.fixture(scope="module")
def mm_rig(ray_session):
    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.corpus import corpus_path
    from nexlt_ray.query import IndexReader

    idx = os.path.join(tempfile.mkdtemp(prefix="mm_idx_"), "idx")
    build_index(
        corpus_path(200), idx, BuildConfig(num_doc_buckets=4, num_term_buckets=4)
    )
    r = IndexReader(idx)
    hit_sets = {
        t: {d for d, _ in r.search(t, k=r.n_docs, use_cache=False)}
        for t in _TERMS
    }
    return r, hit_sets


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    terms=st.lists(st.sampled_from(_TERMS), min_size=1, max_size=4),
    mm=st.integers(min_value=0, max_value=5),
)
def test_min_should_match_equals_brute_force(mm_rig, terms, mm):
    r, hit_sets = mm_rig
    q = " ".join(terms)
    full = r.search(q, k=r.n_docs, algorithm="exhaustive", use_cache=False)

    def clauses_hit(d):
        return sum(1 for t in terms if d in hit_sets[t])

    expected = [(d, s) for d, s in full if clauses_hit(d) >= mm][:10]
    for algo in ("wand", "exhaustive"):
        got = r.search(
            q, k=10, algorithm=algo, min_should_match=mm, use_cache=False
        )
        assert got == expected, (q, mm, algo)
    n = sum(1 for d, _ in full if clauses_hit(d) >= mm)
    assert r.match_count(q, min_should_match=mm) == n
