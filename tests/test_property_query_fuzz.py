"""Query-string fuzz: ANY query text must be handled without crashing.

The parser surface (query.py parse(): match-all, phrase + slop, prefix,
wildcard, fuzzy, boolean +/-/^ clauses, plain OR terms) is driven with
adversarial strings — operator soup, unbalanced quotes, unicode, empty —
against a real 200-doc index. Invariants for every input:

  * search() returns a well-typed list[(int, float32-exact float)] of <= k,
    finite scores, strictly (score desc, doc_id asc) ordered;
  * WAND == exhaustive (rank identity holds on whatever the parse produced);
  * repeat calls are deterministic (cache on AND off);
  * match_count() returns a non-negative int.
"""

from __future__ import annotations

import math
import os
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# operator-heavy alphabet + corpus-plausible tokens + unicode
_ALPHABET = list('abc01 "*?~^+-:[]().\\/') + ["é", "日", "\t"]
_TOKENS = ["def", "return", "import", "the", "http", "wi-fi", "Foo9"]

_free = st.text(alphabet=st.sampled_from(_ALPHABET), min_size=0, max_size=30)
_structured = st.lists(
    st.one_of(
        st.sampled_from(_TOKENS),
        st.sampled_from(_TOKENS).map(lambda t: "+" + t),
        st.sampled_from(_TOKENS).map(lambda t: "-" + t),
        st.sampled_from(_TOKENS).map(lambda t: t + "^2"),
        st.sampled_from(_TOKENS).map(lambda t: t + "~1"),
        st.sampled_from(_TOKENS).map(lambda t: t[:3] + "*"),
        st.sampled_from(_TOKENS).map(lambda t: '"' + t + ' def"'),
        st.sampled_from(_TOKENS).map(lambda t: '"' + t + ' def"~2'),
    ),
    min_size=1,
    max_size=4,
).map(" ".join)
_query = st.one_of(_free, _structured)


@pytest.fixture(scope="module")
def fuzz_reader(ray_session):
    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.corpus import corpus_path
    from nexlt_ray.query import IndexReader

    idx = os.path.join(tempfile.mkdtemp(prefix="fuzz_idx_"), "idx")
    build_index(
        corpus_path(200), idx, BuildConfig(num_doc_buckets=4, num_term_buckets=4)
    )
    return IndexReader(idx)


def _well_formed(res, k):
    assert isinstance(res, list) and len(res) <= k
    for d, s in res:
        assert isinstance(d, int) and d >= 0
        assert isinstance(s, float) and math.isfinite(s)
    # (score desc, doc_id asc) total order
    keys = [(-s, d) for d, s in res]
    assert keys == sorted(keys)
    assert len({d for d, _ in res}) == len(res)


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_query)
def test_any_query_string_is_handled(fuzz_reader, q):
    r = fuzz_reader
    w = r.search(q, k=10, algorithm="wand", use_cache=False)
    e = r.search(q, k=10, algorithm="exhaustive", use_cache=False)
    _well_formed(w, 10)
    assert w == e, q
    assert r.search(q, k=10, algorithm="wand", use_cache=False) == w
    assert r.search(q, k=10) == w  # cached path agrees too
    c = r.match_count(q)
    assert isinstance(c, int) and 0 <= c <= r.n_docs
    # every returned doc is a match, so numFound can't be smaller
    assert c >= len(w), q
