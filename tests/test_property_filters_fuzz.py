"""Filter (fq) fuzz: random filter dicts vs brute-force post-filtering.

The FilterSet lattice (values OR within a field, AND across fields, BM25
statistics corpus-global — Solr fq semantics) is driven with random
(query, filters) combinations, including unknown values and multi-field
conjunctions, against a real 300-doc index. Invariant: the filtered top-10
equals the brute-force filter of the UNFILTERED exhaustive ranking (scores
must be identical — fq selects, it never re-weights), and filtered
match_count equals the brute-force matching-doc count.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_LANGS = ["python", "java", "cpp", "javascript", "markdown", "nosuchlang"]
_REPOS = ["org0/repo0", "org1/repo1", "org2/repo2", "org9/repo9"]
_QUERIES = ["def", "return", "import", "the http", "parse config", "zzz_absent"]


@st.composite
def _filters(draw):
    f = {}
    if draw(st.booleans()):
        vals = draw(st.lists(st.sampled_from(_LANGS), min_size=1, max_size=3,
                             unique=True))
        f["lang"] = vals[0] if len(vals) == 1 and draw(st.booleans()) else vals
    if draw(st.booleans()):
        vals = draw(st.lists(st.sampled_from(_REPOS), min_size=1, max_size=2,
                             unique=True))
        f["repo"] = vals[0] if len(vals) == 1 and draw(st.booleans()) else vals
    return f


@pytest.fixture(scope="module")
def filter_rig(ray_session):
    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.corpus import corpus_path
    from nexlt_ray.query import IndexReader

    idx = os.path.join(tempfile.mkdtemp(prefix="filt_idx_"), "idx")
    m = build_index(
        corpus_path(300), idx, BuildConfig(num_doc_buckets=8, num_term_buckets=4)
    )
    meta = pq.read_table(os.path.join(idx, "docstore"))
    doc_id = (
        np.asarray(m["doc_offsets"])[np.asarray(meta["doc_bucket"])]
        + np.asarray(meta["local_rank"])
    )
    doc_meta = {
        int(d): (r, lg)
        for d, r, lg in zip(
            doc_id, meta["repo"].to_pylist(), meta["lang"].to_pylist()
        )
    }
    return IndexReader(idx), doc_meta


def _matches(meta, filters):
    repo, lang = meta
    for field, vals in filters.items():
        allowed = [vals] if isinstance(vals, str) else vals
        if (repo if field == "repo" else lang) not in allowed:
            return False
    return True


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=st.sampled_from(_QUERIES), filters=_filters())
def test_filtered_search_equals_brute_force(filter_rig, q, filters):
    r, doc_meta = filter_rig
    full = r.search(q, k=r.n_docs, algorithm="exhaustive", use_cache=False)
    expected = [
        (d, s) for d, s in full if _matches(doc_meta[d], filters)
    ][:10]
    for algo in ("wand", "exhaustive"):
        got = r.search(
            q, k=10, algorithm=algo,
            filters=filters or None, use_cache=False,
        )
        assert got == expected, (q, filters, algo)
    n_match = sum(
        1 for d, _ in full if _matches(doc_meta[d], filters)
    )
    assert r.match_count(q, filters=filters or None) == n_match
