"""Property test: facets / facet_pivot vs brute-force counters.

Random (query — term or match-all — field subsets, fq filters) against the
docstore metadata: per-field value counts over the matching docs, Solr
facet.sort=count discipline (count desc, value asc), and the two-level
pivot. Shares the brute-force filter semantics with
test_property_filters_fuzz (OR within a field, AND across)."""

from __future__ import annotations

import os
import tempfile
from collections import Counter

import numpy as np
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_QUERIES = ["def", "return", "the http", "*:*", "zzz_absent"]
_LANGS = ["python", "java", "cpp", "nosuchlang"]


@st.composite
def _case(draw):
    fields = draw(
        st.lists(st.sampled_from(["repo", "lang"]), min_size=1, max_size=2,
                 unique=True)
    )
    filters = None
    if draw(st.booleans()):
        filters = {"lang": draw(
            st.lists(st.sampled_from(_LANGS), min_size=1, max_size=2,
                     unique=True)
        )}
    return fields, filters


@pytest.fixture(scope="module")
def facet_rig(ray_session):
    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.corpus import corpus_path
    from nexlt_ray.query import IndexReader

    idx = os.path.join(tempfile.mkdtemp(prefix="facet_idx_"), "idx")
    m = build_index(
        corpus_path(300), idx, BuildConfig(num_doc_buckets=8, num_term_buckets=4)
    )
    meta = pq.read_table(os.path.join(idx, "docstore"))
    doc_id = (
        np.asarray(m["doc_offsets"])[np.asarray(meta["doc_bucket"])]
        + np.asarray(meta["local_rank"])
    )
    doc_meta = {
        int(d): {"repo": r, "lang": lg}
        for d, r, lg in zip(
            doc_id, meta["repo"].to_pylist(), meta["lang"].to_pylist()
        )
    }
    return IndexReader(idx), doc_meta


def _matching(r, doc_meta, q, filters):
    if q == "*:*":
        docs = sorted(doc_meta)
    else:
        docs = [d for d, _ in r.search(
            q, k=r.n_docs, algorithm="exhaustive", use_cache=False
        )]
    if filters:
        docs = [
            d for d in docs
            if all(doc_meta[d][f] in v for f, v in filters.items())
        ]
    return docs


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=st.sampled_from(_QUERIES), case=_case())
def test_facets_match_brute_force(facet_rig, q, case):
    r, doc_meta = facet_rig
    fields, filters = case
    docs = _matching(r, doc_meta, q, filters)

    got = r.facets(q, fields, filters=filters)
    for f in fields:
        c = Counter(doc_meta[d][f] for d in docs)
        assert got[f] == sorted(c.items(), key=lambda kv: (-kv[1], kv[0])), (
            q, f, filters,
        )

    pv = r.facet_pivot(q, ("repo", "lang"), filters=filters)
    cp = Counter((doc_meta[d]["repo"], doc_meta[d]["lang"]) for d in docs)
    assert pv == [
        (v1, v2, c)
        for (v1, v2), c in sorted(cp.items(), key=lambda kv: (-kv[1], kv[0]))
    ], (q, filters)
