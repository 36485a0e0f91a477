"""Property test: search_sorted (multi-key field sort + offset + cursor)
vs a brute-force reference.

Random sort specs (1-2 of repo/lang/path, per-key asc/desc), random
(start, rows) windows and a random-page-size cursorMark walk, against the
docstore metadata sorted in plain Python (stable sorts from the last key
to the first reproduce the engine's lexicographic order; doc_id is the
mandatory tie-break).
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_FIELDS = ["repo", "lang", "path"]
_QUERIES = ["def", "return", "the http", "parse"]


@st.composite
def _spec(draw):
    n = draw(st.integers(min_value=1, max_value=2))
    fields = draw(
        st.lists(st.sampled_from(_FIELDS), min_size=n, max_size=n, unique=True)
    )
    asc = [draw(st.booleans()) for _ in fields]
    start = draw(st.integers(min_value=0, max_value=15))
    rows = draw(st.integers(min_value=1, max_value=12))
    page = draw(st.integers(min_value=1, max_value=9))
    return fields, asc, start, rows, page


@pytest.fixture(scope="module")
def sort_rig(ray_session):
    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.corpus import corpus_path
    from nexlt_ray.query import IndexReader

    idx = os.path.join(tempfile.mkdtemp(prefix="sort_idx_"), "idx")
    m = build_index(
        corpus_path(300), idx, BuildConfig(num_doc_buckets=8, num_term_buckets=4)
    )
    meta = pq.read_table(os.path.join(idx, "docstore"))
    doc_id = (
        np.asarray(m["doc_offsets"])[np.asarray(meta["doc_bucket"])]
        + np.asarray(meta["local_rank"])
    )
    doc_meta = {
        int(d): {f: v for f, v in zip(_FIELDS, vals)}
        for d, *vals in zip(
            doc_id,
            meta["repo"].to_pylist(),
            meta["lang"].to_pylist(),
            meta["path"].to_pylist(),
        )
    }
    return IndexReader(idx), doc_meta


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=st.sampled_from(_QUERIES), spec=_spec())
def test_sorted_pages_match_brute_force(sort_rig, q, spec):
    r, doc_meta = sort_rig
    fields, asc, start, rows, page = spec

    matching = sorted(d for d, _ in r.search(
        q, k=r.n_docs, algorithm="exhaustive", use_cache=False
    ))
    order = list(matching)  # ascending doc_id = the tie-break baseline
    for f, a in zip(reversed(fields), reversed(asc)):
        order.sort(key=lambda d: doc_meta[d][f], reverse=not a)

    got = r.search_sorted(q, sort_by=fields, ascending=asc,
                          start=start, rows=rows)
    assert int(got.schema.metadata[b"num_found"]) == len(matching)
    assert got["doc_id"].to_pylist() == order[start : start + rows]

    # cursorMark walk with an arbitrary page size covers the full order
    walked, cur = [], None
    while True:
        p = r.search_sorted(q, sort_by=fields, ascending=asc,
                            rows=page, cursor=cur)
        if p.num_rows == 0:
            break
        walked.extend(p["doc_id"].to_pylist())
        cur = tuple(json.loads(p.schema.metadata[b"next_cursor"]))
        if p.num_rows < page:
            break
    assert walked == order
