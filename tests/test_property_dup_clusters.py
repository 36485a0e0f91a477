"""Property test: dup_clusters == union-find on random graphs.

Random edge lists (self-loops, duplicate edges, skewed hubs, long chains
all arise naturally from the generator) must resolve to exactly the
components a textbook union-find computes, with cluster_id = min doc_id of
the component. Runs the single-task fast path per example;
test_dup_clusters_fast_and_distributed_paths_agree (test_operators.py) pins
the distributed label-propagation path equal to the fast path, so this
oracle transitively covers both.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),
        st.integers(min_value=0, max_value=60),
    ),
    min_size=1,
    max_size=80,
)


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        for v in (a, b):
            parent.setdefault(v, v)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges)
def test_random_graph_components_match_union_find(ray_session, edges):
    import ray.data

    from nexlt_ray.dedup import dup_clusters

    pairs = pa.table(
        {
            "doc_a": pa.array(np.array([a for a, _ in edges], np.int64)),
            "doc_b": pa.array(np.array([b for _, b in edges], np.int64)),
        }
    )
    out = dup_clusters(ray.data.from_arrow(pairs)).to_pandas()
    got = dict(zip(out["doc_id"].astype(int), out["cluster_id"].astype(int)))
    assert got == _union_find(edges)
