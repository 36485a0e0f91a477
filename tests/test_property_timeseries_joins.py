"""Property tests: asof_join / range_join vs brute-force references.

Random (key, time) tables with heavy key collisions, duplicate timestamps
(exercising the asof tiebreak), boundary-exact deltas and empty sides,
across multiple input partitions — compared pair-for-pair against O(n*m)
reference implementations.
"""

from __future__ import annotations

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_key = st.integers(min_value=0, max_value=4)
_ts = st.integers(min_value=0, max_value=30)


@st.composite
def _tables(draw):
    nl = draw(st.integers(min_value=1, max_value=20))
    nr = draw(st.integers(min_value=0, max_value=20))
    left = [(i, draw(_key), draw(_ts)) for i in range(nl)]
    right = [(100 + i, draw(_key), draw(_ts)) for i in range(nr)]
    return left, right


def _mk(rows, id_name):
    return pa.table(
        {
            id_name: pa.array([r[0] for r in rows], pa.int64()),
            "k": pa.array([r[1] for r in rows], pa.int64()),
            "t": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=_tables())
def test_asof_join_matches_brute_force(ray_session, data):
    import ray.data

    from nexlt_ray.joins import asof_join

    left, right = data
    expected = {}
    for lid, lk, lt in left:
        cands = [(rt, rid) for rid, rk, rt in right if rk == lk and rt <= lt]
        if cands:
            # backward as-of: latest right.t; ties -> greatest tiebreak id
            expected[lid] = max(cands)[1]

    out = asof_join(
        ray.data.from_arrow(_mk(left, "lid")).repartition(3),
        ray.data.from_arrow(_mk(right, "rid")).repartition(2),
        by="k", on="t", tiebreak="rid", num_buckets=4,
    ).to_pandas()
    got = (
        {}
        if len(out) == 0
        else dict(zip(out["lid"].astype(int), out["r_rid"].astype(int)))
    )
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=_tables(), window=st.integers(min_value=1, max_value=8))
def test_range_join_matches_brute_force(ray_session, data, window):
    import ray.data

    from nexlt_ray.joins import range_join

    left, right = data
    expected = {
        (lid, rid)
        for lid, lk, lt in left
        for rid, rk, rt in right
        if rk == lk and abs(lt - rt) <= window
    }

    out = range_join(
        ray.data.from_arrow(_mk(left, "lid")).repartition(3),
        ray.data.from_arrow(_mk(right, "rid")).repartition(2),
        by="k", on="t", window=window, num_buckets=4,
    ).to_pandas()
    got = (
        set()
        if len(out) == 0
        else set(zip(out["lid"].astype(int), out["r_rid"].astype(int)))
    )
    assert got == expected
    if len(out):
        # each qualifying pair materializes exactly once (banding invariant)
        assert len(out) == len(got)
