"""Property test: substring_dup_pairs completeness + exactness guarantees.

Generator builds doc pairs over DISJOINT alphabets (one doc from 'abcd ',
the other from 'wxyz '), so no min_len-run can be shared by accident, then
plants an identical random run (>= min_len chars, from a third alphabet)
into both docs of randomly chosen pairs at random offsets:

  * completeness (the winnowing guarantee): every planted pair MUST be
    reported — a shared run of >= min_len bytes always shares a selected
    fingerprint, and the exact verify confirms it;
  * exactness: no unplanted pair may ever be reported.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

MIN_LEN = 40
K = 16


@st.composite
def _case(draw):
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    n_pairs = draw(st.integers(min_value=1, max_value=5))
    run_len = draw(st.integers(min_value=MIN_LEN, max_value=MIN_LEN + 30))
    planted = draw(
        st.lists(st.booleans(), min_size=n_pairs, max_size=n_pairs)
    )
    docs, expected = [], set()
    for i, plant in enumerate(planted):
        a = "".join(rng.choice(list("abcd "), rng.integers(100, 400)))
        b = "".join(rng.choice(list("wxyz "), rng.integers(100, 400)))
        if plant:
            run = "".join(rng.choice(list("pqrs"), run_len))
            pa_off = int(rng.integers(0, len(a) + 1))
            pb_off = int(rng.integers(0, len(b) + 1))
            a = a[:pa_off] + run + a[pa_off:]
            b = b[:pb_off] + run + b[pb_off:]
            expected.add((2 * i, 2 * i + 1))
        docs.extend([(2 * i, a), (2 * i + 1, b)])
    return docs, expected


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_case())
def test_planted_runs_found_exactly(ray_session, case):
    import ray.data

    from nexlt_ray.dedup import substring_dup_pairs

    docs, expected = case
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    )
    out = substring_dup_pairs(ds, min_len=MIN_LEN, k=K).to_pandas()
    # Ray's to_pandas drops the columns of any ZERO-row dataset (even a
    # typed from_arrow empty) — normalize that quirk, it still proves the
    # exactness direction (no rows == no pairs reported)
    got = (
        set()
        if len(out) == 0
        else {
            (min(a, b), max(a, b))
            for a, b in zip(
                out["doc_a"].astype(int), out["doc_b"].astype(int)
            )
        }
    )
    assert got == expected
