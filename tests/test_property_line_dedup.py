"""Property test: line_dedup equals a brute-force single-machine reference
on random corpora with skewed line reuse — df counts DISTINCT docs, every
occurrence of a boilerplate line is removed, surviving lines keep their
order, fully-boilerplate docs keep an empty row, and the result is
independent of block layout."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _case(draw):
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    n_docs = draw(st.integers(min_value=1, max_value=40))
    min_docs = draw(st.integers(min_value=2, max_value=6))
    # small shared line pool -> heavy reuse; Zipf-ish pick
    pool = [f"line {i} {'x' * int(rng.integers(0, 4))}" for i in range(12)]
    pool += ["", " "]  # empty and whitespace-only lines
    docs = []
    for d in range(n_docs):
        k = int(rng.integers(1, 8))
        lines = [pool[int(rng.integers(0, len(pool)))] for _ in range(k)]
        docs.append((d, "\n".join(lines)))
    nb = draw(st.integers(min_value=1, max_value=7))
    return docs, min_docs, nb


def _reference(docs, min_docs):
    from collections import Counter

    df = Counter()
    for _, t in docs:
        for ln in set(t.split("\n")):
            df[ln] += 1
    boiler = {ln for ln, c in df.items() if c >= min_docs}
    out = {}
    for d, t in docs:
        lines = t.split("\n")
        kept = [ln for ln in lines if ln not in boiler]
        out[d] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_case())
def test_line_dedup_matches_reference(ray_session, case):
    import ray.data

    from nexlt_ray.dedup import line_dedup

    docs, min_docs, nb = case
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([s for _, s in docs]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(nb)
    out = (
        line_dedup(ds, min_docs=min_docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = _reference(docs, min_docs)
    assert len(out) == len(docs)
    for row in out.itertuples():
        ct, nl, nr = ref[row.doc_id]
        assert row.clean_text == ct, row.doc_id
        assert row.n_lines == nl, row.doc_id
        assert row.n_removed == nr, row.doc_id
