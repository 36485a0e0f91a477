"""End-to-end property test: random corpus -> build_index -> query.

For ANY small corpus (random token soup, duplicates, empty docs) the full
distributed path (Ray build -> segment encode -> block-max WAND) must agree
exactly with the exhaustive scorer AND the pure-Python OracleIndex, for a
battery of OR / phrase / absent-term queries — top-k ids, float32 scores,
tie order, and numFound. This generalizes the fixed-corpus rank-identity
tests (test_build_query.py) the same way the kernel property tests at the
bottom of test_operators.py generalize their fixed cases.

Runtime budget: each example runs a full (tiny) distributed build, so
max_examples stays small; the fixed query battery per corpus does the
coverage work (every vocab term + multi-term + phrase + absent terms).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# small vocab forces term collisions across docs; "the"-style token makes
# stopword-grade df; mixed-case + digits exercise the code profile's
# WordDelimiter splits exactly where the fixed corpus doesn't
VOCAB = ["a", "ab", "b0", "foo", "bar", "Baz9", "x_y", "qq", "zzz", "the"]
ABSENT = ["nope", "missing7"]

_doc = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=25).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=50)


def _query_battery() -> list[str]:
    qs = list(VOCAB) + ABSENT
    qs += ["foo bar", "the a qq", "zzz nope", " ".join(VOCAB[:5])]
    qs += ['"foo bar"', '"the the"', '"a b0 foo"', '"nope foo"']
    return qs


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_corpus, seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_random_corpus_rank_identity(ray_session, docs, seed):
    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.oracle import OracleIndex
    from nexlt_ray.query import IndexReader

    n = len(docs)
    rng = np.random.default_rng(seed)
    root = tempfile.mkdtemp(prefix="prop_rank_")
    src = os.path.join(root, "corpus.parquet")
    pq.write_table(
        pa.table(
            {
                "repo": pa.array([f"r{i % 3}" for i in range(n)]),
                "path": pa.array([f"p/{i}.txt" for i in range(n)]),
                "commit": pa.array(["c0"] * n),
                "lang": pa.array(
                    [["en", "de", "ja"][int(x)] for x in rng.integers(0, 3, n)]
                ),
                "content": pa.array(docs, pa.string()),
            }
        ),
        src,
    )
    idx = os.path.join(root, "idx")
    m = build_index(
        src, idx, BuildConfig(num_doc_buckets=4, num_term_buckets=4)
    )

    meta = pq.read_table(os.path.join(idx, "docstore"))
    doc_id = (
        np.asarray(m["doc_offsets"])[np.asarray(meta["doc_bucket"])]
        + np.asarray(meta["local_rank"])
    )
    oracle = OracleIndex(
        list(zip(doc_id.tolist(), meta["content"].to_pylist())),
        profile="code",
    )
    r = IndexReader(idx)
    for q in _query_battery():
        w = r.search(q, k=10, algorithm="wand", use_cache=False)
        e = r.search(q, k=10, algorithm="exhaustive", use_cache=False)
        exp = [(d, float(np.float32(s))) for d, s in oracle.search(q, k=10)]
        assert w == e == exp, (q, w, e, exp)
        assert r.match_count(q) == oracle.match_count(q), q
