"""Property test: extend_index == full rebuild for ANY corpus and split.

Generalizes test_incremental.py's fixed 500/100 split the same way
test_property_rank_identity.py generalizes the fixed-corpus rank-identity
tests: random token-soup corpora (small vocab so exact-duplicate docs occur
across the split, exercising the upsert/dedup path) and a random split point.
Byte-identity of docstore + segments trees is the assertion — it subsumes
rank-identity of every possible query.

Each example runs three tiny distributed builds, so max_examples stays small.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

VOCAB = ["a", "ab", "b0", "foo", "bar", "Baz9", "x_y", "qq", "zzz", "the"]

_doc = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=15).map(" ".join)


@st.composite
def _corpus_and_split(draw):
    docs = draw(st.lists(_doc, min_size=2, max_size=40))
    split = draw(st.integers(min_value=1, max_value=len(docs) - 1))
    return docs, split


def _table(docs, start):
    n = len(docs)
    return pa.table(
        {
            "repo": pa.array([f"r{(start + i) % 3}" for i in range(n)]),
            "path": pa.array([f"p/{start + i}.txt" for i in range(n)]),
            "commit": pa.array(["c0"] * n),
            "lang": pa.array([["en", "de"][(start + i) % 2] for i in range(n)]),
            "content": pa.array(docs, pa.string()),
        }
    )


def _tree_bytes(root, sub):
    # a corpus with zero tokens legitimately produces no segments dir at all
    # (IndexReader serves it as an empty index); missing == empty here
    out = {}
    d = os.path.join(root, sub)
    if not os.path.isdir(d):
        return out
    for name in sorted(os.listdir(d)):
        if name.endswith(".parquet"):
            with open(os.path.join(d, name), "rb") as f:
                out[name] = f.read()
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=_corpus_and_split())
def test_random_extend_equals_full_rebuild(ray_session, data):
    from nexlt_ray.build import BuildConfig, build_index, extend_index

    docs, split = data
    root = tempfile.mkdtemp(prefix="prop_inc_")
    a_dir = os.path.join(root, "a")
    ab_dir = os.path.join(root, "ab")
    os.makedirs(a_dir)
    os.makedirs(ab_dir)
    pq.write_table(_table(docs[:split], 0), os.path.join(a_dir, "a.parquet"))
    pq.write_table(_table(docs[:split], 0), os.path.join(ab_dir, "a.parquet"))
    pq.write_table(
        _table(docs[split:], split), os.path.join(ab_dir, "b.parquet")
    )
    b_path = os.path.join(root, "b.parquet")
    pq.write_table(_table(docs[split:], split), b_path)

    cfg = BuildConfig(id_mode="strided", num_doc_buckets=4, num_term_buckets=4)
    inc = os.path.join(root, "inc")
    full = os.path.join(root, "full")
    build_index(a_dir, inc, cfg)
    extend_index(b_path, inc)
    build_index(ab_dir, full, cfg)

    for sub in ("docstore", "segments"):
        ta, tb = _tree_bytes(inc, sub), _tree_bytes(full, sub)
        assert ta.keys() == tb.keys(), sub
        for name in ta:
            assert ta[name] == tb[name], f"{sub}/{name}"
