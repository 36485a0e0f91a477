"""Doc-range-group segment sharding (BuildConfig.segment_range_groups):
with G > 1 each term bucket's segment splits into G files keyed by a
contiguous doc-bucket group (the Lucene many-segments analog along the doc
axis), so extend/delete rewrite ONLY the group files holding touched doc
buckets. Contracts tested here:

  * query results are layout-invariant (rank-identical to the single-file
    layout, which byte-reuses the round-3 engine paths);
  * maintenance (extend/delete) on the sharded layout stays byte-identical
    PER FILE to a full rebuild, and leaves untouched group files in place
    (same inode mtime — the localized-I/O point of the feature);
  * emptied term buckets drop their segment files in both layouts (a stale
    file would keep serving deleted docs' postings);
  * a missing group file invalidates the bucket's ledger record, so a
    resumed build regenerates it byte-identically.
"""

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nexlt_ray.corpus import generate_corpus


def _write(tbl, path):
    pq.write_table(tbl, str(path))
    return str(path)


def _tree_bytes_rec(root, sub):
    """{relpath: bytes} for every parquet under root/sub, any nesting."""
    out = {}
    base = os.path.join(root, sub)
    for dirpath, _, files in os.walk(base):
        for name in files:
            if name.endswith(".parquet"):
                p = os.path.join(dirpath, name)
                with open(p, "rb") as f:
                    out[os.path.relpath(p, base)] = f.read()
    return out


def _tree_mtimes(root, sub):
    out = {}
    base = os.path.join(root, sub)
    for dirpath, _, files in os.walk(base):
        for name in files:
            if name.endswith(".parquet"):
                p = os.path.join(dirpath, name)
                out[os.path.relpath(p, base)] = os.stat(p).st_mtime_ns
    return out


@pytest.fixture(scope="module")
def rg_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("rg_corpus")
    full = generate_corpus(600, seed=31)
    a, b = full.slice(0, 597), full.slice(597, 3)
    a_dir, ab_dir = root / "a", root / "ab"
    os.makedirs(a_dir)
    os.makedirs(ab_dir)
    _write(a, a_dir / "a.parquet")
    _write(a, ab_dir / "a.parquet")
    _write(b, ab_dir / "b.parquet")
    b_path = _write(b, root / "b.parquet")
    return str(a_dir), b_path, str(ab_dir), full


def _cfg(**kw):
    from nexlt_ray.build import BuildConfig

    return BuildConfig(
        id_mode="strided", num_doc_buckets=8, num_term_buckets=4, **kw
    )


QUERIES = ["the quick", "error handler", "return value", "config parse",
           '"for the"', "index merge OR sort"]


def test_rg_build_rank_identical_and_stats(ray_session, rg_corpus, tmp_path):
    from nexlt_ray.build import build_index
    from nexlt_ray.query import IndexReader

    _, _, ab_dir, _ = rg_corpus
    m1 = build_index(ab_dir, str(tmp_path / "g1"), _cfg())
    m4 = build_index(
        ab_dir, str(tmp_path / "g4"), _cfg(segment_range_groups=4)
    )
    assert (m1["n_terms"], m1["n_postings"], m1["n_docs"]) == (
        m4["n_terms"], m4["n_postings"], m4["n_docs"]
    )
    # layout: per-bucket dirs of rg files, nothing at the single-file path
    segdir = os.path.join(tmp_path, "g4", "segments")
    assert not any(n.endswith(".parquet") for n in os.listdir(segdir))
    assert all(
        f.startswith("rg=") for n in os.listdir(segdir)
        for f in os.listdir(os.path.join(segdir, n))
    )
    r1 = IndexReader(str(tmp_path / "g1"))
    r4 = IndexReader(str(tmp_path / "g4"))
    for q in QUERIES:
        assert r1.search(q, k=10) == r4.search(q, k=10), q
        assert r1.match_count(q) == r4.match_count(q), q


def test_rg_build_dense_mode(ray_session, rg_corpus, tmp_path):
    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.query import IndexReader

    _, _, ab_dir, _ = rg_corpus
    cfg1 = BuildConfig(num_doc_buckets=8, num_term_buckets=4)
    cfg3 = BuildConfig(
        num_doc_buckets=8, num_term_buckets=4, segment_range_groups=3
    )
    m1 = build_index(ab_dir, str(tmp_path / "d1"), cfg1)
    m3 = build_index(ab_dir, str(tmp_path / "d3"), cfg3)
    assert m1["n_postings"] == m3["n_postings"]
    r1 = IndexReader(str(tmp_path / "d1"))
    r3 = IndexReader(str(tmp_path / "d3"))
    for q in QUERIES:
        assert r1.search(q, k=10) == r3.search(q, k=10), q


def test_rg_extend_byte_identical_and_localized(ray_session, rg_corpus,
                                                tmp_path):
    from nexlt_ray.build import build_index, extend_index

    a_dir, b_path, ab_dir, _ = rg_corpus
    cfg = _cfg(segment_range_groups=4)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    build_index(a_dir, inc, cfg)
    before = _tree_mtimes(inc, "segments")
    time.sleep(0.02)
    extend_index(b_path, inc)
    build_index(ab_dir, full, cfg)

    ta, tb = _tree_bytes_rec(inc, "segments"), _tree_bytes_rec(full, "segments")
    assert ta.keys() == tb.keys()
    for name in ta:
        assert ta[name] == tb[name], name
    after = _tree_mtimes(inc, "segments")
    kept = [n for n in before if after.get(n) == before[n]]
    rewritten = [n for n in before if n in after and after[n] != before[n]]
    # a 3-doc shard touches <=3 of 8 doc buckets (<=2 of 4 range groups):
    # untouched group files must not be rewritten
    assert kept, "extend rewrote every rg file — locality lost"
    assert rewritten, "extend rewrote nothing"
    assert len(kept) >= len(before) // 4


def test_rg_delete_byte_identical_and_localized(ray_session, rg_corpus,
                                                tmp_path):
    import hashlib
    import json

    from nexlt_ray.build import BuildConfig, build_index, delete_docs
    from nexlt_ray.query import IndexReader

    _, _, ab_dir, full_tbl = rg_corpus
    cfg = _cfg(segment_range_groups=4)
    idx = str(tmp_path / "idx")
    m0 = build_index(ab_dir, idx, cfg)
    store = pq.read_table(
        os.path.join(idx, "docstore"), columns=["content_sha256", "doc_bucket"]
    )
    shas = np.asarray(store["content_sha256"].to_pylist(), dtype="U64")
    buckets = np.asarray(store["doc_bucket"])
    victim_b = int(buckets[0])
    victims = sorted(shas[buckets == victim_b][:4].tolist())

    before = _tree_mtimes(idx, "segments")
    time.sleep(0.02)
    m1 = delete_docs(idx, victims)
    assert m1["n_deleted"] == len(victims)
    after = _tree_mtimes(idx, "segments")
    kept = [n for n in before if after.get(n) == before[n]]
    assert kept, "delete rewrote every rg file — locality lost"

    # rebuild over survivors with the same resolved range_bits
    raw_sha = np.array(
        [hashlib.sha256(c.encode()).hexdigest()
         for c in full_tbl["content"].to_pylist()],
        dtype="U64",
    )
    src2 = tmp_path / "src2"
    os.makedirs(src2)
    _write(full_tbl.filter(pa.array(~np.isin(raw_sha, victims))),
           src2 / "all.parquet")
    cfg2 = _cfg(
        segment_range_groups=4,
        range_bits=json.loads(json.dumps(m1["config"]))["range_bits"],
    )
    full2 = str(tmp_path / "full2")
    m2 = build_index(str(src2), full2, cfg2)
    ta = _tree_bytes_rec(idx, "segments")
    tb = _tree_bytes_rec(full2, "segments")
    assert ta.keys() == tb.keys()
    for name in ta:
        assert ta[name] == tb[name], name
    assert m1["n_docs"] == m2["n_docs"]
    r = IndexReader(idx)
    got = set(d for d, _ in r.search("*:*", k=10_000))
    assert len(got) == m1["n_docs"]


@pytest.mark.parametrize("groups", [1, 4])
def test_delete_all_drops_segment_files(ray_session, tmp_path, groups):
    """Deleting every doc must remove segment files in BOTH layouts — a
    stale segment file would keep serving deleted docs' postings (the
    single-file layout had exactly that leak before the rg work)."""
    from nexlt_ray.build import build_index, delete_docs
    from nexlt_ray.query import IndexReader

    src = tmp_path / "src"
    os.makedirs(src)
    tbl = generate_corpus(60, seed=37)
    _write(tbl, src / "all.parquet")
    cfg = _cfg(segment_range_groups=groups)
    idx = str(tmp_path / "idx")
    build_index(str(src), idx, cfg)
    store = pq.read_table(
        os.path.join(idx, "docstore"), columns=["content_sha256"]
    )
    m1 = delete_docs(idx, sorted(set(store["content_sha256"].to_pylist())))
    assert m1["n_docs"] == 0
    assert _tree_bytes_rec(idx, "segments") == {}
    r = IndexReader(idx)
    assert r.match_count("the") == 0
    assert r.search("the quick", k=10) == []


def test_rg_resume_regenerates_missing_file(ray_session, rg_corpus, tmp_path):
    """A build interrupted before the manifest commit (here: one rg file
    lost, manifest absent) resumes by regenerating exactly the invalid
    bucket, byte-identically — the outputs-exist ledger validation;
    Ledger.get's single-path check can't see multi-file buckets."""
    from nexlt_ray.build import build_index

    _, _, ab_dir, _ = rg_corpus
    cfg = _cfg(segment_range_groups=4)
    idx = str(tmp_path / "idx")
    build_index(ab_dir, idx, cfg)
    ta = _tree_bytes_rec(idx, "segments")
    mtimes0 = _tree_mtimes(idx, "segments")
    victim = sorted(ta)[0]
    victim_bucket = victim.split(os.sep)[0]
    os.remove(os.path.join(idx, "segments", victim))
    # crash before commit: manifest.json never landed
    os.remove(os.path.join(idx, "manifest.json"))
    time.sleep(0.02)
    m = build_index(ab_dir, idx, cfg)
    tb = _tree_bytes_rec(idx, "segments")
    assert ta.keys() == tb.keys()
    for name in ta:
        assert ta[name] == tb[name], name
    # only the invalid bucket was reassembled; completed buckets skipped
    mtimes1 = _tree_mtimes(idx, "segments")
    for name in mtimes0:
        if name.split(os.sep)[0] == victim_bucket:
            continue
        assert mtimes1[name] == mtimes0[name], f"resume rewrote {name}"
    assert m["n_terms"] > 0
