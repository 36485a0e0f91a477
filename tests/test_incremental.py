"""Incremental index maintenance (reference continuous uniqueKey upsert,
schema.xml:1030-1033): extend_index(new shard) on a strided-id index must be
byte-identical to a full rebuild over the union input, touch only the doc
buckets the new shard hashes into, and serve queries rank-identically."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nexlt_ray.corpus import generate_corpus


def _write(tbl, path):
    pq.write_table(tbl, path)
    return str(path)


@pytest.fixture(scope="module")
def corpus_parts(tmp_path_factory):
    root = tmp_path_factory.mktemp("inc_corpus")
    full = generate_corpus(600, seed=11)
    a = full.slice(0, 500)
    b = full.slice(500, 100)
    a_dir = root / "a"
    ab_dir = root / "ab"
    os.makedirs(a_dir)
    os.makedirs(ab_dir)
    _write(a, a_dir / "a.parquet")
    _write(a, ab_dir / "a.parquet")
    _write(b, ab_dir / "b.parquet")
    b_path = _write(b, root / "b.parquet")
    return str(a_dir), b_path, str(ab_dir)


def _tree_bytes(root, sub):
    out = {}
    d = os.path.join(root, sub)
    for name in sorted(os.listdir(d)):
        if name.endswith(".parquet"):
            with open(os.path.join(d, name), "rb") as f:
                out[name] = f.read()
    return out


def test_extend_equals_full_rebuild(ray_session, corpus_parts, tmp_path):
    from nexlt_ray.build import BuildConfig, build_index, extend_index

    a_dir, b_path, ab_dir = corpus_parts
    cfg = BuildConfig(id_mode="strided", num_doc_buckets=8, num_term_buckets=4)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    build_index(a_dir, inc, cfg)
    m_inc = extend_index(b_path, inc)
    m_full = build_index(ab_dir, full, cfg)

    for sub in ("docstore", "segments"):
        ta, tb = _tree_bytes(inc, sub), _tree_bytes(full, sub)
        assert ta.keys() == tb.keys(), sub
        for name in ta:
            assert ta[name] == tb[name], f"{sub}/{name}"
    skip = {"timings", "input_shards"}
    # json round-trip normalizes tuple/list config fields
    norm = lambda m: json.loads(
        json.dumps({k: v for k, v in m.items() if k not in skip}, sort_keys=True)
    )
    assert norm(m_inc) == norm(m_full)


def test_extend_is_idempotent_and_repeatable(ray_session, corpus_parts, tmp_path):
    """Re-extending with the same shard changes nothing (upsert semantics:
    every row is already present)."""
    from nexlt_ray.build import BuildConfig, build_index, extend_index

    a_dir, b_path, _ = corpus_parts
    cfg = BuildConfig(id_mode="strided", num_doc_buckets=8, num_term_buckets=4)
    idx = str(tmp_path / "idx")
    build_index(a_dir, idx, cfg)
    m1 = extend_index(b_path, idx)
    seg1 = _tree_bytes(idx, "segments")
    doc1 = _tree_bytes(idx, "docstore")
    m2 = extend_index(b_path, idx)
    assert _tree_bytes(idx, "segments") == seg1
    assert _tree_bytes(idx, "docstore") == doc1
    assert m2["n_docs"] == m1["n_docs"]
    # dup accounting: the re-sent shard rows all dedup away
    assert m2["n_dups_removed"] == m1["n_dups_removed"] + (
        m2["n_input_rows"] - m1["n_input_rows"]
    )


def test_extend_touches_only_new_shard_buckets(ray_session, corpus_parts, tmp_path):
    from nexlt_ray.build import BuildConfig, build_index, extend_index

    a_dir, _, _ = corpus_parts
    # tiny shard over many buckets -> most docstore files must not be rewritten
    cfg = BuildConfig(id_mode="strided", num_doc_buckets=64, num_term_buckets=4)
    idx = str(tmp_path / "idx64")
    build_index(a_dir, idx, cfg)
    small = generate_corpus(900, seed=11).slice(890, 5)
    shard = str(tmp_path / "tiny.parquet")
    pq.write_table(small, shard)
    before = {
        name: os.stat(os.path.join(idx, "docstore", name)).st_mtime_ns
        for name in os.listdir(os.path.join(idx, "docstore"))
    }
    extend_index(shard, idx)
    after = {
        name: os.stat(os.path.join(idx, "docstore", name)).st_mtime_ns
        for name in os.listdir(os.path.join(idx, "docstore"))
    }
    untouched = [n for n in before if after.get(n) == before[n]]
    rewritten = [n for n in before if after.get(n) != before[n]]
    assert len(rewritten) <= 5  # at most one bucket per new row
    assert len(untouched) >= len(before) - 5


def test_extend_requires_strided(ray_session, corpus_parts, tmp_path):
    from nexlt_ray.build import BuildConfig, build_index, extend_index

    a_dir, b_path, _ = corpus_parts
    idx = str(tmp_path / "dense")
    build_index(a_dir, idx, BuildConfig(num_doc_buckets=8, num_term_buckets=4))
    with pytest.raises(ValueError, match="strided"):
        extend_index(b_path, idx)


def test_strided_index_query_rank_identity(ray_session, corpus_parts, tmp_path):
    """Strided docIDs (2^40-wide gaps) serve WAND == exhaustive == oracle."""
    from nexlt_ray.build import BuildConfig, build_index, extend_index
    from nexlt_ray.corpus import reference_queries
    from nexlt_ray.oracle import OracleIndex
    from nexlt_ray.query import IndexReader

    a_dir, b_path, _ = corpus_parts
    cfg = BuildConfig(id_mode="strided", num_doc_buckets=8, num_term_buckets=4)
    idx = str(tmp_path / "idxq")
    build_index(a_dir, idx, cfg)
    m = extend_index(b_path, idx)
    r = IndexReader(idx)
    meta = pq.read_table(os.path.join(idx, "docstore"))
    did = (
        np.asarray(m["doc_offsets"])[np.asarray(meta["doc_bucket"])]
        + np.asarray(meta["local_rank"])
    )
    o = OracleIndex(
        list(zip(did.tolist(), meta["content"].to_pylist())), profile="code"
    )
    # full reference set — includes quoted phrases (qids 8, 9, 15), which
    # exercise the strided-id rank packing in _phrase_candidates (doc ids
    # are bucket<<40 here; raw-id packing would alias/overflow)
    for q in reference_queries():
        w = r.search(q["query"], k=10, algorithm="wand")
        e = r.search(q["query"], k=10, algorithm="exhaustive")
        exp = [(d, float(np.float32(s))) for d, s in o.search(q["query"], k=10)]
        assert w == e == exp, q["query"]
    for pq_ in ('"index query"', '"the import"', '"batch merge"'):
        assert r.match_count(pq_) == o.match_count(pq_), pq_
    assert r.match_count("*:*") == m["n_docs"]
    # multi-term and boolean kinds on strided ids (decode_all doc ids are
    # bucket<<40 here — any dense-id assumption would alias)
    from nexlt_ray.tokenize import tokenize_batch

    tb = tokenize_batch(meta["content"], profile="code")
    terms = tb.terms.astype("U")
    m_pre = np.char.startswith(terms, "pars")
    exp_pre = np.unique(did[tb.doc_idx[m_pre]])
    assert r.match_count("pars*") == exp_pre.size
    assert r.search("pars*", k=3) == [(int(d), 1.0) for d in exp_pre[:3]]
    http_docs = set(did[tb.doc_idx[terms == "http"]].tolist())
    parse_docs = set(did[tb.doc_idx[terms == "parse"]].tolist())
    assert r.match_count("http -parse") == len(http_docs - parse_docs)
    assert r.match_count("+parse http") == len(parse_docs)
    got_boost = r.search("http^2 parse", k=5)
    assert all(int(d) in (http_docs | parse_docs) for d, _ in got_boost)


def test_extend_auto_profile(ray_session, tmp_path):
    """extend_index over an auto-profile strided index (per-language
    analyzer routing must survive the incremental path)."""
    import pyarrow as pa

    from nexlt_ray.build import BuildConfig, build_index, extend_index
    from nexlt_ray.query import IndexReader

    def mk(rows, path):
        t = pa.table(
            {
                "repo": pa.array([f"o/r{i}" for i in range(len(rows))]),
                "path": pa.array([f"f{i}_{rows[i][1][:4]}.txt" for i in range(len(rows))]),
                "commit": pa.array(["c" * 40] * len(rows)),
                "lang": pa.array([l for l, _ in rows]),
                "content": pa.array([c for _, c in rows]),
            }
        )
        pq.write_table(t, path)
        return str(path)

    base_rows = [("deu", f"die übersetzung der bücher {i}") for i in range(30)] + [
        ("eng", f"searching engines generally {i}") for i in range(30)
    ]
    new_rows = [("deu", f"neue aufgaben und bücher {i}") for i in range(10)]
    a = mk(base_rows, tmp_path / "a.parquet")
    b = mk(new_rows, tmp_path / "b.parquet")
    idx = str(tmp_path / "idx_auto")
    cfg = BuildConfig(profile="auto", id_mode="strided", num_doc_buckets=4,
                      num_term_buckets=2)
    m0 = build_index(a, idx, cfg)
    m1 = extend_index(b, idx)
    assert m1["n_docs"] == m0["n_docs"] + 10
    r = IndexReader(idx)
    # German stemming conflates across old+new docs
    n = r.match_count("Bücher", lang="deu")
    assert n == 40  # 30 base + 10 new German docs all contain bücher


def test_delete_docs_equals_rebuild_without(ray_session, tmp_path):
    """delete_docs(shas) on a strided index == a full rebuild over the
    corpus minus those docs, byte for byte; an emptied doc bucket drops its
    docstore file; queries stop matching the removed docs."""
    from nexlt_ray.build import BuildConfig, build_index, delete_docs
    from nexlt_ray.query import IndexReader

    full_tbl = generate_corpus(400, seed=23)
    src = tmp_path / "src"
    os.makedirs(src)
    _write(full_tbl, src / "all.parquet")
    cfg = BuildConfig(id_mode="strided", num_doc_buckets=8, num_term_buckets=4)
    idx = str(tmp_path / "idx")
    m0 = build_index(str(src), idx, cfg)

    # pick victims: every doc of one bucket (to empty it) + a few others
    store = pq.read_table(
        os.path.join(idx, "docstore"),
        columns=["content_sha256", "doc_bucket"],
    )
    shas = np.asarray(store["content_sha256"].to_pylist(), dtype="U64")
    buckets = np.asarray(store["doc_bucket"])
    sizes = np.bincount(buckets, minlength=8)
    victim_b = int(np.argmin(np.where(sizes > 0, sizes, np.iinfo(np.int64).max)))
    victims = set(shas[buckets == victim_b].tolist())
    victims |= set(shas[buckets != victim_b][:5].tolist())
    m1 = delete_docs(idx, sorted(victims))
    assert m1["n_deleted"] == len(victims)
    assert m1["n_docs"] == m0["n_docs"] - len(victims)
    assert not os.path.exists(
        os.path.join(idx, "docstore", f"bucket={victim_b:05d}.parquet")
    )

    # survivors-only rebuild with the SAME resolved range_bits
    keep_mask = ~np.isin(shas, sorted(victims))
    # map docstore rows back to the raw corpus rows via content sha
    import hashlib as _h

    raw_sha = np.array(
        [_h.sha256(c.encode()).hexdigest()
         for c in full_tbl["content"].to_pylist()],
        dtype="U64",
    )
    raw_keep = ~np.isin(raw_sha, sorted(victims))
    src2 = tmp_path / "src2"
    os.makedirs(src2)
    _write(full_tbl.filter(pa.array(raw_keep)), src2 / "all.parquet")
    cfg2 = BuildConfig(
        id_mode="strided", num_doc_buckets=8, num_term_buckets=4,
        range_bits=json.loads(json.dumps(m1["config"]))["range_bits"],
    )
    full2 = str(tmp_path / "full2")
    m2 = build_index(str(src2), full2, cfg2)

    for sub in ("docstore", "segments"):
        ta, tb = _tree_bytes(idx, sub), _tree_bytes(full2, sub)
        assert ta.keys() == tb.keys(), sub
        for name in ta:
            assert ta[name] == tb[name], f"{sub}/{name}"
    assert m1["n_docs"] == m2["n_docs"]
    assert m1["doc_counts"] == m2["doc_counts"]

    # query surface: a deleted doc's tokens no longer match it
    r = IndexReader(idx)
    got = set(d for d, _ in r.search("*:*", k=10_000))
    all_ids = set(int(x) for x in r._all_docs().tolist())
    assert got == all_ids and len(all_ids) == m1["n_docs"]


def test_delete_by_query(ray_session, tmp_path):
    """delete_by_query removes exactly the query's match set."""
    from nexlt_ray.build import BuildConfig, build_index, delete_by_query
    from nexlt_ray.query import IndexReader

    src = tmp_path / "src"
    os.makedirs(src)
    _write(generate_corpus(300, seed=29), src / "all.parquet")
    cfg = BuildConfig(id_mode="strided", num_doc_buckets=8, num_term_buckets=4)
    idx = str(tmp_path / "idx")
    m0 = build_index(str(src), idx, cfg)
    r = IndexReader(idx)
    n_match = r.match_count("parse")
    assert n_match > 0
    m1 = delete_by_query(idx, "parse")
    assert m1["n_deleted"] == n_match
    assert m1["n_docs"] == m0["n_docs"] - n_match
    r2 = IndexReader(idx)
    assert r2.match_count("parse") == 0
    # no-op on a query with no matches
    m2 = delete_by_query(idx, "zzzznotaterm")
    assert m2["n_docs"] == m1["n_docs"]


def test_reindex_same_config_byte_identical(ray_session, corpus_parts, tmp_path):
    """reindex(src, dst, same config): the docstore is a complete source of
    truth, so rebuilding from it is byte-identical to the original build."""
    from nexlt_ray.build import BuildConfig, build_index, reindex

    a_dir, _, _ = corpus_parts
    cfg = BuildConfig(num_doc_buckets=8, num_term_buckets=4)
    orig = str(tmp_path / "orig")
    re_d = str(tmp_path / "re")
    build_index(a_dir, orig, cfg)
    reindex(orig, re_d, cfg)
    for sub in ("docstore", "segments"):
        assert _tree_bytes(orig, sub) == _tree_bytes(re_d, sub), sub


def test_reindex_profile_change(ray_session, corpus_parts, tmp_path):
    """reindex with a different analyzer equals building the new profile
    from the raw corpus — the Solr schema-change reindex."""
    from nexlt_ray.build import BuildConfig, build_index, reindex
    from nexlt_ray.query import IndexReader

    a_dir, _, _ = corpus_parts
    orig = str(tmp_path / "orig_code")
    re_d = str(tmp_path / "re_en")
    direct = str(tmp_path / "direct_en")
    build_index(
        a_dir, orig, BuildConfig(num_doc_buckets=8, num_term_buckets=4)
    )
    cfg_en = BuildConfig(
        profile="text_en", num_doc_buckets=8, num_term_buckets=4
    )
    reindex(orig, re_d, cfg_en)
    build_index(a_dir, direct, cfg_en)
    for sub in ("docstore", "segments"):
        assert _tree_bytes(direct, sub) == _tree_bytes(re_d, sub), sub
    r = IndexReader(re_d)
    assert r.search("running parser", k=5) == IndexReader(direct).search(
        "running parser", k=5
    )


def test_reader_refresh_opens_new_commit_point(ray_session, corpus_parts, tmp_path):
    """Solr commit/openSearcher analog: a reader constructed before
    extend_index serves its snapshot; refresh() reloads iff the manifest
    changed, after which new docs are searchable and n_docs reflects the
    extended corpus."""
    from nexlt_ray.build import BuildConfig, build_index, extend_index
    from nexlt_ray.query import IndexReader

    a_dir, b_path, ab_dir = corpus_parts
    cfg = BuildConfig(id_mode="strided", num_doc_buckets=8, num_term_buckets=4)
    idx = str(tmp_path / "idx")
    full = str(tmp_path / "full")
    build_index(a_dir, idx, cfg)
    r = IndexReader(idx)
    n_before = r.n_docs
    assert r.refresh() is False  # nothing changed yet

    extend_index(b_path, idx)
    assert r.refresh() is True
    assert r.refresh() is False  # idempotent
    assert r.n_docs > n_before

    # the refreshed reader is rank-identical to a fresh reader over the
    # full (a+b) rebuild for the whole reference query set
    build_index(ab_dir, full, cfg)
    fresh = IndexReader(full)
    from nexlt_ray.corpus import reference_queries

    for q in reference_queries():
        assert r.search(q["query"], k=10) == fresh.search(q["query"], k=10), q
