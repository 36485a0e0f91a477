"""Distributed incremental maintenance (SolrCloud continuous upsert):
extend_sharded_index routes new rows to their owning shards by uniqueKey
and each touched shard extends incrementally — byte-identical to a sharded
rebuild over the union input; the refreshed DistributedSearcher serves the
union rank-identically to a DENSE monolithic index (compared by uniqueKey:
strided cluster serving ids differ from monolithic dense ids by design —
Lucene MultiReader docBase vs single-reader docids)."""

import os

import pyarrow.parquet as pq
import pytest

from nexlt_ray.corpus import generate_corpus, reference_queries

_OPTS = {"actor_options": {"num_cpus": 0.1}}


def _write(tbl, path):
    pq.write_table(tbl, path)
    return str(path)


@pytest.fixture(scope="module")
def corpus_parts(tmp_path_factory):
    root = tmp_path_factory.mktemp("cm_corpus")
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


def _strided_cfg():
    from nexlt_ray.build import BuildConfig

    return BuildConfig(
        id_mode="strided", num_doc_buckets=8, num_term_buckets=4
    )


def _tree_bytes(root, sub):
    out = {}
    d = os.path.join(root, sub)
    for dirpath, _, names in os.walk(d):
        for name in sorted(names):
            if name.endswith(".parquet"):
                rel = os.path.relpath(os.path.join(dirpath, name), d)
                with open(os.path.join(dirpath, name), "rb") as f:
                    out[rel] = f.read()
    return out


@pytest.fixture(scope="module")
def extended_cluster(ray_session, corpus_parts, tmp_path_factory):
    from nexlt_ray.cluster import build_sharded_index, extend_sharded_index

    a_dir, b_path, _ = corpus_parts
    cdir = str(tmp_path_factory.mktemp("cm_inc") / "c")
    build_sharded_index(a_dir, cdir, 2, _strided_cfg())
    man = extend_sharded_index(b_path, cdir)
    return cdir, man


@pytest.fixture(scope="module")
def rebuilt_cluster(ray_session, corpus_parts, tmp_path_factory):
    from nexlt_ray.cluster import build_sharded_index

    _, _, ab_dir = corpus_parts
    cdir = str(tmp_path_factory.mktemp("cm_full") / "c")
    man = build_sharded_index(ab_dir, cdir, 2, _strided_cfg())
    return cdir, man


def test_extend_equals_sharded_rebuild(extended_cluster, rebuilt_cluster):
    """Every shard's docstore + segments are byte-identical between the
    incremental path and a from-scratch sharded rebuild over the union."""
    (inc_dir, inc_man), (full_dir, full_man) = extended_cluster, rebuilt_cluster
    assert inc_man["n_docs"] == full_man["n_docs"]
    assert inc_man["total_len"] == full_man["total_len"]
    for s in range(2):
        for sub in ("docstore", "segments"):
            ta = _tree_bytes(os.path.join(inc_dir, f"shard={s:03d}"), sub)
            tb = _tree_bytes(os.path.join(full_dir, f"shard={s:03d}"), sub)
            assert ta.keys() == tb.keys(), (s, sub)
            for name in ta:
                assert ta[name] == tb[name], f"shard {s} {sub}/{name}"


@pytest.fixture(scope="module")
def union_monolith(ray_session, corpus_parts, tmp_path_factory):
    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.query import IndexReader

    _, _, ab_dir = corpus_parts
    idx = str(tmp_path_factory.mktemp("cm_mono") / "idx")
    build_index(
        ab_dir, idx, BuildConfig(num_doc_buckets=8, num_term_buckets=4)
    )
    return IndexReader(idx)


def _by_sha(hits, fetch):
    """[(doc_id, score)] -> [(sha, score)] via the given doc_fields fn."""
    if not hits:
        return []
    tbl = fetch([d for d, _ in hits], ["content_sha256"])
    m = dict(
        zip(tbl["doc_id"].to_pylist(), tbl["content_sha256"].to_pylist())
    )
    return [(m[d], s) for d, s in hits]


def test_extended_cluster_matches_union_monolith(
    ray_session, extended_cluster, union_monolith
):
    from nexlt_ray.cluster import DistributedSearcher

    searcher = DistributedSearcher(extended_cluster[0], **_OPTS)
    mono = union_monolith
    assert searcher.n_docs == mono.n_docs
    assert searcher.avgdl == mono.avgdl
    try:
        for q in reference_queries():
            dist = _by_sha(
                searcher.search(q["query"], k=q["k"]), searcher.doc_fields
            )
            exp = _by_sha(
                mono.search(q["query"], k=q["k"]), mono.doc_fields
            )
            assert dist == exp, f"post-extend rank mismatch for {q['query']!r}"
            assert searcher.match_count(q["query"]) == mono.match_count(
                q["query"]
            )
        assert searcher.facets("value", ["lang"]) == mono.facets(
            "value", ["lang"]
        )
        assert searcher.suggest("va", n=8) == mono.suggest("va", n=8)
    finally:
        searcher.shutdown()


def test_refresh_picks_up_extension(ray_session, corpus_parts, tmp_path_factory):
    """A live searcher opened BEFORE the extension serves the union after
    refresh() — the commit/openSearcher discipline, distributed."""
    from nexlt_ray.cluster import (
        DistributedSearcher,
        build_sharded_index,
        extend_sharded_index,
    )

    a_dir, b_path, _ = corpus_parts
    cdir = str(tmp_path_factory.mktemp("cm_live") / "c")
    build_sharded_index(a_dir, cdir, 2, _strided_cfg())
    searcher = DistributedSearcher(cdir, **_OPTS)
    try:
        n_before = searcher.match_count("*:*")
        man = extend_sharded_index(b_path, cdir)
        # stale searcher still serves the old commit point
        assert searcher.match_count("*:*") == n_before
        assert searcher.refresh() is True
        assert searcher.match_count("*:*") == sum(man["n_docs"])
        assert searcher.match_count("*:*") > n_before
        # and a second refresh with no maintenance is a no-op
        assert searcher.refresh() is False
    finally:
        searcher.shutdown()


def test_delete_docs_sharded_expunges(
    ray_session, rebuilt_cluster, tmp_path_factory
):
    """Maintenance delete (vs NRT tombstone): df/N shrink and the docs are
    gone from the files; the serving layer sees it via refresh()."""
    import shutil

    from nexlt_ray.cluster import DistributedSearcher, delete_docs_sharded
    from nexlt_ray.query import IndexReader

    # work on a copy — rebuilt_cluster is shared by other tests
    src = rebuilt_cluster[0]
    cdir = str(tmp_path_factory.mktemp("cm_del") / "c")
    shutil.copytree(src, cdir)
    searcher = DistributedSearcher(cdir, **_OPTS)
    try:
        hits = searcher.search("value table", k=3)
        shas = searcher.doc_fields(
            [d for d, _ in hits], ["content_sha256"]
        )["content_sha256"].to_pylist()
        n_before = searcher.match_count("*:*")
        man = delete_docs_sharded(cdir, shas)
        assert sum(man["n_docs"]) == n_before - len(set(shas))
        assert searcher.refresh() is True
        assert searcher.match_count("*:*") == n_before - len(set(shas))
        assert searcher.get(shas).num_rows == 0
        # every per-shard index stays internally consistent
        for s in range(int(man["num_shards"])):
            r = IndexReader(os.path.join(cdir, f"shard={s:03d}"))
            assert r.match_count("*:*") == int(man["n_docs"][s])
    finally:
        searcher.shutdown()


def test_reshard_equals_fresh_build(
    ray_session, corpus_parts, rebuilt_cluster, union_monolith, tmp_path_factory
):
    """reshard 2→3 from the shards' own docstores == a fresh 3-shard build
    over the original corpus, byte-identical per shard; the resharded
    cluster serves identically to the union monolith."""
    from nexlt_ray.cluster import (
        DistributedSearcher,
        build_sharded_index,
        reshard_cluster,
    )

    _, _, ab_dir = corpus_parts
    src = rebuilt_cluster[0]
    dst = str(tmp_path_factory.mktemp("cm_reshard") / "c")
    man = reshard_cluster(src, dst, 3)
    fresh = str(tmp_path_factory.mktemp("cm_fresh3") / "c")
    fman = build_sharded_index(ab_dir, fresh, 3, _strided_cfg())
    assert man["n_docs"] == fman["n_docs"]
    assert man["total_len"] == fman["total_len"]
    assert man["id_mode"] == "strided"
    for s in range(3):
        for sub in ("docstore", "segments"):
            ta = _tree_bytes(os.path.join(dst, f"shard={s:03d}"), sub)
            tb = _tree_bytes(os.path.join(fresh, f"shard={s:03d}"), sub)
            assert ta.keys() == tb.keys(), (s, sub)
            for name in ta:
                assert ta[name] == tb[name], f"shard {s} {sub}/{name}"
    searcher = DistributedSearcher(dst, **_OPTS)
    mono = union_monolith
    try:
        assert searcher.n_docs == mono.n_docs
        for q in reference_queries()[:8]:
            dist = _by_sha(
                searcher.search(q["query"], k=q["k"]), searcher.doc_fields
            )
            exp = _by_sha(mono.search(q["query"], k=q["k"]), mono.doc_fields)
            assert dist == exp, f"post-reshard rank mismatch {q['query']!r}"
    finally:
        searcher.shutdown()


def test_check_cluster_clean_and_faulted(
    ray_session, rebuilt_cluster, tmp_path_factory
):
    """check_cluster passes a healthy cluster; detects a router violation
    (shard dirs swapped) and a cluster-manifest mismatch."""
    import json
    import shutil

    from nexlt_ray.cluster import check_cluster

    src = rebuilt_cluster[0]
    res = check_cluster(src)
    assert res["ok"], res["errors"]
    assert res["stats"]["n_docs"] == sum(rebuilt_cluster[1]["n_docs"])

    # fault 1: swap the two shard directories — every doc now lives on
    # the wrong shard (the per-shard indexes are each still internally
    # valid, so only the cluster-level router check can see it)
    bad = str(tmp_path_factory.mktemp("cm_badroute") / "c")
    shutil.copytree(src, bad)
    os.rename(os.path.join(bad, "shard=000"), os.path.join(bad, "tmp"))
    os.rename(os.path.join(bad, "shard=001"), os.path.join(bad, "shard=000"))
    os.rename(os.path.join(bad, "tmp"), os.path.join(bad, "shard=001"))
    res = check_cluster(bad)
    assert not res["ok"]
    assert any("router violation" in e for e in res["errors"])

    # fault 2: tampered cluster.json totals
    bad2 = str(tmp_path_factory.mktemp("cm_badman") / "c")
    shutil.copytree(src, bad2)
    with open(os.path.join(bad2, "cluster.json")) as f:
        man = json.load(f)
    man["n_docs"][0] += 7
    with open(os.path.join(bad2, "cluster.json"), "w") as f:
        json.dump(man, f)
    res = check_cluster(bad2)
    assert not res["ok"]
    assert any("cluster.json n_docs" in e for e in res["errors"])
