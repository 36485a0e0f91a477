"""Distributed (doc-partitioned) search == monolithic index, bit for bit.

The SolrCloud-analog contract (nexlt_ray/cluster.py): a sha-range-sharded
cluster serves the SAME doc ids, float32 scores, counts, facets and
dictionary results as one monolithic index over the union corpus —
ExactStatsCache two-phase scoring makes idf/avgdl cluster-global, and the
sha-range router makes `doc_base[shard] + local_id` equal the monolith's
dense docID.
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from nexlt_ray.corpus import reference_queries


@pytest.fixture(scope="module")
def cluster_dir(ray_session, small_corpus_path, tmp_path_factory):
    from nexlt_ray.build import BuildConfig
    from nexlt_ray.cluster import build_sharded_index

    cdir = str(tmp_path_factory.mktemp("cluster") / "c")
    build_sharded_index(
        small_corpus_path,
        cdir,
        num_shards=3,
        cfg=BuildConfig(num_doc_buckets=16, num_term_buckets=8),
    )
    return cdir


# fractional actor CPUs: the pytest session runs Ray at num_cpus=4, and a
# full-CPU actor per shard would deadlock the second searcher's placement
_OPTS = {"actor_options": {"num_cpus": 0.1}}


@pytest.fixture(scope="module")
def searcher(ray_session, cluster_dir):
    from nexlt_ray.cluster import DistributedSearcher

    s = DistributedSearcher(cluster_dir, **_OPTS)
    yield s
    s.shutdown()


@pytest.fixture(scope="module")
def mono_reader(built_index):
    from nexlt_ray.query import IndexReader

    return IndexReader(built_index[0])


def test_cluster_covers_corpus(searcher, mono_reader):
    assert searcher.n_docs == mono_reader.n_docs
    assert searcher.avgdl == mono_reader.avgdl
    # at 3 shards over a 1000-doc uniform-sha corpus every shard is non-empty
    assert all(int(n) > 0 for n in searcher.manifest["n_docs"])


def test_doc_ids_match_monolith(searcher, mono_reader, built_index):
    """sha-range routing ⇒ global doc id == monolithic dense docID."""
    idx, _ = built_index
    store = pq.read_table(
        os.path.join(idx, "docstore"), columns=["content_sha256"]
    )
    shas = sorted(store["content_sha256"].to_pylist())[::97]  # ~1/97 sample
    mono = mono_reader.get(shas, columns=["content_sha256"])
    dist = searcher.get(shas, columns=["content_sha256"])
    assert mono.num_rows == dist.num_rows == len(shas)
    assert mono["doc_id"].to_pylist() == dist["doc_id"].to_pylist()
    assert (
        mono["content_sha256"].to_pylist() == dist["content_sha256"].to_pylist()
    )
    # and doc_fields round-trips the same rows by global id
    ids = mono["doc_id"].to_pylist()[:5]
    a = mono_reader.doc_fields(ids)
    b = searcher.doc_fields(ids)
    assert a.sort_by("doc_id").equals(b.sort_by("doc_id"))


def test_search_identity_all_reference_queries(searcher, mono_reader):
    for q in reference_queries():
        mono = mono_reader.search(q["query"], k=q["k"])
        dist = searcher.search(q["query"], k=q["k"])
        assert dist == mono, f"distributed rank mismatch for {q['query']!r}"
        assert searcher.match_count(q["query"]) == mono_reader.match_count(
            q["query"]
        )


def test_search_identity_query_features(searcher, mono_reader):
    """Feature surface: AND, mm, filters, phrase+slop, prefix/wildcard/
    fuzzy, boolean boosts — identical through the distributed path."""
    cases = [
        dict(query="value the", mode="AND"),
        dict(query="value the table", min_should_match=2),
        dict(query='"the value"'),
        dict(query='"the value"~2'),
        dict(query="val*"),
        dict(query="ta?le"),
        dict(query="valeu~"),
        dict(query="table^2 scan"),
        dict(query="+value -the spark"),
        dict(query="*:*"),
    ]
    for c in cases:
        q = dict(c)
        query = q.pop("query")
        mono = mono_reader.search(query, k=15, **q)
        dist = searcher.search(query, k=15, **q)
        assert dist == mono, f"mismatch for {c!r}"
        assert searcher.match_count(query, **q) == mono_reader.match_count(
            query, **q
        )


def test_filtered_search_identity(searcher, mono_reader):
    filters = {"lang": ["python", "go"]}
    for q in ["value table", "the scan"]:
        assert searcher.search(q, k=10, filters=filters) == mono_reader.search(
            q, k=10, filters=filters
        )
        assert searcher.match_count(
            q, filters=filters
        ) == mono_reader.match_count(q, filters=filters)


def test_facets_identity(searcher, mono_reader):
    for q in ["value", "*:*"]:
        assert searcher.facets(q, ["lang", "repo"]) == mono_reader.facets(
            q, ["lang", "repo"]
        )
        assert searcher.facet_pivot(
            q, ("lang", "repo")
        ) == mono_reader.facet_pivot(q, ("lang", "repo"))


def test_dictionary_identity(searcher, mono_reader):
    assert searcher.suggest("va", n=8) == mono_reader.suggest("va", n=8)
    assert searcher.spellcheck("valeu", n=3) == mono_reader.spellcheck(
        "valeu", n=3
    )


def _no_meta(t):
    return t.replace_schema_metadata(None)


def test_search_sorted_identity(searcher, mono_reader):
    """Distributed field sort + paging: pages, numFound and cursors all
    match the monolith (dense shards serve the monolith's exact doc ids,
    so stored-field pages are table-equal)."""
    cases = [
        ("value", "lang", True),
        ("*:*", ["lang", "repo"], [True, False]),
        ("table scan", "repo", False),
    ]
    for q, sort_by, asc in cases:
        for start in (0, 5):
            a = mono_reader.search_sorted(q, sort_by, asc, start=start, rows=7)
            b = searcher.search_sorted(q, sort_by, asc, start=start, rows=7)
            assert (
                a.schema.metadata[b"num_found"]
                == b.schema.metadata[b"num_found"]
            )
            assert a.schema.metadata.get(b"next_cursor") == b.schema.metadata.get(
                b"next_cursor"
            )
            assert _no_meta(a).equals(_no_meta(b)), (q, sort_by, start)


def test_cursor_paging_identity(searcher, mono_reader):
    """cursorMark deep paging walks identically page by page."""
    import json

    cur_a = cur_b = None
    for _ in range(4):
        a = mono_reader.search_sorted(
            "*:*", "lang", True, rows=5, cursor=cur_a
        )
        b = searcher.search_sorted("*:*", "lang", True, rows=5, cursor=cur_b)
        assert _no_meta(a).equals(_no_meta(b))
        nc_a = a.schema.metadata.get(b"next_cursor")
        nc_b = b.schema.metadata.get(b"next_cursor")
        assert nc_a == nc_b
        if nc_a is None:
            break
        cur_a = cur_b = tuple(json.loads(nc_a))


def test_highlight_identity(searcher, mono_reader):
    for q in ["value table", "spark the"]:
        a = mono_reader.highlight(q, k=8)
        b = searcher.highlight(q, k=8)
        assert _no_meta(a).equals(_no_meta(b)), q


def test_explain_and_elevation_identity(searcher, mono_reader):
    """Distributed explain reports monolith-identical (tf, df,
    contribution) triples, and query elevation composes identically —
    including a pinned doc OUTSIDE the organic top-k (exact score via the
    owner's explain under global stats)."""
    q = "value table"
    hits = mono_reader.search(q, k=12)
    for d, _ in hits[:3]:
        assert searcher.explain(q, d) == mono_reader.explain(q, d)
    pin_outside = hits[-1][0]
    pins = [pin_outside, hits[0][0]]
    excl = [hits[1][0]]
    assert searcher.search_elevated(
        q, pins, exclude=excl, k=5
    ) == mono_reader.search_elevated(q, pins, exclude=excl, k=5)
    assert searcher.analyze("Fast Table-Scan") == mono_reader.analyze(
        "Fast Table-Scan"
    )


def test_more_like_this_identity(searcher, mono_reader):
    seeds = [d for d, _ in mono_reader.search("value table", k=3)]
    for d in seeds:
        assert searcher.more_like_this(d, k=8) == mono_reader.more_like_this(
            d, k=8
        )


def test_nrt_delete_identity(ray_session, cluster_dir, built_index):
    """Tombstoned docs vanish from every distributed path, and the cluster
    stays identical to a monolith carrying the same tombstones."""
    from nexlt_ray.cluster import DistributedSearcher
    from nexlt_ray.query import IndexReader

    searcher = DistributedSearcher(cluster_dir, **_OPTS)
    mono = IndexReader(built_index[0])
    # kill the monolithic top-3 of a query by uniqueKey
    top = mono.search("value table", k=3)
    ids = [d for d, _ in top]
    shas = mono.doc_fields(ids, ["content_sha256"])["content_sha256"].to_pylist()
    n_before = searcher.match_count("*:*")
    assert searcher.delete(shas) == len(set(shas))
    mono.set_deleted(np.asarray(ids, dtype=np.int64))
    assert searcher.match_count("*:*") == n_before - len(set(shas))
    assert searcher.match_count("*:*") == mono.match_count("*:*")
    for q in ["value table", '"the value"', "val*", "*:*"]:
        dist = searcher.search(q, k=10)
        assert dist == mono.search(q, k=10)
        assert not set(ids) & {d for d, _ in dist}
        assert searcher.match_count(q) == mono.match_count(q)
    assert searcher.facets("value", ["lang"]) == mono.facets("value", ["lang"])
    # deletes are NRT tombstones: df/N keep counting the dead docs until a
    # merge expunges them (Lucene liveDocs), so scores of survivors are
    # unchanged — verify via a fresh searcher with no deletes
    fresh = DistributedSearcher(cluster_dir, **_OPTS)
    fresh_hits = dict(fresh.search("value table", k=20))
    for d, s in searcher.search("value table", k=10):
        assert fresh_hits[d] == s
    fresh.shutdown()
    searcher.shutdown()


def test_stats_push_is_change_aware(built_index):
    """set_global_stats drops score-dependent caches ONLY when (N, avgdl)
    or an override VALUE changes — the steady serving pattern (a fresh df
    push per distinct query, same dims) keeps shard result caches warm."""
    from nexlt_ray.query import IndexReader

    r = IndexReader(built_index[0])
    n, avgdl = r.n_docs, r.avgdl
    r.set_global_stats(n, avgdl, {"value": 123})
    a = r.search("value table", k=10)
    assert len(r._result_cache) == 1
    # disjoint-term push, same dims: cache survives, results stable
    r.set_global_stats(n, avgdl, {"spark": 7})
    assert len(r._result_cache) == 1
    assert r.search("value table", k=10) == a
    # re-push of identical values: still warm
    r.set_global_stats(n, avgdl, {"value": 123, "spark": 7})
    assert len(r._result_cache) == 1
    # an override VALUE changes: caches drop, scores actually move
    r.set_global_stats(n, avgdl, {"value": 999})
    assert len(r._result_cache) == 0
    b = r.search("value table", k=10)
    assert dict(b) != dict(a) or [d for d, _ in b] != [d for d, _ in a]
    # dims change: caches drop and k-table recomputes
    r.set_global_stats(n + 50, avgdl * 1.5, {})
    assert len(r._result_cache) == 0
    assert r.n_docs == n + 50


def test_build_is_resumable(ray_session, small_corpus_path, tmp_path_factory):
    """Second build_sharded_index call over the same dir returns the
    manifest without rebuilding (cluster.json short-circuit)."""
    from nexlt_ray.build import BuildConfig
    from nexlt_ray.cluster import build_sharded_index

    cdir = str(tmp_path_factory.mktemp("cluster_resume") / "c")
    cfg = BuildConfig(num_doc_buckets=8, num_term_buckets=4)
    m1 = build_sharded_index(small_corpus_path, cdir, num_shards=2, cfg=cfg)
    m2 = build_sharded_index(small_corpus_path, cdir, num_shards=2, cfg=cfg)
    assert m1 == m2
