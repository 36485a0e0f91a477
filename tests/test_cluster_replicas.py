"""Replica pool + failover (the SolrCloud replica analog): R ShardWorkers
per shard, round-robin reads, and — the part that can go silently wrong —
a killed replica must come back with its FULL serving state replayed
(pushed global dfs + NRT tombstones), or it would serve shard-local BM25
statistics / resurrect deleted docs without any error. Every test compares
against the monolithic index, so a replay hole shows up as a value diff,
not just a liveness failure."""

import numpy as np
import pytest

from nexlt_ray.corpus import reference_queries

_OPTS = {"actor_options": {"num_cpus": 0.1}}


@pytest.fixture(scope="module")
def cluster_dir(ray_session, small_corpus_path, tmp_path_factory):
    from nexlt_ray.build import BuildConfig
    from nexlt_ray.cluster import build_sharded_index

    cdir = str(tmp_path_factory.mktemp("cluster_repl") / "c")
    build_sharded_index(
        small_corpus_path,
        cdir,
        num_shards=3,
        cfg=BuildConfig(num_doc_buckets=16, num_term_buckets=8),
    )
    return cdir


@pytest.fixture(scope="module")
def mono_reader(built_index):
    from nexlt_ray.query import IndexReader

    return IndexReader(built_index[0])


def test_replicated_search_identity(ray_session, cluster_dir, mono_reader):
    """R=2: round-robin across replicas never changes any result."""
    from nexlt_ray.cluster import DistributedSearcher

    s = DistributedSearcher(cluster_dir, replication_factor=2, **_OPTS)
    try:
        assert all(len(p) == 2 for p in s._pool)
        for q in reference_queries():
            # two consecutive calls hit DIFFERENT replicas (rr advances)
            assert (
                s.search(q["query"], k=q["k"])
                == s.search(q["query"], k=q["k"])
                == mono_reader.search(q["query"], k=q["k"])
            )
        assert s.facets("value", ["lang"]) == mono_reader.facets(
            "value", ["lang"]
        )
    finally:
        s.shutdown()


def test_failover_replays_stats_and_tombstones(
    ray_session, cluster_dir, mono_reader
):
    """Kill replicas AFTER stats were pushed and docs tombstoned: the
    failover respawn must replay both, or scores/counts diverge from the
    monolith carrying the same state."""
    import ray

    from nexlt_ray.cluster import DistributedSearcher
    from nexlt_ray.query import IndexReader

    s = DistributedSearcher(cluster_dir, replication_factor=2, **_OPTS)
    mono = IndexReader(mono_reader.index_dir)
    try:
        # establish serving state: scores pushed for these queries,
        # then NRT-delete the top hits of one of them
        queries = ["value table", '"the value"', "val*"]
        for q in queries:
            assert s.search(q, k=10) == mono.search(q, k=10)
        ids = [d for d, _ in mono.search("value table", k=3)]
        shas = mono.doc_fields(ids, ["content_sha256"])[
            "content_sha256"
        ].to_pylist()
        assert s.delete(shas) == len(set(shas))
        mono.set_deleted(np.asarray(ids, dtype=np.int64))

        # round 1: kill replica 0 of every shard
        for pool in s._pool:
            ray.kill(pool[0])
        for q in queries:
            assert s.search(q, k=10) == mono.search(q, k=10), (1, q)
        assert s.match_count("*:*") == mono.match_count("*:*")

        # round 2: kill replica 1 everywhere — the survivors now include
        # replicas respawned in round 1, proving the replay carried the
        # pushed dfs (float32 score identity) and the tombstones
        for pool in s._pool:
            ray.kill(pool[1])
        for q in queries:
            assert s.search(q, k=10) == mono.search(q, k=10), (2, q)
        assert s.match_count("*:*") == mono.match_count("*:*")
        assert s.facets("value", ["lang"]) == mono.facets("value", ["lang"])
        # no resurrection: the dead docs stay invisible everywhere
        assert not set(ids) & {d for d, _ in s.search("value table", k=20)}
    finally:
        s.shutdown()


def test_failover_with_single_replica(ray_session, cluster_dir, mono_reader):
    """R=1 is the degenerate pool: killing the only worker of a shard must
    respawn-and-replay transparently inside the same call."""
    import ray

    from nexlt_ray.cluster import DistributedSearcher

    s = DistributedSearcher(cluster_dir, **_OPTS)
    try:
        q = "value the table"
        before = s.search(q, k=10, min_should_match=2)
        assert before == mono_reader.search(q, k=10, min_should_match=2)
        ray.kill(s._pool[0][0])
        assert s.search(q, k=10, min_should_match=2) == before
        assert s.suggest("va", n=8) == mono_reader.suggest("va", n=8)
    finally:
        s.shutdown()
