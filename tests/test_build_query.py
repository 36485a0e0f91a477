"""End-to-end build + query tests: rank identity, invariants, determinism.

Mirrors and extends the reference's golden end-to-end test strategy
(/root/reference/tools/test.sh:5-8) per SURVEY.md §5.
"""

import hashlib
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from nexlt_ray.corpus import reference_queries


# ---------------------------------------------------------------------------
# rank identity (golden end-to-end; the correctness gate of the north rule)
# ---------------------------------------------------------------------------
def test_rank_identity_all_reference_queries(built_index, oracle_index):
    from nexlt_ray.query import IndexReader

    idx, _ = built_index
    r = IndexReader(idx)
    for q in reference_queries():
        wand = r.search(q["query"], k=q["k"], algorithm="wand")
        exh = r.search(q["query"], k=q["k"], algorithm="exhaustive")
        exp = [
            (d, float(np.float32(s))) for d, s in oracle_index.search(q["query"], k=q["k"])
        ]
        assert wand == exh == exp, f"rank mismatch for {q['query']!r}"


@pytest.fixture(scope="module")
def varint_codec_index(ray_session_ref, small_corpus_path, tmp_path_factory):
    """Same corpus, postings_codec='varint' (the non-default codec; the
    session `built_index` uses the default FOR bit-packed codec)."""
    from nexlt_ray.build import BuildConfig, build_index

    idx = str(tmp_path_factory.mktemp("index_varint") / "idx")
    cfg = BuildConfig(
        num_doc_buckets=16, num_term_buckets=8, postings_codec="varint"
    )
    manifest = build_index(small_corpus_path, idx, cfg)
    return idx, manifest


@pytest.fixture(scope="module")
def ray_session_ref(ray_session):
    return ray_session


def test_codec_search_identity(built_index, varint_codec_index, oracle_index):
    """Search results are codec-invariant: the default FOR-packed index and
    a varint index return bit-identical hits/scores/counts to each other and
    the oracle, across ranked (WAND + exhaustive), phrase, and count queries."""
    from nexlt_ray.query import IndexReader

    assert built_index[1]["config"]["postings_codec"] == "for"
    assert varint_codec_index[1]["config"]["postings_codec"] == "varint"
    rf = IndexReader(built_index[0])
    rv = IndexReader(varint_codec_index[0])
    for q in reference_queries():
        fw = rf.search(q["query"], k=q["k"], algorithm="wand")
        fe = rf.search(q["query"], k=q["k"], algorithm="exhaustive")
        vw = rv.search(q["query"], k=q["k"], algorithm="wand")
        exp = [
            (d, float(np.float32(s)))
            for d, s in oracle_index.search(q["query"], k=q["k"])
        ]
        assert fw == fe == vw == exp, f"codec rank mismatch for {q['query']!r}"
        assert rf.match_count(q["query"]) == rv.match_count(q["query"])


def test_for_codec_segments_smaller(built_index, varint_codec_index):
    """The point of the FOR default: posting blobs pack tighter than varint
    (dense doc-id deltas beat the 1-byte-per-value floor)."""
    def blob_bytes(idx):
        t = pq.read_table(os.path.join(idx, "segments"), columns=["blob"])
        import pyarrow.compute as pc

        return int(pc.sum(pc.binary_length(t["blob"])).as_py())

    assert blob_bytes(built_index[0]) < blob_bytes(varint_codec_index[0])


def test_match_count_vs_oracle(built_index, oracle_index):
    from nexlt_ray.query import IndexReader

    idx, _ = built_index
    r = IndexReader(idx)
    for q in reference_queries():
        assert r.match_count(q["query"]) == oracle_index.match_count(q["query"])


def test_term_stats_vs_oracle(built_index, oracle_index):
    """df/cf of every term in the merged segments == oracle postings."""
    idx, _ = built_index
    seg = pq.read_table(os.path.join(idx, "segments"), columns=["term", "df", "cf"])
    got = {}
    for t, df, cf in zip(
        seg["term"].to_pylist(), seg["df"].to_pylist(), seg["cf"].to_pylist()
    ):
        a, b = got.get(t, (0, 0))
        got[t] = (a + df, b + cf)
    exp = oracle_index.term_stats()
    assert got == exp


# ---------------------------------------------------------------------------
# per-row invariant: content sha256 equality (BASELINE.json input_hint; F4)
# ---------------------------------------------------------------------------
def test_content_sha256_invariant(built_index, small_corpus_path):
    idx, manifest = built_index
    inp = pq.read_table(small_corpus_path, columns=["content"])
    input_shas = {
        hashlib.sha256(c.encode()).hexdigest() for c in inp["content"].to_pylist()
    }
    meta = pq.read_table(
        os.path.join(idx, "docstore"), columns=["content_sha256", "content"]
    )
    emitted = meta["content_sha256"].to_pylist()
    # every emitted row's sha equals sha256 of its stored content
    for sha, content in zip(emitted, meta["content"].to_pylist()):
        assert sha == hashlib.sha256(content.encode()).hexdigest()
    # the emitted sha set equals the input sha set (dedup only collapses)
    assert set(emitted) == input_shas
    assert len(emitted) == len(set(emitted)) == manifest["n_docs"]


def test_doc_len_and_norms_match_tokenizer(built_index):
    from nexlt_ray.codec import small_float_int_to_byte4
    from nexlt_ray.tokenize import tokenize_batch

    idx, _ = built_index
    meta = pq.read_table(
        os.path.join(idx, "docstore"), columns=["content", "doc_len", "norm_byte"]
    )
    tb = tokenize_batch(meta["content"].combine_chunks(), profile="code")
    assert tb.doc_len.tolist() == meta["doc_len"].to_pylist()
    assert (
        small_float_int_to_byte4(tb.doc_len).tolist() == meta["norm_byte"].to_pylist()
    )


# ---------------------------------------------------------------------------
# dedup + docID determinism
# ---------------------------------------------------------------------------
def test_docids_are_global_sha_rank(built_index):
    """docID == rank of content_sha256 in global sorted order, independent of
    bucketing/scheduling (SURVEY.md §7.4.4)."""
    idx, manifest = built_index
    meta = pq.read_table(
        os.path.join(idx, "docstore"),
        columns=["doc_bucket", "local_rank", "content_sha256"],
    )
    doc_id = (
        np.asarray(manifest["doc_offsets"])[np.asarray(meta["doc_bucket"])]
        + np.asarray(meta["local_rank"])
    )
    shas = np.asarray(meta["content_sha256"].to_pylist(), dtype=object)
    order = np.argsort(doc_id)
    assert (np.sort(doc_id) == np.arange(manifest["n_docs"])).all()
    sorted_shas = shas[order]
    assert all(
        sorted_shas[i] < sorted_shas[i + 1] for i in range(len(sorted_shas) - 1)
    )


def test_dedup_keeps_lexicographically_smallest(built_index, small_corpus_path):
    idx, _ = built_index
    inp = pq.read_table(small_corpus_path)
    by_sha: dict[str, tuple] = {}
    for repo, path, commit, content in zip(
        inp["repo"].to_pylist(),
        inp["path"].to_pylist(),
        inp["commit"].to_pylist(),
        inp["content"].to_pylist(),
    ):
        sha = hashlib.sha256(content.encode()).hexdigest()
        key = (repo, path, commit)
        if sha not in by_sha or key < by_sha[sha]:
            by_sha[sha] = key
    meta = pq.read_table(
        os.path.join(idx, "docstore"),
        columns=["content_sha256", "repo", "path", "commit"],
    )
    for sha, repo, path, commit in zip(
        meta["content_sha256"].to_pylist(),
        meta["repo"].to_pylist(),
        meta["path"].to_pylist(),
        meta["commit"].to_pylist(),
    ):
        assert (repo, path, commit) == by_sha[sha]


def test_rebuild_is_deterministic(ray_session, small_corpus_path, tmp_path, built_index):
    """A fresh build with the same config is byte-identical (parquet files)."""
    from nexlt_ray.build import BuildConfig, build_index

    idx1, _ = built_index
    idx2 = str(tmp_path / "idx2")
    build_index(small_corpus_path, idx2, BuildConfig(num_doc_buckets=16, num_term_buckets=8))
    for sub in ("docstore", "segments"):
        f1 = sorted(os.listdir(os.path.join(idx1, sub)))
        f2 = sorted(os.listdir(os.path.join(idx2, sub)))
        assert f1 == f2
        for name in f1:
            b1 = open(os.path.join(idx1, sub, name), "rb").read()
            b2 = open(os.path.join(idx2, sub, name), "rb").read()
            assert b1 == b2, f"{sub}/{name} differs"


def test_docids_independent_of_bucket_count(ray_session, small_corpus_path, tmp_path, built_index):
    """Range-partitioned sha buckets: doc_id assignment does not depend on
    num_doc_buckets (scale knob changes layout, not identity)."""
    from nexlt_ray.build import BuildConfig, build_index

    idx1, m1 = built_index
    idx3 = str(tmp_path / "idx3")
    m3 = build_index(
        small_corpus_path, idx3, BuildConfig(num_doc_buckets=5, num_term_buckets=3)
    )

    def id_map(idx, m):
        meta = pq.read_table(
            os.path.join(idx, "docstore"), columns=["doc_bucket", "local_rank", "content_sha256"]
        )
        did = (
            np.asarray(m["doc_offsets"])[np.asarray(meta["doc_bucket"])]
            + np.asarray(meta["local_rank"])
        )
        return dict(zip(meta["content_sha256"].to_pylist(), did.tolist()))

    assert id_map(idx1, m1) == id_map(idx3, m3)


# ---------------------------------------------------------------------------
# query features
# ---------------------------------------------------------------------------
def test_phrase_vs_oracle(built_index, oracle_index):
    from nexlt_ray.query import IndexReader

    idx, _ = built_index
    r = IndexReader(idx)
    for q in ['"index query"', '"the import"', '"batch merge"', '"get set"']:
        got = r.search(q, k=10)
        exp = [(d, float(np.float32(s))) for d, s in oracle_index.search(q, k=10)]
        assert got == exp, q


def test_and_mode(built_index, oracle_index):
    from nexlt_ray.query import IndexReader

    idx, _ = built_index
    r = IndexReader(idx)
    res = r.search("http server", k=1000, mode="AND")
    docs = {d for d, _ in res}
    p_http = set(oracle_index.postings.get("http", {}))
    p_server = set(oracle_index.postings.get("server", {}))
    assert docs == (p_http & p_server)


def test_doc_fields_lookup(built_index):
    from nexlt_ray.query import IndexReader

    idx, _ = built_index
    r = IndexReader(idx)
    top = r.search("parse", k=5)
    ids = [d for d, _ in top]
    t = r.doc_fields(ids)
    assert t.num_rows == len(ids)
    assert set(t["doc_id"].to_pylist()) == set(ids)
    assert {"repo", "path", "commit", "lang"} <= set(t.column_names)


def test_empty_and_missing(built_index):
    from nexlt_ray.query import IndexReader

    idx, _ = built_index
    r = IndexReader(idx)
    assert r.search("", k=10) == []
    assert r.search("zzznotaterm", k=10) == []
    assert r.search("the", k=0) == []
    assert r.match_count("zzznotaterm") == 0


def test_text_en_profile_rank_identity(ray_session, small_corpus_path, tmp_path):
    """Porter-stemming profile end-to-end: build + WAND == oracle."""
    import os

    import pyarrow.parquet as pq

    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.oracle import OracleIndex
    from nexlt_ray.query import IndexReader

    idx = str(tmp_path / "idx_en")
    m = build_index(
        small_corpus_path, idx,
        BuildConfig(profile="text_en", num_doc_buckets=8, num_term_buckets=4),
    )
    r = IndexReader(idx)
    meta = pq.read_table(os.path.join(idx, "docstore"))
    doc_id = (
        np.asarray(m["doc_offsets"])[np.asarray(meta["doc_bucket"])]
        + np.asarray(meta["local_rank"])
    )
    o = OracleIndex(
        list(zip(doc_id.tolist(), meta["content"].to_pylist())), profile="text_en"
    )
    for q in ["parsing tokens", "searching", "HTTPServer2", '"index query"', "the"]:
        got = r.search(q, k=10)
        exp = [(d, float(np.float32(s))) for d, s in o.search(q, k=10)]
        assert got == exp, q


def test_token_vectors_identical_segments(ray_session, small_corpus_path, tmp_path):
    """store_token_vectors changes storage layout, never index bytes."""
    from nexlt_ray.build import BuildConfig, build_index

    a = str(tmp_path / "tv_on")
    b = str(tmp_path / "tv_off")
    build_index(small_corpus_path, a,
                BuildConfig(num_doc_buckets=4, num_term_buckets=2,
                            store_token_vectors=True))
    build_index(small_corpus_path, b,
                BuildConfig(num_doc_buckets=4, num_term_buckets=2,
                            store_token_vectors=False))
    for name in sorted(os.listdir(os.path.join(a, "segments"))):
        assert (
            open(os.path.join(a, "segments", name), "rb").read()
            == open(os.path.join(b, "segments", name), "rb").read()
        ), name


def test_empty_and_null_inputs(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from nexlt_ray.build import BuildConfig, build_index

    # nulls are dropped, valid rows survive
    t = pa.table(
        {
            "repo": pa.array(["r", None, "r2"]),
            "path": pa.array(["p", "p", "p2"]),
            "commit": pa.array(["c", "c", "c2"]),
            "lang": pa.array(["python", "python", None]),
            "content": pa.array(["hello world", "x", None]),
        }
    )
    src = str(tmp_path / "n.parquet")
    pq_.write_table(t, src)
    idx = str(tmp_path / "idx_nulls")
    m = build_index(src, idx, BuildConfig(num_doc_buckets=2, num_term_buckets=2))
    assert m["n_docs"] == 1  # only the fully-valid row (null lang allowed? no: content null dropped, repo null dropped)

    # fully empty input commits an empty index
    empty = t.slice(0, 0)
    src2 = str(tmp_path / "e.parquet")
    pq_.write_table(empty, src2)
    idx2 = str(tmp_path / "idx_empty")
    m2 = build_index(src2, idx2, BuildConfig(num_doc_buckets=2, num_term_buckets=2))
    assert m2["n_docs"] == 0 and m2["n_postings"] == 0


def test_max_boolean_clauses(built_index):
    import pytest as _pytest

    from nexlt_ray.query import IndexReader

    idx, _ = built_index
    r = IndexReader(idx)
    big = " ".join(f"term{i}" for i in range(1100))
    with _pytest.raises(ValueError, match="maxBooleanClauses"):
        r.search(big, k=10)
