"""Resume-from-checkpoint tests (north rule: per-partition lineage + resume).

Simulates a build killed after K partitions by deleting outputs/ledger entries
for the others, then asserts the resumed build is byte-identical
(SURVEY.md §5.4).
"""

import glob
import hashlib
import os

import pyarrow.parquet as pq


def _dir_hash(d):
    h = hashlib.sha256()
    for f in sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)):
        h.update(os.path.relpath(f, d).encode())
        h.update(open(f, "rb").read())
    return h.hexdigest()


def test_resume_after_partial_failure(ray_session, small_corpus_path, tmp_path):
    from nexlt_ray.build import BuildConfig, build_index

    cfg = BuildConfig(num_doc_buckets=8, num_term_buckets=4)
    idx = str(tmp_path / "idx")
    build_index(small_corpus_path, idx, cfg)
    full = _dir_hash(idx)

    # "kill" after K partitions: drop the manifest, 2 docstore buckets (one
    # with and one without its ledger record) and 1 segment bucket
    os.remove(os.path.join(idx, "manifest.json"))
    os.remove(os.path.join(idx, "docstore", "bucket=00001.parquet"))
    os.remove(os.path.join(idx, "docstore", "bucket=00004.parquet"))
    os.remove(os.path.join(idx, "ledger", "docstore", "part-00004.json"))
    os.remove(os.path.join(idx, "segments", "bucket=00002.parquet"))

    m = build_index(small_corpus_path, idx, cfg)
    assert _dir_hash(idx) == full
    assert m["n_docs"] == 970  # 1000 - 3% dups


def test_ledger_records_lineage(ray_session, small_corpus_path, tmp_path):
    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.lineage import Ledger

    idx = str(tmp_path / "idx")
    build_index(small_corpus_path, idx, BuildConfig(num_doc_buckets=4, num_term_buckets=2))
    recs = Ledger(idx, "docstore").records()
    assert len(recs) == 4
    assert sum(r["n_docs"] for r in recs) == 970
    for r in recs:
        assert len(r["content_sha256s_digest"]) == 64
        out = os.path.join(idx, r["output"])
        assert os.path.exists(out)
        assert pq.read_metadata(out).num_rows == r["n_docs"]
    seg_recs = Ledger(idx, "segments").records()
    assert len(seg_recs) == 2
    assert all(r["n_terms"] > 0 for r in seg_recs)


def _as_jsonl(src_dir: str, dst_dir: str) -> str:
    """Re-materialize a parquet corpus dir as .jsonl shards (one per
    parquet file, same rows/order) — the reference's actual ingest format
    (per-product JSON exports read by parseJSON.pl)."""
    import json as _json

    os.makedirs(dst_dir, exist_ok=True)
    for f in sorted(glob.glob(os.path.join(src_dir, "*.parquet"))):
        t = pq.read_table(f)
        rows = [
            {c: t[c][i].as_py() for c in t.column_names}
            for i in range(t.num_rows)
        ]
        out = os.path.join(
            dst_dir, os.path.basename(f).replace(".parquet", ".jsonl")
        )
        with open(out, "w", encoding="utf-8") as fh:
            for r in rows:
                fh.write(_json.dumps(r, ensure_ascii=False) + "\n")
    return dst_dir


def test_jsonl_ingest_byte_identical(
    ray_session, small_corpus_path, tmp_path
):
    """S1 literal: building from newline-delimited JSON input produces a
    byte-identical index to building from the same rows as Parquet, on
    BOTH shuffle paths (storage-direct fragment reads treat each .jsonl
    file as one fragment; the sort path goes through ray.data.read_json)."""
    from nexlt_ray.build import BuildConfig, build_index

    jl = _as_jsonl(small_corpus_path, str(tmp_path / "corpus_jsonl"))

    for shuffle in ("disk", "sort"):
        cfg = dict(num_doc_buckets=8, num_term_buckets=4, shuffle=shuffle)
        a = str(tmp_path / f"idx_pq_{shuffle}")
        b = str(tmp_path / f"idx_jl_{shuffle}")
        m1 = build_index(small_corpus_path, a, BuildConfig(**cfg))
        m2 = build_index(jl, b, BuildConfig(**cfg))
        assert _dir_hash(a) == _dir_hash(b), shuffle
        for k in ("n_docs", "n_terms", "n_postings", "avgdl",
                  "n_dups_removed", "doc_counts"):
            assert m1[k] == m2[k], (shuffle, k)


def test_jsonl_ingest_nasty_strings(ray_session, tmp_path):
    """JSON escaping edge cases survive the ingest byte-identically:
    embedded newlines/tabs/quotes/backslashes, unicode (CJK, emoji,
    combining marks), and content that looks like JSON itself."""
    import json as _json

    import pyarrow as pa

    from nexlt_ray.build import BuildConfig, build_index

    contents = [
        'line one\nline two\twith tab',
        'quote " backslash \\ slash / end',
        '日本語のテキスト と emoji \U0001f600 and é combining',
        '{"looks": "like json", "n": [1, 2, 3]}',
        'control-adjacent   nbsp   ls   ps',
        '',
    ]
    rows = [
        {
            "repo": f"org/r{i}",
            "path": f"src/f{i}.py",
            "commit": "c" * 40,
            "lang": "python",
            "content": c,
        }
        for i, c in enumerate(contents)
    ]
    pq_dir = tmp_path / "pq"
    jl_dir = tmp_path / "jl"
    os.makedirs(pq_dir)
    os.makedirs(jl_dir)
    t = pa.table({k: [r[k] for r in rows] for k in rows[0]})
    pq.write_table(t, str(pq_dir / "part-0000.parquet"))
    with open(jl_dir / "part-0000.jsonl", "w", encoding="utf-8") as fh:
        for r in rows:
            fh.write(_json.dumps(r, ensure_ascii=False) + "\n")

    for shuffle in ("disk", "sort"):
        cfg = dict(num_doc_buckets=4, num_term_buckets=2, shuffle=shuffle)
        a = str(tmp_path / f"nidx_pq_{shuffle}")
        b = str(tmp_path / f"nidx_jl_{shuffle}")
        build_index(str(pq_dir), a, BuildConfig(**cfg))
        build_index(str(jl_dir), b, BuildConfig(**cfg))
        assert _dir_hash(a) == _dir_hash(b), shuffle


def test_jsonl_large_line(tmp_path):
    """Regression (r4 advice): a JSON line larger than pyarrow.json's
    default 1 MiB block_size used to fail the storage-direct ingest with
    ArrowInvalid 'straddling object straddles two block boundaries'. The
    fragment reader now retries with doubled block_size (capped at file
    size), mirroring Ray's JSON datasource."""
    import json as _json

    from nexlt_ray.build import _read_input_fragment

    big = "word " * 400_000  # ~2 MiB of content in one JSON line
    rows = [
        {"repo": "org/r0", "path": "a.py", "commit": "c" * 40,
         "lang": "python", "content": big},
        {"repo": "org/r1", "path": "b.py", "commit": "d" * 40,
         "lang": "python", "content": "small doc"},
    ]
    f = tmp_path / "big.jsonl"
    with open(f, "w", encoding="utf-8") as fh:
        for r in rows:
            fh.write(_json.dumps(r) + "\n")
    t = _read_input_fragment(str(f), -1, ["repo", "path", "content"])
    assert t.num_rows == 2
    assert t.column_names == ["repo", "path", "content"]
    assert t["content"][0].as_py() == big
