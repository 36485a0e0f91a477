"""check_index — the Lucene CheckIndex analog. A clean index (either
segment layout, either codec, deep or not) passes; each injected corruption
class is detected: bit-flipped posting blobs, tampered stats, missing
ledger outputs, orphan files, docstore sha mismatches, and manifest totals
drift."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nexlt_ray.corpus import generate_corpus


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session):
    from nexlt_ray.build import BuildConfig, build_index

    root = tmp_path_factory.mktemp("check_idx")
    src = root / "src"
    os.makedirs(src)
    pq.write_table(generate_corpus(400, seed=41), src / "all.parquet")
    idx = str(root / "idx")
    build_index(str(src), idx,
                BuildConfig(id_mode="strided", num_doc_buckets=8,
                            num_term_buckets=4, segment_range_groups=2))
    return str(src), idx


def _copy(idx, tmp_path, name):
    dst = str(tmp_path / name)
    shutil.copytree(idx, dst)
    return dst


def _first_seg_file(idx):
    for dirpath, _, files in os.walk(os.path.join(idx, "segments")):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(dirpath, f)
    raise AssertionError("no segment files")


def test_clean_index_passes(ray_session, built):
    from nexlt_ray.check import check_index

    _, idx = built
    rep = check_index(idx, deep=True)
    assert rep["ok"], rep["errors"][:5]
    assert rep["stats"]["n_docs"] == 400 - 12  # dup_frac removes ~3%
    assert rep["stats"]["n_errors"] == 0


def test_clean_passes_all_variants(ray_session, tmp_path):
    """Dense ids, varint codec, single-file layout, no positions."""
    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.check import check_index

    src = tmp_path / "src"
    os.makedirs(src)
    pq.write_table(generate_corpus(150, seed=43), src / "all.parquet")
    idx = str(tmp_path / "idx")
    build_index(str(src), idx,
                BuildConfig(num_doc_buckets=4, num_term_buckets=4,
                            postings_codec="varint", store_positions=False))
    rep = check_index(idx)
    assert rep["ok"], rep["errors"][:5]


def test_detects_blob_corruption(ray_session, built, tmp_path):
    from nexlt_ray.check import check_index

    _, idx0 = built
    idx = _copy(idx0, tmp_path, "blob")
    seg = _first_seg_file(idx)
    tbl = pq.ParquetFile(seg).read()
    # flip bytes inside the largest blob (decode fails or values drift)
    blobs = tbl["blob"].to_pylist()
    j = int(np.argmax([len(x) for x in blobs]))
    bad = bytearray(blobs[j])
    for k in range(min(4, len(bad))):
        bad[len(bad) // 2 + k] ^= 0xFF
    blobs[j] = bytes(bad)
    tbl = tbl.set_column(tbl.schema.get_field_index("blob"), "blob",
                         pa.array(blobs, pa.binary()))
    pq.write_table(tbl, seg)
    rep = check_index(idx, verify_shas=False)
    assert not rep["ok"]
    assert any("decode failed" in e or "mismatch" in e or
               "not strictly increasing" in e or "missing docs" in e or
               "range bucket" in e or "cf=" in e or "postings, df=" in e
               for e in rep["errors"]), rep["errors"][:5]


def test_detects_stat_tampering(ray_session, built, tmp_path):
    from nexlt_ray.check import check_index

    _, idx0 = built
    idx = _copy(idx0, tmp_path, "stats")
    seg = _first_seg_file(idx)
    tbl = pq.ParquetFile(seg).read()
    dfs = tbl["df"].to_pylist()
    dfs[0] += 1
    tbl = tbl.set_column(tbl.schema.get_field_index("df"), "df",
                         pa.array(dfs, pa.int64()))
    pq.write_table(tbl, seg)
    rep = check_index(idx, verify_shas=False)
    assert not rep["ok"]


def test_detects_missing_and_orphan_files(ray_session, built, tmp_path):
    from nexlt_ray.check import check_index

    _, idx0 = built
    idx = _copy(idx0, tmp_path, "files")
    seg = _first_seg_file(idx)
    orphan = os.path.join(os.path.dirname(seg), "rg=09999.parquet")
    shutil.copyfile(seg, orphan)
    os.remove(seg)
    rep = check_index(idx, verify_shas=False)
    assert not rep["ok"]
    assert any("missing" in e for e in rep["errors"])
    assert any("orphan" in e for e in rep["errors"])


def test_detects_sha_mismatch(ray_session, built, tmp_path):
    from nexlt_ray.check import check_index

    _, idx0 = built
    idx = _copy(idx0, tmp_path, "sha")
    store_dir = os.path.join(idx, "docstore")
    f = os.path.join(store_dir, sorted(os.listdir(store_dir))[0])
    tbl = pq.ParquetFile(f).read()
    contents = tbl["content"].to_pylist()
    contents[0] = contents[0] + " tampered"
    tbl = tbl.set_column(tbl.schema.get_field_index("content"), "content",
                         pa.array(contents, pa.string()))
    pq.write_table(tbl, f)
    rep = check_index(idx)
    assert not rep["ok"]
    assert any("content_sha256" in e for e in rep["errors"])


def test_detects_manifest_total_drift(ray_session, built, tmp_path):
    from nexlt_ray.check import check_index

    _, idx0 = built
    idx = _copy(idx0, tmp_path, "totals")
    mp = os.path.join(idx, "manifest.json")
    with open(mp) as fh:
        m = json.load(fh)
    m["n_postings"] += 7
    m["n_terms"] += 1
    with open(mp, "w") as fh:
        json.dump(m, fh)
    rep = check_index(idx, verify_shas=False)
    assert not rep["ok"]
    assert any("n_postings" in e for e in rep["errors"])
    assert any("n_terms" in e for e in rep["errors"])


def test_clean_after_maintenance(ray_session, built, tmp_path):
    """extend + delete on the sharded layout keep the index check-clean —
    guards the assemble_maintenance ledger/outputs bookkeeping (every
    group file claimed by a record, no orphans, totals consistent)."""
    import pyarrow as pa

    from nexlt_ray.build import delete_by_query, extend_index
    from nexlt_ray.check import check_index

    src, idx0 = built
    idx = _copy(idx0, tmp_path, "maint")
    extra = tmp_path / "extra.parquet"
    pq.write_table(generate_corpus(430, seed=41).slice(400, 30), extra)
    extend_index(str(extra), idx)
    rep = check_index(idx)
    assert rep["ok"], rep["errors"][:5]
    delete_by_query(idx, "parse")
    rep = check_index(idx)
    assert rep["ok"], rep["errors"][:5]
