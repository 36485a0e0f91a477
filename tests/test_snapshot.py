"""snapshot_index / restore_index (Solr replication-handler analog).
The load-bearing property: a hardlinked snapshot stays BIT-FROZEN through
later maintenance of the source index, because every engine writer
publishes via write-temp + os.replace (new inode) and never mutates files
in place. Also: a snapshot is directly servable, verification composes with
check_index, and restore rolls a corrupted index back byte-identically."""

import os

import pyarrow.parquet as pq
import pytest

from nexlt_ray.corpus import generate_corpus


def _tree_bytes(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = fh.read()
    return out


@pytest.fixture()
def built(ray_session, tmp_path):
    from nexlt_ray.build import BuildConfig, build_index

    src = tmp_path / "src"
    os.makedirs(src)
    full = generate_corpus(350, seed=47)
    pq.write_table(full.slice(0, 330), src / "a.parquet")
    extra = tmp_path / "extra.parquet"
    pq.write_table(full.slice(330, 20), extra)
    idx = str(tmp_path / "idx")
    build_index(str(src), idx,
                BuildConfig(id_mode="strided", num_doc_buckets=8,
                            num_term_buckets=4))
    return idx, str(extra)


def test_snapshot_is_servable_and_verified(built, tmp_path):
    from nexlt_ray.query import IndexReader
    from nexlt_ray.snapshot import snapshot_index

    idx, _ = built
    snap = str(tmp_path / "snap")
    info = snapshot_index(idx, snap, verify=True)
    assert info["files"] > 0 and info["manifest"]["n_docs"] > 0
    r0, r1 = IndexReader(idx), IndexReader(snap)
    for q in ["error handler", "return value", '"for the"']:
        assert r0.search(q, k=10) == r1.search(q, k=10), q
    with pytest.raises(ValueError):
        snapshot_index(idx, snap)  # target exists


def test_snapshot_frozen_through_maintenance(built, tmp_path):
    """extend + delete on the source must not change one snapshot byte
    (os.replace swaps inodes; hardlinks keep the old ones)."""
    from nexlt_ray.build import delete_by_query, extend_index
    from nexlt_ray.query import IndexReader
    from nexlt_ray.snapshot import snapshot_index

    idx, extra = built
    snap = str(tmp_path / "snap")
    snapshot_index(idx, snap)
    before = _tree_bytes(snap)
    extend_index(extra, idx)
    delete_by_query(idx, "parse")
    after = _tree_bytes(snap)
    assert before == after
    # and the snapshot still serves the PRE-maintenance corpus
    r = IndexReader(snap)
    assert r.match_count("parse") > 0


def test_restore_rolls_back(built, tmp_path):
    from nexlt_ray.build import extend_index
    from nexlt_ray.check import check_index
    from nexlt_ray.snapshot import restore_index, snapshot_index

    idx, extra = built
    snap = str(tmp_path / "snap")
    snapshot_index(idx, snap)
    want = _tree_bytes(idx)
    extend_index(extra, idx)  # mutate
    # corrupt a segment file on top
    seg_dir = os.path.join(idx, "segments")
    victim = os.path.join(seg_dir, sorted(os.listdir(seg_dir))[0])
    with open(victim, "r+b") as fh:
        fh.seek(100)
        fh.write(b"\xff\xff\xff\xff")
    m = restore_index(snap, idx)
    assert _tree_bytes(idx) == want
    assert m["n_docs"] > 0
    assert check_index(idx, verify_shas=False)["ok"]
