"""Index snapshot / restore — the Solr replication-handler analog (the
reference serves from Solr 4.x whose backup command hardlinks the current
commit's segment files; NeXLT itself swaps a `lastrefresh` marker,
tr2solr.sh:58,83).

Safety argument for hardlinks: every writer in this engine publishes files
with write-temp + os.replace (lineage.atomic_write_parquet/json) and
removes them with os.unlink — neither ever MUTATES an existing inode. A
hardlinked snapshot therefore stays bit-frozen through any later
maintenance (extend/delete/reindex) of the source index: maintenance swaps
in new inodes under the same names while the snapshot keeps the old ones.
(Same reasoning Lucene/Solr rely on: segment files are write-once, commits
swap the segments_N pointer.)

A snapshot is a COMPLETE, directly-servable index directory (manifest +
docstore + segments + ledger), so "restore" is just opening it — or
hardlinking it back over a broken index dir.

Consistency: snapshot the index only between maintenance ops (the manifest
is the atomic commit point; mid-maintenance the data files are ahead of the
manifest). `verify=True` runs check_index on the snapshot to prove the
captured state is internally consistent."""

from __future__ import annotations

import json
import os
import shutil

_SKIP_PREFIXES = ("exchange-",)  # transient shuffle staging


def _iter_index_files(index_dir: str):
    for dirpath, dirnames, files in os.walk(index_dir):
        rel_dir = os.path.relpath(dirpath, index_dir)
        parts = [] if rel_dir == "." else rel_dir.split(os.sep)
        if parts and parts[0].startswith(_SKIP_PREFIXES):
            dirnames[:] = []
            continue
        dirnames[:] = [
            d for d in dirnames if not d.startswith(_SKIP_PREFIXES)
        ]
        for f in files:
            if f.endswith(".tmp") or ".tmp." in f:
                continue
            yield os.path.join(dirpath, f)


def snapshot_index(
    index_dir: str, snap_dir: str, *, verify: bool = False
) -> dict:
    """Capture the index's current commit into `snap_dir` (hardlinks where
    the filesystem allows, byte copies otherwise). Fails if the index has
    no manifest (nothing committed) or the snapshot dir already exists.
    Returns {"files", "bytes", "hardlinked", "manifest"}."""
    manifest_path = os.path.join(index_dir, "manifest.json")
    if not os.path.exists(manifest_path):
        raise ValueError(f"no committed index at {index_dir}")
    if os.path.exists(snap_dir):
        raise ValueError(f"snapshot target exists: {snap_dir}")
    tmp = snap_dir.rstrip(os.sep) + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    n_files = 0
    n_bytes = 0
    hardlinked = True
    for src in _iter_index_files(index_dir):
        rel = os.path.relpath(src, index_dir)
        dst = os.path.join(tmp, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(src, dst)
        except OSError:  # cross-device / unsupported fs: degrade to copy
            shutil.copyfile(src, dst)
            hardlinked = False
        n_files += 1
        n_bytes += os.path.getsize(dst)
    os.replace(tmp, snap_dir)  # atomic publish (same discipline as builds)
    if verify:
        from .check import check_index

        rep = check_index(snap_dir, verify_shas=False)
        if not rep["ok"]:
            raise ValueError(
                f"snapshot failed verification: {rep['errors'][:3]}"
            )
    with open(os.path.join(snap_dir, "manifest.json")) as f:
        manifest = json.load(f)
    return {
        "files": n_files,
        "bytes": n_bytes,
        "hardlinked": hardlinked,
        "manifest": manifest,
    }


def restore_index(snap_dir: str, index_dir: str) -> dict:
    """Replace `index_dir` with the snapshot's content (hardlink-or-copy
    back, atomic swap via a sibling temp dir + os.replace of the manifest
    last). The old index dir, if any, is moved aside and removed only after
    the restore lands. Returns the restored manifest."""
    if not os.path.exists(os.path.join(snap_dir, "manifest.json")):
        raise ValueError(f"not a snapshot (no manifest): {snap_dir}")
    tmp = index_dir.rstrip(os.sep) + ".restore-tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    for src in _iter_index_files(snap_dir):
        rel = os.path.relpath(src, snap_dir)
        dst = os.path.join(tmp, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(src, dst)
        except OSError:
            shutil.copyfile(src, dst)
    old = index_dir.rstrip(os.sep) + ".restore-old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(index_dir):
        os.replace(index_dir, old)
    os.replace(tmp, index_dir)
    shutil.rmtree(old, ignore_errors=True)
    with open(os.path.join(index_dir, "manifest.json")) as f:
        return json.load(f)
