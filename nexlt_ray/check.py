"""Index integrity checker — the Lucene CheckIndex analog (the reference
runs Lucene 4.9 under Solr, where CheckIndex is the operational tool for
validating segment files after crashes / bit rot; solr/NeXLT's only recourse
was a full re-crawl). Verifies, without trusting any cached state:

  structure   manifest <-> ledger <-> files agree (no missing outputs, no
              orphan segment/docstore parquet, doc_counts match file rows)
  docstore    local ranks are exactly 0..n-1 per bucket; content_sha256
              really is sha256(content) (the dedup identity, M11)
  postings    every segment row round-trips: decoded doc ids are strictly
              increasing, inside the row's doc-range window, and point at
              docs that exist; df/cf/max_tf match the decoded streams;
              skip pointers (block_last/block_off) and block-max metadata
              (block_max_tf, block_min_norm) match per-block recomputation
              from the decoded values + docstore norms; positions decode to
              exactly tf ascending values per posting
  placement   every term lives in the term bucket its hash names; rows are
              sorted by (term, range_bucket) with no duplicates
  totals      manifest n_docs / n_terms / n_postings / avgdl equal the
              recomputed sums

Runs as Ray Data tasks (one per segment / docstore file — the same
storage-direct fan-out the build uses), so a 100 TB index checks at full
cluster parallelism with no driver data path; each task returns only error
strings + counters. `deep=True` additionally re-tokenizes every stored doc
and re-derives its norm byte (catches analyzer drift; costs a full analysis
pass)."""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .codec import (
    positions_decoder_for,
    small_float_int_to_byte4,
    span_decoder_for,
)

MAX_ERRORS_PER_FILE = 20


def _err(errors: list[str], msg: str) -> None:
    if len(errors) < MAX_ERRORS_PER_FILE:
        errors.append(msg)


def _check_docstore_file(
    path: str, manifest: dict, verify_shas: bool, deep: bool
) -> dict:
    errors: list[str] = []
    name = os.path.basename(path)
    b = int(name[len("bucket=") : -len(".parquet")])
    cols = ["local_rank", "norm_byte", "content", "content_sha256"]
    if deep and manifest["config"]["profile"] == "auto":
        cols.append("lang")
    tbl = pq.ParquetFile(path).read(columns=cols, use_threads=False)
    n = tbl.num_rows
    counts = manifest["doc_counts"]
    if b >= len(counts) or counts[b] != n:
        _err(errors, f"docstore {name}: {n} rows, manifest doc_counts says "
                     f"{counts[b] if b < len(counts) else 'absent'}")
    ranks = np.asarray(tbl["local_rank"], dtype=np.int64)
    if not np.array_equal(np.sort(ranks), np.arange(n, dtype=np.int64)):
        _err(errors, f"docstore {name}: local ranks are not exactly 0..{n-1}")
    total_len = 0
    if verify_shas or deep:
        contents = tbl["content"].to_pylist()
        if verify_shas:
            shas = tbl["content_sha256"].to_pylist()
            for i, (c, s) in enumerate(zip(contents, shas)):
                if hashlib.sha256(c.encode()).hexdigest() != s:
                    _err(errors, f"docstore {name} row {i}: content_sha256 "
                                 "does not hash the content")
        if deep:
            from .tokenize import tokenize_batch, tokenize_by_lang

            profile = manifest["config"]["profile"]
            if profile == "auto":
                tb = tokenize_by_lang(tbl["content"], tbl["lang"])
            else:
                tb = tokenize_batch(tbl["content"], profile=profile)
            norm = np.asarray(tbl["norm_byte"], dtype=np.uint8)
            want = small_float_int_to_byte4(tb.doc_len.astype(np.int64))
            bad = np.flatnonzero(want.astype(np.uint8) != norm)
            for i in bad[:5]:
                _err(errors, f"docstore {name} row {int(i)}: norm_byte "
                             f"{int(norm[i])} != re-derived {int(want[i])}")
            total_len = int(tb.doc_len.sum())
    return {"errors": errors, "n_docs": n, "total_len": total_len,
            "bucket": b}


def _check_segment_file(
    path: str, index_dir: str, manifest: dict
) -> dict:
    from .build import term_bucket_of

    cfg = manifest["config"]
    codec = cfg.get("postings_codec", "varint")
    block_size = cfg["block_size"]
    range_bits = cfg["range_bits"]
    id_mode = cfg.get("id_mode", "dense")
    cap_bits = cfg.get("bucket_capacity_bits", 40)
    offsets = np.asarray(manifest["doc_offsets"], dtype=np.int64)
    counts = np.asarray(manifest["doc_counts"], dtype=np.int64)
    n_docs = manifest["n_docs"]
    store_positions = cfg.get("store_positions", True)
    span_dec = span_decoder_for(codec)
    pos_dec = positions_decoder_for(codec)

    rel = os.path.relpath(path, os.path.join(index_dir, "segments"))
    tb_num = int(rel.split(os.sep)[0][len("bucket=") :].split(".")[0])
    errors: list[str] = []
    tbl = pq.ParquetFile(path).read(use_threads=False)
    terms = tbl["term"].to_pylist()
    rbs = np.asarray(tbl["range_bucket"], dtype=np.int64)
    keys = list(zip(terms, rbs.tolist()))
    if keys != sorted(keys):
        _err(errors, f"{rel}: rows not sorted by (term, range_bucket)")
    if len(set(keys)) != len(keys):
        _err(errors, f"{rel}: duplicate (term, range_bucket) rows")
    # norms shard cache for block_min_norm recomputation
    norm_cache: dict[int, np.ndarray] = {}

    def norms_for(doc_ids: np.ndarray) -> np.ndarray:
        if id_mode == "strided":
            db = doc_ids >> cap_bits
            local = doc_ids - offsets[db]
        else:
            db = np.searchsorted(offsets, doc_ids, side="right") - 1
            local = doc_ids - offsets[db]
        out = np.zeros(doc_ids.size, dtype=np.uint8)
        for bb in np.unique(db):
            if bb not in norm_cache:
                p = os.path.join(index_dir, "docstore",
                                 f"bucket={int(bb):05d}.parquet")
                t = pq.ParquetFile(p).read(
                    columns=["local_rank", "norm_byte"], use_threads=False
                )
                arr = np.zeros(t.num_rows, dtype=np.uint8)
                arr[np.asarray(t["local_rank"], dtype=np.int64)] = np.asarray(
                    t["norm_byte"], dtype=np.uint8
                )
                norm_cache[int(bb)] = arr
            m = db == bb
            out[m] = norm_cache[int(bb)][local[m]]
        return out

    # one columnar extraction up front — the per-row loop is inherent (each
    # row owns its blobs), but per-row chained .as_py() costs ~10x the
    # numpy work at real vocabulary sizes
    col_df = tbl["df"].to_pylist()
    col_cf = tbl["cf"].to_pylist()
    col_max_tf = tbl["max_tf"].to_pylist()
    col_min_norm = tbl["min_norm"].to_pylist()
    col_blob = tbl["blob"].to_pylist()
    col_bl = tbl["block_last"].to_pylist()
    col_bo = tbl["block_off"].to_pylist()
    col_btf = tbl["block_max_tf"].to_pylist()
    col_bmn = tbl["block_min_norm"].to_pylist()
    col_pblob = tbl["pos_blob"].to_pylist() if store_positions else None
    col_bpo = tbl["block_pos_off"].to_pylist() if store_positions else None
    n_postings = 0
    for i in range(tbl.num_rows):
        term = terms[i]
        rb = int(rbs[i])
        df = int(col_df[i])
        cf = int(col_cf[i])
        max_tf = int(col_max_tf[i])
        blob = col_blob[i]
        block_last = np.asarray(col_bl[i], dtype=np.int64)
        block_off = np.asarray(col_bo[i], dtype=np.int32)
        block_max_tf = np.asarray(col_btf[i], dtype=np.int32)
        block_min_norm = np.asarray(col_bmn[i], dtype=np.uint8)
        if term_bucket_of(term, cfg["num_term_buckets"]) != tb_num:
            _err(errors, f"{rel} row {i} ({term!r}): wrong term bucket")
            continue
        nblocks = len(block_last)
        if nblocks != (df + block_size - 1) // block_size:
            _err(errors, f"{rel} row {i} ({term!r}): {nblocks} blocks for "
                         f"df={df}")
            continue
        try:
            docs, tfs = span_dec(blob, block_off, block_last, 0, nblocks, df,
                                 block_size)
        except Exception as e:  # noqa: BLE001 — corrupt blob = finding
            _err(errors, f"{rel} row {i} ({term!r}): blob decode failed: {e}")
            continue
        if docs.size != df:
            _err(errors, f"{rel} row {i} ({term!r}): decoded {docs.size} "
                         f"postings, df={df}")
            continue
        if docs.size > 1 and not (np.diff(docs) > 0).all():
            _err(errors, f"{rel} row {i} ({term!r}): doc ids not strictly "
                         "increasing")
        if ((docs >> range_bits) != rb).any():
            _err(errors, f"{rel} row {i} ({term!r}): doc outside range "
                         f"bucket {rb}")
        if id_mode == "strided":
            db = docs >> cap_bits
            db_c = np.minimum(db, counts.size - 1)
            local = docs - offsets[db_c]
            bad = (db >= counts.size) | (local < 0) | (local >= counts[db_c])
        else:
            bad = (docs < 0) | (docs >= n_docs)
        if bad.any():
            _err(errors, f"{rel} row {i} ({term!r}): "
                         f"{int(bad.sum())} postings point at missing docs")
        if int(tfs.sum()) != cf:
            _err(errors, f"{rel} row {i} ({term!r}): cf={cf} != "
                         f"sum(tf)={int(tfs.sum())}")
        if tfs.size and int(tfs.max()) != max_tf:
            _err(errors, f"{rel} row {i} ({term!r}): max_tf={max_tf} != "
                         f"decoded {int(tfs.max())}")
        if (tfs < 1).any():
            _err(errors, f"{rel} row {i} ({term!r}): tf < 1")
        # skip pointers + block-max metadata vs recomputation
        starts = np.arange(0, df, block_size)
        ends = np.minimum(starts + block_size, df)
        if not np.array_equal(docs[ends - 1], block_last):
            _err(errors, f"{rel} row {i} ({term!r}): block_last mismatch")
        want_btf = np.maximum.reduceat(tfs, starts).astype(np.int32)
        if not np.array_equal(want_btf, block_max_tf):
            _err(errors, f"{rel} row {i} ({term!r}): block_max_tf mismatch")
        if not bad.any():  # norm lookup needs every doc to exist
            norms = norms_for(docs)
            want_bmn = np.minimum.reduceat(norms, starts).astype(np.uint8)
            if not np.array_equal(want_bmn, block_min_norm):
                _err(errors, f"{rel} row {i} ({term!r}): block_min_norm "
                             "mismatch")
            if int(col_min_norm[i]) != int(norms.min()):
                _err(errors,
                     f"{rel} row {i} ({term!r}): row min_norm mismatch")
        if store_positions:
            pos_blob = col_pblob[i]
            block_pos_off = np.asarray(col_bpo[i],
                                       dtype=np.int32)
            try:
                pcounts, ppos = pos_dec(pos_blob, block_pos_off, 0, nblocks,
                                        df, block_size)
            except Exception as e:  # noqa: BLE001
                _err(errors, f"{rel} row {i} ({term!r}): pos decode failed: "
                             f"{e}")
                continue
            if not np.array_equal(pcounts, tfs):
                _err(errors, f"{rel} row {i} ({term!r}): position counts "
                             "!= tfs")
            elif ppos.size:
                # ascending within each posting: diffs may drop only at
                # posting boundaries
                bounds = np.cumsum(pcounts)[:-1]
                d = np.diff(ppos)
                interior = np.ones(d.size, dtype=bool)
                interior[bounds - 1] = False
                if (d[interior] <= 0).any() or (ppos < 0).any():
                    _err(errors, f"{rel} row {i} ({term!r}): positions not "
                                 "ascending within a posting")
        n_postings += df
    return {"errors": errors, "n_rows": tbl.num_rows,
            "n_postings": n_postings, "terms": sorted(set(terms)),
            "term_bucket": tb_num}


def check_index(
    index_dir: str, *, verify_shas: bool = True, deep: bool = False
) -> dict:
    """Full integrity check; returns {"ok", "errors", "stats"}. Distributed:
    one Ray task per docstore / segment file (storage-direct, no driver
    data path beyond error strings and counters)."""
    import ray
    import ray.data

    from .lineage import Ledger

    manifest_path = os.path.join(index_dir, "manifest.json")
    errors: list[str] = []
    if not os.path.exists(manifest_path):
        return {"ok": False, "errors": ["manifest.json missing"], "stats": {}}
    with open(manifest_path) as f:
        manifest = json.load(f)

    # ---- structure: ledger <-> files ----
    seg_dir = os.path.join(index_dir, "segments")
    seg_files: list[str] = []
    for dirpath, _, files in (os.walk(seg_dir) if os.path.isdir(seg_dir)
                              else ()):
        for fn in files:
            if fn.endswith(".parquet"):
                seg_files.append(os.path.join(dirpath, fn))
    led_outputs: set[str] = set()
    for rec in Ledger(index_dir, "segments").records():
        outs = rec.get("outputs") or [rec["output"]]
        for p in outs:
            full = os.path.join(index_dir, p)
            led_outputs.add(os.path.abspath(full))
            if not os.path.exists(full):
                errors.append(f"segments ledger {rec['partition_id']}: "
                              f"output {p} missing")
    for p in seg_files:
        if os.path.abspath(p) not in led_outputs:
            errors.append(
                f"orphan segment file {os.path.relpath(p, index_dir)} "
                "(no ledger record claims it)"
            )
    doc_dir = os.path.join(index_dir, "docstore")
    doc_files = sorted(
        os.path.join(doc_dir, f)
        for f in (os.listdir(doc_dir) if os.path.isdir(doc_dir) else [])
        if f.startswith("bucket=") and f.endswith(".parquet")
    )
    have_buckets = {
        int(os.path.basename(p)[len("bucket=") : -len(".parquet")])
        for p in doc_files
    }
    for b, c in enumerate(manifest["doc_counts"]):
        if c > 0 and b not in have_buckets:
            errors.append(f"docstore bucket {b} has {c} docs in the "
                          "manifest but no file")
        if c == 0 and b in have_buckets:
            errors.append(f"docstore bucket {b} file exists but manifest "
                          "says empty")

    # ---- distributed per-file checks ----
    def run(paths: list[str], fn) -> list[dict]:
        if not paths:
            return []

        def task(batch: pa.Table) -> pa.Table:
            out = [fn(p) for p in batch["path"].to_pylist()]
            return pa.table({"res": pa.array([json.dumps(r) for r in out],
                                             pa.string())})

        ds = ray.data.from_arrow(pa.table({"path": pa.array(paths)}))
        res = (
            ds.repartition(len(paths))
            .map_batches(task, batch_format="pyarrow", batch_size=1,
                         num_cpus=1)
            .take_all()
        )
        return [json.loads(r["res"]) for r in res]

    doc_res = run(
        doc_files,
        lambda p: _check_docstore_file(p, manifest, verify_shas, deep),
    )
    seg_res = run(
        seg_files, lambda p: _check_segment_file(p, index_dir, manifest)
    )
    for r in doc_res + seg_res:
        errors.extend(r["errors"])

    # ---- totals ----
    n_docs = sum(r["n_docs"] for r in doc_res)
    if n_docs != manifest["n_docs"]:
        errors.append(f"n_docs: manifest {manifest['n_docs']} != docstore "
                      f"{n_docs}")
    n_postings = sum(r["n_postings"] for r in seg_res)
    if n_postings != manifest["n_postings"]:
        errors.append(f"n_postings: manifest {manifest['n_postings']} != "
                      f"decoded {n_postings}")
    # terms partition by bucket hash, so distinct-per-bucket sums exactly
    per_bucket: dict[int, set] = {}
    for r in seg_res:
        per_bucket.setdefault(r["term_bucket"], set()).update(r["terms"])
    n_terms = sum(len(s) for s in per_bucket.values())
    if n_terms != manifest["n_terms"]:
        errors.append(f"n_terms: manifest {manifest['n_terms']} != "
                      f"recomputed {n_terms}")
    if manifest["n_docs"]:
        want_avgdl = manifest["total_len"] / manifest["n_docs"]
        if abs(want_avgdl - manifest["avgdl"]) > 1e-9:
            errors.append("avgdl inconsistent with total_len/n_docs")
    if deep:
        total_len = sum(r["total_len"] for r in doc_res)
        if total_len != manifest["total_len"]:
            errors.append(f"total_len: manifest {manifest['total_len']} != "
                          f"re-tokenized {total_len}")
    stats = {
        "n_docs": n_docs,
        "n_segment_files": len(seg_files),
        "n_docstore_files": len(doc_files),
        "n_postings": n_postings,
        "n_terms": n_terms,
        "n_errors": len(errors),
    }
    return {"ok": not errors, "errors": errors, "stats": stats}
