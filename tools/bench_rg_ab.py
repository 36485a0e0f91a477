"""One-window A/B of segment layouts (segment_range_groups=1 vs G):
build wall, cold/warm query latency, and extend_index wall + bytes
rewritten for a small update shard. Interleaved in one process per the
BASELINE host-noise protocol (never compare across windows).

Usage: python tools/bench_rg_ab.py [n_docs] [G] [shard]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def seg_bytes(idx):
    total = 0
    files = {}
    base = os.path.join(idx, "segments")
    for dp, _, fn in os.walk(base):
        for f in fn:
            p = os.path.join(dp, f)
            st = os.stat(p)
            files[os.path.relpath(p, base)] = (st.st_mtime_ns, st.st_size)
            total += st.st_size
    return total, files


def main():
    import ray

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    shard = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from nexlt_ray.build import BuildConfig, build_index, extend_index
    from nexlt_ray.corpus import generate_corpus
    from nexlt_ray.query import IndexReader

    root = "/tmp/bench_rg_ab"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    full = generate_corpus(n_docs + shard, seed=7)
    base, extra = full.slice(0, n_docs), full.slice(n_docs, shard)
    os.makedirs(f"{root}/base")
    pq.write_table(base, f"{root}/base/a.parquet")
    pq.write_table(extra, f"{root}/extra.parquet")

    queries = ["error handler", "return value", '"for the"', "config parse",
               "index merge OR sort", "the quick brown"]
    out = {"n_docs": n_docs, "G": G, "shard": shard}
    for tag, groups in (("g1", 1), (f"g{G}", G)):
        cfg = BuildConfig(id_mode="strided", num_doc_buckets=64,
                          num_term_buckets=32, segment_range_groups=groups)
        idx = f"{root}/idx_{tag}"
        t0 = time.perf_counter()
        build_index(f"{root}/base", idx, cfg)
        t_build = time.perf_counter() - t0
        size0, files0 = seg_bytes(idx)
        r = IndexReader(idx)
        lat_cold = []
        for q in queries:
            t0 = time.perf_counter()
            r.search(q, k=10)
            lat_cold.append(time.perf_counter() - t0)
        lat_warm = []
        for q in queries:  # repeat pass: term-cache-resident postings
            t0 = time.perf_counter()
            r.search(q, k=10, filters={"lang": ["en", "de"]})
            lat_warm.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        extend_index(f"{root}/extra.parquet", idx)
        t_ext = time.perf_counter() - t0
        size1, files1 = seg_bytes(idx)
        rewritten = sum(
            sz for rel, (mt, sz) in files1.items()
            if rel not in files0 or files0[rel][0] != mt
        )
        out[tag] = {
            "build_sec": round(t_build, 3),
            "seg_bytes": size0,
            "n_seg_files": len(files0),
            "query_cold_ms": [round(x * 1e3, 2) for x in lat_cold],
            "query_warm_ms": [round(x * 1e3, 2) for x in lat_warm],
            "extend_sec": round(t_ext, 3),
            "extend_bytes_rewritten": rewritten,
            "extend_rewrite_frac": round(rewritten / max(size1, 1), 4),
        }
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
