"""Back-to-back A/B of the postings block codecs (varint vs FOR bit-packed).

Per the host-noise protocol (BASELINE.md): both legs run in the SAME window,
interleaved A B A B, so co-tenant steal hits both codecs equally. Reports
build wall time, segment posting-blob bytes, and query latency percentiles
over the reference query set for each codec.

Usage: python tools/bench_codec_ab.py [n_docs] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def one_leg(codec: str, path: str, n: int, reps: int) -> dict:
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.corpus import reference_queries
    from nexlt_ray.query import IndexReader

    index_dir = f"/tmp/nexlt_codec_ab/{codec}_{n}"
    shutil.rmtree(index_dir, ignore_errors=True)
    cfg = BuildConfig(
        exchange_root="/dev/shm/nexlt_exchange_ab", postings_codec=codec
    )
    t0 = time.perf_counter()
    manifest = build_index(path, index_dir, cfg)
    build_sec = time.perf_counter() - t0

    seg = pq.read_table(
        os.path.join(index_dir, "segments"), columns=["blob", "pos_blob"]
    )
    blob_bytes = int(pc.sum(pc.binary_length(seg["blob"])).as_py())
    pos_bytes = int(pc.sum(pc.binary_length(seg["pos_blob"])).as_py())

    reader = IndexReader(index_dir)
    qs = reference_queries()
    lat = []
    for _ in range(reps):
        for q in qs:
            reader_cold = IndexReader(index_dir)  # cold caches per trial
            t = time.perf_counter()
            reader_cold.search(q["query"], k=q["k"], algorithm="wand")
            lat.append(time.perf_counter() - t)
    # warm-path latencies (decoded-block caches hot) on the shared reader
    warm = []
    for _ in range(reps):
        for q in qs:
            t = time.perf_counter()
            reader.search(q["query"], k=q["k"], algorithm="wand")
            warm.append(time.perf_counter() - t)
    lat_ms = sorted(1000 * x for x in lat)
    warm_ms = sorted(1000 * x for x in warm)
    return {
        "codec": codec,
        "build_sec": round(build_sec, 3),
        "docs_per_sec": round(manifest["n_docs"] / build_sec, 1),
        "blob_bytes": blob_bytes,
        "pos_blob_bytes": pos_bytes,
        "cold_p50_ms": round(lat_ms[len(lat_ms) // 2], 3),
        "cold_p95_ms": round(lat_ms[int(len(lat_ms) * 0.95)], 3),
        "warm_p50_ms": round(warm_ms[len(warm_ms) // 2], 3),
        "warm_p95_ms": round(warm_ms[int(len(warm_ms) * 0.95)], 3),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from nexlt_ray.corpus import corpus_path

    path = corpus_path(n)  # cached, untimed

    legs = []
    for trial in range(2):  # interleave A B A B
        for codec in ("varint", "for"):
            legs.append(one_leg(codec, path, n, reps))
    out = {"n_docs": n, "reps": reps, "legs": legs}
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
