"""Scale-prove the round-4/5 flagship operators at sf0.1 (VERDICT r4 #6):
run each named __ray_entry__.queries() entry over $GRAFT_SF_DIR (default
/root/testdata/sf0.1 — 10x the driver's correctness scale) and print one
JSON line of per-entry wall seconds. The point is evidence that the
operators whose implementations are new or changed this round hold up at
the next scale tier with no driver-side materialization surprises.

Usage: python tools/bench_flagships.py [entry ...]
"""

import json
import os
import sys
import time

import ray

ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, ".")
import __ray_entry__ as E

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT = [
    # r4 flagships VERDICT asked to scale-prove
    "line_dedup_docs", "dup_ngram_docs", "dsir_weights", "bigram_lm_logprob",
    # r5 changed operators
    "curated_docs", "simhash_pairs", "dup_clusters",
    # r5 new operators
    "bpe_token_counts", "bpe_encoded_docs", "bpe_packed_sequences",
]

names = sys.argv[1:] or DEFAULT
qs = E.queries()
out = {}
for name in names:
    t0 = time.perf_counter()
    r = qs[name](SF)
    import ray.data as _rd
    n = r.count() if isinstance(r, _rd.Dataset) else len(r)
    out[name] = {"sec": round(time.perf_counter() - t0, 3), "rows": int(n)}
    print(f"{name}: {out[name]['sec']}s rows={n}", flush=True)

print(json.dumps({
    "metric": "flagship_sf01_wall_sec",
    "sf": os.path.basename(os.path.normpath(SF)),
    "entries": out,
}))
ray.shutdown()
