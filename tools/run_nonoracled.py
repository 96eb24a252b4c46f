"""Driver-style rows/schema artifact for the non-SQL-expressible queries.

The driver's CORRECTNESS window only reaches the first 50 `queries()`
entries, and the 11 inherently non-SQL queries (approximate sketches,
coverings, media, IVF/bucketed ANN, semantic dedup, BPE) close the dict,
so they never receive a driver row.  This runner applies the driver's
weaker rows-only contract to exactly those keys: run each at sf0.01,
record row count + sorted column schema + dtypes, and write
``NONORACLED_r{N}.json`` at the repo root (round-4 verdict task 8).

Usage:  python tools/run_nonoracled.py [--round 5] [--sf-dir DIR]

Owns a Ray session (library code and __ray_entry__ never call ray.init).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _shape(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        df = obj
    elif isinstance(obj, pa.Table):
        df = obj.to_pandas()
    else:  # ray.data.Dataset
        df = obj.to_pandas()
    cols = sorted(df.columns)
    return len(df), cols, [str(df[c].dtype) for c in cols]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oracled = e.queries(), set(e.oracle_sql())
    out = {}
    for name, fn in qs.items():
        if name in oracled:
            continue
        t0 = time.perf_counter()
        try:
            rows, cols, dtypes = _shape(fn(args.sf_dir))
            out[name] = {"rows": rows, "columns": cols, "dtypes": dtypes,
                         "sec": round(time.perf_counter() - t0, 3),
                         "status": "ok" if rows > 0 else "empty"}
        except Exception as ex:  # record, don't abort: the artifact must list every key
            out[name] = {"status": "error", "err": repr(ex)[:300]}
    path = os.path.join(REPO, f"NONORACLED_r{args.round:02d}.json")
    with open(path, "w") as f:
        json.dump({"sf_dir": args.sf_dir, "queries": out}, f, indent=1, sort_keys=True)
    ok = sum(1 for v in out.values() if v.get("status") == "ok")
    print(f"{path}: {ok}/{len(out)} ok")
    ray.shutdown()


if __name__ == "__main__":
    main()
