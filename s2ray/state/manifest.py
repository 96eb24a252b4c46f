"""Resumable partitioned output with per-partition lineage + metrics.

north_rule requirement: "resumable from checkpoint with per-partition
lineage + metrics ... any partition can resume without recompute".

Design: partition = input parquet fragment (the natural unit Ray Data also
splits reads on).  For each fragment the runner executes
read -> transform(batch fn chain) -> write under
``out_dir/part-<fragment-hash>/`` and then atomically renames a manifest
JSON into ``out_dir/_manifest/``.  A rerun lists fragments, skips those with
a valid manifest (input path + mtime + row count match), and processes only
the pending ones.  Fragment tasks are plain Ray tasks (this is the one
place the Dataset API can't express the semantics: checkpoint granularity
must align with a stable partition identity across runs).

Each manifest carries lineage + metrics:
  input file, input mtime, rows in/out, output files, wall seconds, rows/s.
``load_metrics`` returns them as one table for reporting.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import time


def _fragment_id(path: str) -> str:
    return hashlib.sha1(path.encode()).hexdigest()[:16]


def _manifest_path(out_dir: str, frag_id: str) -> str:
    return os.path.join(out_dir, "_manifest", f"{frag_id}.json")


def pending_fragments(input_paths: list[str], out_dir: str) -> list[str]:
    """Fragments lacking a valid manifest (resume scan)."""
    todo = []
    for p in input_paths:
        mp = _manifest_path(out_dir, _fragment_id(p))
        if not os.path.exists(mp):
            todo.append(p)
            continue
        try:
            with open(mp) as f:
                m = json.load(f)
            if (m.get("input") != p
                    or m.get("input_mtime") != os.path.getmtime(p)):
                todo.append(p)
        except (json.JSONDecodeError, OSError):
            todo.append(p)
    return todo


def _process_fragment(path: str, out_dir: str, transforms) -> dict:
    import pyarrow.parquet as pq

    t0 = time.time()
    frag_id = _fragment_id(path)
    table = pq.read_table(path)
    rows_in = table.num_rows
    for fn in transforms:
        table = fn(table)
    part_dir = os.path.join(out_dir, f"part-{frag_id}")
    os.makedirs(part_dir, exist_ok=True)
    out_file = os.path.join(part_dir, "data.parquet")
    tmp = out_file + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, out_file)
    wall = time.time() - t0
    manifest = {
        "fragment_id": frag_id,
        "input": path,
        "input_mtime": os.path.getmtime(path),
        "rows_in": rows_in,
        "rows_out": table.num_rows,
        "output_files": [out_file],
        "wall_s": wall,
        "rows_per_s": rows_in / wall if wall > 0 else None,
        "finished_at": time.time(),
    }
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    mp = _manifest_path(out_dir, frag_id)
    with open(mp + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(mp + ".tmp", mp)
    return manifest


def run_resumable(input_paths: list[str], out_dir: str, transforms,
                  max_in_flight: int = 16) -> dict:
    """Process all pending fragments in parallel Ray tasks; returns summary.

    ``transforms`` is a list of pure ``pa.Table -> pa.Table`` callables
    (the same batch fns the Dataset pipelines use).
    """
    import ray

    os.makedirs(out_dir, exist_ok=True)
    todo = pending_fragments(input_paths, out_dir)
    skipped = len(input_paths) - len(todo)
    task = ray.remote(num_cpus=1)(_process_fragment)
    done = []
    in_flight = []
    for p in todo:
        in_flight.append(task.remote(p, out_dir, transforms))
        if len(in_flight) >= max_in_flight:
            ready, in_flight = ray.wait(in_flight, num_returns=1)
            done.extend(ray.get(ready))
    done.extend(ray.get(in_flight))
    return {
        "fragments_total": len(input_paths),
        "fragments_skipped_resume": skipped,
        "fragments_processed": len(done),
        "rows_out": sum(m["rows_out"] for m in done),
    }


def load_metrics(out_dir: str):
    """All per-partition lineage/metrics rows as a pandas DataFrame."""
    import pandas as pd

    rows = []
    for mp in sorted(glob.glob(os.path.join(out_dir, "_manifest", "*.json"))):
        with open(mp) as f:
            rows.append(json.load(f))
    return pd.DataFrame(rows)
