"""Generic resumable key-partitioned parquet sink.

Complements state/manifest.py (which checkpoints on INPUT-fragment
identity): here the checkpoint unit is an OUTPUT partition key, for
pipelines whose natural resume granularity is a key range or hash bucket
(tile ancestors, doc-id buckets, languages, ...).

Every partition is written INSIDE its map_groups task (no driver collect)
to ``out_dir/<part_col>=<value>/data.parquet`` with an atomically renamed
manifest under ``out_dir/_manifest/``; a rerun recomputes the upstream
pipeline but skips writing partitions whose manifest already exists —
writes are the non-idempotent part on shared storage.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _safe(value) -> str:
    """Filesystem-safe, COLLISION-FREE name for a partition key: sanitized
    (and truncated) keys get an 8-hex blake2b suffix of the raw key, so two
    distinct keys ('a/b' vs 'a_b', or keys differing past the truncation
    point) can never map to the same directory/manifest and silently lose
    a partition."""
    import hashlib

    s = str(value)
    clean = "".join(c if (c.isalnum() or c in "-_.") else "_" for c in s)
    if clean == s and len(s) <= 64:
        return clean
    tag = hashlib.blake2b(s.encode(), digest_size=4).hexdigest()
    return f"{clean[:55]}-{tag}"


def checkpointed_write(out_dir: str, part: str, subdir: str, tbl: pa.Table,
                       t0: float, filename: str = "data.parquet",
                       extra: dict | None = None):
    """The checkpoint protocol shared by every partitioned sink: skip if
    the partition's manifest exists, else write the parquet then the
    manifest, each via .tmp + atomic rename.  Returns (written, rows)."""
    mp = os.path.join(out_dir, "_manifest", f"{part}.json")
    if os.path.exists(mp):
        return False, 0
    pdir = os.path.join(out_dir, subdir)
    os.makedirs(pdir, exist_ok=True)
    out_file = os.path.join(pdir, filename)
    pq.write_table(tbl, out_file + ".tmp")
    os.replace(out_file + ".tmp", out_file)
    manifest = {
        "partition": part,
        "rows": int(tbl.num_rows),
        "output": out_file,
        "wall_s": time.time() - t0,
    }
    if extra:
        manifest.update(extra)
    with open(mp + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(mp + ".tmp", mp)
    return True, int(tbl.num_rows)


def write_partitioned(ds, out_dir: str, part_col: str):
    """Write ``ds`` (a Ray Dataset) partitioned by ``part_col``.  Returns
    {"partitions_written": int, "partitions_total": int, "rows": int}."""
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    t0 = time.time()

    def write_part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"partition": pd.Series(dtype=object),
                                 "written": pd.Series(dtype=bool),
                                 "rows": pd.Series(dtype=np.int64)})
        part = _safe(df[part_col].iloc[0])
        tbl = pa.Table.from_pandas(df, preserve_index=False)
        written, rows = checkpointed_write(
            out_dir, part, f"{part_col}={part}", tbl, t0)
        return pd.DataFrame({"partition": [part], "written": [written],
                             "rows": [np.int64(rows)]})

    summary = (ds.groupby(part_col)
               .map_groups(write_part, batch_format="pandas")
               .to_pandas())
    return {
        "partitions_written": int(summary["written"].sum()),
        "partitions_total": int(len(summary)),
        "rows": int(summary["rows"].sum()),
    }
