"""Source/sink format coverage: JSONL and CSV twins of the parquet read
path must round-trip every sf table type losslessly (incl. microsecond
timestamps) and feed operators identically."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("table,fmt", [
    ("events", "jsonl"), ("events", "csv"),
    ("documents", "jsonl"), ("documents", "csv"),
])
def test_text_format_roundtrip_lossless(ray_session, tmp_path, table, fmt):
    from s2ray.sources.readers import (read_csv, read_jsonl, read_table,
                                       write_csv, write_jsonl)

    schema = pq.read_schema(f"{SF}/{table}.parquet").remove_metadata()
    ds = read_table(SF, table)
    out = f"{tmp_path}/{table}_{fmt}"
    (write_jsonl if fmt == "jsonl" else write_csv)(ds, out)
    reader = read_jsonl if fmt == "jsonl" else read_csv
    back = reader(out, schema=schema).to_pandas()
    orig = ds.to_pandas()
    a, b = _canon(back), _canon(orig)
    assert list(a.columns) == list(b.columns)
    assert [str(t) for t in a.dtypes] == [str(t) for t in b.dtypes]
    for c in a.columns:
        assert a[c].astype(str).equals(b[c].astype(str)), (table, fmt, c)


def test_jsonl_feeds_operators_identically(ray_session, tmp_path):
    """An operator consuming the JSONL read must produce byte-identical
    results to the parquet path (types included — timestamps survive)."""
    import pyarrow as pa

    from s2ray.pipelines.text import text_stats
    from s2ray.sources.readers import read_jsonl, read_table, write_jsonl

    schema = pq.read_schema(f"{SF}/documents.parquet").remove_metadata()
    out = f"{tmp_path}/docs_jsonl"
    write_jsonl(read_table(SF, "documents"), out)
    a = (read_jsonl(out, schema=schema, columns=["doc_id", "text"])
         .map_batches(text_stats, batch_format="pyarrow",
                      batch_size=None).to_pandas())
    b = (read_table(SF, "documents", columns=["doc_id", "text"])
         .map_batches(text_stats, batch_format="pyarrow",
                      batch_size=None).to_pandas())
    a, b = _canon(a), _canon(b)
    for c in a.columns:
        assert a[c].astype(str).equals(b[c].astype(str)), c


def test_arrow_ipc_roundtrip(tmp_path, ray_session):
    """write_arrow_ipc -> read_arrow_ipc is a lossless roundtrip
    (timestamps, floats, strings) with column pruning on read."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s2ray.sources.readers import read_arrow_ipc, read_table, \
        write_arrow_ipc

    src = read_table("/root/testdata/sf0.001", "events")
    out = str(tmp_path / "ipc")
    n_files = write_arrow_ipc(src, out)
    assert n_files >= 1
    back = read_arrow_ipc(out).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    ref = pq.read_table("/root/testdata/sf0.001/events.parquet") \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    cols = sorted(ref.columns)
    assert list(back.columns.sort_values()) == cols
    for c in cols:
        a, b = np.asarray(back[c]), np.asarray(ref[c])
        if a.dtype.kind == "f":
            assert np.array_equal(a, b, equal_nan=True), c
        else:
            assert np.array_equal(a, b), c
    pruned = read_arrow_ipc(out, columns=["event_id", "value"]).schema()
    assert pruned.names == ["event_id", "value"]
