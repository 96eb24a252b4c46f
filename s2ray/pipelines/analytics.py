"""Generic analytic operators over the pages/events/embeddings tables:
time-window aggregates, domain rollups, per-label embedding centroids.

All use the partial-then-merge pattern: vectorized in-batch aggregation
first, so the shuffle moves only (key, partial) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pages_per_month(pages_ds):
    """(month:timestamp, n_pages) from warc_ts."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["warc_ts"].to_numpy(zero_copy_only=False)
        months = ts.astype("datetime64[M]").astype(np.int64)  # months since epoch
        u, c = np.unique(months, return_counts=True)
        return pa.table({"mkey": pa.array(u), "partial_n": pa.array(c.astype(np.int64))})

    agg = (
        pages_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("mkey")
        .aggregate(Sum("partial_n", alias_name="n_pages"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        m = batch["mkey"].to_numpy(zero_copy_only=False)
        month = m.astype("datetime64[M]").astype("datetime64[us]")
        return pa.table({"month": pa.array(month), "n_pages": batch["n_pages"]})

    return agg.map_batches(finalize, batch_format="pyarrow")


def url_domain_counts(pages_ds):
    """(domain, n_pages) extracted from the url column."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        dom = pc.struct_field(
            pc.extract_regex(batch["url"], r"https://(?P<d>[^/]+)/"), "d")
        arr = np.asarray(dom.to_pandas(), dtype=object)
        u, c = np.unique(arr, return_counts=True)
        return pa.table({"domain": pa.array(u.tolist(), type=pa.string()),
                         "partial_n": pa.array(c.astype(np.int64))})

    return (
        pages_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("domain")
        .aggregate(Sum("partial_n", alias_name="n_pages"))
    )


def events_hourly(sf_dir: str):
    """Tumbling 1-hour window per event_type over the events stream table:
    (hour, event_type, n_events, sum_value)."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "h": batch["ts"].to_numpy(zero_copy_only=False)
                  .astype("datetime64[h]").astype(np.int64),
            "event_type": batch["event_type"].to_pandas(),
            "value": batch["value"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["h", "event_type"], sort=False).agg(
            n=("value", "size"), s=("value", "sum")).reset_index()
        return pa.table({
            "h": pa.array(g["h"].to_numpy()),
            "event_type": pa.array(g["event_type"], type=pa.string()),
            "partial_n": pa.array(g["n"].to_numpy().astype(np.int64)),
            "partial_s": pa.array(g["s"].to_numpy()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["h", "event_type"])
        .aggregate(Sum("partial_n", alias_name="n_events"),
                   Sum("partial_s", alias_name="sum_value"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_numpy(zero_copy_only=False)
        hour = h.astype("datetime64[h]").astype("datetime64[us]")
        sv = np.round(batch["sum_value"].to_numpy(zero_copy_only=False), 6)
        return pa.table({
            "hour": pa.array(hour),
            "event_type": batch["event_type"],
            "n_events": batch["n_events"],
            "sum_value": pa.array(sv, type=pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def embedding_centroids(sf_dir: str, ndigits: int = 4):
    """Per-label per-dimension centroid of the embedding column:
    (label, dim, centroid)."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch["label"].to_numpy(zero_copy_only=False)
        mat = np.stack(batch["embedding"].to_pandas().values).astype(np.float64)
        u = np.unique(labels)
        rows_l, rows_d, rows_s, rows_n = [], [], [], []
        for lab in u:
            sel = labels == lab
            s = mat[sel].sum(axis=0)
            n = int(sel.sum())
            dims = np.arange(1, mat.shape[1] + 1, dtype=np.int64)
            rows_l.append(np.full(mat.shape[1], lab, dtype=np.int64))
            rows_d.append(dims)
            rows_s.append(s)
            rows_n.append(np.full(mat.shape[1], n, dtype=np.int64))
        return pa.table({
            "label": pa.array(np.concatenate(rows_l)),
            "dim": pa.array(np.concatenate(rows_d)),
            "partial_s": pa.array(np.concatenate(rows_s)),
            "partial_n": pa.array(np.concatenate(rows_n)),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["label", "dim"])
        .aggregate(Sum("partial_s", alias_name="s"),
                   Sum("partial_n", alias_name="n"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        c = np.round(batch["s"].to_numpy(zero_copy_only=False)
                     / batch["n"].to_numpy(zero_copy_only=False), ndigits)
        return pa.table({
            "label": batch["label"],
            "dim": batch["dim"],
            "centroid": pa.array(c, type=pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")
