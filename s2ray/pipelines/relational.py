"""Relational set operations and pivot (long->wide) operators.

The reference engine is a geometry library with no table algebra; these
operators complete the data-processing surface a user expects next to
the generic equi-joins in ``join.py``: INTERSECT/EXCEPT between row
sets, and conditional-aggregation pivots that turn a categorical column
into a wide feature matrix (the standard feature-engineering step in
front of training pipelines).

All three follow the engine's scale contract: per-batch vectorized
partials, shuffle keys that are digests or int64 ids (never document
bodies), category lists fixed up-front so output schemas are static,
and final groupbys bounded by key cardinality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

DOC_LANGS = ("de", "en", "es", "fr", "zh")
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def source_overlap(sf_dir: str, src_a: str = "src1", src_b: str = "src2"):
    """Distinct-text INTERSECT / EXCEPT between two document sources —
    ONE row (n_both, n_only_a, n_only_b).

    Scale design: rows outside the two sources are dropped in-batch at
    the read; each batch reduces its texts to distinct (content-digest,
    seen-in-a, seen-in-b) triples, so the one all-to-all moves ~18 B per
    distinct text (the exact_dedup digest contract, collision ~2^-64) —
    never a document body.  The digest groupby ORs the membership bits
    with two Max aggregates; a three-counter fold returns the scalars.
    """
    import ray.data
    from ray.data.aggregate import Max, Sum

    from ..sources.readers import read_table
    from .dedup import content_digest

    ds = read_table(sf_dir, "documents", columns=["text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_pandas()
        m = (src == src_a) | (src == src_b)
        if not m.any():
            return pa.table({"digest": pa.array([], type=pa.binary()),
                             "ba": pa.array([], type=pa.int64()),
                             "bb": pa.array([], type=pa.int64())})
        df = pd.DataFrame({
            "t": batch["text"].to_pandas()[m.to_numpy()],
            "a": (src[m] == src_a).to_numpy().astype(np.int64),
            "b": (src[m] == src_b).to_numpy().astype(np.int64),
        })
        g = df.groupby("t", sort=False, dropna=False) \
            .agg(ba=("a", "max"), bb=("b", "max")).reset_index()
        return pa.table({
            "digest": pa.array([content_digest(t) for t in g["t"]],
                               type=pa.binary()),
            "ba": pa.array(g["ba"].to_numpy().astype(np.int64)),
            "bb": pa.array(g["bb"].to_numpy().astype(np.int64)),
        })

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
              .groupby("digest")
              .aggregate(Max("ba"), Max("bb")))

    def fold(batch: pa.Table) -> pa.Table:
        ba = batch["max(ba)"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bb = batch["max(bb)"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "both": pa.array([int(((ba == 1) & (bb == 1)).sum())],
                             type=pa.int64()),
            "onlya": pa.array([int(((ba == 1) & (bb == 0)).sum())],
                              type=pa.int64()),
            "onlyb": pa.array([int(((ba == 0) & (bb == 1)).sum())],
                              type=pa.int64()),
        })

    s = (merged.map_batches(fold, batch_format="pyarrow",
                            batch_size=None)
         .aggregate(Sum("both"), Sum("onlya"), Sum("onlyb")))
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "n_both": pa.array([int(s["sum(both)"] or 0)], type=pa.int64()),
        "n_only_a": pa.array([int(s["sum(onlya)"] or 0)],
                             type=pa.int64()),
        "n_only_b": pa.array([int(s["sum(onlyb)"] or 0)],
                             type=pa.int64()),
    }))


def source_overlap_sql(src_a: str = "src1", src_b: str = "src2") -> str:
    """Oracle for :func:`source_overlap` — INTERSECT / EXCEPT mirrors."""
    return f"""
WITH a AS (SELECT DISTINCT text FROM documents WHERE source = '{src_a}'),
     b AS (SELECT DISTINCT text FROM documents WHERE source = '{src_b}')
SELECT
  (SELECT count(*) FROM (SELECT text FROM a INTERSECT
                         SELECT text FROM b)) AS n_both,
  (SELECT count(*) FROM (SELECT text FROM a EXCEPT
                         SELECT text FROM b)) AS n_only_a,
  (SELECT count(*) FROM (SELECT text FROM b EXCEPT
                         SELECT text FROM a)) AS n_only_b"""


def _pivot_counts(ds, key_col: str, cat_col: str, cats: tuple,
                  prefix: str, key_cast=None):
    """Shared long->wide pivot core: per-batch 2D bincount partials over
    a FIXED category list (static output schema; unseen/NULL categories
    fold into ``{prefix}other``), ONE key groupby summing each wide
    column.  Returns the grouped Dataset (key, {prefix}<cat>...,
    {prefix}other, {prefix}total)."""
    from ray.data.aggregate import Sum

    cat_arr = np.array(sorted(cats), dtype=object)
    ncat = len(cat_arr)
    cols = [f"{prefix}{c}" for c in cat_arr] + [f"{prefix}other",
                                                f"{prefix}total"]

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        if key_cast is not None:
            keys = pc.cast(keys, key_cast)
        kp = keys.to_pandas()
        cp = batch[cat_col].to_pandas().to_numpy(dtype=object)
        codes, uniques = pd.factorize(kp, use_na_sentinel=True)
        ok = codes >= 0
        codes, cp = codes[ok], cp[ok]
        cid = np.full(len(cp), ncat, dtype=np.int64)
        for i, c in enumerate(cat_arr):
            cid[cp == c] = i
        nk = len(uniques)
        mat = np.zeros((nk, ncat + 1), dtype=np.int64)
        np.add.at(mat, (codes, cid), 1)
        data = {key_col: pa.array(uniques)}
        for i, name in enumerate(cols[:-1]):
            data[name] = pa.array(mat[:, i])
        data[cols[-1]] = pa.array(mat.sum(axis=1))
        return pa.table(data)

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby(key_col)
            .aggregate(*[Sum(c, alias_name=c) for c in cols]))


def pivot_lang_counts(sf_dir: str, langs: tuple = DOC_LANGS):
    """Pivot the documents table long->wide: one row per source with a
    document count per language column — (source, n_de, ..., n_zh,
    n_other, n_total), sorted by source.

    The category list is FIXED up front (static schema — the pivot
    contract every engine imposes); languages outside it and NULLs land
    in n_other; NULL source rows are dropped (mirrored in the oracle —
    the pivot key must be a real group).  Per-batch partials are one factorize + one 2D bincount;
    the only exchange is the source-cardinality groupby.
    """
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "documents", columns=["source", "lang"])
    return _pivot_counts(ds, "source", "lang", langs, "n_") \
        .sort("source")


def pivot_lang_counts_sql(langs: tuple = DOC_LANGS) -> str:
    """Oracle for :func:`pivot_lang_counts` — conditional aggregation."""
    cats = sorted(langs)
    in_list = ", ".join(f"'{c}'" for c in cats)
    cols = ",\n       ".join(
        f"count(*) FILTER (WHERE lang = '{c}') AS n_{c}" for c in cats)
    return f"""
SELECT source,
       {cols},
       count(*) FILTER (WHERE lang IS NULL OR lang NOT IN ({in_list}))
         AS n_other,
       count(*) AS n_total
FROM documents
WHERE source IS NOT NULL
GROUP BY source ORDER BY source"""


def user_type_matrix(sf_dir: str, types: tuple = EVENT_TYPES):
    """Pivot the events table into a per-user feature matrix: one row
    per user with an event count per type column — (user_id, n_click,
    ..., n_view, n_other, n_total).  The standard long->wide feature-
    engineering step in front of a training pipeline.

    NULL users are dropped (the engine-wide user-key contract); unseen
    or NULL event types land in n_other.  Same pivot core as
    :func:`pivot_lang_counts`: factorize + 2D bincount per batch, ONE
    user-cardinality groupby.
    """
    from ..sources.readers import read_table
    from .analytics import _drop_null_users

    ds = (read_table(sf_dir, "events", columns=["user_id", "event_type"])
          .map_batches(_drop_null_users, batch_format="pyarrow",
                       batch_size=None))
    return _pivot_counts(ds, "user_id", "event_type", types, "n_",
                         key_cast=pa.int64())


def user_type_matrix_sql(types: tuple = EVENT_TYPES) -> str:
    """Oracle for :func:`user_type_matrix` — conditional aggregation."""
    cats = sorted(types)
    in_list = ", ".join(f"'{c}'" for c in cats)
    cols = ",\n       ".join(
        f"count(*) FILTER (WHERE event_type = '{c}') AS n_{c}"
        for c in cats)
    return f"""
SELECT user_id,
       {cols},
       count(*) FILTER (WHERE event_type IS NULL
                        OR event_type NOT IN ({in_list})) AS n_other,
       count(*) AS n_total
FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id"""
