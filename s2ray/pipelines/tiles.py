"""Tile-assignment pipelines: pages -> S2 cells -> per-tile aggregates.

Flagship chain (SURVEY.md par.3.1 / par.7 step 2):
read pages -> extract_text -> extract_geotag -> drop html -> assign_cells
-> per-batch partial aggregation -> small global groupby (pre-aggregation
pattern: the all-to-all shuffle only moves (tile, partial_count) rows, never
pages).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.extract import extract_text_geo
from ..sources.pages import read_pages
from ..stages.assign import assign_cells


def pages_with_cells(sf_dir: str, repl: int = 1, token_level: int | None = 8,
                     **read_kwargs):
    """Dataset of pages with lat/lng + cell_id (+ level-K ancestor/token).

    Text + geotag extraction run as ONE fused regex pass over the html
    (extract_text_geo) — html is the memory-bandwidth hog of the flagship,
    so every extra scan of it costs real scaling headroom.
    """
    ds = read_pages(sf_dir, repl=repl, **read_kwargs)
    ds = ds.map_batches(extract_text_geo, batch_format="pyarrow",
                        batch_size=None)
    return ds.map_batches(
        assign_cells, fn_kwargs={"token_level": token_level},
        batch_format="pyarrow", batch_size=None,
    )


def _partial_tile_counts(batch: pa.Table, level: int) -> pa.Table:
    """Per-batch partial aggregate, COMPACT form: one row per batch holding
    the sorted (cell_key, count) arrays as binary blobs.

    np.unique instead of pa.Table.group_by (this pyarrow's hash aggregate is
    ~2000x slower than a sort-based unique on uint64), and blob-rows instead
    of one row per tile so the combine step is a log-depth merge of sorted
    arrays rather than a multi-million-row sort shuffle (Ray's sort-based
    Aggregate costs ~84us/row — it dominated the whole pipeline).  Binary
    blobs, not list<int64> columns: Ray's schema dedup can't hash list
    types (log spam + objectification through shuffles).
    """
    from ..kernel import keys

    col = f"cell_l{level}"
    ids = batch[col].to_numpy(zero_copy_only=False).astype(np.uint64)
    u, c = np.unique(ids, return_counts=True)
    return pa.table({
        "keys": pa.array([keys.to_key(u).tobytes()], type=pa.binary()),
        "counts": pa.array([c.astype(np.int64).tobytes()], type=pa.binary()),
    })


def _flat_list_col(batch: pa.Table, name: str) -> np.ndarray:
    blobs = batch[name].to_pylist()
    if not blobs:
        return np.empty(0, dtype=np.int64)
    return np.concatenate([np.frombuffer(b, dtype=np.int64) for b in blobs])


def _merge_partials(batch: pa.Table) -> pa.Table:
    """Merge compact partial rows: concatenate list values, re-aggregate.

    argsort + reduceat instead of np.unique(return_inverse) + bincount:
    12x faster on 10M-entry merges (no inverse permutation pass).
    """
    all_keys = _flat_list_col(batch, "keys")
    all_counts = _flat_list_col(batch, "counts")
    order = np.argsort(all_keys, kind="stable")
    k = all_keys[order]
    c = all_counts[order]
    if len(k) == 0:
        starts = np.empty(0, dtype=np.int64)
    else:
        starts = np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
    u = k[starts] if len(k) else k
    sums = np.add.reduceat(c, starts) if len(k) else c
    return pa.table({
        "keys": pa.array([u.tobytes()], type=pa.binary()),
        "counts": pa.array([sums.astype(np.int64).tobytes()],
                           type=pa.binary()),
    })


def tile_counts(sf_dir: str, level: int = 8, repl: int = 1, **read_kwargs):
    """Pages per level-K S2 tile: (cell_token, n_pages), Hilbert-sorted.

    Pre-aggregated per batch into compact sorted (keys, counts) list-rows,
    then tree-merged (fanout-controlled repartitions) instead of a sort
    shuffle; the final explode is already Hilbert-sorted because the merge
    preserves key order.  Keys travel as the order-preserving biased int64
    (s2ray.kernel.keys) because Ray Data pickles uint64 keys.
    """
    import ray

    ds = pages_with_cells(sf_dir, repl=repl, token_level=level, **read_kwargs)
    ds = ds.map_batches(
        _partial_tile_counts, fn_kwargs={"level": level},
        batch_format="pyarrow", batch_size=None,
    )
    # Tree reduction over compact partials: one intermediate merge level as
    # wide as the cluster, then the final merge.  (A range-bucketed variant
    # that parallelizes the final merge was tried; Ray's sort shuffle
    # handles the large binary payload rows poorly at scale.)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    mid = max(1, ncpu)
    ds = ds.repartition(mid).map_batches(_merge_partials,
                                         batch_format="pyarrow",
                                         batch_size=None)
    ds = ds.repartition(1).map_batches(_merge_partials,
                                       batch_format="pyarrow",
                                       batch_size=None)

    def finalize(batch: pa.Table) -> pa.Table:
        from ..kernel import cellid, keys

        k = _flat_list_col(batch, "keys")
        n = _flat_list_col(batch, "counts")
        ids = keys.from_key(k)
        toks = cellid.to_token(ids)
        return pa.table({
            "cell_id": pa.array(ids, type=pa.uint64()),
            "cell_token": pa.array(toks, type=pa.string()),
            "n_pages": pa.array(n, type=pa.int64()),
        })

    return ds.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def _partial_pyramid_counts(batch: pa.Table, levels) -> pa.Table:
    """Per-batch compact partials for EVERY pyramid level from one pass:
    the finest level's sorted unique (key, count) arrays are rolled up to
    each coarser level with parent bit-math + reduceat (parents of
    Hilbert-sorted ids are contiguous runs), so coarser levels cost O(tiles)
    extra, not another page scan."""
    from ..kernel import cellid, keys

    fine = max(levels)
    ids = batch[f"cell_l{fine}"].to_numpy(zero_copy_only=False).astype(np.uint64)
    u, c = np.unique(ids, return_counts=True)
    c = c.astype(np.int64)
    out_lv, out_k, out_c = [], [], []
    for lv in sorted(levels, reverse=True):
        if lv != fine and len(u):
            p = cellid.parent(u, lv)
            starts = np.concatenate(
                [[0], np.flatnonzero(p[1:] != p[:-1]) + 1])
            u = p[starts]
            c = np.add.reduceat(c, starts)
        out_lv.append(lv)
        out_k.append(keys.to_key(u).tobytes())
        out_c.append(c.tobytes())
    return pa.table({
        "level": pa.array(out_lv, type=pa.int64()),
        "keys": pa.array(out_k, type=pa.binary()),
        "counts": pa.array(out_c, type=pa.binary()),
    })


def _merge_pyramid_partials(batch: pa.Table) -> pa.Table:
    """Merge compact pyramid rows level-by-level (rows of different levels
    never mix); emits one compact row per level present."""
    lv = batch["level"].to_numpy(zero_copy_only=False)
    out_lv, out_k, out_c = [], [], []
    for level in np.unique(lv):
        sub = batch.filter(pa.array(lv == level))
        merged = _merge_partials(sub)
        out_lv.append(int(level))
        out_k.append(merged["keys"][0].as_py())
        out_c.append(merged["counts"][0].as_py())
    return pa.table({
        "level": pa.array(out_lv, type=pa.int64()),
        "keys": pa.array(out_k, type=pa.binary()),
        "counts": pa.array(out_c, type=pa.binary()),
    })


def tile_pyramid(sf_dir: str, levels=(8, 6, 4, 2), repl: int = 1,
                 **read_kwargs):
    """Tile counts at every pyramid level in ONE page scan:
    (level, cell_id, cell_token, n_pages).  The rollup l8->l6->l4->l2 is
    pure cell-id bit algebra on the per-batch partials (kernel parent), so
    the shuffle volume is the same compact blob rows as the flagship —
    levels add bytes, not passes."""
    import ray

    fine = max(levels)
    ds = pages_with_cells(sf_dir, repl=repl, token_level=fine, **read_kwargs)
    ds = ds.map_batches(
        _partial_pyramid_counts, fn_kwargs={"levels": tuple(levels)},
        batch_format="pyarrow", batch_size=None,
    )
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    ds = ds.repartition(max(1, ncpu)).map_batches(
        _merge_pyramid_partials, batch_format="pyarrow", batch_size=None)
    ds = ds.repartition(1).map_batches(
        _merge_pyramid_partials, batch_format="pyarrow", batch_size=None)

    def finalize(batch: pa.Table) -> pa.Table:
        from ..kernel import cellid, keys

        lv_col = batch["level"].to_numpy(zero_copy_only=False)
        lvs, idss, tokss, cnts = [], [], [], []
        for i, level in enumerate(lv_col):
            k = np.frombuffer(batch["keys"][i].as_py(), dtype=np.int64)
            n = np.frombuffer(batch["counts"][i].as_py(), dtype=np.int64)
            ids = keys.from_key(k)
            lvs.append(np.full(len(ids), level, dtype=np.int64))
            idss.append(ids)
            tokss.extend(cellid.to_token(ids))
            cnts.append(n)
        return pa.table({
            "level": pa.array(np.concatenate(lvs) if lvs else [],
                              type=pa.int64()),
            "cell_id": pa.array(
                np.concatenate(idss) if idss else [], type=pa.uint64()),
            "cell_token": pa.array(tokss, type=pa.string()),
            "n_pages": pa.array(np.concatenate(cnts) if cnts else [],
                                type=pa.int64()),
        })

    return ds.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def adaptive_tiles(sf_dir: str, levels=(4, 6, 8, 10), max_pages: int = 8,
                   repl: int = 1, **read_kwargs):
    """Adaptive (quadtree-style) tiling: starting at ``min(levels)``, a cell
    splits into its ``levels``-chain descendants while it holds more than
    ``max_pages`` pages; cells at ``max(levels)`` never split.  Output:
    (level, cell_id, cell_token, n_pages) — a DISJOINT set of cells whose
    counts sum to the page total (every page belongs to exactly one output
    cell).

    Equivalent per-page rule (this is what the SQL oracle mirrors): a page's
    adaptive cell is its ancestor at the SMALLEST level whose page count is
    <= max_pages, else its ``max(levels)`` cell.  Well-defined because counts
    are monotone non-increasing down a page's ancestor chain.

    Engine shape: ONE page scan producing the same compact per-level blob
    partials as tile_pyramid (coarser levels are parent bit algebra on the
    finest histogram, not extra scans), the same log-depth tree merge, and
    the adaptive selection runs on the merged histogram in the final task —
    bounded by the number of DISTINCT ``max(levels)`` cells (<= 6*4^L, ~6.3M
    at level 10; compact int64 arrays), never by corpus size.
    """
    import ray

    levels = tuple(sorted(levels))
    fine = max(levels)
    ds = pages_with_cells(sf_dir, repl=repl, token_level=fine, **read_kwargs)
    ds = ds.map_batches(
        _partial_pyramid_counts, fn_kwargs={"levels": levels},
        batch_format="pyarrow", batch_size=None,
    )
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    ds = ds.repartition(max(1, ncpu)).map_batches(
        _merge_pyramid_partials, batch_format="pyarrow", batch_size=None)
    ds = ds.repartition(1).map_batches(
        _merge_pyramid_partials, batch_format="pyarrow", batch_size=None)

    def finalize(batch: pa.Table) -> pa.Table:
        from ..kernel import cellid, keys

        lv_col = batch["level"].to_numpy(zero_copy_only=False)
        hist = {}
        for i, level in enumerate(lv_col):
            k = keys.from_key(
                np.frombuffer(batch["keys"][i].as_py(), dtype=np.int64))
            n = np.frombuffer(batch["counts"][i].as_py(), dtype=np.int64)
            hist[int(level)] = (k, n)
        u_f, c_f = hist.get(fine, (np.empty(0, np.uint64),
                                   np.empty(0, np.int64)))
        chosen = np.full(len(u_f), fine, dtype=np.int64)
        unset = np.ones(len(u_f), dtype=bool)
        for lv in levels[:-1] if len(u_f) else ():  # empty corpus: no hist
            anc = cellid.parent(u_f, lv)
            ids_l, cnt_l = hist[lv]
            cnt = cnt_l[np.searchsorted(ids_l, anc)]
            ok = unset & (cnt <= max_pages)
            chosen[ok] = lv
            unset &= ~ok
        out_id = u_f.copy()
        for lv in levels[:-1]:
            m = chosen == lv
            if m.any():
                out_id[m] = cellid.parent(u_f[m], lv)
        # ids at different levels never collide (lsb marker), and all fine
        # cells under one chosen ancestor agree on it (shared chain), so a
        # plain group-by-out_id sum reproduces each output cell's count
        order = np.argsort(out_id, kind="stable")
        key, cc, lvv = out_id[order], c_f[order], chosen[order]
        if len(key):
            starts = np.concatenate(
                [[0], np.flatnonzero(key[1:] != key[:-1]) + 1])
            ids = key[starts]
            sums = np.add.reduceat(cc, starts)
            out_lv = lvv[starts]
        else:
            ids = key
            sums = cc
            out_lv = lvv
        return pa.table({
            "level": pa.array(out_lv, type=pa.int64()),
            "cell_id": pa.array(ids, type=pa.uint64()),
            "cell_token": pa.array(cellid.to_token(ids), type=pa.string()),
            "n_pages": pa.array(sums, type=pa.int64()),
        })

    return ds.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def _partial_tile_counts_parted(batch: pa.Table, level: int,
                                partition_level: int) -> pa.Table:
    """Per-batch compact partials split by level-`partition_level` ancestor:
    one (part_key, keys_blob, counts_blob) row per partition per batch, so
    the partitioned-sink shuffle moves a bounded number of compact rows."""
    from ..kernel import cellid, keys

    col = f"cell_l{level}"
    ids = batch[col].to_numpy(zero_copy_only=False).astype(np.uint64)
    u, c = np.unique(ids, return_counts=True)
    # u is Hilbert-sorted, so equal partition ancestors are contiguous runs
    pk = keys.to_key(cellid.parent(u, partition_level))
    uk = keys.to_key(u)
    cc = c.astype(np.int64)
    if len(pk):
        starts = np.concatenate([[0], np.flatnonzero(pk[1:] != pk[:-1]) + 1,
                                 [len(pk)]])
    else:
        starts = np.array([0, 0])
    rows_p, rows_k, rows_c = [], [], []
    for s, e_ in zip(starts[:-1], starts[1:]):
        if e_ <= s:
            continue
        rows_p.append(int(pk[s]))
        rows_k.append(uk[s:e_].tobytes())
        rows_c.append(cc[s:e_].tobytes())
    return pa.table({
        "part": pa.array(rows_p, type=pa.int64()),
        "keys_b": pa.array(rows_k, type=pa.binary()),
        "counts_b": pa.array(rows_c, type=pa.binary()),
    })


def write_tiles_partitioned(sf_dir: str, out_dir: str, level: int = 8,
                            partition_level: int = 2, repl: int = 1):
    """Flagship output as resumable key-range-partitioned parquet: one
    directory per level-`partition_level` ancestor cell token (Hilbert key
    ranges), each with a sidecar manifest (rows, cell range, wall time) so a
    rerun can skip complete partitions (SURVEY.md par.4 resumable-output
    row).

    Fully distributed sink: per-batch compact partials are hash-shuffled by
    partition key and each partition is merged + written INSIDE its
    map_groups task (no driver-side collect; the driver only sees the
    one-row-per-partition manifest summary).  A rerun recomputes the
    aggregation but skips writing partitions whose manifest exists (writes
    are the expensive, non-idempotent part at scale; out_dir must be shared
    storage on a multi-node cluster).
    """
    import os
    import time as _time

    import pandas as pd

    t0 = _time.time()
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)

    ds = pages_with_cells(sf_dir, repl=repl, token_level=level)
    ds = ds.map_batches(
        _partial_tile_counts_parted,
        fn_kwargs={"level": level, "partition_level": partition_level},
        batch_format="pyarrow", batch_size=None,
    )

    def write_partition(df: pd.DataFrame) -> pd.DataFrame:
        from ..kernel import cellid, keys
        from ..state.sink import checkpointed_write

        part_key = np.int64(df["part"].iloc[0])
        pid = keys.from_key(np.array([part_key], dtype=np.int64))
        tok = str(cellid.to_token(pid)[0])
        # resume fast path: skip the blob merge entirely, not just the write
        if os.path.exists(os.path.join(out_dir, "_manifest", f"{tok}.json")):
            return pd.DataFrame({"partition": [tok], "written": [False],
                                 "rows": [0]})
        k = np.concatenate([np.frombuffer(x, dtype=np.int64)
                            for x in df["keys_b"]])
        c = np.concatenate([np.frombuffer(x, dtype=np.int64)
                            for x in df["counts_b"]])
        order = np.argsort(k, kind="stable")
        k, c = k[order], c[order]
        starts = (np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
                  if len(k) else np.empty(0, dtype=np.int64))
        u = k[starts] if len(k) else k
        sums = np.add.reduceat(c, starts) if len(k) else c
        ids = keys.from_key(u)
        toks = cellid.to_token(ids)
        tbl = pa.table({
            "cell_id": pa.array(ids, type=pa.uint64()),
            "cell_token": pa.array(toks, type=pa.string()),
            "n_pages": pa.array(sums, type=pa.int64()),
        })
        written, rows = checkpointed_write(
            out_dir, tok, f"cell={tok}", tbl, t0, filename="tiles.parquet",
            extra={
                "n_pages": int(sums.sum()) if len(sums) else 0,
                "cell_min": str(toks[0]) if len(toks) else None,
                "cell_max": str(toks[-1]) if len(toks) else None,
            })
        return pd.DataFrame({"partition": [tok], "written": [written],
                             "rows": [rows]})

    summary = (ds.groupby("part")
               .map_groups(write_partition, batch_format="pandas")
               .to_pandas())
    return {"partitions_written": int(summary["written"].sum()),
            "partitions_total": int(len(summary))}


def tile_top_lang(sf_dir: str, level: int = 6, repl: int = 1,
                  **read_kwargs):
    """Dominant category per tile: the most frequent page language in
    every level-``level`` cell — (cell_id, cell_token, top_lang,
    n_pages), ties broken by lexicographically smallest language (the
    deterministic argmax every dominant-category map layer needs).

    Shape: per-batch (cell, lang) partial counts (compact — bounded by
    tiles x languages, never pages), a Sum groupby at that same
    cardinality, then a per-cell argmax in map_groups.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = pages_with_cells(sf_dir, repl=repl, token_level=level,
                          **read_kwargs)
    col = f"cell_l{level}"

    def partial(batch: pa.Table) -> pa.Table:
        from ..kernel import keys

        ids = keys.to_key(batch[col].to_numpy(zero_copy_only=False)
                          .astype(np.uint64))
        lang = batch["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        d = lang.dictionary_encode()
        codes = np.asarray(d.indices, dtype=np.int64)
        uniq = np.asarray(d.dictionary, dtype=object)
        # lexsort pair grouping, NOT `ids * n + code` packing: biased
        # cell keys span the whole int64 range, so any multiply overflows
        if not len(ids):
            return pa.table({
                "ckey": pa.array([], type=pa.int64()),
                "lang": pa.array([], type=pa.string()),
                "pn": pa.array([], type=pa.int64()),
            })
        order = np.lexsort((codes, ids))
        si, sc = ids[order], codes[order]
        starts = np.concatenate(
            [[0], np.flatnonzero((si[1:] != si[:-1])
                                 | (sc[1:] != sc[:-1])) + 1,
             [len(si)]])
        return pa.table({
            "ckey": pa.array(si[starts[:-1]]),
            "lang": pa.array([uniq[int(c)] for c in sc[starts[:-1]]],
                             type=pa.string()),
            "pn": pa.array(np.diff(starts).astype(np.int64)),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby(["ckey", "lang"])
           .aggregate(Sum("pn", alias_name="n")))

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        from ..kernel import cellid, keys

        df = df.sort_values(["n", "lang"],
                            ascending=[False, True]).head(1)
        cid = keys.from_key(df["ckey"].to_numpy().astype(np.int64))
        return pd.DataFrame({
            "cell_id": cid.astype(np.uint64),
            "cell_token": cellid.to_token(cid),
            "top_lang": df["lang"].to_numpy(),
            "n_pages": df["n"].to_numpy().astype(np.int64),
        })

    return agg.groupby("ckey").map_groups(argmax, batch_format="pandas")


def tile_centroids(sf_dir: str, level: int = 6, **read_kwargs):
    """Discrete spherical centroid per level-``level`` tile — the
    aggregation analogue of the reference's S2::trueCentroid
    (S2.php:~560: sum of unit vectors, normalized): (cell_token,
    n_pages, c_lat, c_lng) where (c_lat, c_lng) is the direction of the
    vector sum of the tile's page points.  Unlike a naive lat/lng mean,
    this is correct across the antimeridian and near the poles.

    Exactness: each unit vector is quantized to 1e-9 fixed point with
    half-away rounding (matching SQL round()), so the per-tile vector
    sums are ORDER-FREE int64 aggregations — no float summation order to
    disagree on; the final atan2/degrees conversion runs on identical
    doubles on both engines.  int64 headroom: |q| <= 1e9, so sums stay
    exact to ~9e9 pages per tile.  Scale shape: per-batch per-cell
    partial sums (bounded by tiles-per-batch), one Sum groupby at tile
    cardinality, then a tile-sized finishing map.
    """
    from ray.data.aggregate import Sum

    from ..kernel import cellid, keys
    from .text import round_half_away

    ds = pages_with_cells(sf_dir, token_level=level, **read_kwargs)
    col = f"cell_l{level}"
    _S = 1_000_000_000.0

    def partial(batch: pa.Table) -> pa.Table:
        ids = keys.to_key(batch[col].to_numpy(zero_copy_only=False)
                          .astype(np.uint64))
        if not len(ids):
            return pa.table({
                "ckey": pa.array([], type=pa.int64()),
                "qx": pa.array([], type=pa.int64()),
                "qy": pa.array([], type=pa.int64()),
                "qz": pa.array([], type=pa.int64()),
                "pn": pa.array([], type=pa.int64()),
            })
        phi = np.radians(batch["lat"].to_numpy(zero_copy_only=False))
        theta = np.radians(batch["lng"].to_numpy(zero_copy_only=False))
        cp = np.cos(phi)
        qx = round_half_away(cp * np.cos(theta) * _S, 0).astype(np.int64)
        qy = round_half_away(cp * np.sin(theta) * _S, 0).astype(np.int64)
        qz = round_half_away(np.sin(phi) * _S, 0).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        si = ids[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(si[1:] != si[:-1]) + 1])
        return pa.table({
            "ckey": pa.array(si[starts]),
            "qx": pa.array(np.add.reduceat(qx[order], starts)),
            "qy": pa.array(np.add.reduceat(qy[order], starts)),
            "qz": pa.array(np.add.reduceat(qz[order], starts)),
            "pn": pa.array(np.add.reduceat(
                np.ones(len(si), dtype=np.int64), starts)),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("ckey")
           .aggregate(Sum("qx", alias_name="sx"),
                      Sum("qy", alias_name="sy"),
                      Sum("qz", alias_name="sz"),
                      Sum("pn", alias_name="n_pages")))

    def finish(batch: pa.Table) -> pa.Table:
        cid = keys.from_key(batch["ckey"].to_numpy(zero_copy_only=False)
                            .astype(np.int64))
        sx = batch["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = batch["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sz = batch["sz"].to_numpy(zero_copy_only=False).astype(np.float64)
        hyp = np.sqrt(sx * sx + sy * sy)
        return pa.table({
            "cell_token": pa.array(cellid.to_token(cid), type=pa.string()),
            "n_pages": batch["n_pages"],
            "c_lat": pa.array(round_half_away(
                np.degrees(np.arctan2(sz, hyp)))),
            "c_lng": pa.array(round_half_away(
                np.degrees(np.arctan2(sy, sx)))),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def tile_growth(sf_dir: str, level: int = 6, n_parts: int = 256):
    """Month-over-month page-count growth per S2 tile — (cell_token,
    month, n_pages, prev_n_pages, delta), the spatio-temporal LAG window
    behind change-detection map layers; a tile's first observed month
    takes prev = 0 (coalesce(lag(), 0) in the mirror — an all-int64
    contract, so neither engine ever surfaces a nullable numeric).

    Per-batch (cell, month) pre-aggregation bounds the shuffle at tiles x
    months rows per batch, then ONE cell-hash co-partition computes the
    lag locally (a tile's whole history lives in one group; months never
    cross cells).
    """
    import pandas as pd
    from ..kernel import cellid, keys

    col = f"cell_l{level}"
    ds = pages_with_cells(sf_dir, token_level=level)

    def partial(batch: pa.Table) -> pa.Table:
        ck = keys.to_key(batch[col].to_numpy(zero_copy_only=False))
        ts = batch["warc_ts"].to_numpy(zero_copy_only=False)
        m = ts.astype("datetime64[M]").astype(np.int64)
        df = pd.DataFrame({"ck": ck, "m": m})
        g = df.groupby(["ck", "m"], sort=False).size().reset_index(name="pn")
        ckv = g["ck"].to_numpy()
        return pa.table({
            "part": pa.array((ckv % n_parts).astype(np.int32)),
            "ck": pa.array(ckv, type=pa.int64()),
            "m": pa.array(g["m"].to_numpy().astype(np.int64)),
            "pn": pa.array(g["pn"].to_numpy().astype(np.int64)),
        })

    def lag_part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "cell_token": pd.Series(dtype=object),
                "month": pd.Series(dtype="datetime64[us]"),
                "n_pages": pd.Series(dtype=np.int64),
                "prev_n_pages": pd.Series(dtype="Int64"),
                "delta": pd.Series(dtype="Int64"),
            })
        g = df.groupby(["ck", "m"], sort=True)["pn"].sum().reset_index()
        ck = g["ck"].to_numpy().astype(np.int64)
        n = g["pn"].to_numpy().astype(np.int64)
        first = np.concatenate([[True], ck[1:] != ck[:-1]])
        prev = np.where(first, 0, np.concatenate([[0], n[:-1]]))
        ids = keys.from_key(ck)
        return pd.DataFrame({
            "cell_token": cellid.to_token(ids),
            "month": g["m"].to_numpy().astype("datetime64[M]")
                .astype("datetime64[us]"),
            "n_pages": n,
            "prev_n_pages": prev.astype(np.int64),
            "delta": (n - prev).astype(np.int64),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby("part")
            .map_groups(lag_part, batch_format="pandas"))


def quadrat_dispersion(sf_dir: str, level: int = 8):
    """Quadrat-count index of dispersion over the occupied level-K S2
    tiles — the classic point-pattern statistic (variance-to-mean ratio
    of quadrat counts: ~1 = Poisson/random, >1 = clustered, <1 =
    regular): ONE row (n_tiles, n_pages, vmr) with population variance
    over the OCCUPIED tiles (the standard empty-quadrat exclusion for
    unbounded study areas; documented, mirrored in the oracle).

    Exactness: vmr = var/mean = (T*S2 - S^2) / (T*S) with T = tile
    count, S = sum of counts, S2 = sum of squared counts, all exact
    Python big ints (HUGEINT in SQL), then ONE CAST-then-divide float
    rounded to 6.  The fold runs in the grid-bounded final merge task
    that tile_counts already produces (<= 6*4^K cells at level K, never
    corpus-sized).
    """
    from .text import round_half_away

    tc = tile_counts(sf_dir, level=level)

    def fold(batch: pa.Table) -> pa.Table:
        c = [int(x) for x in
             batch["n_pages"].to_numpy(zero_copy_only=False)]
        t = len(c)
        s = sum(c)
        s2 = sum(x * x for x in c)
        vmr = None if t * s == 0 else float(round_half_away(
            np.float64(float(t * s2 - s * s) / float(t * s)), 6))
        return pa.table({
            "n_tiles": pa.array([t], type=pa.int64()),
            "n_pages": pa.array([s], type=pa.int64()),
            "vmr": pa.array([vmr], type=pa.float64()),
        })

    return tc.repartition(1).map_batches(fold, batch_format="pyarrow",
                                         batch_size=None)


def lang_geo_bbox(sf_dir: str, **read_kwargs):
    """Per-language geographic summary: one row per lang with page
    count, lat/lng bounding box, and the discrete spherical centroid —
    (lang, n_pages, min_lat, max_lat, min_lng, max_lng, c_lat, c_lng).
    The dataset-profiling companion to :func:`tile_centroids`: same
    1e-9 fixed-point order-free vector sums (antimeridian/pole-safe),
    plus order-free min/max extents.

    Scale shape: per-batch per-lang partials (lang cardinality x 7
    numbers), ONE lang-cardinality groupby, tiny finishing map.
    """
    from ray.data.aggregate import Max, Min, Sum

    from .text import round_half_away

    ds = pages_with_cells(sf_dir, token_level=None, **read_kwargs)
    _S = 1_000_000_000.0

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        lang = batch["lang"].to_pandas()
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        codes, uniques = pd.factorize(lang, use_na_sentinel=False)
        phi = np.radians(lat)
        theta = np.radians(lng)
        cp = np.cos(phi)
        qx = round_half_away(cp * np.cos(theta) * _S, 0).astype(np.int64)
        qy = round_half_away(cp * np.sin(theta) * _S, 0).astype(np.int64)
        qz = round_half_away(np.sin(phi) * _S, 0).astype(np.int64)
        k = len(uniques)
        mnla = np.full(k, np.inf)
        mxla = np.full(k, -np.inf)
        mnlo = np.full(k, np.inf)
        mxlo = np.full(k, -np.inf)
        np.minimum.at(mnla, codes, lat)
        np.maximum.at(mxla, codes, lat)
        np.minimum.at(mnlo, codes, lng)
        np.maximum.at(mxlo, codes, lng)
        return pa.table({
            "lang": pa.array([str(u) for u in uniques],
                             type=pa.string()),
            "qx": pa.array(np.bincount(codes, weights=qx, minlength=k)
                           .astype(np.int64)),
            "qy": pa.array(np.bincount(codes, weights=qy, minlength=k)
                           .astype(np.int64)),
            "qz": pa.array(np.bincount(codes, weights=qz, minlength=k)
                           .astype(np.int64)),
            "pn": pa.array(np.bincount(codes, minlength=k)
                           .astype(np.int64)),
            "pmnla": pa.array(mnla), "pmxla": pa.array(mxla),
            "pmnlo": pa.array(mnlo), "pmxlo": pa.array(mxlo),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("lang")
           .aggregate(Sum("qx", alias_name="sx"),
                      Sum("qy", alias_name="sy"),
                      Sum("qz", alias_name="sz"),
                      Sum("pn", alias_name="n_pages"),
                      Min("pmnla", alias_name="min_lat"),
                      Max("pmxla", alias_name="max_lat"),
                      Min("pmnlo", alias_name="min_lng"),
                      Max("pmxlo", alias_name="max_lng")))

    def finish(batch: pa.Table) -> pa.Table:
        sx = batch["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = batch["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sz = batch["sz"].to_numpy(zero_copy_only=False).astype(np.float64)
        hyp = np.sqrt(sx * sx + sy * sy)
        return pa.table({
            "lang": batch["lang"],
            "n_pages": batch["n_pages"],
            "min_lat": batch["min_lat"], "max_lat": batch["max_lat"],
            "min_lng": batch["min_lng"], "max_lng": batch["max_lng"],
            "c_lat": pa.array(round_half_away(
                np.degrees(np.arctan2(sz, hyp)), 6)),
            "c_lng": pa.array(round_half_away(
                np.degrees(np.arctan2(sy, sx)), 6)),
        })

    return (agg.map_batches(finish, batch_format="pyarrow",
                            batch_size=None)
            .sort("lang"))


def lang_ellipse(sf_dir: str, **read_kwargs):
    """Standard deviational ellipse (Yuill 1971 — the ArcGIS
    "Directional Distribution" tool) per language: mean center,
    major-axis orientation, and the two axis standard deviations of each
    language's page cloud in planar lat/lng degrees — (lang, n_pages,
    mean_lat, mean_lng, theta_deg, sigma_major_deg, sigma_minor_deg).
    theta is the major-axis rotation from the +x (east) axis,
    0.5 * atan2(2*Cxy, Cxx - Cyy).

    Exactness: all six moments (n, Sx, Sy, Sxx, Syy, Sxy) accumulate
    over the pages synth's int64 1e-4-degree fixed-point coordinates —
    per-batch int64 partials (asserted < 2^63, same guard as
    corr_by_group) ride hi/lo-split lanes through ONE lang-cardinality
    groupby so the global sums cannot wrap at 100 TB; the driver
    reconstructs exact Python ints for the handful of languages.  The
    N^2-scaled central moments a = N*Sxx - Sx^2, b = N*Syy - Sy^2,
    c = N*Sxy - Sx*Sy are exact integers; each is cast to float64 once
    (SQL CAST(HUGEINT AS DOUBLE), round-to-nearest in both runtimes) and
    the eigen/rotation chain runs in the identical IEEE op order as the
    oracle: half = (a-b)/2, disc = sqrt(half*half + c*c),
    sigma = sqrt((a+b)/2 +- disc) / N / 1e4 (the +-disc eigenvalue is
    clamped at 0 on BOTH engines against 1-ulp negative residue).
    """
    import math

    from ray.data.aggregate import Sum

    from .text import round_half_away

    ds = pages_with_cells(sf_dir, token_level=None, **read_kwargs)

    def moments(batch: pa.Table) -> pa.Table:
        import pandas as pd

        lang = batch["lang"].to_pandas()
        x = batch["lng_e4"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch["lat_e4"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x):
            mx = max(int(np.abs(x).max()), int(np.abs(y).max()))
            assert mx * mx * len(x) < 2**63, (
                "lang_ellipse per-batch moment partial would exceed int64; "
                "lower batch_size")
        codes, uniques = pd.factorize(lang, use_na_sentinel=False)
        k = len(uniques)
        cols = {"lang": pa.array([str(u) for u in uniques],
                                 type=pa.string()),
                "pn": pa.array(np.bincount(codes, minlength=k)
                               .astype(np.int64))}
        # argsort+reduceat keeps the sums in int64 (bincount weights are
        # float64 and lose exactness past 2^53)
        order = np.argsort(codes, kind="stable")
        seg = codes[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(seg[1:] != seg[:-1]) + 1]) \
            if len(seg) else np.empty(0, np.int64)
        seg_ids = seg[starts.astype(np.int64)] if len(seg) else seg
        for nm, v in (("sx", x), ("sy", y), ("sxx", x * x),
                      ("syy", y * y), ("sxy", x * y)):
            s = np.zeros(k, dtype=np.int64)
            if len(seg):
                s[seg_ids] = np.add.reduceat(v[order], starts)
            cols[nm + "_hi"] = pa.array(s // np.int64(2**31))
            cols[nm + "_lo"] = pa.array(s % np.int64(2**31))
        return pa.table(cols)

    parts = [f"{c}_{h}" for c in ("sx", "sy", "sxx", "syy", "sxy")
             for h in ("hi", "lo")]
    m = (ds.map_batches(moments, batch_format="pyarrow", batch_size=None)
         .groupby("lang")
         .aggregate(Sum("pn", alias_name="pn"),
                    *[Sum(p, alias_name=p) for p in parts])).to_pandas()

    def _rec(r, c):
        return int(getattr(r, c + "_hi")) * 2**31 + int(getattr(r, c + "_lo"))

    out = {"lang": [], "n_pages": [], "mean_lat": [], "mean_lng": [],
           "theta_deg": [], "sigma_major_deg": [], "sigma_minor_deg": []}
    for r in m.itertuples():
        n = int(r.pn)
        sx, sy = _rec(r, "sx"), _rec(r, "sy")
        sxx, syy, sxy = _rec(r, "sxx"), _rec(r, "syy"), _rec(r, "sxy")
        fa = float(n * sxx - sx * sx)
        fb = float(n * syy - sy * sy)
        fc = float(n * sxy - sx * sy)
        dn = float(n)
        half = (fa - fb) / 2.0
        disc = math.sqrt(half * half + fc * fc)
        out["lang"].append(r.lang)
        out["n_pages"].append(n)
        out["mean_lat"].append(float(round_half_away(
            np.float64(float(sy) / dn / 10000.0))))
        out["mean_lng"].append(float(round_half_away(
            np.float64(float(sx) / dn / 10000.0))))
        out["theta_deg"].append(float(round_half_away(np.float64(
            math.degrees(0.5 * math.atan2(2.0 * fc, fa - fb))))))
        out["sigma_major_deg"].append(float(round_half_away(np.float64(
            math.sqrt((fa + fb) / 2.0 + disc) / dn / 10000.0))))
        out["sigma_minor_deg"].append(float(round_half_away(np.float64(
            math.sqrt(max((fa + fb) / 2.0 - disc, 0.0)) / dn / 10000.0))))
    order = np.argsort(np.asarray(out["lang"], dtype=object))
    return pa.table({
        "lang": pa.array(np.asarray(out["lang"], dtype=object)[order]
                         .tolist(), type=pa.string()),
        "n_pages": pa.array(np.asarray(out["n_pages"], dtype=np.int64)
                            [order]),
        "mean_lat": pa.array(np.asarray(out["mean_lat"])[order],
                             type=pa.float64()),
        "mean_lng": pa.array(np.asarray(out["mean_lng"])[order],
                             type=pa.float64()),
        "theta_deg": pa.array(np.asarray(out["theta_deg"])[order],
                              type=pa.float64()),
        "sigma_major_deg": pa.array(
            np.asarray(out["sigma_major_deg"])[order], type=pa.float64()),
        "sigma_minor_deg": pa.array(
            np.asarray(out["sigma_minor_deg"])[order], type=pa.float64()),
    })


def monthly_centroid(sf_dir: str, **read_kwargs):
    """Space-time centroid track: the discrete spherical centroid of the
    page cloud per crawl month — (month, n_pages, c_lat, c_lng) — the
    "is the crawl's geographic focus drifting?" monitoring primitive
    (the temporal companion of :func:`lang_geo_bbox`, same 1e-9
    fixed-point order-free vector sums, antimeridian/pole-safe).

    Scale shape: per-batch per-month partials (months x 4 numbers), ONE
    month-cardinality groupby, tiny finishing map.
    """
    from ray.data.aggregate import Sum

    from .text import round_half_away

    ds = pages_with_cells(sf_dir, token_level=None, **read_kwargs)
    _S = 1_000_000_000.0

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["warc_ts"].to_numpy(zero_copy_only=False)
        mkey = ts.astype("datetime64[M]").astype(np.int64)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        phi = np.radians(lat)
        theta = np.radians(lng)
        cp = np.cos(phi)
        qx = round_half_away(cp * np.cos(theta) * _S, 0).astype(np.int64)
        qy = round_half_away(cp * np.sin(theta) * _S, 0).astype(np.int64)
        qz = round_half_away(np.sin(phi) * _S, 0).astype(np.int64)
        u, inv = np.unique(mkey, return_inverse=True)
        k = len(u)
        ordr = np.argsort(inv, kind="stable")
        seg = inv[ordr]
        starts = np.concatenate(
            [[0], np.flatnonzero(seg[1:] != seg[:-1]) + 1]) \
            if len(seg) else np.empty(0, np.int64)
        cols = {"mkey": pa.array(u),
                "pn": pa.array(np.bincount(inv, minlength=k)
                               .astype(np.int64))}
        for nm, v in (("qx", qx), ("qy", qy), ("qz", qz)):
            s = np.zeros(k, dtype=np.int64)
            if len(seg):
                s[seg[starts.astype(np.int64)]] = \
                    np.add.reduceat(v[ordr], starts)
            cols[nm] = pa.array(s)
        return pa.table(cols)

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("mkey")
           .aggregate(Sum("qx", alias_name="sx"),
                      Sum("qy", alias_name="sy"),
                      Sum("qz", alias_name="sz"),
                      Sum("pn", alias_name="n_pages")))

    def finish(batch: pa.Table) -> pa.Table:
        m = batch["mkey"].to_numpy(zero_copy_only=False)
        sx = batch["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = batch["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sz = batch["sz"].to_numpy(zero_copy_only=False).astype(np.float64)
        hyp = np.sqrt(sx * sx + sy * sy)
        return pa.table({
            "month": pa.array(m.astype("datetime64[M]")
                              .astype("datetime64[us]")),
            "n_pages": batch["n_pages"],
            "c_lat": pa.array(round_half_away(
                np.degrees(np.arctan2(sz, hyp)), 6)),
            "c_lng": pa.array(round_half_away(
                np.degrees(np.arctan2(sy, sx)), 6)),
        })

    return (agg.map_batches(finish, batch_format="pyarrow",
                            batch_size=None)
            .sort("month"))


def tile_zipf(sf_dir: str, level: int = 8, **read_kwargs):
    """Rank-size law of tile populations: least-squares slope/intercept
    of ln(n_pages) vs ln(rank) over the occupied level-``level`` tiles
    — ONE row (n_tiles, total_pages, slope, intercept).  Urban-systems
    rank-size exponents sit near -1 (Zipf for cities); the geospatial
    twin of the vocabulary's zipf_slope, over the same tile-count core
    as tile_counts_l8.

    Exactness: tile counts are exact integers from the blob-compacted
    tile shuffle; ranks are count-descending (equal-count rank
    assignment provably cancels out of every moment, the zipf_slope
    argument) and the four regression moments fold ORDER-PINNED
    ascending rank, mirroring the oracle's list_reduce.
    """
    import math

    import ray.data

    from .text import round_half_away

    counts = tile_counts(sf_dir, level=level, **read_kwargs).to_pandas()
    n = np.sort(counts["n_pages"].to_numpy().astype(np.int64))[::-1]
    v = len(n)
    total = int(n.sum()) if v else 0
    slope = intercept = None
    if v:
        sx = sy = sxx = sxy = 0.0
        for i, f in enumerate(n.tolist(), start=1):   # ascending rank
            x = math.log(float(i))
            y = math.log(float(f))
            sx += x
            sy += y
            sxx += x * x
            sxy += x * y
        nf = float(v)
        den = nf * sxx - sx * sx
        if den != 0.0:
            sl = (nf * sxy - sx * sy) / den
            slope = float(round_half_away(np.float64(sl)))
            intercept = float(round_half_away(np.float64(
                (sy - sl * sx) / nf)))
    return ray.data.from_arrow(pa.table({
        "n_tiles": pa.array([v], type=pa.int64()),
        "total_pages": pa.array([total], type=pa.int64()),
        "slope": pa.array([slope], type=pa.float64()),
        "intercept": pa.array([intercept], type=pa.float64()),
    }))


def centroid_drift(sf_dir: str, **read_kwargs):
    """Month-over-month drift of the crawl's spherical centroid: the
    great-circle distance between consecutive monthly centroids —
    (month, n_pages, drift_m); the first month's drift is NULL.  The
    LAG layer over :func:`monthly_centroid`'s exact fixed-point track
    (drift spikes mark crawl-coverage regime changes).

    Exactness: consecutive distances are computed FROM THE ROUNDED
    6-dp centroid coordinates both engines already agree on bit-exactly,
    with the reference haversine chain mirrored op-for-op and mm
    rounding — so the LAG layer cannot reintroduce divergence.
    """
    import ray.data

    from .text import round_half_away

    m = monthly_centroid(sf_dir, **read_kwargs).to_pandas() \
        .sort_values("month", ignore_index=True)
    lat = np.radians(m["c_lat"].to_numpy().astype(np.float64))
    lng = np.radians(m["c_lng"].to_numpy().astype(np.float64))
    drift = np.full(len(m), np.nan)
    for i in range(1, len(m)):
        a, b = i - 1, i
        h = (1.0 - np.cos(lat[a] - lat[b])) / 2.0 \
            + np.cos(lat[a]) * np.cos(lat[b]) \
            * (1.0 - np.cos(lng[a] - lng[b])) / 2.0
        drift[i] = float(round_half_away(np.float64(
            2.0 * 6371000.0 * np.arcsin(np.sqrt(h)), ), 3))
    return ray.data.from_arrow(pa.table({
        "month": pa.array(m["month"]),
        "n_pages": pa.array(m["n_pages"].to_numpy().astype(np.int64)),
        "drift_m": pa.array([None if np.isnan(x) else float(x)
                             for x in drift], type=pa.float64()),
    }))


def lang_radius(sf_dir: str, beyond_m: float = 1_000_000.0,
                **read_kwargs):
    """Per-language dispersion radius: distance of every page to its
    language's spherical centroid — (lang, n_pages, max_dist_m,
    n_beyond); max great-circle radius plus the count of pages farther
    than ``beyond_m`` (how concentrated is each language's footprint).

    Two passes: per-lang fixed-point vector sums (the monthly_centroid
    1e-9 integer domain, order-free) give the driver each centroid,
    ROUNDED to the 6-dp coordinates both engines agree on bit-exactly;
    pass 2 broadcasts the tiny (lang, lat, lng) table and folds
    per-batch (max, beyond-count) partials — max is order-free IEEE,
    the beyond test compares mm-rounded doubles, so no float fold ever
    crosses batches.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Max, Sum

    from ..state.bcast import cached_get
    from .text import round_half_away

    ds = pages_with_cells(sf_dir, token_level=None, **read_kwargs)
    _S = 1_000_000_000.0

    def cpartial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        lang = batch["lang"].to_pandas()
        ok = lang.notna().to_numpy()
        lang = lang[ok].astype(str).to_numpy()
        lat = batch["lat"].to_numpy(zero_copy_only=False)[ok]
        lng = batch["lng"].to_numpy(zero_copy_only=False)[ok]
        phi = np.radians(lat)
        theta = np.radians(lng)
        cp = np.cos(phi)
        qx = round_half_away(cp * np.cos(theta) * _S, 0).astype(np.int64)
        qy = round_half_away(cp * np.sin(theta) * _S, 0).astype(np.int64)
        qz = round_half_away(np.sin(phi) * _S, 0).astype(np.int64)
        codes, uniq = pd.factorize(pd.Series(lang))
        k = len(uniq)
        out = {"lang": pa.array(uniq, type=pa.string())}
        for nm, v in (("qx", qx), ("qy", qy), ("qz", qz)):
            acc = np.zeros(k, dtype=np.int64)
            np.add.at(acc, codes, v)
            out[nm] = pa.array(acc)
        out["pn"] = pa.array(np.bincount(codes, minlength=k)
                             .astype(np.int64))
        return pa.table(out)

    cs = (ds.map_batches(cpartial, batch_format="pyarrow",
                         batch_size=None)
          .groupby("lang")
          .aggregate(Sum("qx", alias_name="sx"),
                     Sum("qy", alias_name="sy"),
                     Sum("qz", alias_name="sz"))).to_pandas() \
        .sort_values("lang", ignore_index=True)
    langs = cs["lang"].to_numpy()
    sx = cs["sx"].to_numpy().astype(np.float64)
    sy = cs["sy"].to_numpy().astype(np.float64)
    sz = cs["sz"].to_numpy().astype(np.float64)
    hyp = np.sqrt(sx * sx + sy * sy)
    clat = round_half_away(np.degrees(np.arctan2(sz, hyp)), 6)
    clng = round_half_away(np.degrees(np.arctan2(sy, sx)), 6)
    cmap = {lg: (float(a), float(b))
            for lg, a, b in zip(langs, clat, clng)}
    bc = ray.put(cmap)

    def dpartial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        cm = cached_get(bc)
        lang = batch["lang"].to_pandas()
        ok = lang.notna().to_numpy()
        lang = lang[ok].astype(str).to_numpy()
        lat = batch["lat"].to_numpy(zero_copy_only=False)[ok]
        lng = batch["lng"].to_numpy(zero_copy_only=False)[ok]
        ca = np.radians(np.array([cm[lg][0] for lg in lang]))
        co = np.radians(np.array([cm[lg][1] for lg in lang]))
        pa_ = np.radians(lat)
        po = np.radians(lng)
        h = (1.0 - np.cos(ca - pa_)) / 2.0 \
            + np.cos(ca) * np.cos(pa_) * (1.0 - np.cos(co - po)) / 2.0
        dm = round_half_away(2.0 * 6371000.0 * np.arcsin(np.sqrt(h)), 3)
        codes, uniq = pd.factorize(pd.Series(lang))
        k = len(uniq)
        mx = np.full(k, -1.0)
        np.maximum.at(mx, codes, dm)
        nb = np.zeros(k, dtype=np.int64)
        np.add.at(nb, codes, (dm > beyond_m).astype(np.int64))
        return pa.table({
            "lang": pa.array(uniq, type=pa.string()),
            "pm": pa.array(mx),
            "pb": pa.array(nb),
            "pn": pa.array(np.bincount(codes, minlength=k)
                           .astype(np.int64)),
        })

    m = (ds.map_batches(dpartial, batch_format="pyarrow",
                        batch_size=None)
         .groupby("lang")
         .aggregate(Sum("pn", alias_name="n_pages"),
                    Max("pm", alias_name="max_dist_m"),
                    Sum("pb", alias_name="n_beyond"))).to_pandas() \
        .sort_values("lang", ignore_index=True)
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "lang": pa.array(m["lang"], type=pa.string()),
        "n_pages": pa.array(m["n_pages"].to_numpy().astype(np.int64)
                            if len(m) else np.empty(0, np.int64)),
        "max_dist_m": pa.array(m["max_dist_m"].to_numpy()
                               .astype(np.float64) if len(m)
                               else np.empty(0, np.float64)),
        "n_beyond": pa.array(m["n_beyond"].to_numpy().astype(np.int64)
                             if len(m) else np.empty(0, np.int64)),
    }))


def tile_gini(sf_dir: str, level: int = 8, **read_kwargs):
    """Gini coefficient of tile populations: how unequally do pages
    spread over the occupied level-``level`` tiles — ONE row (n_tiles,
    total_pages, gini); ~0 uniform sprawl, ~1 a single megacity tile.
    The inequality summary next to :func:`tile_zipf`'s rank-size
    exponent (same tile-count core, same single-number monitoring use).

    Exactness: G = (2*S2 - (n+1)*S1) / (n*S1) over ascending-sorted
    exact integer counts; equal counts make the rank weighting
    permutation-invariant, so no tie-break is needed; all moments are
    Python big ints (S2 ~ n^2 * max_count would wrap int64 at a fine
    level) and ONE mirrored division reports it.
    """
    import ray.data

    from .text import round_half_away

    counts = tile_counts(sf_dir, level=level, **read_kwargs).to_pandas()
    x = np.sort(counts["n_pages"].to_numpy().astype(np.int64))
    n = len(x)
    s1 = sum(int(v) for v in x)
    s2 = sum((i + 1) * int(v) for i, v in enumerate(x))
    gini = (None if n * s1 == 0 else float(round_half_away(np.float64(
        float(2 * s2 - (n + 1) * s1) / float(n * s1)))))
    return ray.data.from_arrow(pa.table({
        "n_tiles": pa.array([n], type=pa.int64()),
        "total_pages": pa.array([s1], type=pa.int64()),
        "gini": pa.array([gini], type=pa.float64()),
    }))


def tile_entropy(sf_dir: str, level: int = 8, **read_kwargs):
    """Spatial entropy of the page distribution over occupied
    level-``level`` tiles — ONE row (n_tiles, total_pages, entropy) in
    nats; ln(n_tiles) is the uniform-sprawl ceiling.  The information
    summary next to tile_gini's inequality and tile_zipf's rank-size
    exponent (same tile-count core).

    Exactness: exact integer tile counts; the -sum p*ln(p) fold is
    ORDER-PINNED ascending cell id, mirrored by the oracle's
    list_reduce over the id-ordered term list.
    """
    import ray.data

    from .text import round_half_away

    counts = tile_counts(sf_dir, level=level, **read_kwargs).to_pandas() \
        .sort_values("cell_id", ignore_index=True)
    x = counts["n_pages"].to_numpy().astype(np.int64)
    n = len(x)
    total = sum(int(v) for v in x)
    acc = np.float64(0.0)
    if total:
        tf = np.float64(float(total))
        for v in x.tolist():           # occupied-tile-bounded fold
            p = np.float64(float(v)) / tf
            acc = acc + p * np.log(p)
    return ray.data.from_arrow(pa.table({
        "n_tiles": pa.array([n], type=pa.int64()),
        "total_pages": pa.array([total], type=pa.int64()),
        "entropy": pa.array([None if total == 0 else
                             float(round_half_away(-acc))],
                            type=pa.float64()),
    }))


def theil_decomposition(sf_dir: str, level: int = 8, **read_kwargs):
    """Theil-T inequality of tile populations DECOMPOSED by cube face —
    (face, n_tiles, n_pages, theil_within, between_term), one row per
    occupied S2 face.  Theil is the only standard inequality index that
    decomposes exactly (T = sum_g s_g*T_g + sum_g s_g*ln(mean_g/mean)),
    so this splits the crawl's spatial concentration into
    within-continent crowding vs between-continent imbalance — the
    question tile_gini's single number cannot answer.

    Exactness: tile counts are exact integers from the tile_counts
    core; face = top 3 bits of the cell id, derived from the FIRST HEX
    DIGIT of the token (nibble >> 1) identically on both engines; the
    within-face entropy folds are ORDER-PINNED ascending cell_token
    (libm ln, the tile_zipf contract) and the share/between terms are
    mirrored scalar float chains.

    Scale shape: everything past the tile-count shuffle is a
    tile-bounded driver fold.
    """
    import math

    import ray.data

    from .text import round_half_away

    counts = tile_counts(sf_dir, level=level, **read_kwargs).to_pandas()
    out = {"face": [], "n_tiles": [], "n_pages": [], "theil_within": [],
           "between_term": []}
    if len(counts):
        counts = counts.sort_values("cell_token", ignore_index=True)
        face = counts["cell_token"].str[0].map(
            lambda h: int(h, 16) >> 1).to_numpy()
        n = counts["n_pages"].to_numpy().astype(np.int64)
        big_x = int(n.sum())
        big_n = len(n)
        mean = float(big_x) / float(big_n)
        for f in sorted(set(face.tolist())):
            sel = face == f
            xs = n[sel]
            ng = int(sel.sum())
            xg = int(xs.sum())
            mg = float(xg) / float(ng)
            acc = 0.0
            for x_ in xs.tolist():          # ascending cell_token order
                r = float(x_) / mg
                acc = acc + r * math.log(r)
            tg = acc / float(ng)
            bt = (float(xg) / float(big_x)) * math.log(mg / mean)
            out["face"].append(int(f))
            out["n_tiles"].append(ng)
            out["n_pages"].append(xg)
            out["theil_within"].append(float(round_half_away(
                np.float64(tg))))
            out["between_term"].append(float(round_half_away(
                np.float64(bt))))
    return ray.data.from_arrow(pa.table({
        "face": pa.array(out["face"], type=pa.int64()),
        "n_tiles": pa.array(out["n_tiles"], type=pa.int64()),
        "n_pages": pa.array(out["n_pages"], type=pa.int64()),
        "theil_within": pa.array(out["theil_within"], type=pa.float64()),
        "between_term": pa.array(out["between_term"], type=pa.float64()),
    }))


def monthly_lang_js(sf_dir: str, **read_kwargs):
    """Month-over-month Jensen-Shannon drift of the crawl's language
    mix — (month, n_pages, js_prev): the JS divergence (nats) between
    each month's language distribution and the previous month's, NULL
    for the first month.  The temporal face of source_js_divergence
    (which compares two provenances at a point in time); a JS spike
    marks a crawl-composition regime change that per-language counts
    alone smear out.

    Exactness: (month, lang) counts are exact integers from ONE
    bounded groupby; each month-pair fold runs ORDER-PINNED ascending
    lang over the GLOBAL language set (zero-count terms exactly 0.0),
    with p/q/m and the 0.5*p*ln(p/m) elements in the oracle's exact op
    order (libm math.log — the source_js contract).  NULL lang drops.

    Scale shape: per-batch (month, lang) partials, a (months x langs)-
    bounded groupby, driver folds over the bounded grid.
    """
    import math

    import ray.data
    from ray.data.aggregate import Sum

    from .text import round_half_away

    ds = pages_with_cells(sf_dir, token_level=None, **read_kwargs)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch["lang"].null_count:
            batch = batch.filter(pc.is_valid(batch["lang"]))
        empty = pa.table({"mkey": pa.array([], type=pa.int64()),
                          "lang": pa.array([], type=pa.string()),
                          "pn": pa.array([], type=pa.int64())})
        if not len(batch):
            return empty
        ts = batch["warc_ts"].to_numpy(zero_copy_only=False)
        mkey = ts.astype("datetime64[M]").astype(np.int64)
        lang = batch["lang"].to_pandas().astype(str).to_numpy()
        import pandas as pd
        lcodes, luniq = pd.factorize(pd.Series(lang))
        # packing stride guard: > 4096 distinct languages in one batch
        # would silently collide counts (review finding)
        if len(luniq) > 4096:    # codes 0..4095 pack safely
            raise ValueError("monthly_lang_js: more than 4096 distinct "
                             "languages in one batch exceeds the "
                             "packing stride")
        packed = mkey * np.int64(4096) + lcodes
        u, cnt = np.unique(packed, return_counts=True)
        return pa.table({
            "mkey": pa.array((u // 4096).astype(np.int64)),
            "lang": pa.array(luniq[(u % 4096).astype(np.int64)],
                             type=pa.string()),
            "pn": pa.array(cnt.astype(np.int64)),
        })

    m = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby(["mkey", "lang"])
         .aggregate(Sum("pn", alias_name="n"))).to_pandas()
    out = {"month": [], "n_pages": [], "js_prev": []}
    if len(m):
        langs = sorted(m["lang"].unique().tolist())
        months = sorted(m["mkey"].unique().tolist())
        tab = {(int(r["mkey"]), r["lang"]): int(r["n"])
               for _, r in m.iterrows()}
        totals = {mo: sum(tab.get((mo, lg), 0) for lg in langs)
                  for mo in months}
        prev = None
        for mo in months:
            js = None
            if prev is not None and totals[prev] > 0 and totals[mo] > 0:
                fta = float(totals[prev])
                ftb = float(totals[mo])
                acc = 0.0
                for lg in langs:             # ascending lang order
                    a = tab.get((prev, lg), 0)
                    b = tab.get((mo, lg), 0)
                    p = float(a) / fta
                    q = float(b) / ftb
                    mm = 0.5 * (p + q)
                    el = 0.0
                    if a > 0:
                        el = 0.5 * (p * math.log(p / mm))
                    if b > 0:
                        el = el + 0.5 * (q * math.log(q / mm))
                    acc += el
                js = float(round_half_away(np.float64(acc), 6))
            out["month"].append(mo)
            out["n_pages"].append(totals[mo])
            out["js_prev"].append(js)
            prev = mo
    months_ts = np.array(out["month"], dtype=np.int64) \
        .astype("datetime64[M]").astype("datetime64[us]") \
        if out["month"] else np.empty(0, "datetime64[us]")
    return ray.data.from_arrow(pa.table({
        "month": pa.array(months_ts),
        "n_pages": pa.array(out["n_pages"], type=pa.int64()),
        "js_prev": pa.array(out["js_prev"], type=pa.float64()),
    }))


def cramers_v_lang_face(sf_dir: str, level: int = 8, **read_kwargs):
    """Cramér's V association between page language and S2 cube face —
    ONE row (n_pages, n_langs, n_faces, chi2, cramers_v): the
    normalized [0, 1] strength of the language-geography association
    (chi2_lang_source's effect-size companion; chi-square grows with N,
    V does not, so V is the number to monitor across crawl sizes).

    Exactness: the (lang, face) contingency is exact integers (face =
    first token nibble >> 1, the theil_decomposition rule); the
    chi-square fold is ORDER-PINNED ascending (lang, face) over the
    FULL zero-filled grid with e/d/el in the oracle's exact op order,
    and V = sqrt(chi2 / (N * (min(r,c) - 1))) is one mirrored chain.
    NULL lang drops.

    Scale shape: per-batch packed (lang, face) counts, a (langs x 6)-
    bounded groupby, scalar driver finish.
    """
    import math

    import pandas as pd
    import ray.data

    from .text import round_half_away

    ds = pages_with_cells(sf_dir, token_level=level, **read_kwargs)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from ray.data.aggregate import Sum  # noqa: F401

        if batch["lang"].null_count:
            batch = batch.filter(pc.is_valid(batch["lang"]))
        empty = pa.table({"lang": pa.array([], type=pa.string()),
                          "face": pa.array([], type=pa.int64()),
                          "pn": pa.array([], type=pa.int64())})
        if not len(batch):
            return empty
        # face = top 3 bits of the uint64 ancestor id — identical to the
        # oracle's first-token-nibble >> 1 rule by construction
        anc = batch["cell_l8"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        face = (anc >> np.uint64(61)).astype(np.int64)
        lang = batch["lang"].to_pandas().astype(str).to_numpy()
        lcodes, luniq = pd.factorize(pd.Series(lang))
        packed = lcodes.astype(np.int64) * 8 + face
        u, cnt = np.unique(packed, return_counts=True)
        return pa.table({
            "lang": pa.array(luniq[(u // 8).astype(np.int64)],
                             type=pa.string()),
            "face": pa.array((u % 8).astype(np.int64)),
            "pn": pa.array(cnt.astype(np.int64)),
        })

    from ray.data.aggregate import Sum

    h = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby(["lang", "face"])
         .aggregate(Sum("pn", alias_name="n"))).to_pandas()
    n_pages = int(h["n"].sum()) if len(h) else 0
    n_langs = int(h["lang"].nunique()) if len(h) else 0
    n_faces = int(h["face"].nunique()) if len(h) else 0
    chi2 = v = None
    if n_pages > 0 and n_langs > 1 and n_faces > 1:
        langs = sorted(h["lang"].unique().tolist())
        faces = sorted(int(x) for x in h["face"].unique())
        tab = {(r["lang"], int(r["face"])): int(r["n"])
               for _, r in h.iterrows()}
        rt = {lg: sum(tab.get((lg, f), 0) for f in faces) for lg in langs}
        ct = {f: sum(tab.get((lg, f), 0) for lg in langs) for f in faces}
        nf = float(n_pages)
        acc = 0.0
        for lg in langs:                     # ascending (lang, face)
            for f in faces:
                e = (float(rt[lg]) * float(ct[f])) / nf
                d = float(tab.get((lg, f), 0)) - e
                acc += (d * d) / e
        chi2 = float(round_half_away(np.float64(acc), 6))
        v = float(round_half_away(np.float64(math.sqrt(
            acc / (nf * float(min(n_langs, n_faces) - 1)))), 6))
    return ray.data.from_arrow(pa.table({
        "n_pages": pa.array([n_pages], type=pa.int64()),
        "n_langs": pa.array([n_langs], type=pa.int64()),
        "n_faces": pa.array([n_faces], type=pa.int64()),
        "chi2": pa.array([chi2], type=pa.float64()),
        "cramers_v": pa.array([v], type=pa.float64()),
    }))


def tile_month_jaccard(sf_dir: str, level: int = 8, **read_kwargs):
    """Spatial-coverage churn: the Jaccard similarity between the sets
    of occupied level-``level`` tiles in consecutive calendar months —
    (month, n_tiles, n_common_prev, jaccard_prev).  The geographic twin
    of day_user_jaccard: DAU-style tile counts can stay flat while the
    crawl wanders, and this is the statistic that sees the wandering.
    Comparison is against the strictly previous calendar month; a
    calendar gap yields NULL (no adjacent month to compare).

    Exactness: the distinct (month, tile) grid is exact from ONE
    bounded groupby (months x occupied tiles, <= 393k tiles at level
    8); intersection/union counts are integers and jaccard one
    mirrored division.

    Scale shape: per-batch distinct (month, ancestor) partials, the
    bounded grid groupby, driver set algebra over the grid.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from .text import round_half_away

    ds = pages_with_cells(sf_dir, token_level=level, **read_kwargs)
    col = f"cell_l{level}"

    def partial(batch: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if not len(batch):
            return pa.table({"mi": z, "cell": z, "pn": z})
        ts = batch["warc_ts"].to_numpy(zero_copy_only=False)
        mi = ts.astype("datetime64[M]").astype(np.int64)
        # int64 bit view of the uint64 ancestor: pure set identity (the
        # wrap for faces 4-5 is deterministic and never leaves the job)
        cell = batch[col].to_numpy(zero_copy_only=False) \
            .astype(np.uint64).view(np.int64)
        key = np.unique(np.stack([mi, cell], axis=1), axis=0)
        return pa.table({"mi": pa.array(key[:, 0]),
                         "cell": pa.array(key[:, 1]),
                         "pn": pa.array(np.ones(len(key), np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby(["mi", "cell"])
         .aggregate(Sum("pn", alias_name="n"))).to_pandas()
    out = {"month": [], "n_tiles": [], "n_common_prev": [],
           "jaccard_prev": []}
    if len(g):
        sets = {int(mi_): set(grp["cell"].astype(int))
                for mi_, grp in g.groupby("mi", sort=True)}
        for mi_ in sorted(sets):
            cur = sets[mi_]
            out["month"].append(mi_)
            out["n_tiles"].append(len(cur))
            prev = sets.get(mi_ - 1)
            if prev is None:
                out["n_common_prev"].append(None)
                out["jaccard_prev"].append(None)
            else:
                ni = len(cur & prev)
                out["n_common_prev"].append(ni)
                out["jaccard_prev"].append(float(round_half_away(
                    np.float64(float(ni)
                               / float(len(cur) + len(prev) - ni)))))
    months = np.array(out["month"], dtype=np.int64) \
        .astype("datetime64[M]").astype("datetime64[us]") \
        if out["month"] else np.empty(0, "datetime64[us]")
    return ray.data.from_arrow(pa.table({
        "month": pa.array(months),
        "n_tiles": pa.array(out["n_tiles"], type=pa.int64()),
        "n_common_prev": pa.array(out["n_common_prev"],
                                  type=pa.int64()),
        "jaccard_prev": pa.array(out["jaccard_prev"],
                                 type=pa.float64()),
    }))


def lang_tile_jaccard(sf_dir: str, level: int = 8, **read_kwargs):
    """Pairwise geographic-footprint similarity of languages: Jaccard
    between the occupied level-``level`` tile sets of every language
    pair — (lang1, lang2, n_tiles_1, n_tiles_2, n_common, jaccard),
    all ordered pairs of observed languages (zero-overlap pairs
    included).  The symmetric-matrix companion of lang_frontier (which
    counts adjacency contacts) and colocation_quotient (which scores
    point-level mixing): this one asks whether two languages even
    crawl the same places at tile granularity.

    Exactness: the distinct (lang, tile) grid is exact from ONE
    bounded groupby (langs x occupied tiles); set counts are integers
    and jaccard one mirrored division.  NULL lang drops.
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    from .text import round_half_away

    ds = pages_with_cells(sf_dir, token_level=level, **read_kwargs)
    col = f"cell_l{level}"

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch["lang"].null_count:
            batch = batch.filter(pc.is_valid(batch["lang"]))
        empty = pa.table({"lang": pa.array([], type=pa.string()),
                          "cell": pa.array([], type=pa.int64()),
                          "pn": pa.array([], type=pa.int64())})
        if not len(batch):
            return empty
        cell = batch[col].to_numpy(zero_copy_only=False) \
            .astype(np.uint64).view(np.int64)
        lang = batch["lang"].to_pandas().astype(str).to_numpy()
        lcodes, luniq = pd.factorize(pd.Series(lang))
        df = pd.DataFrame({"l": lcodes, "c": cell}).drop_duplicates()
        return pa.table({
            "lang": pa.array(luniq[df["l"].to_numpy()],
                             type=pa.string()),
            "cell": pa.array(df["c"].to_numpy().astype(np.int64)),
            "pn": pa.array(np.ones(len(df), np.int64)),
        })

    g = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby(["lang", "cell"])
         .aggregate(Sum("pn", alias_name="n"))).to_pandas()
    out = {"lang1": [], "lang2": [], "n_tiles_1": [], "n_tiles_2": [],
           "n_common": [], "jaccard": []}
    if len(g):
        sets = {lg: set(grp["cell"].astype(int))
                for lg, grp in g.groupby("lang", sort=True)}
        langs = sorted(sets)
        for i, a in enumerate(langs):
            for b in langs[i + 1:]:
                ni = len(sets[a] & sets[b])
                un = len(sets[a]) + len(sets[b]) - ni
                out["lang1"].append(a)
                out["lang2"].append(b)
                out["n_tiles_1"].append(len(sets[a]))
                out["n_tiles_2"].append(len(sets[b]))
                out["n_common"].append(ni)
                out["jaccard"].append(float(round_half_away(np.float64(
                    float(ni) / float(un)))) if un else None)
    return ray.data.from_arrow(pa.table({
        "lang1": pa.array(out["lang1"], type=pa.string()),
        "lang2": pa.array(out["lang2"], type=pa.string()),
        "n_tiles_1": pa.array(out["n_tiles_1"], type=pa.int64()),
        "n_tiles_2": pa.array(out["n_tiles_2"], type=pa.int64()),
        "n_common": pa.array(out["n_common"], type=pa.int64()),
        "jaccard": pa.array(out["jaccard"], type=pa.float64()),
    }))
