"""Generic equi-joins: broadcast hash join and co-partition shuffle join.

The spatial, as-of and interval joins in this engine are specialized; this
module provides the plain relational equi-join the same way a user of the
reference would expect to combine tables (documents x embeddings,
events x users, ...).

Plan selection mirrors the spatial-join split:
- broadcast_hash_join: small build side shipped once via ray.put, probe
  side streams through map_batches (no shuffle at all).  The default for
  dimension-table joins.
- copartition_hash_join: both sides hashed on the key into n_parts
  buckets, one groupby(part).map_groups does a pandas merge per bucket.
  For two large tables; shuffle volume = both tables once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _ipc_bytes(tbl: pa.Table) -> bytes:
    """One Arrow table -> one IPC-stream blob (the co-partition shuffle's
    unit of exchange)."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return sink.getvalue().to_pybytes()


def _ipc_table(b: bytes) -> pa.Table:
    return pa.ipc.open_stream(b).read_all()


def _part_of(key_arr: np.ndarray, n_parts: int) -> np.ndarray:
    """Deterministic partition of an int64 key (splitmix-style mix so
    sequential ids spread)."""
    h = key_arr.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(33)) % np.uint64(n_parts)).astype(np.int32)


def broadcast_hash_join(probe_ds, build_tbl: pa.Table, on: str,
                        build_on: str | None = None, how: str = "inner"):
    """probe_ds JOIN build_tbl, build side broadcast once per worker.

    build_tbl: a (small) pyarrow Table.  Output columns = probe columns +
    build columns (minus its key).  how: 'inner' or 'left'.
    """
    import ray

    build_on = build_on or on
    # ArrowDtype frames merge without the classic pandas null→float64
    # upcast, so int64 payloads (ids, hashes ≥ 2^53) survive a left join
    # bit-exactly and output dtypes match the inputs.
    build_df = (build_tbl.to_pandas(types_mapper=pd.ArrowDtype)
                .rename(columns={build_on: on}))
    build_ref = ray.put(build_df)

    def probe(batch: pa.Table) -> pa.Table:
        bd = _cached_build(build_ref)
        df = batch.to_pandas(types_mapper=pd.ArrowDtype)
        out = df.merge(bd, on=on, how=how, sort=False)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    return probe_ds.map_batches(probe, batch_format="pyarrow",
                                batch_size=None)


from ..state.bcast import cached_get as _cached_build  # shared worker cache


def _sorted_membership(keys_sorted: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Vectorized `v in keys_sorted` for int64 arrays (one searchsorted)."""
    if len(keys_sorted) == 0:
        return np.zeros(len(v), dtype=bool)
    pos = np.searchsorted(keys_sorted, v)
    return (pos < len(keys_sorted)) \
        & (keys_sorted[np.minimum(pos, len(keys_sorted) - 1)] == v)


def broadcast_semi_anti_join(probe_ds, keys, on: str, anti: bool = False):
    """SEMI (anti=False) / ANTI (anti=True) join against a broadcast key
    set: keep probe rows whose int64 key is / is not in ``keys``.

    Zero shuffle — the sorted distinct key array ships once per worker
    (ray.put + cache) and each batch filters with one searchsorted.  The
    membership-filter analog of broadcast_hash_join: right for seen-sets,
    allow/deny lists and eval-id sets that fit one heap.  For larger
    right sides use ``copartition_hash_join(how='semi'/'anti')``.
    """
    import ray

    ks = np.unique(np.asarray(keys, dtype=np.int64))
    keys_ref = ray.put(ks)

    def probe(batch: pa.Table, keys_ref=keys_ref) -> pa.Table:
        kk = _cached_build(keys_ref)
        v = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = _sorted_membership(kk, v)
        return batch.filter(pa.array(~hit if anti else hit))

    return probe_ds.map_batches(probe, batch_format="pyarrow",
                                batch_size=None)


def copartition_hash_join(left_ds, right_ds, on: str,
                          right_on: str | None = None,
                          n_parts: int = 64, how: str = "inner",
                          hot_keys=None, salt: int = 8):
    """Both sides hash-partitioned on the (int64) key; one pandas merge per
    bucket inside map_groups.  The key column must be int64 on both sides;
    non-key column names must not collide.

    how: 'inner' / 'left' / 'outer' (pandas merge per bucket — 'outer' is
    exact under co-partitioning: a key's rows from BOTH sides land in the
    same bucket, so unmatched right rows null-fill left columns locally;
    incompatible with ``hot_keys``, whose right-row replication would
    duplicate unmatched right rows), or 'semi' / 'anti'
    (membership filter of left rows per bucket — the right side is reduced
    to its key column before the shuffle, so only keys move; output = left
    columns only).  Semi/anti is the scale path when the right key set is
    too large to broadcast (cf. broadcast_semi_anti_join).

    Skew: pass ``hot_keys`` (an int64 array of keys too frequent for one
    bucket) and hot LEFT rows spread over ``salt`` sub-buckets while hot
    RIGHT rows are replicated into each — the same salting contract as the
    spatial shuffle join (cold keys pay nothing)."""
    right_on = right_on or on
    if how == "outer" and hot_keys is not None and len(hot_keys):
        # salting replicates hot RIGHT rows into every sub-bucket; an outer
        # merge would then emit one right-only copy per replica (wrong).
        raise ValueError("hot_keys salting is not supported with "
                         "how='outer' (right-row replication would "
                         "duplicate unmatched right rows)")
    if how in ("semi", "anti"):
        # only the right KEYS matter; drop payload columns pre-shuffle
        right_ds = right_ds.select_columns([right_on])
    hot = (np.asarray(sorted(hot_keys), dtype=np.int64)
           if hot_keys is not None and len(hot_keys) else None)

    lschema = left_ds.schema()
    rschema = right_ds.schema()
    lcols = list(lschema.names)
    rcols_renamed = [on if c == right_on else c for c in rschema.names]
    clash = (set(lcols) - {on}) & (set(rcols_renamed) - {on})
    if clash:
        raise ValueError(f"column collision across join sides: {clash}")
    lschema_clean = pa.schema(list(zip(lschema.names, lschema.types)))
    rschema_clean = pa.schema(list(zip(rcols_renamed, rschema.types)))

    # The shuffle moves ONE Arrow-IPC blob row per (batch, partition), not
    # one row per input row: Ray's sort shuffle costs ~80us/ROW, which
    # made raw-row co-partition joins the slowest stage of every pipeline
    # using them (measured 10x on dup_span_stats' analogous shuffle).
    def tag(side_val, rename_from=None):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.replace_schema_metadata(None)
            if rename_from and rename_from != on:
                names = [on if c == rename_from else c
                         for c in batch.column_names]
                batch = batch.rename_columns(names)
            out = batch
            k = out[on].to_numpy(zero_copy_only=False).astype(np.int64)
            salt_id = np.zeros(len(out), dtype=np.int64)
            if hot is not None:
                pos = np.searchsorted(hot, k)
                is_hot = (pos < len(hot)) & \
                    (hot[np.minimum(pos, len(hot) - 1)] == k)
                if side_val == 0:
                    # spread hot probe rows deterministically
                    salt_id = np.where(
                        is_hot, np.arange(len(out), dtype=np.int64) % salt,
                        0)
                elif is_hot.any():
                    # replicate hot build rows into every sub-bucket
                    rep_idx = np.nonzero(is_hot)[0]
                    extra = out.take(pa.array(np.repeat(rep_idx, salt - 1)))
                    extra_salt = np.tile(
                        np.arange(1, salt, dtype=np.int64), len(rep_idx))
                    out = pa.concat_tables([out, extra])
                    salt_id = np.concatenate([salt_id, extra_salt])
                    k = out[on].to_numpy(zero_copy_only=False) \
                        .astype(np.int64)
            part = (_part_of(k, n_parts).astype(np.int64) * np.int64(salt)
                    + salt_id).astype(np.int32)
            order = np.argsort(part, kind="stable")
            out = out.take(pa.array(order))
            part = part[order]
            if len(part):
                starts = np.concatenate(
                    [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
                     [len(part)]])
            else:
                starts = np.array([0, 0])
            rows_p, rows_b = [], []
            for s, e_ in zip(starts[:-1], starts[1:]):
                if e_ <= s:
                    continue
                rows_p.append(int(part[s]))
                rows_b.append(_ipc_bytes(out.slice(s, e_ - s)))
            return pa.table({
                "_part": pa.array(rows_p, type=pa.int32()),
                "_side": pa.array(np.full(len(rows_p), side_val,
                                          dtype=np.int8)),
                "_blob": pa.array(rows_b, type=pa.large_binary()),
            })
        return fn

    left = left_ds.map_batches(tag(0), batch_format="pyarrow",
                               batch_size=None)
    right = right_ds.map_batches(tag(1, rename_from=right_on),
                                 batch_format="pyarrow", batch_size=None)

    out_rcols = [c for c in rcols_renamed if c != on]

    def _concat_side(group: pa.Table, side_mask, schema) -> pa.Table:
        blobs = group.filter(side_mask)["_blob"]
        tabs = [_ipc_table(b.as_py()) for b in blobs]
        return pa.concat_tables(tabs) if tabs \
            else schema.empty_table()

    def merge(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False)
        ltab = _concat_side(group, pa.array(side == 0), lschema_clean)
        if how in ("semi", "anti"):
            # pure-Arrow membership filter: no pandas, no payload motion
            rtab = _concat_side(group, pa.array(side == 1), rschema_clean)
            rk = np.unique(rtab[on].to_numpy(zero_copy_only=False)
                           .astype(np.int64))
            v = ltab[on].to_numpy(zero_copy_only=False).astype(np.int64)
            hit = _sorted_membership(rk, v)
            return ltab.filter(pa.array(~hit if how == "anti" else hit))
        # Merge as ArrowDtype frames: no null→float64 upcast, so int64
        # payloads stay bit-exact and output dtypes match the input
        # schemas even for left-join null fills.
        rtab = _concat_side(group, pa.array(side == 1),
                            rschema_clean).select([on] + out_rcols)
        l = ltab.to_pandas(types_mapper=pd.ArrowDtype)
        r = rtab.to_pandas(types_mapper=pd.ArrowDtype)
        out = l.merge(r, on=on, how=how, sort=False)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    return (left.union(right)
            .groupby("_part")
            .map_groups(merge, batch_format="pyarrow"))


def revenue_by_nation(sf_dir: str, n_parts: int = 64,
                      broadcast_threshold_bytes: int = 64 * 1024 * 1024):
    """TPC-H-flavored relational pipeline (Q5 shape) over the lineitem /
    orders / customer / nation tables: revenue attributed to the ordering
    customer's nation.  Output: (n_name, revenue_microcents, n_items).

    Revenue is computed in the INTEGER domain —
    ``round(l_extendedprice*100) * round((1-l_discount)*100)`` — so every
    distributed partial sum is exact (float summation order never enters
    the result; the per-row rounding is bit-identical on both engines).

    Plan, sized for the TPC-H ratios (lineitem >> orders >> customer >>
    nation): lineitem is PRE-AGGREGATED per l_orderkey inside each batch
    before anything moves; the (orderkey-keyed) lineitem partials join
    orders x customer through the generic co-partition hash join; the
    25-row nation dim is broadcast; the final groupby is nation-sized.

    orders x customer picks its plan by the customer table's on-disk
    size (the optimizer rule every engine applies to dimension joins):
    below ``broadcast_threshold_bytes`` the (custkey -> nationkey) map
    broadcasts once per worker and the join is shuffle-free; above it,
    the co-partition exchange runs — the honest path at full TPC-H
    scale, where customer is ~1/10 of orders and never fits one heap.
    """
    import os as _os

    import ray

    from ..sources.readers import read_table

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust_bytes = _os.path.getsize(f"{sf_dir}/customer.parquet")

    def cust_cast(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch["c_custkey"],
            "c_nationkey": pc.cast(batch["c_nationkey"], pa.int64()),
        })

    if cust_bytes <= broadcast_threshold_bytes:
        import pyarrow.parquet as pq

        ct = pq.read_table(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
        ct = cust_cast(ct)
        oc = broadcast_hash_join(orders, ct, on="o_custkey",
                                 build_on="c_custkey", how="inner")
    else:
        cust = read_table(sf_dir, "customer",
                          columns=["c_custkey", "c_nationkey"])
        cust = cust.map_batches(cust_cast, batch_format="pyarrow",
                                batch_size=None)
        oc = copartition_hash_join(orders, cust, on="o_custkey",
                                   right_on="c_custkey", n_parts=n_parts)
    oc = oc.select_columns(["o_orderkey", "c_nationkey"])

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ext = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = (np.rint(ext * 100.0).astype(np.int64)
               * np.rint((1.0 - disc) * 100.0).astype(np.int64))
        u, inv = np.unique(ok, return_inverse=True)
        # float64 bincount accumulation is exact here: per-batch per-order
        # sums stay far below 2^53; the int64 cast locks it in
        return pa.table({
            "o_orderkey": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u)).astype(np.int64)),
            "items": pa.array(np.bincount(inv, minlength=len(u))
                              .astype(np.int64)),
        })

    li_agg = li.map_batches(li_partial, batch_format="pyarrow",
                            batch_size=None)
    j = copartition_hash_join(li_agg, oc, on="o_orderkey", n_parts=n_parts)

    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    names = dict(zip(nat["n_nationkey"].to_pylist(),
                     nat["n_name"].to_pylist()))
    names_ref = ray.put(names)

    def nation_partial(batch: pa.Table, names_ref=names_ref) -> pa.Table:
        from ..state.bcast import cached_get

        nm = cached_get(names_ref)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rev = batch["rev"].to_numpy(zero_copy_only=False)
        items = batch["items"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(nk, return_inverse=True)
        return pa.table({
            "n_name": pa.array([nm[int(x)] for x in u], type=pa.string()),
            "prev": pa.array(np.bincount(inv, weights=rev,
                                         minlength=len(u)).astype(np.int64)),
            "pitems": pa.array(np.bincount(inv, weights=items,
                                           minlength=len(u))
                               .astype(np.int64)),
        })

    from ray.data.aggregate import Sum

    return (j.map_batches(nation_partial, batch_format="pyarrow",
                          batch_size=None)
            .groupby("n_name")
            .aggregate(Sum("prev", alias_name="revenue_microcents"),
                       Sum("pitems", alias_name="n_items")))


def pricing_summary(sf_dir: str):
    """TPC-H Q1-shape pricing summary over lineitem: per (l_returnflag,
    l_linestatus) — item count, exact integer sums of quantity / base
    price cents / discounted price micro-cents, and the derived average
    quantity.  One streaming pass of per-batch partials (a handful of
    (flag, status) groups exist), then a group-count-sized Sum groupby.

    Quantities are integral doubles and prices are dollars.cents, so
    ``rint`` lifts every measure into int64 exactly; the only float op
    after that is the final avg division of two identical int64s on both
    engines.
    """
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table
    from .analytics import _dict_codes
    from .text import round_half_away

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        fcodes, fuq = _dict_codes(batch["l_returnflag"])
        scodes, suq = _dict_codes(batch["l_linestatus"])
        key = fcodes * np.int64(max(1, len(suq))) + scodes
        qty = np.rint(batch["l_quantity"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        price_c = np.rint(batch["l_extendedprice"]
                          .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        disc_c = np.rint((1.0 - batch["l_discount"]
                          .to_numpy(zero_copy_only=False)) * 100.0) \
            .astype(np.int64)
        u, inv = np.unique(key, return_inverse=True)
        n = len(u)
        # float64 bincount weights are exact only below 2^53: guard the
        # per-batch per-group bound so a huge block fails loudly rather
        # than silently losing microcents (review finding)
        if len(key):
            mx = int(np.max(price_c * disc_c))
            if mx * len(key) >= (1 << 53):
                raise ValueError("pricing_summary: per-batch weighted "
                                 "bincount would exceed float64 exact "
                                 "range; lower the block size")
        return pa.table({
            "l_returnflag": pa.array(
                [fuq[int(k) // max(1, len(suq))] for k in u],
                type=pa.string()),
            "l_linestatus": pa.array(
                [suq[int(k) % max(1, len(suq))] for k in u],
                type=pa.string()),
            "pq": pa.array(np.bincount(inv, weights=qty, minlength=n)
                           .astype(np.int64)),
            "pp": pa.array(np.bincount(inv, weights=price_c, minlength=n)
                           .astype(np.int64)),
            "pd": pa.array(np.bincount(
                inv, weights=price_c * disc_c, minlength=n)
                .astype(np.int64)),
            "pn": pa.array(np.bincount(inv, minlength=n).astype(np.int64)),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("pq", alias_name="sum_qty"),
                      Sum("pp", alias_name="sum_price_cents"),
                      Sum("pd", alias_name="sum_disc_microcents"),
                      Sum("pn", alias_name="n_items")))

    def finalize(batch: pa.Table) -> pa.Table:
        q = batch["sum_qty"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = batch["n_items"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return batch.append_column(
            "avg_qty", pa.array(round_half_away(q / np.maximum(1.0, n)),
                                type=pa.float64()))

    return agg.map_batches(finalize, batch_format="pyarrow",
                           batch_size=None)


def emb_integrity(sf_dir: str, n_parts: int = 64):
    """Referential-integrity audit between documents and embeddings —
    per side: (side, n_total, n_matched, n_missing), where matched means
    the id exists in the other table (doc_id == vec_id contract).  The
    standard pre-training sanity gate before any doc<->vector join.

    ONE id-hash co-partition of both id columns (ids only — never text or
    vectors), per-part vectorized set intersection, then a 2-row partial
    sum; both tables stream, nothing corpus-sized sits anywhere.
    """
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    embs = read_table(sf_dir, "embeddings", columns=["vec_id"])

    def tag(col, side):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch[col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({
                "part": pa.array((ids % n_parts).astype(np.int32)),
                "id": pa.array(ids),
                "side": pa.array(np.full(len(ids), side, dtype=np.int8)),
            })
        return fn

    both = docs.map_batches(tag("doc_id", 0), batch_format="pyarrow",
                            batch_size=None) \
        .union(embs.map_batches(tag("vec_id", 1), batch_format="pyarrow",
                                batch_size=None))

    def audit(df) -> pa.Table:
        # mirrors the oracle's LEFT JOIN under DUPLICATE ids (the very
        # corruption an integrity audit exists for): each left row
        # contributes max(1, matches) to n_total and matches to
        # n_matched — join fan-out semantics, not distinct-id counts
        d = np.sort(df.loc[df["side"] == 0, "id"].to_numpy()
                    .astype(np.int64))
        v = np.sort(df.loc[df["side"] == 1, "id"].to_numpy()
                    .astype(np.int64))

        def fanout(left, right):
            if not len(left):
                return np.int64(0), np.int64(0)
            lo = np.searchsorted(right, left, side="left")
            hi = np.searchsorted(right, left, side="right")
            matches = (hi - lo).astype(np.int64)
            return (np.int64(np.maximum(matches, 1).sum()),
                    np.int64(matches.sum()))

        td, md = fanout(d, v)
        tv, mv = fanout(v, d)
        return pa.table({
            "side": pa.array(["documents", "embeddings"]),
            "pn": pa.array(np.array([td, tv], dtype=np.int64)),
            "pm": pa.array(np.array([md, mv], dtype=np.int64)),
        })

    agg = (both.groupby("part").map_groups(audit, batch_format="pandas")
           .groupby("side")
           .aggregate(Sum("pn", alias_name="n_total"),
                      Sum("pm", alias_name="n_matched")))

    def finalize(batch: pa.Table) -> pa.Table:
        nt = batch["n_total"].to_numpy(zero_copy_only=False)
        nm = batch["n_matched"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "n_missing", pa.array((nt - nm).astype(np.int64)))

    return agg.map_batches(finalize, batch_format="pyarrow",
                           batch_size=None)


def cheapest_supplier(sf_dir: str, n_parts: int = 64):
    """Group-argmin retrieval join (the TPC-H Q2 shape): for every part,
    the supplier row(s) achieving the MINIMUM lineitem extended price —
    all ties kept, supplier name attributed.  Output: DISTINCT
    (partkey, suppkey, min_price, s_name).

    The shape SQL writes as ``JOIN (GROUP BY key, min(v))`` back onto the
    fact table: the aggregate alone loses WHICH row won; the retrieval
    join recovers the winning rows' other columns.

    min() is comparison-only, so float64 prices compare bit-identically
    on both engines (no arithmetic enters the result).

    Scale shape: ZERO fact-table shuffles.
    - Pass 1 streams lineitem once: per-batch partial min per partkey
      (batch-distinct keys out, never raw rows), then a partkey-sized
      groupby-min.  The min table is PART-dimension-sized (TPC-H
      part : lineitem ≈ 1 : 30), the same class this module already
      broadcasts for dimension joins — it ships once per worker via
      ray.put; a deployment whose group-key cardinality rivals the fact
      table should route through copartition_hash_join instead.
    - Pass 2 streams lineitem again: one searchsorted probe keeps rows
      equal to their key's min; a per-batch DISTINCT (partkey, suppkey,
      price) shrinks the emit to winners only, then one winner-sized
      hash co-partition finishes the global distinct.
    - supplier is a dimension: broadcast_hash_join attaches s_name.
    """
    import pyarrow.parquet as pq
    import ray

    from ..sources.readers import read_table

    cols = ["l_partkey", "l_suppkey", "l_extendedprice"]

    def _clean(batch: pa.Table) -> pa.Table:
        for c in cols:
            if batch[c].null_count:
                batch = batch.filter(pc.is_valid(batch[c]))
        return batch

    def partial_min(batch: pa.Table) -> pa.Table:
        batch = _clean(batch)
        df = pd.DataFrame({
            "k": batch["l_partkey"].to_numpy(zero_copy_only=False),
            "v": batch["l_extendedprice"].to_numpy(zero_copy_only=False)})
        g = df.groupby("k", sort=False)["v"].min().reset_index()
        return pa.table({"l_partkey": pa.array(g["k"].to_numpy()),
                         "mn": pa.array(g["v"].to_numpy())})

    mins = (read_table(sf_dir, "lineitem", columns=cols)
            .map_batches(partial_min, batch_format="pyarrow",
                         batch_size=None)
            .groupby("l_partkey").min("mn"))
    mt = pa.concat_tables([ray.get(r) for r in mins.to_arrow_refs()])
    vcol = [c for c in mt.column_names if c != "l_partkey"][0]
    mk = mt["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    mv = mt[vcol].to_numpy(zero_copy_only=False)
    order = np.argsort(mk, kind="stable")
    min_ref = ray.put((mk[order], mv[order]))

    def keep_winners(batch: pa.Table) -> pa.Table:
        kk, vv = _cached_build(min_ref)
        batch = _clean(batch)
        k = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        if len(kk) == 0:
            win = np.zeros(len(k), dtype=bool)
        else:
            pos = np.minimum(np.searchsorted(kk, k), len(kk) - 1)
            # every pass-2 key exists in the pass-1 min table (same
            # _clean); the key check is correctness belt-and-braces
            win = (kk[pos] == k) & (v == vv[pos])
        df = pd.DataFrame({
            "partkey": k[win],
            "suppkey": batch["l_suppkey"].to_numpy(
                zero_copy_only=False)[win].astype(np.int64),
            "min_price": v[win]}).drop_duplicates()
        h = (df["partkey"].to_numpy() * np.int64(2654435761)
             + df["suppkey"].to_numpy()) % n_parts
        # strip the pandas schema metadata: Ray's shuffle schema dedup
        # can't hash dict-valued metadata (log spam per reduce task)
        return pa.Table.from_pandas(
            df.assign(part=h.astype(np.int32)),
            preserve_index=False).replace_schema_metadata(None)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["partkey", "suppkey"]) \
            .drop(columns=["part"]).reset_index(drop=True)

    winners = (read_table(sf_dir, "lineitem", columns=cols)
               .map_batches(keep_winners, batch_format="pyarrow",
                            batch_size=None)
               .groupby("part")
               .map_groups(finish, batch_format="pandas"))

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])
    return broadcast_hash_join(winners, sup, on="suppkey",
                               build_on="s_suppkey", how="inner")


CHEAPEST_SUPPLIER_SQL = """
WITH m AS (SELECT l_partkey, min(l_extendedprice) AS min_price
           FROM lineitem
           WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
             AND l_extendedprice IS NOT NULL
           GROUP BY 1)
SELECT DISTINCT m.l_partkey AS partkey, l.l_suppkey AS suppkey,
       m.min_price, s.s_name
FROM m
JOIN lineitem l ON l.l_partkey = m.l_partkey
               AND l.l_extendedprice = m.min_price
JOIN supplier s ON s.s_suppkey = l.l_suppkey"""


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1998-06-01", k: int = 10,
                      n_parts: int = 64,
                      broadcast_threshold_bytes: int = 64 * 1024 * 1024):
    """TPC-H Q3 shape (shipping priority): top-``k`` unshipped orders of a
    market segment by integer-exact revenue — (l_orderkey,
    revenue_microcents, o_orderdate, o_orderpriority), ranked
    (revenue DESC, l_orderkey ASC) so the cut is deterministic under
    ties.  (o_orderpriority stands in for the reference schema's
    o_shippriority, which the synth does not carry.)

    Revenue uses the Q5 integer-domain rule — round(p*100) *
    round((1-d)*100) summed in int64 — so distributed partial order
    never touches the result.  Plan, sized for the TPC-H ratios:
    lineitem (the fact) is date-filtered and PRE-AGGREGATED per
    l_orderkey inside each batch before anything moves; the dimension
    side (segment customers -> date-filtered orders) either broadcasts
    (both dims below ``broadcast_threshold_bytes``) or runs as two
    co-partition joins (semi on custkey, inner on orderkey) — the
    honest path at full scale.  Top-k = per-block local top-k, then one
    k-row final merge (never a global sort).
    """
    import os as _os

    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    cut = np.datetime64(cutoff)
    cut_us = cut.astype("datetime64[us]").astype(np.int64)

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice",
                             "l_discount", "l_shipdate"])

    def li_partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        keep = sd > cut_us
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        ext = batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        rev = (np.rint(ext * 100.0).astype(np.int64)
               * np.rint((1.0 - disc) * 100.0).astype(np.int64))
        u, inv = np.unique(ok, return_inverse=True)
        return pa.table({
            "o_orderkey": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64)),
        })

    li_agg = li.map_batches(li_partial, batch_format="pyarrow",
                            batch_size=None)

    dim_bytes = (_os.path.getsize(f"{sf_dir}/customer.parquet")
                 + _os.path.getsize(f"{sf_dir}/orders.parquet"))

    def orders_cast(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        keep = od < cut_us
        return pa.table({
            "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64())
                .filter(pa.array(keep)),
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64())
                .filter(pa.array(keep)),
            "odate_us": pa.array(od[keep], type=pa.int64()),
            "o_orderpriority": batch["o_orderpriority"]
                .filter(pa.array(keep)),
        })

    if dim_bytes <= broadcast_threshold_bytes:
        import pyarrow.parquet as pq

        ct = pq.read_table(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
        keys = np.sort(pc.cast(
            ct.filter(pc.equal(ct["c_mktsegment"], segment))["c_custkey"],
            pa.int64()).to_numpy(zero_copy_only=False))
        ot = orders_cast(pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate",
                     "o_orderpriority"]))
        ck = ot["o_custkey"].to_numpy(zero_copy_only=False)
        ot = ot.filter(pa.array(_sorted_membership(keys, ck))) \
            .drop_columns(["o_custkey"])
        j = broadcast_hash_join(li_agg, ot, on="o_orderkey", how="inner")
    else:
        cust = (read_table(sf_dir, "customer",
                           columns=["c_custkey", "c_mktsegment"])
                .map_batches(lambda b: pa.table({
                    "c_custkey": pc.cast(b.filter(pc.equal(
                        b["c_mktsegment"], segment))["c_custkey"],
                        pa.int64())}),
                    batch_format="pyarrow", batch_size=None))
        orders = (read_table(sf_dir, "orders",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_orderpriority"])
                  .map_batches(orders_cast, batch_format="pyarrow",
                               batch_size=None))
        orders_f = copartition_hash_join(
            orders, cust, on="o_custkey", right_on="c_custkey",
            n_parts=n_parts, how="semi").drop_columns(["o_custkey"])
        j = copartition_hash_join(li_agg, orders_f, on="o_orderkey",
                                  n_parts=n_parts, how="inner")

    agg = (j.groupby(["o_orderkey", "odate_us", "o_orderpriority"])
           .aggregate(Sum("rev", alias_name="revenue_microcents")))

    def topk(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return batch
        rev = batch["revenue_microcents"] \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((okey, -rev))[:k]
        return batch.take(pa.array(order))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch["o_orderkey"],
            "revenue_microcents": batch["revenue_microcents"],
            "o_orderdate": pa.array(
                batch["odate_us"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")),
            "o_orderpriority": batch["o_orderpriority"],
        })

    return (agg.map_batches(topk, batch_format="pyarrow",
                            batch_size=None)
            .repartition(1)
            .map_batches(topk, batch_format="pyarrow", batch_size=None)
            .map_batches(finalize, batch_format="pyarrow",
                         batch_size=None))


def shipping_priority_sql(segment: str = "BUILDING",
                          cutoff: str = "1998-06-01",
                          k: int = 10) -> str:
    """Oracle for :func:`shipping_priority` — the Q3 join with the Q5
    integer revenue rule and the deterministic (rev DESC, key) cut."""
    return f"""
SELECT l.l_orderkey AS l_orderkey,
  CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
           * CAST(round((1 - l.l_discount) * 100, 0) AS BIGINT))
       AS BIGINT) AS revenue_microcents,
  o.o_orderdate, o.o_orderpriority
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = '{segment}'
  AND o.o_orderdate < TIMESTAMP '{cutoff}'
  AND l.l_shipdate > TIMESTAMP '{cutoff}'
GROUP BY 1, 3, 4
ORDER BY revenue_microcents DESC, l_orderkey
LIMIT {k}"""


def returned_items(sf_dir: str, start: str = "1996-01-01",
                   end: str = "1996-04-01", k: int = 20,
                   n_parts: int = 64,
                   broadcast_threshold_bytes: int = 64 * 1024 * 1024):
    """TPC-H Q10 shape (returned-item reporting): top-``k`` customers by
    integer-exact revenue from RETURNED lineitems of orders placed in
    [start, end) — (c_custkey, c_name, revenue_microcents, c_acctbal,
    n_name), ranked (revenue DESC, c_custkey ASC).

    Scale plan: lineitem is returnflag-filtered and pre-aggregated per
    l_orderkey inside each batch before anything moves; the date-filtered
    orders side broadcasts under the threshold or co-partitions above it;
    revenue is then re-keyed per customer in ONE custkey-sized groupby and
    cut to k with the Q3 two-level local-top-k merge.  Customer and nation
    attributes are attached LAST, to exactly k rows, via a key-filtered
    parquet read — the customer table (the largest dimension at 100 TB)
    never ships.  Revenue uses the Q5 integer-domain rule (round(p*100) *
    round((1-d)*100) summed in int64) so partial order never matters.
    """
    import os as _os

    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    s_us = np.datetime64(start).astype("datetime64[us]").astype(np.int64)
    e_us = np.datetime64(end).astype("datetime64[us]").astype(np.int64)

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice",
                             "l_discount", "l_returnflag"])

    def li_partial(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["l_returnflag"], "R")
        b = batch.filter(keep)
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ext = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = (np.rint(ext * 100.0).astype(np.int64)
               * np.rint((1.0 - disc) * 100.0).astype(np.int64))
        u, inv = np.unique(ok, return_inverse=True)
        return pa.table({
            "o_orderkey": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64)),
        })

    li_agg = li.map_batches(li_partial, batch_format="pyarrow",
                            batch_size=None)

    def orders_cast(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        keep = (od >= s_us) & (od < e_us)
        return pa.table({
            "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64())
                .filter(pa.array(keep)),
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64())
                .filter(pa.array(keep)),
        })

    if (_os.path.getsize(f"{sf_dir}/orders.parquet")
            <= broadcast_threshold_bytes):
        ot = orders_cast(pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"]))
        j = broadcast_hash_join(li_agg, ot, on="o_orderkey", how="inner")
    else:
        orders = (read_table(sf_dir, "orders",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])
                  .map_batches(orders_cast, batch_format="pyarrow",
                               batch_size=None))
        j = copartition_hash_join(li_agg, orders, on="o_orderkey",
                                  n_parts=n_parts, how="inner")

    agg = (j.groupby("o_custkey")
           .aggregate(Sum("rev", alias_name="revenue_microcents")))

    def topk(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return batch
        rev = batch["revenue_microcents"] \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((ck, -rev))[:k]
        return batch.take(pa.array(order))

    top = (agg.map_batches(topk, batch_format="pyarrow", batch_size=None)
           .repartition(1)
           .map_batches(topk, batch_format="pyarrow", batch_size=None)
           .take_all())          # <= k rows by construction

    ck = np.array([r["o_custkey"] for r in top], dtype=np.int64)
    rev = np.array([r["revenue_microcents"] for r in top], dtype=np.int64)
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filters=[("c_custkey", "in", ck.tolist())])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    ckeys = pc.cast(cust["c_custkey"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    pos = {int(c): i for i, c in enumerate(ckeys)}
    idx = np.array([pos[int(c)] for c in ck], dtype=np.int64)
    nkeys = pc.cast(nat["n_nationkey"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    npos = {int(n): i for i, n in enumerate(nkeys)}
    cnat = pc.cast(cust["c_nationkey"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    nidx = np.array([npos[int(cnat[i])] for i in idx], dtype=np.int64)
    out = pa.table({
        "c_custkey": pa.array(ck),
        "c_name": cust["c_name"].take(pa.array(idx)),
        "revenue_microcents": pa.array(rev),
        "c_acctbal": cust["c_acctbal"].take(pa.array(idx)),
        "n_name": nat["n_name"].take(pa.array(nidx)),
    })
    return ray.data.from_arrow(out)


def returned_items_sql(start: str = "1996-01-01", end: str = "1996-04-01",
                       k: int = 20) -> str:
    """Oracle for :func:`returned_items` — the Q10 join with the Q5
    integer revenue rule and the deterministic (rev DESC, custkey) cut."""
    return f"""
SELECT c.c_custkey, c.c_name,
  CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
           * CAST(round((1 - l.l_discount) * 100, 0) AS BIGINT))
       AS BIGINT) AS revenue_microcents,
  c.c_acctbal, n.n_name
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '{start}'
  AND o.o_orderdate < TIMESTAMP '{end}'
GROUP BY 1, 2, 4, 5
ORDER BY revenue_microcents DESC, c_custkey
LIMIT {k}"""


def promo_revenue(sf_dir: str, start: str = "1996-03-01",
                  end: str = "1996-04-01",
                  broadcast_threshold_bytes: int = 64 * 1024 * 1024):
    """TPC-H Q14 shape (promotion effect): the share of one month's
    integer-exact revenue that came from PROMO-type parts — ONE row
    (promo_revenue_microcents, total_revenue_microcents, promo_pct).

    Scale plan: lineitem is window-filtered and pre-aggregated per
    l_partkey inside each batch; the part side ships ONCE as a sorted
    promo-partkey array (searchsorted membership) under the threshold or
    co-partitions above it.  The two global revenue sums ride the
    hi/lo-split int64 lanes (the event_type_trend convention) so the Ray
    Sum cannot wrap even at 100 TB; the exact big-int recombine and the
    single CAST-then-divide happen in a one-row fold.
    """
    import os as _os

    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table
    from .text import round_half_away

    s_us = np.datetime64(start).astype("datetime64[us]").astype(np.int64)
    e_us = np.datetime64(end).astype("datetime64[us]").astype(np.int64)

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_extendedprice",
                             "l_discount", "l_shipdate"])

    def li_partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        keep = (sd >= s_us) & (sd < e_us)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        ext = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        rev = (np.rint(ext * 100.0).astype(np.int64)
               * np.rint((1.0 - disc) * 100.0).astype(np.int64))
        u, inv = np.unique(pk, return_inverse=True)
        return pa.table({
            "p_partkey": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64)),
        })

    li_agg = li.map_batches(li_partial, batch_format="pyarrow",
                            batch_size=None)

    def split_partial(promo_rev: int, tot_rev: int) -> pa.Table:
        return pa.table({
            "ph": pa.array([promo_rev // (1 << 31)], type=pa.int64()),
            "pl": pa.array([promo_rev % (1 << 31)], type=pa.int64()),
            "th": pa.array([tot_rev // (1 << 31)], type=pa.int64()),
            "tl": pa.array([tot_rev % (1 << 31)], type=pa.int64()),
        })

    if (_os.path.getsize(f"{sf_dir}/part.parquet")
            <= broadcast_threshold_bytes):
        pt = pq.read_table(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])
        promo = np.sort(pc.cast(
            pt.filter(pc.starts_with(pt["p_type"], "PROMO"))["p_partkey"],
            pa.int64()).to_numpy(zero_copy_only=False))
        promo_ref = ray.put(promo)

        def mark(batch: pa.Table) -> pa.Table:
            keys = ray.get(promo_ref)
            pk = batch["p_partkey"].to_numpy(zero_copy_only=False)
            rev = batch["rev"].to_numpy(zero_copy_only=False)
            isp = _sorted_membership(keys, pk)
            return split_partial(int(rev[isp].sum()), int(rev.sum()))

        partials = li_agg.map_batches(mark, batch_format="pyarrow",
                                      batch_size=None)
    else:
        part = (read_table(sf_dir, "part",
                           columns=["p_partkey", "p_type"])
                .map_batches(lambda b: pa.table({
                    "p_partkey": pc.cast(b["p_partkey"], pa.int64()),
                    "isp": pc.starts_with(b["p_type"], "PROMO"),
                }), batch_format="pyarrow", batch_size=None))
        j = copartition_hash_join(li_agg, part, on="p_partkey",
                                  how="inner")

        def mark(batch: pa.Table) -> pa.Table:
            rev = batch["rev"].to_numpy(zero_copy_only=False)
            isp = batch["isp"].to_numpy(zero_copy_only=False) \
                .astype(bool)
            return split_partial(int(rev[isp].sum()), int(rev.sum()))

        partials = j.map_batches(mark, batch_format="pyarrow",
                                 batch_size=None)

    agg = partials.aggregate(Sum("ph"), Sum("pl"), Sum("th"), Sum("tl"))
    p = ((int(agg["sum(ph)"] or 0) << 31) + int(agg["sum(pl)"] or 0))
    t = ((int(agg["sum(th)"] or 0) << 31) + int(agg["sum(tl)"] or 0))
    pct = (None if t == 0 else float(round_half_away(
        np.float64(100.0 * (np.float64(p) / np.float64(t))), 6)))
    return ray.data.from_arrow(pa.table({
        "promo_revenue_microcents": pa.array([p], type=pa.int64()),
        "total_revenue_microcents": pa.array([t], type=pa.int64()),
        "promo_pct": pa.array([pct], type=pa.float64()),
    }))


def promo_revenue_sql(start: str = "1996-03-01",
                      end: str = "1996-04-01") -> str:
    """Oracle for :func:`promo_revenue` — HUGEINT sums, one
    CAST-then-divide in the engine's op order."""
    return f"""
WITH j AS (
  SELECT CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
         * CAST(round((1 - l.l_discount) * 100, 0) AS BIGINT) AS rev,
         p.p_type LIKE 'PROMO%' AS isp
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{start}'
    AND l.l_shipdate < TIMESTAMP '{end}')
SELECT CAST(coalesce(sum(CASE WHEN isp THEN rev END), 0) AS BIGINT)
         AS promo_revenue_microcents,
       CAST(coalesce(sum(rev), 0) AS BIGINT)
         AS total_revenue_microcents,
       CASE WHEN coalesce(sum(rev), 0) = 0 THEN NULL ELSE
         round(100.0 * (CAST(coalesce(sum(CASE WHEN isp THEN rev END), 0)
                             AS DOUBLE)
                        / CAST(sum(rev) AS DOUBLE)), 6) END AS promo_pct
FROM j"""


def top_supplier(sf_dir: str, start: str = "1996-01-01",
                 end: str = "1996-04-01", n_parts: int = 64):
    """TPC-H Q15 shape (top supplier): the supplier(s) with the maximum
    integer-exact revenue over one quarter of shipped lineitems —
    (s_suppkey, s_name, total_revenue_microcents), ALL ties kept (the
    reference query's = max semantics), sorted by s_suppkey.

    Scale plan: per-suppkey batch pre-aggregation, ONE supplier-
    cardinality groupby, a scalar max action, an equality filter, and a
    key-filtered supplier read for the handful of winners — the supplier
    table never ships, and nothing larger than the supplier-key space
    ever shuffles.
    """
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    s_us = np.datetime64(start).astype("datetime64[us]").astype(np.int64)
    e_us = np.datetime64(end).astype("datetime64[us]").astype(np.int64)

    li = read_table(sf_dir, "lineitem",
                    columns=["l_suppkey", "l_extendedprice",
                             "l_discount", "l_shipdate"])

    def li_partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        keep = (sd >= s_us) & (sd < e_us)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        ext = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        rev = (np.rint(ext * 100.0).astype(np.int64)
               * np.rint((1.0 - disc) * 100.0).astype(np.int64))
        u, inv = np.unique(sk, return_inverse=True)
        return pa.table({
            "s_suppkey": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64)),
        })

    agg = (li.map_batches(li_partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("s_suppkey")
           .aggregate(Sum("rev", alias_name="total_revenue_microcents"))
           .materialize())
    mx = agg.max("total_revenue_microcents")
    if mx is None:
        return ray.data.from_arrow(pa.table({
            "s_suppkey": pa.array([], type=pa.int64()),
            "s_name": pa.array([], type=pa.string()),
            "total_revenue_microcents": pa.array([], type=pa.int64()),
        }))
    winners = (agg.filter(expr=f"total_revenue_microcents == {int(mx)}")
               .take_all())
    sk = np.sort(np.array([r["s_suppkey"] for r in winners],
                          dtype=np.int64))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"],
                        filters=[("s_suppkey", "in", sk.tolist())])
    skeys = pc.cast(sup["s_suppkey"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    pos = {int(s): i for i, s in enumerate(skeys)}
    idx = pa.array(np.array([pos[int(s)] for s in sk], dtype=np.int64))
    return ray.data.from_arrow(pa.table({
        "s_suppkey": pa.array(sk),
        "s_name": sup["s_name"].take(idx),
        "total_revenue_microcents": pa.array(
            np.full(len(sk), int(mx), dtype=np.int64)),
    }))


def top_supplier_sql(start: str = "1996-01-01",
                     end: str = "1996-04-01") -> str:
    """Oracle for :func:`top_supplier` — the Q15 view-max formulation."""
    return f"""
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
    CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * CAST(round((1 - l_discount) * 100, 0) AS BIGINT))
         AS BIGINT) AS total_revenue_microcents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{start}'
    AND l_shipdate < TIMESTAMP '{end}'
  GROUP BY 1)
SELECT r.s_suppkey, s.s_name, r.total_revenue_microcents
FROM r JOIN supplier s ON r.s_suppkey = s.s_suppkey
WHERE r.total_revenue_microcents =
      (SELECT max(total_revenue_microcents) FROM r)
ORDER BY r.s_suppkey"""


def large_orders(sf_dir: str, min_qty: int = 250, k: int = 100,
                 n_parts: int = 64,
                 broadcast_threshold_bytes: int = 64 * 1024 * 1024):
    """TPC-H Q18 shape (large-volume customers): orders whose total
    lineitem quantity exceeds ``min_qty``, ranked (o_totalprice DESC,
    o_orderdate ASC, o_orderkey ASC) and cut to ``k`` — (c_custkey,
    c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty).

    Scale plan: quantities (integral doubles) pre-sum per l_orderkey as
    int64 inside each batch, ONE orderkey groupby, the HAVING filter
    applied before anything joins, then the surviving sliver (p99+ of
    orders) joins orders broadcast-or-co-partition, cuts to k with the
    two-level local-top-k merge, and attaches c_name to exactly k rows
    via a key-filtered customer read.
    """
    import os as _os

    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_quantity"])

    def li_partial(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        qty = np.rint(batch["l_quantity"]
                      .to_numpy(zero_copy_only=False)).astype(np.int64)
        u, inv = np.unique(ok, return_inverse=True)
        return pa.table({
            "o_orderkey": pa.array(u),
            "sum_qty": pa.array(np.bincount(inv, weights=qty,
                                            minlength=len(u))
                                .astype(np.int64)),
        })

    agg = (li.map_batches(li_partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("o_orderkey")
           .aggregate(Sum("sum_qty", alias_name="sum_qty"))
           .filter(expr=f"sum_qty > {int(min_qty)}"))

    def orders_cast(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
            "odate_us": pa.array(
                batch["o_orderdate"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64)),
            "o_totalprice": batch["o_totalprice"],
        })

    if (_os.path.getsize(f"{sf_dir}/orders.parquet")
            <= broadcast_threshold_bytes):
        ot = orders_cast(pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate",
                     "o_totalprice"]))
        j = broadcast_hash_join(agg, ot, on="o_orderkey", how="inner")
    else:
        orders = (read_table(sf_dir, "orders",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_totalprice"])
                  .map_batches(orders_cast, batch_format="pyarrow",
                               batch_size=None))
        j = copartition_hash_join(agg, orders, on="o_orderkey",
                                  n_parts=n_parts, how="inner")

    def topk(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return batch
        tp = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        od = batch["odate_us"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((ok, od, -tp))[:k]
        return batch.take(pa.array(order))

    top = (j.map_batches(topk, batch_format="pyarrow", batch_size=None)
           .repartition(1)
           .map_batches(topk, batch_format="pyarrow", batch_size=None)
           .take_all())          # <= k rows by construction

    ck = np.array([r["o_custkey"] for r in top], dtype=np.int64)
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"],
                         filters=[("c_custkey", "in",
                                   sorted(set(ck.tolist())))])
    ckeys = pc.cast(cust["c_custkey"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    pos = {int(c): i for i, c in enumerate(ckeys)}
    idx = pa.array(np.array([pos[int(c)] for c in ck], dtype=np.int64))
    return ray.data.from_arrow(pa.table({
        "c_custkey": pa.array(ck),
        "c_name": cust["c_name"].take(idx),
        "o_orderkey": pa.array(np.array([r["o_orderkey"] for r in top],
                                        dtype=np.int64)),
        "o_orderdate": pa.array(
            np.array([r["odate_us"] for r in top], dtype=np.int64)
            .astype("datetime64[us]")),
        "o_totalprice": pa.array(
            np.array([r["o_totalprice"] for r in top],
                     dtype=np.float64)),
        "sum_qty": pa.array(np.array([r["sum_qty"] for r in top],
                                     dtype=np.int64)),
    }))


def large_orders_sql(min_qty: int = 250, k: int = 100) -> str:
    """Oracle for :func:`large_orders` — the Q18 HAVING join with the
    deterministic (price DESC, date, key) cut."""
    return f"""
WITH q AS (
  SELECT l_orderkey AS o_orderkey,
         CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
           AS sum_qty
  FROM lineitem GROUP BY 1 HAVING sum_qty > {int(min_qty)})
SELECT c.c_custkey, c.c_name, q.o_orderkey, o.o_orderdate,
       o.o_totalprice, q.sum_qty
FROM q
JOIN orders o ON q.o_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderdate, q.o_orderkey
LIMIT {k}"""


def order_priority_count(sf_dir: str, start: str = "1996-01-01",
                         end: str = "1996-04-01", n_parts: int = 64):
    """TPC-H Q4 shape (order-priority checking): per o_orderpriority, the
    number of orders placed in one quarter for which at least one
    lineitem came back returned (EXISTS semi-join; the reference Q4's
    commit<receipt predicate has no column here, so returnflag='R' plays
    the qualifying-lineitem role) — (o_orderpriority, order_count).

    Scale plan: the probe side is the window-filtered orders slice
    (orderkey + priority only); the EXISTS side never ships payload —
    qualifying lineitems reduce to per-batch-distinct orderkeys and ride
    the keys-only 'semi' lane of :func:`copartition_hash_join` (per-bucket
    np.unique membership, no pandas).  The final groupby is
    priority-cardinality (5 rows).
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    s_us = np.datetime64(start).astype("datetime64[us]").astype(np.int64)
    e_us = np.datetime64(end).astype("datetime64[us]").astype(np.int64)

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderdate",
                                 "o_orderpriority"])

    def o_filter(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        keep = (od >= s_us) & (od < e_us)
        return pa.table({
            "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64())
            .filter(pa.array(keep)),
            "o_orderpriority": batch["o_orderpriority"]
            .filter(pa.array(keep)),
        })

    owin = orders.map_batches(o_filter, batch_format="pyarrow",
                              batch_size=None)

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_returnflag"])

    def li_keys(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["l_returnflag"], "R")
        ok = batch["l_orderkey"].filter(keep) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"o_orderkey": pa.array(np.unique(ok))})

    exists_keys = li.map_batches(li_keys, batch_format="pyarrow",
                                 batch_size=None)
    hits = copartition_hash_join(owin, exists_keys, on="o_orderkey",
                                 n_parts=n_parts, how="semi")

    def prio_partial(batch: pa.Table) -> pa.Table:
        pr = batch["o_orderpriority"].to_pandas()
        vc = pr.value_counts()
        return pa.table({
            "o_orderpriority": pa.array(vc.index.astype(str)),
            "cnt": pa.array(vc.to_numpy().astype(np.int64)),
        })

    return (hits.map_batches(prio_partial, batch_format="pyarrow",
                             batch_size=None)
            .groupby("o_orderpriority")
            .aggregate(Sum("cnt", alias_name="order_count"))
            .sort("o_orderpriority"))


def order_priority_count_sql(start: str = "1996-01-01",
                             end: str = "1996-04-01") -> str:
    """Oracle for :func:`order_priority_count` — the Q4 EXISTS mirror."""
    return f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{start}'
  AND o.o_orderdate < TIMESTAMP '{end}'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_returnflag = 'R')
GROUP BY 1 ORDER BY 1"""


def cust_order_dist(sf_dir: str, excl_priority: str = "1-URGENT",
                    n_parts: int = 64):
    """TPC-H Q13 shape (customer distribution): histogram of customers by
    their non-urgent order count, INCLUDING the zero-order customers the
    left join keeps — (c_count, custdist), custdist DESC / c_count DESC.

    Scale plan: orders pre-count per custkey inside each batch, ONE
    custkey-cardinality groupby, then the customer key column (keys only,
    no payload) LEFT-co-partition-joins the counts so zero-order
    customers null-fill locally in their bucket — no customer-table
    broadcast, nothing driver-side until the final count-cardinality
    histogram (max orders per customer ~ tens of rows).
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderpriority"])

    def o_partial(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch["o_orderpriority"], excl_priority)
        ck = batch["o_custkey"].filter(keep) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(ck, return_inverse=True)
        return pa.table({
            "c_custkey": pa.array(u),
            "pc_": pa.array(np.bincount(inv, minlength=len(u))
                            .astype(np.int64)),
        })

    counts = (orders.map_batches(o_partial, batch_format="pyarrow",
                                 batch_size=None)
              .groupby("c_custkey")
              .aggregate(Sum("pc_", alias_name="n_orders")))

    cust = (read_table(sf_dir, "customer", columns=["c_custkey"])
            .map_batches(lambda b: pa.table({
                "c_custkey": pc.cast(b["c_custkey"], pa.int64())}),
                batch_format="pyarrow", batch_size=None))
    j = copartition_hash_join(cust, counts, on="c_custkey",
                              n_parts=n_parts, how="left")

    def hist_partial(batch: pa.Table) -> pa.Table:
        n = pc.fill_null(pc.cast(batch["n_orders"], pa.int64()), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(n, return_inverse=True)
        return pa.table({
            "c_count": pa.array(u),
            "pd_": pa.array(np.bincount(inv, minlength=len(u))
                            .astype(np.int64)),
        })

    hist = (j.map_batches(hist_partial, batch_format="pyarrow",
                          batch_size=None)
            .groupby("c_count")
            .aggregate(Sum("pd_", alias_name="custdist")))
    out = hist.take_all()  # count-cardinality rows (tens)
    cc = np.array([r["c_count"] for r in out], dtype=np.int64)
    cd = np.array([r["custdist"] for r in out], dtype=np.int64)
    order = np.lexsort((-cc, -cd))
    return ray.data.from_arrow(pa.table({
        "c_count": pa.array(cc[order]),
        "custdist": pa.array(cd[order]),
    }))


def cust_order_dist_sql(excl_priority: str = "1-URGENT") -> str:
    """Oracle for :func:`cust_order_dist` — the Q13 left-join histogram."""
    return f"""
WITH c_orders AS (
  SELECT c.c_custkey, count(o.o_custkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '{excl_priority}'
  GROUP BY 1)
SELECT c_count, count(*) AS custdist
FROM c_orders GROUP BY 1
ORDER BY custdist DESC, c_count DESC"""


def small_qty_revenue(sf_dir: str, brand: str = "Brand#23",
                      qty_frac: float = 0.2):
    """TPC-H Q17 shape (small-quantity-order revenue): total extended
    price (in cents) of lineitems for one brand's parts whose quantity is
    below ``qty_frac`` x that part's average quantity — ONE row
    (revenue_cents, n_rows).

    Scale plan: the classic two-pass Q17.  Pass 1 streams lineitem once,
    pre-summing (qty, count) per partkey in-batch behind a sorted
    brand-partkey membership filter, into a partkey groupby whose result
    is one row per brand part (1/25 of the part table — the broadcast is
    bounded by brand selectivity; the co-partition join lane exists for
    a hypothetical unselective brand).  Pass 2 streams lineitem again,
    compares qty against the broadcast per-part threshold with ONE
    searchsorted, and folds the surviving cents through the wrap-safe
    hi/lo-split sum lanes.

    Float parity: the threshold is ``qty_frac * (CAST(qsum AS DOUBLE) /
    cnt)`` in both engines — identical IEEE op order, so the strict <
    comparison is bit-exact.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    pt = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_brand"],
                       filters=[("p_brand", "=", brand)])
    bkeys = np.sort(pc.cast(pt["p_partkey"], pa.int64())
                    .to_numpy(zero_copy_only=False))
    bkeys_ref = ray.put(bkeys)

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_quantity",
                             "l_extendedprice"])

    def pass1(batch: pa.Table) -> pa.Table:
        from ..state.bcast import cached_get

        keys = cached_get(bkeys_ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _sorted_membership(keys, pk)
        pk = pk[m]
        qty = np.rint(batch["l_quantity"].to_numpy(zero_copy_only=False)
                      [m]).astype(np.int64)
        u, inv = np.unique(pk, return_inverse=True)
        return pa.table({
            "p_partkey": pa.array(u),
            "qsum": pa.array(np.bincount(inv, weights=qty,
                                         minlength=len(u))
                             .astype(np.int64)),
            "cnt": pa.array(np.bincount(inv, minlength=len(u))
                            .astype(np.int64)),
        })

    agg = (li.map_batches(pass1, batch_format="pyarrow", batch_size=None)
           .groupby("p_partkey")
           .aggregate(Sum("qsum", alias_name="qsum"),
                      Sum("cnt", alias_name="cnt"))
           .take_all())  # one row per brand part (1/25 of part)
    tk = np.array([r["p_partkey"] for r in agg], dtype=np.int64)
    order = np.argsort(tk)
    tk = tk[order]
    thr = (np.float64(qty_frac)
           * (np.array([r["qsum"] for r in agg], dtype=np.int64)
              .astype(np.float64)
              / np.array([r["cnt"] for r in agg], dtype=np.int64)
              .astype(np.float64)))[order]
    thr_ref = ray.put((tk, thr))

    def pass2(batch: pa.Table) -> pa.Table:
        from ..state.bcast import cached_get

        keys, th = cached_get(thr_ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _sorted_membership(keys, pk)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, pk[m])
        sel = qty[m] < th[pos]
        cents = np.rint(batch["l_extendedprice"]
                        .to_numpy(zero_copy_only=False)[m][sel] * 100.0) \
            .astype(np.int64)
        tot = int(cents.sum())
        return pa.table({
            "rh": pa.array([tot // (1 << 31)], type=pa.int64()),
            "rl": pa.array([tot % (1 << 31)], type=pa.int64()),
            "n": pa.array([int(sel.sum())], type=pa.int64()),
        })

    res = (li.map_batches(pass2, batch_format="pyarrow", batch_size=None)
           .aggregate(Sum("rh"), Sum("rl"), Sum("n")))
    rev = ((int(res["sum(rh)"] or 0) << 31) + int(res["sum(rl)"] or 0))
    return ray.data.from_arrow(pa.table({
        "revenue_cents": pa.array([rev], type=pa.int64()),
        "n_rows": pa.array([int(res["sum(n)"] or 0)], type=pa.int64()),
    }))


def small_qty_revenue_sql(brand: str = "Brand#23",
                          qty_frac: float = 0.2) -> str:
    """Oracle for :func:`small_qty_revenue` — the Q17 avg-threshold
    mirror in the engine's exact op order."""
    return f"""
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = '{brand}'),
a AS (
  SELECT l.l_partkey,
         CAST(sum(CAST(round(l.l_quantity, 0) AS BIGINT)) AS BIGINT)
           AS qsum,
         count(*) AS cnt
  FROM lineitem l JOIN bp ON l.l_partkey = bp.p_partkey
  GROUP BY 1)
SELECT CAST(coalesce(sum(CAST(round(l.l_extendedprice * 100, 0)
                              AS BIGINT)), 0) AS BIGINT) AS revenue_cents,
       count(*) AS n_rows
FROM lineitem l
JOIN a ON l.l_partkey = a.l_partkey
WHERE l.l_quantity < {qty_frac} * (CAST(a.qsum AS DOUBLE) / a.cnt)"""


def nation_volume(sf_dir: str, n1: str = "NATION_1", n2: str = "NATION_2",
                  start: str = "1995-01-01", end: str = "1997-01-01",
                  n_parts: int = 64,
                  broadcast_threshold_bytes: int = 64 * 1024 * 1024):
    """TPC-H Q7 shape (volume shipping): integer-exact revenue shipped
    between two nations per (supp_nation, cust_nation, year), both
    directions — (supp_nation, cust_nation, l_year, revenue_microcents).

    Scale plan: the supplier->nation map is the one genuinely tiny fact
    dimension (SF x 10k rows at TPC-H ratios) and broadcasts pre-filtered
    to the two nations; customer x orders follows the Q5 rule (broadcast
    below the on-disk threshold, else co-partition), ALSO pre-filtered to
    the two nations before anything moves.  lineitem pre-aggregates per
    (orderkey, supp-nation-bit, year-index) composite inside each batch —
    the only fact-table shuffle is those partials through ONE orderkey
    co-partition join; the final groupby is (2 x 2 x years)-sized.
    """
    import os as _os

    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    s_us = np.datetime64(start).astype("datetime64[us]").astype(np.int64)
    e_us = np.datetime64(end).astype("datetime64[us]").astype(np.int64)
    y0 = int(str(np.datetime64(start, "Y")))
    n_years = max(1, int(str(np.datetime64(end, "Y"))) - y0 + 1)

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    key_of = {n: int(k) for k, n in zip(nat["n_nationkey"].to_pylist(),
                                        nat["n_name"].to_pylist())}
    k1, k2 = key_of[n1], key_of[n2]

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sk = pc.cast(sup["s_suppkey"], pa.int64()).to_numpy(zero_copy_only=False)
    snat = pc.cast(sup["s_nationkey"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    keep = (snat == k1) | (snat == k2)
    order = np.argsort(sk[keep])
    sup_ref = ray.put((sk[keep][order],
                       (snat[keep][order] == k2).astype(np.int64)))

    # orderkey -> customer nation, two-nation slice only (Q5 plan rule)
    def cust_cast(batch: pa.Table) -> pa.Table:
        ck = pc.cast(batch["c_custkey"], pa.int64())
        cn = pc.cast(batch["c_nationkey"], pa.int64())
        m = pc.or_(pc.equal(cn, k1), pc.equal(cn, k2))
        return pa.table({"c_custkey": ck.filter(m),
                         "c_nationkey": cn.filter(m)})

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    if (_os.path.getsize(f"{sf_dir}/customer.parquet")
            <= broadcast_threshold_bytes):
        ct = cust_cast(pq.read_table(f"{sf_dir}/customer.parquet",
                                     columns=["c_custkey", "c_nationkey"]))
        oc = broadcast_hash_join(orders, ct, on="o_custkey",
                                 build_on="c_custkey", how="inner")
    else:
        cust = (read_table(sf_dir, "customer",
                           columns=["c_custkey", "c_nationkey"])
                .map_batches(cust_cast, batch_format="pyarrow",
                             batch_size=None))
        oc = copartition_hash_join(orders, cust, on="o_custkey",
                                   right_on="c_custkey", n_parts=n_parts)
    oc = oc.select_columns(["o_orderkey", "c_nationkey"])

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                             "l_discount", "l_shipdate"])

    def li_partial(batch: pa.Table) -> pa.Table:
        from ..state.bcast import cached_get

        skeys, sbit = cached_get(sup_ref)
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]")
        sd_us = sd.astype(np.int64)
        keep = (sd_us >= s_us) & (sd_us < e_us)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        m = _sorted_membership(skeys, lsk)
        idx = np.flatnonzero(keep)[m]
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[idx]
        ext = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[idx]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[idx]
        rev = (np.rint(ext * 100.0).astype(np.int64)
               * np.rint((1.0 - disc) * 100.0).astype(np.int64))
        sb = sbit[np.searchsorted(skeys, lsk[m])]
        yr = (sd[idx].astype("datetime64[Y]").astype(np.int64)
              + 1970 - y0)
        comp = ok * (2 * n_years) + sb * n_years + yr
        u, inv = np.unique(comp, return_inverse=True)
        return pa.table({
            "o_orderkey": pa.array(u // (2 * n_years)),
            "sbit": pa.array((u // n_years) % 2),
            "l_year": pa.array(u % n_years + y0),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64)),
        })

    li_agg = li.map_batches(li_partial, batch_format="pyarrow",
                            batch_size=None)
    j = copartition_hash_join(li_agg, oc, on="o_orderkey", n_parts=n_parts)

    def pair_partial(batch: pa.Table) -> pa.Table:
        sb = batch["sbit"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        yr = batch["l_year"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rev = batch["rev"].to_numpy(zero_copy_only=False)
        snk = np.where(sb == 1, k2, k1)
        keep = snk != cn
        comp = (snk[keep] == k2).astype(np.int64) * n_years \
            + (yr[keep] - y0)
        u, inv = np.unique(comp, return_inverse=True)
        sn = np.where(u // n_years == 1, n2, n1)
        cn_name = np.where(u // n_years == 1, n1, n2)
        return pa.table({
            "supp_nation": pa.array(sn.astype(str)),
            "cust_nation": pa.array(cn_name.astype(str)),
            "l_year": pa.array(u % n_years + y0),
            "prev": pa.array(np.bincount(inv, weights=rev[keep],
                                         minlength=len(u))
                             .astype(np.int64)),
        })

    # (2 x 2 x years)-cardinality result: fold the per-batch partials on
    # the driver instead of paying a second sort-shuffle for <=4N rows
    parts = (j.map_batches(pair_partial, batch_format="pyarrow",
                           batch_size=None).take_all())
    acc: dict = {}
    for r in parts:
        k = (r["supp_nation"], r["cust_nation"], int(r["l_year"]))
        acc[k] = acc.get(k, 0) + int(r["prev"])
    keys = sorted(acc)
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "supp_nation": pa.array([k[0] for k in keys], type=pa.string()),
        "cust_nation": pa.array([k[1] for k in keys], type=pa.string()),
        "l_year": pa.array([k[2] for k in keys], type=pa.int64()),
        "revenue_microcents": pa.array([acc[k] for k in keys],
                                       type=pa.int64()),
    }))


def nation_volume_sql(n1: str = "NATION_1", n2: str = "NATION_2",
                      start: str = "1995-01-01",
                      end: str = "1997-01-01") -> str:
    """Oracle for :func:`nation_volume` — the Q7 six-way join mirror."""
    return f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                * CAST(round((1 - l.l_discount) * 100, 0) AS BIGINT))
            AS BIGINT) AS revenue_microcents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
WHERE ((ns.n_name = '{n1}' AND nc.n_name = '{n2}')
    OR (ns.n_name = '{n2}' AND nc.n_name = '{n1}'))
  AND l.l_shipdate >= TIMESTAMP '{start}'
  AND l.l_shipdate < TIMESTAMP '{end}'
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""


def supplier_parts_cnt(sf_dir: str, excl_brand: str = "Brand#1",
                       max_size: int = 25, n_parts: int = 64,
                       broadcast_threshold_bytes: int = 64 * 1024 * 1024):
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per (p_brand, p_type, p_size) over the lineitem part-supplier
    pairs, excluding one brand, large sizes, and negative-balance
    suppliers (the complaints analogue) — (p_brand, p_type, p_size,
    supplier_cnt), supplier_cnt DESC then attrs ASC.

    Scale plan: the negative-balance supplier blacklist broadcasts as a
    sorted key array (complainers are a small fraction); lineitem reduces
    to per-batch-DISTINCT (partkey, suppkey) pairs via one lexsort before
    anything moves; part attrs attach broadcast-or-co-partition (Q5
    rule, filtered before the join so excluded parts never ship).  The
    Q16 DISTINCT itself is irreducibly one exchange — expressed as a
    multi-key groupby over the already-deduped pair stream — followed by
    an attr-cardinality count rollup.
    """
    import os as _os

    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Count, Sum

    from ..sources.readers import read_table

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_acctbal"])
    bad = np.sort(pc.cast(
        sup.filter(pc.less(sup["s_acctbal"], 0.0))["s_suppkey"],
        pa.int64()).to_numpy(zero_copy_only=False))
    bad_ref = ray.put(bad)

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        from ..state.bcast import cached_get

        bl = cached_get(bad_ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sk2 = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ok = ~_sorted_membership(bl, sk2)
        pk, sk2 = pk[ok], sk2[ok]
        # overflow-free pair dedupe (partkey can exceed 2^31 at scale,
        # so no pk<<32|sk packing): lexsort + adjacent-diff mask
        order = np.lexsort((sk2, pk))
        pk, sk2 = pk[order], sk2[order]
        if len(pk):
            first = np.concatenate(
                [[True], (pk[1:] != pk[:-1]) | (sk2[1:] != sk2[:-1])])
        else:
            first = np.zeros(0, dtype=bool)
        return pa.table({"p_partkey": pa.array(pk[first]),
                         "l_suppkey": pa.array(sk2[first])})

    pairs = li.map_batches(pair_partial, batch_format="pyarrow",
                           batch_size=None)

    def part_cast(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.not_equal(batch["p_brand"], excl_brand),
                    pc.less_equal(pc.cast(batch["p_size"], pa.int64()),
                                  max_size))
        return pa.table({
            "p_partkey": pc.cast(batch["p_partkey"], pa.int64()).filter(m),
            "p_brand": batch["p_brand"].filter(m),
            "p_type": batch["p_type"].filter(m),
            "p_size": pc.cast(batch["p_size"], pa.int64()).filter(m),
        })

    if (_os.path.getsize(f"{sf_dir}/part.parquet")
            <= broadcast_threshold_bytes):
        ptab = part_cast(pq.read_table(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_brand", "p_type", "p_size"]))
        j = broadcast_hash_join(pairs, ptab, on="p_partkey", how="inner")
    else:
        part = (read_table(sf_dir, "part",
                           columns=["p_partkey", "p_brand", "p_type",
                                    "p_size"])
                .map_batches(part_cast, batch_format="pyarrow",
                             batch_size=None))
        j = copartition_hash_join(pairs, part, on="p_partkey",
                                  n_parts=n_parts)

    distinct = (j.groupby(["p_brand", "p_type", "p_size", "l_suppkey"])
                .aggregate(Count()))

    def cnt_partial(batch: pa.Table) -> pa.Table:
        import pandas as _pd

        df = _pd.DataFrame({
            "p_brand": batch["p_brand"].to_pandas(),
            "p_type": batch["p_type"].to_pandas(),
            "p_size": batch["p_size"].to_pandas(),
        })
        g = df.groupby(["p_brand", "p_type", "p_size"], sort=False) \
            .size().reset_index(name="pcnt")
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    return (distinct.map_batches(cnt_partial, batch_format="pyarrow",
                                 batch_size=None)
            .groupby(["p_brand", "p_type", "p_size"])
            .aggregate(Sum("pcnt", alias_name="supplier_cnt"))
            .sort(["supplier_cnt", "p_brand", "p_type", "p_size"],
                  descending=[True, False, False, False]))


def supplier_parts_cnt_sql(excl_brand: str = "Brand#1",
                           max_size: int = 25) -> str:
    """Oracle for :func:`supplier_parts_cnt` — the Q16 DISTINCT mirror."""
    return f"""
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> '{excl_brand}'
  AND p.p_size <= {max_size}
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""


def idle_customers(sf_dir: str, since: str = "2000-01-01",
                   n_parts: int = 64):
    """TPC-H Q22 shape (global sales opportunity): customers with an
    above-average positive balance and NO orders since ``since`` (the
    synthetic corpus gives every customer SOME order, so the dormancy
    cutoff keeps the anti-join non-vacuous), rolled up per market
    segment — (c_mktsegment, numcust, totacctbal_cents).

    Scale plan: pass 1 folds the positive-balance mean through the
    wrap-safe hi/lo-split cents lanes (one scalar pair to the driver);
    the above-average test is the integer cross-multiplication
    ``cents x count > sum_cents`` — NO float division anywhere, so the
    engine and the oracle agree bit-exactly with zero IEEE caveats.
    Pass 2 streams customer again, anti-joins the order custkeys through
    the keys-only 'anti' co-partition lane (orders reduce to per-batch-
    distinct custkeys; nothing broadcasts), and the final groupby is
    segment-cardinality.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_acctbal", "c_mktsegment"])

    def bal_partial(batch: pa.Table) -> pa.Table:
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        cents = np.rint(bal * 100.0).astype(np.int64)[bal > 0.0]
        tot = int(cents.sum())
        return pa.table({
            "bh": pa.array([tot // (1 << 31)], type=pa.int64()),
            "bl": pa.array([tot % (1 << 31)], type=pa.int64()),
            "n": pa.array([len(cents)], type=pa.int64()),
        })

    s = (cust.map_batches(bal_partial, batch_format="pyarrow",
                          batch_size=None)
         .aggregate(Sum("bh"), Sum("bl"), Sum("n")))
    sum_cents = ((int(s["sum(bh)"] or 0) << 31) + int(s["sum(bl)"] or 0))
    cnt = int(s["sum(n)"] or 0)

    def rich_filter(batch: pa.Table) -> pa.Table:
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        cents = np.rint(bal * 100.0).astype(np.int64)
        keep = cents * cnt > sum_cents
        return pa.table({
            "c_custkey": pc.cast(batch["c_custkey"], pa.int64())
            .filter(pa.array(keep)),
            "cents": pa.array(cents[keep]),
            "c_mktsegment": batch["c_mktsegment"].filter(pa.array(keep)),
        })

    rich = cust.map_batches(rich_filter, batch_format="pyarrow",
                            batch_size=None)

    since_us = np.datetime64(since).astype("datetime64[us]") \
        .astype(np.int64)
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate"])

    def ckeys(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[od >= since_us]
        return pa.table({"c_custkey": pa.array(np.unique(ck))})

    okeys = orders.map_batches(ckeys, batch_format="pyarrow",
                               batch_size=None)
    idle = copartition_hash_join(rich, okeys, on="c_custkey",
                                 n_parts=n_parts, how="anti")

    def seg_partial(batch: pa.Table) -> pa.Table:
        import pandas as _pd

        df = _pd.DataFrame({
            "c_mktsegment": batch["c_mktsegment"].to_pandas(),
            "cents": batch["cents"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby("c_mktsegment", sort=False) \
            .agg(pn=("cents", "size"), pt=("cents", "sum")).reset_index()
        g["pn"] = g["pn"].astype(np.int64)
        g["pt"] = g["pt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    out = (idle.map_batches(seg_partial, batch_format="pyarrow",
                            batch_size=None)
           .groupby("c_mktsegment")
           .aggregate(Sum("pn", alias_name="numcust"),
                      Sum("pt", alias_name="totacctbal_cents"))
           .take_all())  # segment-cardinality rows
    out.sort(key=lambda r: r["c_mktsegment"])
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "c_mktsegment": pa.array([r["c_mktsegment"] for r in out],
                                 type=pa.string()),
        "numcust": pa.array([int(r["numcust"]) for r in out],
                            type=pa.int64()),
        "totacctbal_cents": pa.array(
            [int(r["totacctbal_cents"]) for r in out], type=pa.int64()),
    }))


def idle_customers_sql(since: str = "2000-01-01") -> str:
    """Oracle for :func:`idle_customers` — the Q22 anti-join mirror in
    the engine's integer cross-multiplication domain."""
    return f"""
WITH pos AS (
  SELECT CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
           AS sum_cents,
         count(*) AS cnt
  FROM customer WHERE c_acctbal > 0.00)
SELECT c.c_mktsegment, count(*) AS numcust,
       CAST(sum(CAST(round(c.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
         AS totacctbal_cents
FROM customer c, pos
WHERE CAST(round(c.c_acctbal * 100, 0) AS BIGINT) * pos.cnt
        > pos.sum_cents
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{since}')
GROUP BY 1 ORDER BY 1"""


def forecast_revenue(sf_dir: str, start: str = "1996-01-01",
                     end: str = "1997-01-01", disc_lo: float = 0.05,
                     disc_hi: float = 0.07, max_qty: int = 24):
    """TPC-H Q6 shape (forecasting revenue change): the revenue increase
    from eliminating a discount band — sum(extendedprice x discount) over
    one year's lineitems inside the band and below a quantity cap; ONE
    row (revenue_microcents, n_rows).

    The canonical pruned-scan query: three columns read, every predicate
    applied vectorized in-batch, zero joins, zero shuffles — only two
    hi/lo-split int64 lanes reach the driver.  Discount-band membership
    is evaluated on round(l_discount x 100) integers so the engine and
    the oracle share one exact comparison domain (0.07 has no binary
    representation; cents do).
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    s_us = np.datetime64(start).astype("datetime64[us]").astype(np.int64)
    e_us = np.datetime64(end).astype("datetime64[us]").astype(np.int64)
    lo_c = int(np.rint(disc_lo * 100.0))
    hi_c = int(np.rint(disc_hi * 100.0))

    li = read_table(sf_dir, "lineitem",
                    columns=["l_extendedprice", "l_discount",
                             "l_quantity", "l_shipdate"])

    def fold(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        disc_c = np.rint(batch["l_discount"]
                         .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        keep = ((sd >= s_us) & (sd < e_us)
                & (disc_c >= lo_c) & (disc_c <= hi_c)
                & (qty < max_qty))
        ext_c = np.rint(batch["l_extendedprice"]
                        .to_numpy(zero_copy_only=False)[keep] * 100.0) \
            .astype(np.int64)
        tot = int((ext_c * disc_c[keep]).sum())
        return pa.table({
            "rh": pa.array([tot // (1 << 31)], type=pa.int64()),
            "rl": pa.array([tot % (1 << 31)], type=pa.int64()),
            "n": pa.array([int(keep.sum())], type=pa.int64()),
        })

    res = (li.map_batches(fold, batch_format="pyarrow", batch_size=None)
           .aggregate(Sum("rh"), Sum("rl"), Sum("n")))
    rev = ((int(res["sum(rh)"] or 0) << 31) + int(res["sum(rl)"] or 0))
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "revenue_microcents": pa.array([rev], type=pa.int64()),
        "n_rows": pa.array([int(res["sum(n)"] or 0)], type=pa.int64()),
    }))


def forecast_revenue_sql(start: str = "1996-01-01",
                         end: str = "1997-01-01", disc_lo: float = 0.05,
                         disc_hi: float = 0.07,
                         max_qty: int = 24) -> str:
    """Oracle for :func:`forecast_revenue` — the Q6 band scan in the
    engine's integer cents domain."""
    lo_c = int(round(disc_lo * 100))
    hi_c = int(round(disc_hi * 100))
    return f"""
SELECT CAST(coalesce(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                         * CAST(round(l_discount * 100, 0) AS BIGINT)),
                     0) AS BIGINT) AS revenue_microcents,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{start}'
  AND l_shipdate < TIMESTAMP '{end}'
  AND CAST(round(l_discount * 100, 0) AS BIGINT) BETWEEN {lo_c} AND {hi_c}
  AND l_quantity < {max_qty}"""


_Q19_BRACKETS = (
    ("Brand#12", 1, 15, 1, 11),
    ("Brand#23", 10, 25, 10, 20),
    ("Brand#34", 20, 50, 20, 30),
)


def bracket_revenue(sf_dir: str, brackets=_Q19_BRACKETS,
                    n_parts: int = 64,
                    broadcast_threshold_bytes: int = 64 * 1024 * 1024):
    """TPC-H Q19 shape (discounted revenue, OR-of-conjunctions): revenue
    per disjoint (brand, size-range, quantity-range) bracket —
    (bracket, revenue_microcents, n_rows), one row per bracket that
    matched anything.

    Scale plan: part reduces to (partkey -> bracket-candidate id) with
    the size predicate already applied, shipping ONLY matching parts
    (broadcast under the Q5 threshold, else co-partition); the quantity
    leg of each conjunction evaluates vectorized in-batch after the
    attach; per-bracket partial sums ride hi/lo-split lanes into a
    bracket-cardinality groupby.  Brackets are brand-disjoint by
    construction, which is what lets bracket id attach per PART —
    mirroring Q19's one-bracket-per-row property.
    """
    import os as _os

    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    brands = [b[0] for b in brackets]
    assert len(set(brands)) == len(brands), "brackets must be brand-disjoint"

    def part_map(tbl: pa.Table):
        pk = pc.cast(tbl["p_partkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        br = tbl["p_brand"].to_pandas().to_numpy(dtype=object)
        sz = pc.cast(tbl["p_size"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        bid = np.full(len(pk), -1, dtype=np.int64)
        for i, (brand, slo, shi, _, _) in enumerate(brackets):
            bid[(br == brand) & (sz >= slo) & (sz <= shi)] = i
        m = bid >= 0
        return pk[m], bid[m]

    qlo = np.array([b[3] for b in brackets], dtype=np.float64)
    qhi = np.array([b[4] for b in brackets], dtype=np.float64)

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_quantity", "l_extendedprice",
                             "l_discount"])

    def fold(batch: pa.Table, keys, bids) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _sorted_membership(keys, pk)
        bid = bids[np.searchsorted(keys, pk[m])]
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)[m]
        sel = (qty >= qlo[bid]) & (qty <= qhi[bid])
        bid = bid[sel]
        ext = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m][sel]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[m][sel]
        rev = (np.rint(ext * 100.0).astype(np.int64)
               * np.rint((1.0 - disc) * 100.0).astype(np.int64))
        nb = len(brackets)
        tot = np.bincount(bid, weights=rev, minlength=nb).astype(np.int64)
        return pa.table({
            "bracket": pa.array(np.arange(nb, dtype=np.int64)),
            "rh": pa.array(tot // (1 << 31)),
            "rl": pa.array(tot % (1 << 31)),
            "pn": pa.array(np.bincount(bid, minlength=nb)
                           .astype(np.int64)),
        })

    if (_os.path.getsize(f"{sf_dir}/part.parquet")
            <= broadcast_threshold_bytes):
        keys, bids = part_map(pq.read_table(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_brand", "p_size"]))
        order = np.argsort(keys)
        ref = ray.put((keys[order], bids[order]))

        def fold_b(batch: pa.Table) -> pa.Table:
            from ..state.bcast import cached_get

            keys, bids = cached_get(ref)
            return fold(batch, keys, bids)

        partials = li.map_batches(fold_b, batch_format="pyarrow",
                                  batch_size=None)
    else:
        def part_batch(batch: pa.Table) -> pa.Table:
            pk, bid = part_map(batch)
            return pa.table({"l_partkey": pa.array(pk),
                             "bid": pa.array(bid)})

        part = (read_table(sf_dir, "part",
                           columns=["p_partkey", "p_brand", "p_size"])
                .map_batches(part_batch, batch_format="pyarrow",
                             batch_size=None))
        j = copartition_hash_join(li, part, on="l_partkey",
                                  n_parts=n_parts)

        def fold_j(batch: pa.Table) -> pa.Table:
            bid = batch["bid"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
            sel = (qty >= qlo[bid]) & (qty <= qhi[bid])
            bid = bid[sel]
            ext = batch["l_extendedprice"] \
                .to_numpy(zero_copy_only=False)[sel]
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)[sel]
            rev = (np.rint(ext * 100.0).astype(np.int64)
                   * np.rint((1.0 - disc) * 100.0).astype(np.int64))
            nb = len(brackets)
            tot = np.bincount(bid, weights=rev, minlength=nb) \
                .astype(np.int64)
            return pa.table({
                "bracket": pa.array(np.arange(nb, dtype=np.int64)),
                "rh": pa.array(tot // (1 << 31)),
                "rl": pa.array(tot % (1 << 31)),
                "pn": pa.array(np.bincount(bid, minlength=nb)
                               .astype(np.int64)),
            })

        partials = j.map_batches(fold_j, batch_format="pyarrow",
                                 batch_size=None)

    out = (partials.groupby("bracket")
           .aggregate(Sum("rh"), Sum("rl"),
                      Sum("pn", alias_name="n_rows"))
           .take_all())  # bracket-cardinality rows
    out.sort(key=lambda r: r["bracket"])
    rows = [(int(r["bracket"]),
             (int(r["sum(rh)"]) << 31) + int(r["sum(rl)"]),
             int(r["n_rows"])) for r in out if int(r["n_rows"]) > 0]
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "bracket": pa.array([r[0] for r in rows], type=pa.int64()),
        "revenue_microcents": pa.array([r[1] for r in rows],
                                       type=pa.int64()),
        "n_rows": pa.array([r[2] for r in rows], type=pa.int64()),
    }))


def bracket_revenue_sql(brackets=_Q19_BRACKETS) -> str:
    """Oracle for :func:`bracket_revenue` — the Q19 OR-of-conjunctions
    mirror with a CASE bracket id."""
    cases = "\n    ".join(
        f"WHEN p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi} "
        f"AND l.l_quantity BETWEEN {qlo} AND {qhi} THEN {i}"
        for i, (b, slo, shi, qlo, qhi) in enumerate(brackets))
    return f"""
WITH j AS (
  SELECT CASE
    {cases}
    END AS bracket,
    CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
      * CAST(round((1 - l.l_discount) * 100, 0) AS BIGINT) AS rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
SELECT bracket, CAST(sum(rev) AS BIGINT) AS revenue_microcents,
       count(*) AS n_rows
FROM j WHERE bracket IS NOT NULL
GROUP BY 1 ORDER BY 1"""


def market_share(sf_dir: str, supp_nation: str = "NATION_1",
                 region: str = "EUROPE", start: str = "1995-01-01",
                 end: str = "1997-01-01", n_parts: int = 64,
                 broadcast_threshold_bytes: int = 64 * 1024 * 1024):
    """TPC-H Q8 shape (national market share): per order year, the share
    of revenue sold into one region's customer nations that was supplied
    by one nation — (l_year, nation_microcents, total_microcents,
    mkt_share).

    Scale plan: the supplier->is-nation bit broadcasts (SF x 10k rows);
    customers reduce to the region's custkeys pre-join (Q5 broadcast/
    co-partition rule); lineitem pre-aggregates per (orderkey,
    supplier-bit, year) composite in-batch, takes ONE orderkey
    co-partition join against the region-filtered order keys, and folds
    into a (years x 2)-cardinality groupby.  Both revenue lanes are
    hi/lo-split wrap-safe int64; the single share division happens once
    per year row, mirrored CAST-for-CAST in the oracle.
    """
    import os as _os

    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table
    from .text import round_half_away

    s_us = np.datetime64(start).astype("datetime64[us]").astype(np.int64)
    e_us = np.datetime64(end).astype("datetime64[us]").astype(np.int64)
    y0 = int(str(np.datetime64(start, "Y")))
    n_years = max(1, int(str(np.datetime64(end, "Y"))) - y0 + 1)

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = {n: int(k) for k, n in zip(reg["r_regionkey"].to_pylist(),
                                      reg["r_name"].to_pylist())}[region]
    nat_k = pc.cast(nat["n_nationkey"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    nat_r = pc.cast(nat["n_regionkey"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    region_nations = set(nat_k[nat_r == rkey].tolist())
    supp_nk = {n: int(k) for k, n in zip(nat["n_nationkey"].to_pylist(),
                                         nat["n_name"].to_pylist())}[
        supp_nation]

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sk = pc.cast(sup["s_suppkey"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    sbit = (pc.cast(sup["s_nationkey"], pa.int64())
            .to_numpy(zero_copy_only=False) == supp_nk).astype(np.int64)
    order = np.argsort(sk)
    sup_ref = ray.put((sk[order], sbit[order]))

    def cust_cast(batch: pa.Table) -> pa.Table:
        ck = pc.cast(batch["c_custkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cn = pc.cast(batch["c_nationkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        m = np.isin(cn, np.array(sorted(region_nations), dtype=np.int64))
        return pa.table({"c_custkey": pa.array(ck[m])})

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    if (_os.path.getsize(f"{sf_dir}/customer.parquet")
            <= broadcast_threshold_bytes):
        ct = cust_cast(pq.read_table(f"{sf_dir}/customer.parquet",
                                     columns=["c_custkey", "c_nationkey"]))
        oc = broadcast_hash_join(orders, ct, on="o_custkey",
                                 build_on="c_custkey", how="inner")
    else:
        cust = (read_table(sf_dir, "customer",
                           columns=["c_custkey", "c_nationkey"])
                .map_batches(cust_cast, batch_format="pyarrow",
                             batch_size=None))
        oc = copartition_hash_join(orders, cust, on="o_custkey",
                                   right_on="c_custkey", n_parts=n_parts,
                                   how="semi")
    oc = oc.select_columns(["o_orderkey"])

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                             "l_discount", "l_shipdate"])

    def li_partial(batch: pa.Table) -> pa.Table:
        from ..state.bcast import cached_get

        skeys, sb = cached_get(sup_ref)
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]")
        sd_us = sd.astype(np.int64)
        keep = (sd_us >= s_us) & (sd_us < e_us)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        ext = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        rev = (np.rint(ext * 100.0).astype(np.int64)
               * np.rint((1.0 - disc) * 100.0).astype(np.int64))
        pos = np.minimum(np.searchsorted(skeys, lsk),
                         max(0, len(skeys) - 1))
        assert len(lsk) == 0 or bool((skeys[pos] == lsk).all()), \
            "lineitem references a suppkey absent from supplier (FK)"
        bit = sb[pos]
        yr = (sd[keep].astype("datetime64[Y]").astype(np.int64)
              + 1970 - y0)
        comp = ok * (2 * n_years) + bit * n_years + yr
        u, inv = np.unique(comp, return_inverse=True)
        return pa.table({
            "o_orderkey": pa.array(u // (2 * n_years)),
            "sbit": pa.array((u // n_years) % 2),
            "l_year": pa.array(u % n_years + y0),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64)),
        })

    li_agg = li.map_batches(li_partial, batch_format="pyarrow",
                            batch_size=None)
    j = copartition_hash_join(li_agg, oc, on="o_orderkey",
                              n_parts=n_parts, how="semi")

    def year_partial(batch: pa.Table) -> pa.Table:
        yr = batch["l_year"].to_numpy(zero_copy_only=False) \
            .astype(np.int64) - y0
        sb = batch["sbit"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = batch["rev"].to_numpy(zero_copy_only=False)
        nat_t = np.zeros(n_years, dtype=np.int64)
        tot_t = np.zeros(n_years, dtype=np.int64)
        np.add.at(tot_t, yr, rev)
        np.add.at(nat_t, yr[sb == 1], rev[sb == 1])
        return pa.table({
            "l_year": pa.array(np.arange(n_years, dtype=np.int64) + y0),
            "nh": pa.array(nat_t // (1 << 31)),
            "nl": pa.array(nat_t % (1 << 31)),
            "th": pa.array(tot_t // (1 << 31)),
            "tl": pa.array(tot_t % (1 << 31)),
        })

    out = (j.map_batches(year_partial, batch_format="pyarrow",
                         batch_size=None)
           .groupby("l_year")
           .aggregate(Sum("nh"), Sum("nl"), Sum("th"), Sum("tl"))
           .take_all())  # one row per year
    out.sort(key=lambda r: r["l_year"])
    rows = []
    for r in out:
        n_rev = (int(r["sum(nh)"]) << 31) + int(r["sum(nl)"])
        t_rev = (int(r["sum(th)"]) << 31) + int(r["sum(tl)"])
        if t_rev == 0:
            continue
        share = float(round_half_away(
            np.float64(n_rev) / np.float64(t_rev), 6))
        rows.append((int(r["l_year"]), n_rev, t_rev, share))
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "l_year": pa.array([r[0] for r in rows], type=pa.int64()),
        "nation_microcents": pa.array([r[1] for r in rows],
                                      type=pa.int64()),
        "total_microcents": pa.array([r[2] for r in rows],
                                     type=pa.int64()),
        "mkt_share": pa.array([r[3] for r in rows], type=pa.float64()),
    }))


def market_share_sql(supp_nation: str = "NATION_1",
                     region: str = "EUROPE", start: str = "1995-01-01",
                     end: str = "1997-01-01") -> str:
    """Oracle for :func:`market_share` — the Q8 share mirror with the
    engine's exact CAST/round order."""
    return f"""
WITH j AS (
  SELECT CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
         CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
           * CAST(round((1 - l.l_discount) * 100, 0) AS BIGINT) AS rev,
         (ns.n_name = '{supp_nation}') AS is_nat
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN region r ON nc.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  WHERE r.r_name = '{region}'
    AND l.l_shipdate >= TIMESTAMP '{start}'
    AND l.l_shipdate < TIMESTAMP '{end}')
SELECT l_year,
       CAST(coalesce(sum(CASE WHEN is_nat THEN rev END), 0) AS BIGINT)
         AS nation_microcents,
       CAST(sum(rev) AS BIGINT) AS total_microcents,
       round(CAST(coalesce(sum(CASE WHEN is_nat THEN rev END), 0)
                  AS DOUBLE)
             / CAST(sum(rev) AS DOUBLE), 6) AS mkt_share
FROM j GROUP BY 1 HAVING sum(rev) > 0 ORDER BY 1"""


def sole_fault_supplier(sf_dir: str, k: int = 100, n_parts: int = 64):
    """TPC-H Q21 shape (suppliers who kept orders waiting): per supplier,
    the number of multi-supplier orders in which THIS supplier had a
    returned lineitem and no other supplier did — top ``k``
    (s_suppkey, s_name, numwait), numwait DESC then suppkey.

    Scale plan: lineitem reduces in-batch to DISTINCT (orderkey, suppkey,
    any-returned) triples (lexsort dedupe, no packing); ONE orderkey
    co-partition groups each order's triples in one bucket where the
    exists/not-exists pair evaluates vectorized (segment counts over the
    sorted triple stream — n_suppliers >= 2, exactly one supplier with a
    return, emit that supplier); per-batch suppkey count partials feed a
    supplier-cardinality groupby, the top-k cut is the two-level local
    merge, and s_name attaches to exactly k rows via a key-filtered read.
    """
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_returnflag"])

    def triples(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rf = pc.equal(batch["l_returnflag"], "R").to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((sk, ok))
        ok, sk, rf = ok[order], sk[order], rf[order]
        if len(ok):
            new = np.concatenate(
                [[True], (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])])
        else:
            new = np.zeros(0, dtype=bool)
        seg = np.cumsum(new) - 1
        any_r = np.zeros(int(seg[-1]) + 1 if len(seg) else 0,
                         dtype=np.int64)
        np.maximum.at(any_r, seg, rf)
        return pa.table({
            "o_orderkey": pa.array(ok[new]),
            "l_suppkey": pa.array(sk[new]),
            "anyr": pa.array(any_r),
        })

    tri = li.map_batches(triples, batch_format="pyarrow", batch_size=None)

    def bucket_of(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return batch.append_column(
            "_b", pa.array(_part_of(ok, n_parts).astype(np.int64)))

    def per_order(group: pa.Table) -> pa.Table:
        ok = group["o_orderkey"].to_numpy(zero_copy_only=False)
        sk = group["l_suppkey"].to_numpy(zero_copy_only=False)
        rf = group["anyr"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, ok))
        ok, sk, rf = ok[order], sk[order], rf[order]
        if not len(ok):
            return pa.table({"l_suppkey": pa.array([], type=pa.int64()),
                             "pc_": pa.array([], type=pa.int64())})
        # merge cross-batch duplicates of the same (order, supplier)
        new = np.concatenate(
            [[True], (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])])
        seg = np.cumsum(new) - 1
        any_r = np.zeros(int(seg[-1]) + 1, dtype=np.int64)
        np.maximum.at(any_r, seg, rf)
        ok, sk = ok[new], sk[new]
        # per-order segment stats
        onew = np.concatenate([[True], ok[1:] != ok[:-1]])
        oseg = np.cumsum(onew) - 1
        n_ord = int(oseg[-1]) + 1
        n_sup = np.bincount(oseg, minlength=n_ord)
        n_ret = np.bincount(oseg, weights=any_r, minlength=n_ord) \
            .astype(np.int64)
        emit = (any_r == 1) & (n_sup[oseg] >= 2) & (n_ret[oseg] == 1)
        winners = sk[emit]
        u, inv = np.unique(winners, return_inverse=True)
        return pa.table({
            "l_suppkey": pa.array(u),
            "pc_": pa.array(np.bincount(inv, minlength=len(u))
                            .astype(np.int64)),
        })

    counts = (tri.map_batches(bucket_of, batch_format="pyarrow",
                              batch_size=None)
              .groupby("_b")
              .map_groups(per_order, batch_format="pyarrow")
              .groupby("l_suppkey")
              .aggregate(Sum("pc_", alias_name="numwait")))

    def topk(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return batch
        nw = batch["numwait"].to_numpy(zero_copy_only=False)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((sk, -nw))[:k]
        return batch.take(pa.array(order))

    top = (counts.map_batches(topk, batch_format="pyarrow",
                              batch_size=None)
           .repartition(1)
           .map_batches(topk, batch_format="pyarrow", batch_size=None)
           .take_all())
    sk = np.array([r["l_suppkey"] for r in top], dtype=np.int64)
    nw = np.array([r["numwait"] for r in top], dtype=np.int64)
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"],
                        filters=[("s_suppkey", "in",
                                  sorted(set(sk.tolist())))])
    skeys = pc.cast(sup["s_suppkey"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    pos = {int(s): i for i, s in enumerate(skeys)}
    idx = pa.array(np.array([pos[int(s)] for s in sk], dtype=np.int64))
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "s_suppkey": pa.array(sk),
        "s_name": sup["s_name"].take(idx),
        "numwait": pa.array(nw),
    }))


def sole_fault_supplier_sql(k: int = 100) -> str:
    """Oracle for :func:`sole_fault_supplier` — the Q21 exists/not-exists
    mirror."""
    return f"""
WITH t AS (
  SELECT DISTINCT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
           OVER (PARTITION BY l_orderkey, l_suppkey) AS anyr
  FROM lineitem)
SELECT s.s_suppkey, s.s_name, count(*) AS numwait
FROM t
JOIN supplier s ON t.l_suppkey = s.s_suppkey
WHERE t.anyr = 1
  AND EXISTS (SELECT 1 FROM t t2
              WHERE t2.l_orderkey = t.l_orderkey
                AND t2.l_suppkey <> t.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM t t3
                  WHERE t3.l_orderkey = t.l_orderkey
                    AND t3.l_suppkey <> t.l_suppkey
                    AND t3.anyr = 1)
GROUP BY 1, 2
ORDER BY numwait DESC, s.s_suppkey
LIMIT {k}"""


def product_profit(sf_dir: str, name_like: str = "red"):
    """TPC-H Q9 shape (product-type profit): integer-exact revenue
    (extendedprice x (1 - discount), microcents — this corpus has no
    partsupp/supplycost, so "profit" is gross revenue; the ship year
    stands in for Q9's order year, saving the orders join Q9 only needs
    for the date) from lineitems of parts whose name contains
    ``name_like``, rolled up per (supplier nation, year) —
    (nation, o_year, profit_microcents) sorted.

    Scale plan: the part side reduces to a sorted matching-partkey array
    and the supplier side to a suppkey -> nationkey map, both broadcast
    ONCE via ray.put (dimension tables — the small_qty_revenue / Q5
    convention); lineitem streams through one vectorized pass that
    filters, maps and pre-aggregates per packed (nationkey, year) key
    in-batch, so the only exchange is a (nations x years)-cardinality
    groupby on hi/lo-split int64 lanes (wrap-safe at 100 TB).  Nation
    names attach driver-side to the handful of final rows.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    pt = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_name"])
    match = np.sort(pc.cast(
        pt.filter(pc.match_substring(pt["p_name"], name_like))
        ["p_partkey"], pa.int64()).to_numpy(zero_copy_only=False))
    match_ref = ray.put(match)

    st = pq.read_table(f"{sf_dir}/supplier.parquet",
                       columns=["s_suppkey", "s_nationkey"])
    sk = pc.cast(st["s_suppkey"], pa.int64()).to_numpy(
        zero_copy_only=False)
    nk = pc.cast(st["s_nationkey"], pa.int64()).to_numpy(
        zero_copy_only=False)
    order = np.argsort(sk)
    supp_ref = ray.put((sk[order], nk[order]))

    nt = pq.read_table(f"{sf_dir}/nation.parquet",
                       columns=["n_nationkey", "n_name"])
    nation_name = dict(zip(
        pc.cast(nt["n_nationkey"], pa.int64()).to_pylist(),
        nt["n_name"].to_pylist()))

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_extendedprice",
                             "l_discount", "l_shipdate"])

    def partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(match_ref)
        skeys, snat = ray.get(supp_ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = _sorted_membership(keys, pk)
        sup = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        ext = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False)[keep]
        rev = (np.rint(ext * 100.0).astype(np.int64)
               * np.rint((1.0 - disc) * 100.0).astype(np.int64))
        pos = np.minimum(np.searchsorted(skeys, sup), len(skeys) - 1)
        assert len(sup) == 0 or bool((skeys[pos] == sup).all()), \
            "lineitem references a suppkey absent from supplier (FK)"
        nat = snat[pos]
        year = sd.astype("datetime64[Y]").astype(np.int64) + 1970
        k = nat * np.int64(8192) + (year - np.int64(1970))
        u, inv = np.unique(k, return_inverse=True)
        # int64-exact per-key sums (bincount weights are float64)
        s = np.zeros(len(u), dtype=np.int64)
        ordr = np.argsort(inv, kind="stable")
        seg = inv[ordr]
        if len(seg):
            starts = np.concatenate(
                [[0], np.flatnonzero(seg[1:] != seg[:-1]) + 1])
            s[seg[starts]] = np.add.reduceat(rev[ordr], starts)
        return pa.table({
            "k": pa.array(u),
            "ph": pa.array(s // np.int64(2**31)),
            "pl": pa.array(s % np.int64(2**31)),
        })

    m = (li.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby("k")
         .aggregate(Sum("ph", alias_name="ph"),
                    Sum("pl", alias_name="pl"))).to_pandas()

    ks = m["k"].to_numpy()
    prof = [int(h) * 2**31 + int(lo)
            for h, lo in zip(m["ph"].to_numpy(), m["pl"].to_numpy())]
    rows = sorted(
        (str(nation_name[int(k) // 8192]), int(k) % 8192 + 1970, p)
        for k, p in zip(ks, prof))
    return ray.data.from_arrow(pa.table({
        "nation": pa.array([r[0] for r in rows], type=pa.string()),
        "o_year": pa.array([r[1] for r in rows], type=pa.int64()),
        "profit_microcents": pa.array([r[2] for r in rows],
                                      type=pa.int64()),
    }))


def product_profit_sql(name_like: str = "red") -> str:
    """Oracle for :func:`product_profit` — the Q9 join tree in the
    engine's integer microcents domain, ship year standing in for the
    order year (documented deviation: no partsupp table)."""
    return f"""
SELECT n.n_name AS nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                * CAST(round((1 - l.l_discount) * 100, 0) AS BIGINT))
            AS BIGINT) AS profit_microcents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%{name_like}%'
GROUP BY 1, 2
ORDER BY 1, 2"""


def part_concentration(sf_dir: str, fraction_bp: int = 6):
    """TPC-H Q11 shape (important stock identification): parts whose
    share of total integer-exact revenue strictly exceeds
    ``fraction_bp`` / 10000 (Q11's value > total * FRACTION with
    FRACTION = 0.0001 at SF1) — (p_partkey, value_microcents) sorted by
    value desc.  Output is pigeonhole-bounded: fewer than
    10000 / fraction_bp parts can each hold more than fraction_bp/10000
    of the total, so the result always folds driver-side.

    Scale plan: zero joins — per-batch per-partkey revenue partials,
    ONE part-cardinality groupby on hi/lo lanes, then a second tiny
    lane aggregation over the GROUPED table for the global total; the
    HAVING is the exact integer cross-multiply 10000 * value > total,
    evaluated as value > total // fraction-scaled-floor (equivalent for
    integers), so no float share ever materializes.  Per-part values are
    reconstructed in int64 (exact while a single part stays under
    2^63 microcents ~ $92 B — a physical bound, documented).
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ext = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = (np.rint(ext * 100.0).astype(np.int64)
               * np.rint((1.0 - disc) * 100.0).astype(np.int64))
        u, inv = np.unique(pk, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        ordr = np.argsort(inv, kind="stable")
        seg = inv[ordr]
        if len(seg):
            starts = np.concatenate(
                [[0], np.flatnonzero(seg[1:] != seg[:-1]) + 1])
            s[seg[starts]] = np.add.reduceat(rev[ordr], starts)
        return pa.table({
            "p_partkey": pa.array(u),
            "vh": pa.array(s // np.int64(2**31)),
            "vl": pa.array(s % np.int64(2**31)),
        })

    per_part = (li.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)
                .groupby("p_partkey")
                .aggregate(Sum("vh", alias_name="vh"),
                           Sum("vl", alias_name="vl"))
                .materialize())

    tot = per_part.aggregate(Sum("vh"), Sum("vl"))
    total = ((int(tot["sum(vh)"] or 0) << 31) + int(tot["sum(vl)"] or 0))
    # 10000 * v > total  <=>  v > total // 10000 for integer v (exact)
    thr = min(total * fraction_bp // 10000, 2**63 - 1)

    def keep(batch: pa.Table) -> pa.Table:
        v = (batch["vh"].to_numpy(zero_copy_only=False) * np.int64(2**31)
             + batch["vl"].to_numpy(zero_copy_only=False))
        m = v > np.int64(thr)
        return pa.table({
            "p_partkey": pa.array(
                batch["p_partkey"].to_numpy(zero_copy_only=False)[m]),
            "value_microcents": pa.array(v[m]),
        })

    rows = (per_part.map_batches(keep, batch_format="pyarrow",
                                 batch_size=None).to_pandas()
            .sort_values(["value_microcents", "p_partkey"],
                         ascending=[False, True], ignore_index=True))
    return ray.data.from_arrow(pa.table({
        "p_partkey": pa.array(rows["p_partkey"].to_numpy()
                              .astype(np.int64)),
        "value_microcents": pa.array(rows["value_microcents"].to_numpy()
                                     .astype(np.int64)),
    }))


def part_concentration_sql(fraction_bp: int = 6) -> str:
    """Oracle for :func:`part_concentration` — Q11's global-scalar
    HAVING as a HUGEINT cross-multiply."""
    return f"""
WITH v AS (
  SELECT l_partkey AS p_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(round((1 - l_discount) * 100, 0) AS BIGINT))
              AS HUGEINT) AS value
  FROM lineitem GROUP BY 1),
t AS (SELECT CAST(coalesce(sum(value), 0) AS HUGEINT) AS total FROM v)
SELECT v.p_partkey AS p_partkey,
       CAST(v.value AS BIGINT) AS value_microcents
FROM v CROSS JOIN t
WHERE 10000 * v.value > {fraction_bp} * t.total
ORDER BY value_microcents DESC, p_partkey"""


def late_shipments(sf_dir: str, start: str = "1996-01-01",
                   end: str = "1997-01-01", bucket_days: int = 30,
                   max_bucket: int = 5, n_parts: int = 64):
    """TPC-H Q12 shape (shipping-mode / priority split): one year's
    lineitems joined to their orders, bucketed by shipping delay
    (floor((shipdate - orderdate) / 30 days), clamped to [0, 5]) with
    Q12's CASE split of high (1-URGENT / 2-HIGH) vs low priority —
    (delay_bucket, high_line_count, low_line_count) sorted.

    Scale plan: the window filter prunes lineitem BEFORE anything moves;
    each batch reduces to distinct (orderkey, shipdate, count) triples
    (same-day lines of one order collapse), which ride ONE orderkey
    co-partition join against the orders projection (orderkey,
    orderdate, is_high); delay and bucket are computed vectorized
    in-bucket and only (bucket, high, low) partials reach the final
    6-row groupby.  Negative delays clamp at 0 on BOTH engines (guards
    the floor-vs-truncate divide divergence on negatives the repo
    documents elsewhere).
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    s_us = np.datetime64(start).astype("datetime64[us]").astype(np.int64)
    e_us = np.datetime64(end).astype("datetime64[us]").astype(np.int64)
    bucket_us = np.int64(bucket_days) * 86_400_000_000

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_shipdate"])

    def li_partial(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        keep = (sd >= s_us) & (sd < e_us)
        ok, sd = ok[keep], sd[keep]
        df = pd.DataFrame({"l_orderkey": ok, "sd_us": sd})
        g = df.groupby(["l_orderkey", "sd_us"], sort=False) \
            .size().reset_index(name="n_lines")
        return pa.table({
            "l_orderkey": pa.array(g["l_orderkey"].to_numpy()
                                   .astype(np.int64)),
            "sd_us": pa.array(g["sd_us"].to_numpy().astype(np.int64)),
            "n_lines": pa.array(g["n_lines"].to_numpy().astype(np.int64)),
        })

    li_agg = li.map_batches(li_partial, batch_format="pyarrow",
                            batch_size=None)

    orders = (read_table(sf_dir, "orders",
                         columns=["o_orderkey", "o_orderdate",
                                  "o_orderpriority"])
              .map_batches(lambda b: pa.table({
                  "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                  "od_us": pa.array(
                      b["o_orderdate"].to_numpy(zero_copy_only=False)
                      .astype("datetime64[us]").astype(np.int64)),
                  "is_high": pc.is_in(
                      b["o_orderpriority"],
                      value_set=pa.array(["1-URGENT", "2-HIGH"])),
              }), batch_format="pyarrow", batch_size=None))

    j = copartition_hash_join(li_agg, orders, on="l_orderkey",
                              right_on="o_orderkey", n_parts=n_parts,
                              how="inner")

    def bucketize(batch: pa.Table) -> pa.Table:
        sd = batch["sd_us"].to_numpy(zero_copy_only=False)
        od = batch["od_us"].to_numpy(zero_copy_only=False)
        nl = batch["n_lines"].to_numpy(zero_copy_only=False)
        hi = batch["is_high"].to_numpy(zero_copy_only=False).astype(bool)
        delay = np.maximum(sd - od, 0)
        b = np.minimum(delay // bucket_us, max_bucket)
        u, inv = np.unique(b, return_inverse=True)
        return pa.table({
            "delay_bucket": pa.array(u),
            "h": pa.array(np.bincount(inv, weights=np.where(hi, nl, 0),
                                      minlength=len(u)).astype(np.int64)),
            "lo": pa.array(np.bincount(inv, weights=np.where(hi, 0, nl),
                                       minlength=len(u)).astype(np.int64)),
        })

    m = (j.map_batches(bucketize, batch_format="pyarrow", batch_size=None)
         .groupby("delay_bucket")
         .aggregate(Sum("h", alias_name="high_line_count"),
                    Sum("lo", alias_name="low_line_count"))).to_pandas() \
        .sort_values("delay_bucket", ignore_index=True)
    return ray.data.from_arrow(pa.table({
        "delay_bucket": pa.array(m["delay_bucket"].to_numpy()
                                 .astype(np.int64)),
        "high_line_count": pa.array(m["high_line_count"].to_numpy()
                                    .astype(np.int64)),
        "low_line_count": pa.array(m["low_line_count"].to_numpy()
                                   .astype(np.int64)),
    }))


def late_shipments_sql(start: str = "1996-01-01",
                       end: str = "1997-01-01", bucket_days: int = 30,
                       max_bucket: int = 5) -> str:
    """Oracle for :func:`late_shipments` — Q12's CASE split over the
    engine's clamped integer delay buckets."""
    bucket_us = bucket_days * 86_400_000_000
    return f"""
WITH j AS (
  SELECT GREATEST(epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate),
                  0) AS delay_us,
         o.o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_high
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate >= TIMESTAMP '{start}'
    AND l.l_shipdate < TIMESTAMP '{end}')
SELECT CAST(LEAST(delay_us // {bucket_us}, {max_bucket}) AS BIGINT)
         AS delay_bucket,
       CAST(coalesce(count(*) FILTER (is_high), 0) AS BIGINT)
         AS high_line_count,
       CAST(coalesce(count(*) FILTER (NOT is_high), 0) AS BIGINT)
         AS low_line_count
FROM j GROUP BY 1 ORDER BY 1"""


def order_overlap(sf_dir: str, n_parts: int = 64):
    """Interval-overlap self-join per customer: each order spans
    [orderdate, last shipdate of its lineitems] (orders with no lineitem
    drop — inner semantics); count, per customer, the unordered pairs of
    their orders whose spans overlap — (c_custkey, n_orders,
    n_overlap_pairs).  The temporal-join primitive (campaign/session
    overlap analysis) that SQL writes as a quadratic self-join.

    Scale plan: lineitem pre-aggregates per-batch per-orderkey max
    shipdate partials into ONE orderkey-cardinality Max groupby; the
    span table co-partition-joins orders on orderkey; a second custkey
    co-partition then counts overlaps WITHOUT the quadratic pair join:
    within each bucket, customers are factorized and every span is
    encoded rank * 50000 + day (day < 50000 pins spans of different
    customers to disjoint ranges), so ONE global sort + ONE searchsorted
    per bucket yields, for every order j, the count of same-customer
    spans ending strictly before s_j — and

        overlap_pairs = C(k, 2) - #{ordered (i, j): e_i < s_j}

    (disjoint unordered pairs contribute exactly one ordered term:
    e_i < s_j <= e_j < s_i is a contradiction).  Days floor-divide from
    epoch microseconds on BOTH engines (all source timestamps are
    midnight-aligned dates; non-negative post-1970 epochs make SQL's
    truncating // identical to floor).
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    day_us = np.int64(86_400_000_000)

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_shipdate"])

    def li_partial(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        order = np.argsort(ok, kind="stable")
        ok, sd = ok[order], sd[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(ok[1:] != ok[:-1]) + 1]) \
            if len(ok) else np.empty(0, np.int64)
        u = ok[starts.astype(np.int64)] if len(ok) else ok
        e = np.maximum.reduceat(sd, starts) if len(ok) else sd
        return pa.table({"l_orderkey": pa.array(u),
                         "pe": pa.array(e // day_us)})

    # NO orderkey-cardinality Ray Aggregate: per-batch max partials
    # (duplicate orderkeys across batches are fine) ride the orderkey
    # co-partition directly, and the per-order max finishes INSIDE the
    # merge block — hash co-partitioning guarantees every partial of an
    # orderkey lands in the same part, and map_batches(batch_size=None)
    # sees one whole part block per call.  (The Max-groupby variant ran
    # ~10x slower: Ray's sort aggregate costs ~84us/row on the ~0.5M
    # partial rows.)
    spans = li.map_batches(li_partial, batch_format="pyarrow",
                           batch_size=None)

    orders = (read_table(sf_dir, "orders",
                         columns=["o_orderkey", "o_custkey",
                                  "o_orderdate"])
              .map_batches(lambda b: pa.table({
                  "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                  "o_custkey": pc.cast(b["o_custkey"], pa.int64()),
                  "s_day": pa.array(
                      b["o_orderdate"].to_numpy(zero_copy_only=False)
                      .astype("datetime64[us]").astype(np.int64) // day_us),
              }), batch_format="pyarrow", batch_size=None))

    j = copartition_hash_join(orders, spans, on="o_orderkey",
                              right_on="l_orderkey", n_parts=n_parts,
                              how="inner")

    P = np.int64(n_parts)

    def tag_cust(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sd = batch["s_day"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pe = batch["pe"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-order max WITHIN this block; the orderkey RIDES the blob
        # so the custkey stage can re-merge partials if Ray's dynamic
        # block splitting ever splits a co-partition group's output
        # across map_batches calls (review finding — block integrity is
        # not a Ray contract, unlike map_groups group integrity)
        order = np.argsort(ok, kind="stable")
        ok, c, sd, pe = ok[order], c[order], sd[order], pe[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(ok[1:] != ok[:-1]) + 1]) \
            if len(ok) else np.empty(0, np.int64)
        si = starts.astype(np.int64)
        e = np.maximum.reduceat(pe, si) if len(ok) \
            else pe
        ok1 = ok[si] if len(ok) else ok
        c1 = c[si] if len(ok) else c
        s1 = sd[si] if len(ok) else sd
        # compact to one Arrow-IPC blob row per (block, part): the
        # custkey exchange then sorts ~n_parts rows per block instead of
        # one row per ORDER (Ray's sort shuffle costs ~84us/raw row)
        part = (c1 % P).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, ok1, c1, s1, e = (part[ordp], ok1[ordp], c1[ordp],
                                s1[ordp], e[ordp])
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "o": pa.array(ok1[a_:b_]),
                "c": pa.array(c1[a_:b_]),
                "s": pa.array(s1[a_:b_]),
                "e": pa.array(e[a_:b_])})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def count_overlaps(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"o": pa.array([], type=pa.int64()),
             "c": pa.array([], type=pa.int64()),
             "s": pa.array([], type=pa.int64()),
             "e": pa.array([], type=pa.int64())})
        o_ = t["o"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        s0 = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        e0 = t["e"].to_numpy(zero_copy_only=False).astype(np.int64)
        # re-merge per-order partials that arrived split (s0 constant
        # per order; the span end is the max of partial maxima)
        om = np.argsort(o_, kind="stable")
        o_, c, s0, e0 = o_[om], c[om], s0[om], e0[om]
        ost = np.concatenate(
            [[0], np.flatnonzero(o_[1:] != o_[:-1]) + 1]) \
            .astype(np.int64) if len(o_) else np.empty(0, np.int64)
        if len(o_):
            c = c[ost]
            s0 = s0[ost]
            e0 = np.maximum.reduceat(e0, ost)
        # normalize: the synthetic corpus ships some lines BEFORE the
        # order date, so the span is [min, max] (LEAST/GREATEST in the
        # oracle) — the disjoint-pair identity requires e >= s
        s = np.minimum(s0, e0)
        e = np.maximum(s0, e0)
        assert len(s) == 0 or (s.min() >= 0 and e.max() < 50000), \
            "order_overlap day encoding assumes days in [0, 50000)"
        uniq, rank = np.unique(c, return_inverse=True)
        base = rank.astype(np.int64) * np.int64(50000)
        enc_e = np.sort(base + e)
        k = np.bincount(rank, minlength=len(uniq)).astype(np.int64)
        # ordered disjoint terms: same-customer spans ending before s_j.
        # searchsorted also counts EVERY span of lower-ranked customers
        # (their encodings all sort below this customer's block), so
        # subtract the per-rank prefix count.
        prefix = np.concatenate([[0], np.cumsum(k)[:-1]]).astype(np.int64)
        before = (np.searchsorted(enc_e, base + s, side="left")
                  - prefix[rank])
        disj = np.bincount(rank, weights=before,
                           minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "c_custkey": pa.array(uniq),
            "n_orders": pa.array(k),
            "n_overlap_pairs": pa.array(k * (k - 1) // 2 - disj),
        })

    return (j.map_batches(tag_cust, batch_format="pyarrow",
                          batch_size=None)
            .groupby("part")
            .map_groups(count_overlaps, batch_format="pandas"))


def order_overlap_sql() -> str:
    """Oracle for :func:`order_overlap` — the quadratic per-customer
    interval self-join the engine's sweep replaces."""
    return """
WITH oi AS (
  SELECT o.o_orderkey, o.o_custkey,
         LEAST(epoch_us(o.o_orderdate) // 86400000000,
               max(epoch_us(l.l_shipdate) // 86400000000)) AS s,
         GREATEST(epoch_us(o.o_orderdate) // 86400000000,
                  max(epoch_us(l.l_shipdate) // 86400000000)) AS e
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_custkey, o.o_orderdate),
p AS (
  SELECT a.o_custkey AS c, CAST(count(*) AS BIGINT) AS np
  FROM oi a JOIN oi b
    ON b.o_custkey = a.o_custkey AND b.o_orderkey > a.o_orderkey
   AND a.s <= b.e AND b.s <= a.e
  GROUP BY 1),
k AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM oi GROUP BY 1)
SELECT k.o_custkey AS c_custkey, k.n_orders,
       coalesce(p.np, 0) AS n_overlap_pairs
FROM k LEFT JOIN p ON p.c = k.o_custkey"""


def excess_shippers(sf_dir: str, name_like: str = "red",
                    start: str = "1996-01-01", end: str = "1997-01-01",
                    frac_bp: int = 2500, n_parts: int = 64):
    """TPC-H Q20 shape (excess-share shippers) — completes the Q1-Q22
    sweep.  The reference corpus has no partsupp table, so Q20's
    "availqty > half the shipped quantity" test adapts to shipped share:
    for each part whose name contains ``name_like``, a supplier
    qualifies when its window-shipped quantity exceeds
    ``frac_bp``/10000 of the part's total shipped quantity; output is
    (s_suppkey, s_name, n_parts_qualified) for suppliers with at least
    one qualifying part, suppkey-sorted.

    Scale plan: the name-filtered part list is dimension-sized (LIKE
    selectivity ~1/8 of an already-small table) and broadcasts once as
    sorted keys; lineitem streams ONCE behind the window + membership
    filter, pre-summing integral quantities per (partkey, suppkey)
    in-batch (lexsort + reduceat), and the partials ride a
    partkey-hashed blob co-partition (one Arrow-IPC row per (batch,
    part) — never one Ray-sort row per pair) so each part's total and
    the 10000*q > frac_bp*tq integer cross-multiply finish INSIDE the
    merge block; only supplier-cardinality (suppkey, count) partials
    reach the final groupby, and s_name attaches via a key-filtered
    dimension read (searchsorted, no dict loop).  Quantities are
    integral by corpus contract (round(q, 0) == q; mirrored with
    CAST(round(..)) in SQL), so the share test is exact in int64:
    10000 * q <= ~1e4 * part total stays far below 2^63 even at 100 TB.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    s_us = np.datetime64(start).astype("datetime64[us]").astype(np.int64)
    e_us = np.datetime64(end).astype("datetime64[us]").astype(np.int64)

    pt = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_name"])
    sel = pc.match_substring(pt["p_name"], name_like)
    pkeys = np.sort(pc.cast(pt.filter(sel)["p_partkey"], pa.int64())
                    .to_numpy(zero_copy_only=False))
    pkeys_ref = ray.put(pkeys)

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_quantity",
                             "l_shipdate"])

    def partials(batch: pa.Table) -> pa.Table:
        from ..state.bcast import cached_get

        keys = cached_get(pkeys_ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        m = (sd >= s_us) & (sd < e_us) & _sorted_membership(keys, pk)
        pk = pk[m]
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[m]
        q = np.rint(batch["l_quantity"].to_numpy(zero_copy_only=False)
                    [m]).astype(np.int64)
        order = np.lexsort((sk, pk))
        pk, sk, q = pk[order], sk[order], q[order]
        new = np.concatenate(
            [[True], (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])]) \
            if len(pk) else np.zeros(0, dtype=bool)
        starts = np.flatnonzero(new).astype(np.int64)
        qs = np.add.reduceat(q, starts) if len(pk) \
            else np.empty(0, np.int64)
        pk, sk = pk[new], sk[new]
        # blob-compact per target partition (see order_overlap.tag_cust)
        part = _part_of(pk, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, pk, sk, qs = part[ordp], pk[ordp], sk[ordp], qs[ordp]
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "pk": pa.array(pk[a_:b_]),
                "sk": pa.array(sk[a_:b_]),
                "q": pa.array(qs[a_:b_])})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def qualify(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"pk": pa.array([], type=pa.int64()),
             "sk": pa.array([], type=pa.int64()),
             "q": pa.array([], type=pa.int64())})
        pk = t["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["sk"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = t["q"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((sk, pk))
        pk, sk, q = pk[order], sk[order], q[order]
        if not len(pk):
            return pa.table({"l_suppkey": pa.array([], type=pa.int64()),
                             "pc_": pa.array([], type=pa.int64())})
        # merge cross-batch partials of the same (part, supplier)
        new = np.concatenate(
            [[True], (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])])
        starts = np.flatnonzero(new).astype(np.int64)
        q = np.add.reduceat(q, starts)
        pk, sk = pk[new], sk[new]
        # per-part totals (every partial of a partkey is in this block)
        pnew = np.concatenate([[True], pk[1:] != pk[:-1]])
        pseg = np.cumsum(pnew) - 1
        tq = np.zeros(int(pseg[-1]) + 1, dtype=np.int64)
        np.add.at(tq, pseg, q)
        winners = sk[10000 * q > np.int64(frac_bp) * tq[pseg]]
        u, inv = np.unique(winners, return_inverse=True)
        return pa.table({
            "l_suppkey": pa.array(u),
            "pc_": pa.array(np.bincount(inv, minlength=len(u))
                            .astype(np.int64)),
        })

    counts = (li.map_batches(partials, batch_format="pyarrow",
                             batch_size=None)
              .groupby("part")
              .map_groups(qualify, batch_format="pandas")
              .groupby("l_suppkey")
              .aggregate(Sum("pc_", alias_name="n_parts_qualified"))
              .take_all())
    sk = np.array([r["l_suppkey"] for r in counts], dtype=np.int64)
    nq = np.array([r["n_parts_qualified"] for r in counts],
                  dtype=np.int64)
    order = np.argsort(sk)
    sk, nq = sk[order], nq[order]
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"],
                        filters=[("s_suppkey", "in", sk.tolist())]
                        if len(sk) else None)
    skeys = pc.cast(sup["s_suppkey"], pa.int64()) \
        .to_numpy(zero_copy_only=False)
    sorder = np.argsort(skeys)
    idx = sorder[np.searchsorted(skeys[sorder], sk)] if len(sk) \
        else np.empty(0, np.int64)
    return ray.data.from_arrow(pa.table({
        "s_suppkey": pa.array(sk),
        "s_name": sup["s_name"].take(pa.array(idx, type=pa.int64())),
        "n_parts_qualified": pa.array(nq),
    }))


def excess_shippers_sql(name_like: str = "red",
                        start: str = "1996-01-01",
                        end: str = "1997-01-01",
                        frac_bp: int = 2500) -> str:
    """Oracle for :func:`excess_shippers` — Q20's semi-join shape over
    the shipped-share adaptation, integer cross-multiplied."""
    return f"""
WITH p AS (SELECT p_partkey FROM part
           WHERE p_name LIKE '%{name_like}%'),
sq AS (SELECT l_partkey, l_suppkey,
              CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
                AS q
       FROM lineitem JOIN p ON p.p_partkey = l_partkey
       WHERE l_shipdate >= TIMESTAMP '{start}'
         AND l_shipdate < TIMESTAMP '{end}'
       GROUP BY 1, 2),
t AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS tq
      FROM sq GROUP BY 1),
qual AS (SELECT sq.l_suppkey,
                CAST(count(*) AS BIGINT) AS n_parts_qualified
         FROM sq JOIN t USING (l_partkey)
         WHERE 10000 * sq.q > {frac_bp} * t.tq
         GROUP BY 1)
SELECT s.s_suppkey, s.s_name, q.n_parts_qualified
FROM qual q JOIN supplier s ON s.s_suppkey = q.l_suppkey
ORDER BY 1"""


def covered_days(sf_dir: str, span_days: int = 30, n_parts: int = 64):
    """Interval-union coverage per customer (gaps-and-islands): each
    order opens a [orderdate, orderdate + ``span_days``) activity
    window; overlapping windows of one customer merge, and the output is
    (c_custkey, covered_days, n_islands) — total union length and the
    number of disjoint activity islands.  The interval-union primitive
    SQL writes with a running-max window; the engine's sibling of
    order_overlap's pair count.

    Scale plan: orders stream once into a custkey-hashed blob
    co-partition (one Arrow-IPC row per (batch, part)); inside each
    merge block ONE lexsort by (customer, start) plus the rank*50000+day
    offset encoding (days < 50000 asserted, like order_overlap) makes
    the within-customer running max a single global
    np.maximum.accumulate — island breaks, per-island spans and
    per-customer sums all fall out of reduceat, no per-customer loop.
    Day floor-division is exact on both engines (post-1970 midnight
    dates).  Tie starts cannot split an island (e = s + span > s), so
    the SQL window's nondeterministic tie order is result-stable.
    """
    import ray.data

    from ..sources.readers import read_table

    day_us = np.int64(86_400_000_000)
    span = np.int64(span_days)

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate"])

    P = np.int64(n_parts)

    def tag(batch: pa.Table) -> pa.Table:
        c = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // day_us
        part = _part_of(c, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, c, s = part[ordp], c[ordp], s[ordp]
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "c": pa.array(c[a_:b_]), "s": pa.array(s[a_:b_])})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def merge(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"c": pa.array([], type=pa.int64()),
             "s": pa.array([], type=pa.int64())})
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(c):
            return pa.table({
                "c_custkey": pa.array([], type=pa.int64()),
                "covered_days": pa.array([], type=pa.int64()),
                "n_islands": pa.array([], type=pa.int64())})
        e = s + span
        assert s.min() >= 0 and e.max() < 50000, \
            "covered_days day encoding assumes days in [0, 50000)"
        order = np.lexsort((s, c))
        c, s, e = c[order], s[order], e[order]
        uniq, rank = np.unique(c, return_inverse=True)
        base = rank.astype(np.int64) * np.int64(50000)
        run = np.maximum.accumulate(base + e)
        prev = np.concatenate([[np.int64(-1)], run[:-1]])
        # break at a customer's first row (prev max belongs to an
        # earlier rank block) or when this start clears the running max
        brk = (prev < base) | (base + s > prev)
        isl = np.cumsum(brk) - 1
        istarts = np.flatnonzero(brk).astype(np.int64)
        ilen = np.maximum.reduceat(e, istarts) - s[istarts]
        irank = rank[istarts]
        cov = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(cov, irank, ilen)
        nisl = np.bincount(irank, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "c_custkey": pa.array(uniq),
            "covered_days": pa.array(cov),
            "n_islands": pa.array(nisl),
        })

    return (orders.map_batches(tag, batch_format="pyarrow",
                               batch_size=None)
            .groupby("part")
            .map_groups(merge, batch_format="pandas"))


def covered_days_sql(span_days: int = 30) -> str:
    """Oracle for :func:`covered_days` — the running-max
    gaps-and-islands window the engine's offset-encoded sweep replaces."""
    return f"""
WITH iv AS (
  SELECT o_custkey AS c,
         epoch_us(o_orderdate) // 86400000000 AS s,
         epoch_us(o_orderdate) // 86400000000 + {span_days} AS e
  FROM orders),
w AS (SELECT c, s, e,
             max(e) OVER (PARTITION BY c ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_max
      FROM iv),
g AS (SELECT c, s, e,
             CASE WHEN prev_max IS NULL OR s > prev_max
                  THEN 1 ELSE 0 END AS brk
      FROM w),
isl AS (SELECT c, s, e,
               sum(brk) OVER (PARTITION BY c ORDER BY s
                              ROWS UNBOUNDED PRECEDING) AS island
        FROM g),
m AS (SELECT c, island, max(e) - min(s) AS len
      FROM isl GROUP BY 1, 2)
SELECT c AS c_custkey, CAST(sum(len) AS BIGINT) AS covered_days,
       CAST(count(*) AS BIGINT) AS n_islands
FROM m GROUP BY 1 ORDER BY 1"""


def order_cadence(sf_dir: str, n_parts: int = 64):
    """Per-customer reorder cadence: gaps between CONSECUTIVE order days
    (the LAG window) — (c_custkey, n_orders, max_gap_days,
    avg_gap_days) for customers with at least two orders.  max_gap is
    the longest dormancy; avg telescopes to (max-min)/(n-1) and is
    mirrored as one float chain.

    Scale plan: same custkey-hashed blob co-partition as covered_days;
    inside each merge block one lexsort by (customer, day) yields every
    consecutive diff vectorized (d[1:] - d[:-1] masked to same-customer
    adjacency), per-customer maxima via the offset-encoded
    maximum.reduceat, and only customer-cardinality rows leave the
    block.  No Ray sort ever sees an order-cardinality row.
    """
    import ray.data

    from ..sources.readers import read_table

    day_us = np.int64(86_400_000_000)

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate"])

    def tag(batch: pa.Table) -> pa.Table:
        c = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // day_us
        part = _part_of(c, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, c, s = part[ordp], c[ordp], s[ordp]
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "c": pa.array(c[a_:b_]), "d": pa.array(s[a_:b_])})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def merge(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"c": pa.array([], type=pa.int64()),
             "d": pa.array([], type=pa.int64())})
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table({
            "c_custkey": pa.array([], type=pa.int64()),
            "n_orders": pa.array([], type=pa.int64()),
            "max_gap_days": pa.array([], type=pa.int64()),
            "avg_gap_days": pa.array([], type=pa.float64())})
        if not len(c):
            return empty
        order = np.lexsort((d, c))
        c, d = c[order], d[order]
        uniq, rank = np.unique(c, return_inverse=True)
        n = np.bincount(rank, minlength=len(uniq)).astype(np.int64)
        keep = n >= 2
        if not keep.any():
            return empty
        same = np.concatenate([[False], c[1:] == c[:-1]])
        gaps = np.concatenate([[np.int64(0)], d[1:] - d[:-1]])
        # per-customer max gap: offset-encode so one reduceat suffices
        assert gaps.max(initial=0) < 50000, \
            "order_cadence gap encoding assumes day gaps in [0, 50000)"
        enc = np.where(same, gaps, np.int64(-1)) + np.int64(1)
        cstarts = np.flatnonzero(
            np.concatenate([[True], c[1:] != c[:-1]])).astype(np.int64)
        mx = np.maximum.reduceat(enc, cstarts) - 1
        first = d[cstarts]
        last = d[np.concatenate([cstarts[1:] - 1,
                                 [len(d) - 1]]).astype(np.int64)]
        avg = (last - first).astype(np.float64) \
            / np.maximum(n - 1, 1).astype(np.float64)
        from .text import round_half_away
        return pa.table({
            "c_custkey": pa.array(uniq[keep]),
            "n_orders": pa.array(n[keep]),
            "max_gap_days": pa.array(mx[keep]),
            "avg_gap_days": pa.array(round_half_away(avg[keep])),
        })

    return (orders.map_batches(tag, batch_format="pyarrow",
                               batch_size=None)
            .groupby("part")
            .map_groups(merge, batch_format="pandas"))


ORDER_CADENCE_SQL = """
WITH d AS (SELECT o_custkey,
                  epoch_us(o_orderdate) // 86400000000 AS day
           FROM orders),
g AS (SELECT o_custkey,
             day - lag(day) OVER (PARTITION BY o_custkey
                                  ORDER BY day) AS gap
      FROM d),
m AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
             min(day) AS mn, max(day) AS mx
      FROM d GROUP BY 1)
SELECT m.o_custkey AS c_custkey, m.n_orders,
       CAST(max(g.gap) AS BIGINT) AS max_gap_days,
       round(CAST(m.mx - m.mn AS DOUBLE)
             / CAST(m.n_orders - 1 AS DOUBLE), 6) AS avg_gap_days
FROM m JOIN g ON g.o_custkey = m.o_custkey
WHERE m.n_orders >= 2 AND g.gap IS NOT NULL
GROUP BY 1, 2, m.mx, m.mn ORDER BY 1"""


def basket_pairs(sf_dir: str, k: int = 100, n_parts: int = 64):
    """Market-basket part co-occurrence: the top ``k`` unordered part
    pairs by the number of orders containing BOTH — (p1, p2,
    n_orders), count DESC then (p1, p2).  The candidate-generation
    step of frequent-itemset mining, which SQL writes as a quadratic
    self-join on orderkey.

    Scale plan: lineitem reduces in-batch to DISTINCT (orderkey,
    partkey) (lexsort dedupe); ONE orderkey-hashed blob co-partition
    co-locates each order's parts, where pairs enumerate vectorized
    per order (repeat/concatenate over segment sizes — per-order part
    counts are small, C(n,2) bounded by basket size, never a corpus
    blowup) and collapse to per-block (pair, count) partials keyed as
    p1 * 2^32 + p2; the pair groupby is co-occurrence-cardinality, and
    the top-k cut is the standard two-level local merge.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey"])

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        new = np.concatenate(
            [[True], (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])]) \
            if len(ok) else np.zeros(0, dtype=bool)
        ok, pk = ok[new], pk[new]
        part = _part_of(ok, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, ok, pk = part[ordp], ok[ordp], pk[ordp]
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "ok": pa.array(ok[a_:b_]), "pk": pa.array(pk[a_:b_])})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    SH = np.int64(1) << 32

    def enum_pairs(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"ok": pa.array([], type=pa.int64()),
             "pk": pa.array([], type=pa.int64())})
        ok = t["ok"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = t["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ok):
            return pa.table({"pair": pa.array([], type=pa.int64()),
                             "pn": pa.array([], type=pa.int64())})
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        # cross-batch duplicates of (order, part) merge here
        new = np.concatenate(
            [[True], (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])])
        ok, pk = ok[new], pk[new]
        assert pk.max(initial=0) < (1 << 31), \
            "basket_pairs pair key assumes partkey < 2^31"
        onew = np.concatenate([[True], ok[1:] != ok[:-1]])
        starts = np.flatnonzero(onew).astype(np.int64)
        sizes = np.diff(np.concatenate([starts, [len(ok)]])) \
            .astype(np.int64)
        # vectorized within-order pair enumeration: for each order of
        # size s, indices (u, v) with u < v
        # u runs 0..s-2 within each order, each u pairing with the
        # s-1-u following parts: fully vectorized ragged enumeration
        # (no per-order Python loop — that cost ~2s/leg at sf0.1)
        nu = np.maximum(sizes - 1, 0)
        u_order = np.repeat(np.arange(len(sizes), dtype=np.int64), nu)
        u_within = np.arange(int(nu.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(nu) - nu, nu)
        u_idx = starts[u_order] + u_within
        cnt_u = sizes[u_order] - 1 - u_within
        left = np.repeat(u_idx, cnt_u)
        off = np.arange(int(cnt_u.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(cnt_u) - cnt_u, cnt_u)
        right = left + 1 + off
        pair = pk[left] * SH + pk[right]
        uk, cnt = np.unique(pair, return_counts=True)
        # second blob exchange keyed by pair hash: a pair recurs across
        # MANY order blocks, so its global count needs one more
        # co-partition — blob rows, never a pair-cardinality Ray sort
        # (the r3 ~84us/raw-row lore; this cut the leg from 8.0s)
        p2 = _part_of(uk, n_parts).astype(np.int64)
        ordp = np.argsort(p2, kind="stable")
        p2, uk, cnt = p2[ordp], uk[ordp], cnt[ordp].astype(np.int64)
        bstarts = np.concatenate(
            [[0], np.flatnonzero(p2[1:] != p2[:-1]) + 1,
             [len(p2)]]) if len(p2) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(p2[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "pair": pa.array(uk[a_:b_]),
                "pn": pa.array(cnt[a_:b_])})))
        return pa.table({
            "part2": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def merge_topk(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"pair": pa.array([], type=pa.int64()),
             "pn": pa.array([], type=pa.int64())})
        pr = t["pair"].to_numpy(zero_copy_only=False).astype(np.int64)
        pn = t["pn"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(pr):
            return pa.table({"pair": pa.array([], type=pa.int64()),
                             "n_orders": pa.array([], type=pa.int64())})
        order = np.argsort(pr, kind="stable")
        pr, pn = pr[order], pn[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(pr[1:] != pr[:-1]) + 1]) \
            .astype(np.int64)
        tot = np.add.reduceat(pn, starts)
        pr = pr[starts]
        # each pair lives wholly in this partition -> local top-k is a
        # safe cut before the single-task global merge
        cut = np.lexsort((pr, -tot))[:k]
        return pa.table({"pair": pa.array(pr[cut]),
                         "n_orders": pa.array(tot[cut])})

    counts = (li.map_batches(distinct_pairs, batch_format="pyarrow",
                             batch_size=None)
              .groupby("part")
              .map_groups(enum_pairs, batch_format="pandas")
              .groupby("part2")
              .map_groups(merge_topk, batch_format="pandas"))

    def topk(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return batch
        n = batch["n_orders"].to_numpy(zero_copy_only=False)
        pr = batch["pair"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((pr, -n))[:k]
        return batch.take(pa.array(order))

    top = (counts.repartition(1)
           .map_batches(topk, batch_format="pyarrow", batch_size=None)
           .take_all())
    pr = np.array([r["pair"] for r in top], dtype=np.int64)
    n = np.array([r["n_orders"] for r in top], dtype=np.int64)
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "p1": pa.array((pr // SH).astype(np.int64)),
        "p2": pa.array((pr % SH).astype(np.int64)),
        "n_orders": pa.array(n),
    }))


def basket_pairs_sql(k: int = 100) -> str:
    """Oracle for :func:`basket_pairs` — the quadratic orderkey
    self-join the engine's co-partition enumeration replaces."""
    return f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pr AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
       FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
                          AND a.l_partkey < b.l_partkey)
SELECT p1, p2, CAST(count(*) AS BIGINT) AS n_orders
FROM pr GROUP BY 1, 2
ORDER BY n_orders DESC, p1, p2 LIMIT {k}"""


def peak_open_orders(sf_dir: str, span_days: int = 30):
    """Peak order concurrency: each order is open [orderdate,
    orderdate + ``span_days``); output the EARLIEST day with the most
    simultaneously-open orders — ONE row (peak_day, n_open).  The
    interval-stabbing max (capacity planning), computed as a delta
    sweep instead of a day x order join.

    Scale plan: each batch collapses to +1/-1 deltas per boundary day
    (calendar-bounded cardinality); ONE bounded groupby sums deltas and
    the driver's prefix sum over the sorted delta days finds the max —
    a step function attains its maximum at a +delta day, so scanning
    delta days only is exact.  All-integer.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    day_us = np.int64(86_400_000_000)
    span = np.int64(span_days)

    orders = read_table(sf_dir, "orders", columns=["o_orderdate"])

    def deltas(batch: pa.Table) -> pa.Table:
        s = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // day_us
        d = np.concatenate([s, s + span])
        x = np.concatenate([np.ones(len(s), dtype=np.int64),
                            -np.ones(len(s), dtype=np.int64)])
        u, inv = np.unique(d, return_inverse=True)
        return pa.table({
            "d": pa.array(u),
            "px": pa.array(np.bincount(inv, weights=x,
                                       minlength=len(u))
                           .astype(np.int64)),
        })

    agg = (orders.map_batches(deltas, batch_format="pyarrow",
                              batch_size=None)
           .groupby("d").aggregate(Sum("px", alias_name="dx"))) \
        .to_pandas().sort_values("d", ignore_index=True)
    if not len(agg):
        return ray.data.from_arrow(pa.table({
            "peak_day": pa.array([], type=pa.int64()),
            "n_open": pa.array([], type=pa.int64())}))
    run = np.cumsum(agg["dx"].to_numpy().astype(np.int64))
    best = int(np.argmax(run))            # earliest on ties
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "peak_day": pa.array([int(agg["d"].iloc[best])],
                             type=pa.int64()),
        "n_open": pa.array([int(run[best])], type=pa.int64()),
    }))


def peak_open_orders_sql(span_days: int = 30) -> str:
    """Oracle for :func:`peak_open_orders` — delta sweep with a running
    window sum, earliest-max rank."""
    return f"""
WITH iv AS (SELECT epoch_us(o_orderdate) // 86400000000 AS s
            FROM orders),
delta AS (SELECT s AS d, 1 AS x FROM iv
          UNION ALL SELECT s + {span_days}, -1 FROM iv),
agg AS (SELECT d, CAST(sum(x) AS BIGINT) AS dx FROM delta GROUP BY 1),
run AS (SELECT d, CAST(sum(dx) OVER (ORDER BY d
                                     ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS open
        FROM agg)
SELECT d AS peak_day, open AS n_open
FROM run ORDER BY open DESC, d LIMIT 1"""


def supplier_lead_time(sf_dir: str, n_parts: int = 64):
    """Per-supplier shipping lead time: delay = shipdate - orderdate in
    days over every lineitem — (s_suppkey, n_lines, avg_delay_days,
    max_delay_days), suppkey-sorted.  The supplier-latency profile
    (SLA monitoring); negative delays (pre-order shipments exist in the
    synthetic corpus) are kept raw on both engines.

    Scale plan: lineitem pre-collapses per-batch to (orderkey, suppkey,
    n, max_delay-partial...) — delay needs orderdate, so the lineitem
    stream rides ONE orderkey blob co-partition against the orders
    projection and delays evaluate vectorized inside the merge block;
    per-supplier (n, sum, max) partials leave each block and one
    supplier-cardinality groupby finishes.  sum(delay_days) stays in
    int64 (|delay| < 5e4, rows per supplier < 2e14 at 100 TB).
    """
    import ray.data
    from ray.data.aggregate import Max, Sum

    from ..sources.readers import read_table
    from .text import round_half_away

    day_us = np.int64(86_400_000_000)

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    def li_tag(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // day_us
        part = _part_of(ok, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, ok, sk, sd = part[ordp], ok[ordp], sk[ordp], sd[ordp]
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "ok": pa.array(ok[a_:b_]), "sk": pa.array(sk[a_:b_]),
                "sd": pa.array(sd[a_:b_]), "side": pa.array(
                    np.zeros(b_ - a_, dtype=np.int8))})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderdate"])

    def o_tag(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // day_us
        part = _part_of(ok, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, ok, od = part[ordp], ok[ordp], od[ordp]
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "ok": pa.array(ok[a_:b_]),
                "sk": pa.array(np.zeros(b_ - a_, dtype=np.int64)),
                "sd": pa.array(od[a_:b_]), "side": pa.array(
                    np.ones(b_ - a_, dtype=np.int8))})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    both = li.map_batches(li_tag, batch_format="pyarrow",
                          batch_size=None).union(
        orders.map_batches(o_tag, batch_format="pyarrow",
                           batch_size=None))

    def merge(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"ok": pa.array([], type=pa.int64()),
             "sk": pa.array([], type=pa.int64()),
             "sd": pa.array([], type=pa.int64()),
             "side": pa.array([], type=pa.int8())})
        ok = t["ok"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["sk"].to_numpy(zero_copy_only=False).astype(np.int64)
        sd = t["sd"].to_numpy(zero_copy_only=False).astype(np.int64)
        side = t["side"].to_numpy(zero_copy_only=False).astype(np.int8)
        empty = pa.table({"sk": pa.array([], type=pa.int64()),
                          "pn": pa.array([], type=pa.int64()),
                          "ps": pa.array([], type=pa.int64()),
                          "pm": pa.array([], type=pa.int64())})
        lhs = side == 0
        if not lhs.any():
            return empty
        o_ok, o_od = ok[~lhs], sd[~lhs]
        oorder = np.argsort(o_ok)
        o_ok, o_od = o_ok[oorder], o_od[oorder]
        pos = np.searchsorted(o_ok, ok[lhs])
        hit = (pos < len(o_ok)) & (o_ok[np.minimum(
            pos, max(len(o_ok) - 1, 0))] == ok[lhs]) if len(o_ok) \
            else np.zeros(int(lhs.sum()), dtype=bool)
        delay = sd[lhs][hit] - o_od[pos[hit]]
        skh = sk[lhs][hit]
        u, inv = np.unique(skh, return_inverse=True)
        if not len(u):
            return empty
        mx = np.full(len(u), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, delay)
        # np.add.at keeps the sum in int64 (bincount weights would
        # round-trip through float64)
        ps = np.zeros(len(u), dtype=np.int64)
        np.add.at(ps, inv, delay)
        return pa.table({
            "sk": pa.array(u),
            "pn": pa.array(np.bincount(inv, minlength=len(u))
                           .astype(np.int64)),
            "ps": pa.array(ps),
            "pm": pa.array(mx),
        })

    m = (both.groupby("part")
         .map_groups(merge, batch_format="pandas")
         .groupby("sk")
         .aggregate(Sum("pn", alias_name="n_lines"),
                    Sum("ps", alias_name="sum_delay"),
                    Max("pm", alias_name="max_delay_days"))).to_pandas() \
        .sort_values("sk", ignore_index=True)
    avg = np.array([
        float(round_half_away(np.float64(float(s_) / float(n_))))
        for s_, n_ in zip(m["sum_delay"], m["n_lines"])],
        dtype=np.float64) if len(m) else np.empty(0, np.float64)
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "s_suppkey": pa.array(m["sk"].to_numpy().astype(np.int64)
                              if len(m) else np.empty(0, np.int64)),
        "n_lines": pa.array(m["n_lines"].to_numpy().astype(np.int64)
                            if len(m) else np.empty(0, np.int64)),
        "avg_delay_days": pa.array(avg),
        "max_delay_days": pa.array(
            m["max_delay_days"].to_numpy().astype(np.int64)
            if len(m) else np.empty(0, np.int64)),
    }))


SUPPLIER_LEAD_TIME_SQL = """
WITH j AS (SELECT l.l_suppkey,
                  epoch_us(l.l_shipdate) // 86400000000
                    - epoch_us(o.o_orderdate) // 86400000000 AS delay
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
SELECT l_suppkey AS s_suppkey, CAST(count(*) AS BIGINT) AS n_lines,
       round(CAST(sum(delay) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS avg_delay_days,
       CAST(max(delay) AS BIGINT) AS max_delay_days
FROM j GROUP BY 1 ORDER BY 1"""


def order_size_hist(sf_dir: str, n_parts: int = 64):
    """Order-size histogram: lineitems per order, counted by size —
    (order_size, n_orders), size-sorted.  The basket-size distribution
    (the marginal of basket_pairs' enumeration).

    Scale plan: per-batch per-order count partials ride the orderkey
    blob co-partition; counts finish inside the merge block, each block
    emits (size, n) partials (size is basket-bounded) and one tiny
    groupby sums them.  All-integer.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey"])

    def tag(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        u, cnt = np.unique(ok, return_counts=True)
        part = _part_of(u, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, u, cnt = part[ordp], u[ordp], cnt[ordp].astype(np.int64)
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "ok": pa.array(u[a_:b_]), "c": pa.array(cnt[a_:b_])})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def merge(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"ok": pa.array([], type=pa.int64()),
             "c": pa.array([], type=pa.int64())})
        ok = t["ok"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ok):
            return pa.table({"sz": pa.array([], type=pa.int64()),
                             "pn": pa.array([], type=pa.int64())})
        order = np.argsort(ok, kind="stable")
        ok, c = ok[order], c[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(ok[1:] != ok[:-1]) + 1]).astype(np.int64)
        tot = np.add.reduceat(c, starts)
        sz, cnt = np.unique(tot, return_counts=True)
        return pa.table({"sz": pa.array(sz),
                         "pn": pa.array(cnt.astype(np.int64))})

    m = (li.map_batches(tag, batch_format="pyarrow", batch_size=None)
         .groupby("part")
         .map_groups(merge, batch_format="pandas")
         .groupby("sz").aggregate(Sum("pn", alias_name="n_orders"))) \
        .to_pandas().sort_values("sz", ignore_index=True)
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "order_size": pa.array(m["sz"].to_numpy().astype(np.int64)
                               if len(m) else np.empty(0, np.int64)),
        "n_orders": pa.array(m["n_orders"].to_numpy().astype(np.int64)
                             if len(m) else np.empty(0, np.int64)),
    }))


ORDER_SIZE_HIST_SQL = """
WITH c AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS sz
           FROM lineitem GROUP BY 1)
SELECT sz AS order_size, CAST(count(*) AS BIGINT) AS n_orders
FROM c GROUP BY 1 ORDER BY 1"""


def basket_lift(sf_dir: str, k: int = 100, n_parts: int = 64):
    """Association lift for the top-``k`` co-occurring part pairs:
    lift = P(a,b) / (P(a) P(b)) = n_ab * N / (n_a * n_b) over distinct
    order baskets — (p1, p2, n_orders, lift).  Lift >> 1 marks genuine
    affinity the raw co-occurrence count can't distinguish from two
    independently-popular parts; the scoring step of frequent-itemset
    mining on top of :func:`basket_pairs`.

    Scale plan: the top pairs come from basket_pairs' blob-exchange
    top-k (bounded); their <= 2k member parts broadcast as sorted keys;
    one more lineitem pass emits per-batch distinct (order, part)
    member rows PLUS one (order, -1) sentinel per order, and a single
    orderkey blob co-partition finishes the global distinct so each
    block yields exact per-part basket counts and its share of N.  The
    lift float chain is one mirrored expression over four exact ints.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table
    from .text import round_half_away

    top = basket_pairs(sf_dir, k=k, n_parts=n_parts).to_pandas()
    if not len(top):
        return ray.data.from_arrow(pa.table({
            "p1": pa.array([], type=pa.int64()),
            "p2": pa.array([], type=pa.int64()),
            "n_orders": pa.array([], type=pa.int64()),
            "lift": pa.array([], type=pa.float64())}))
    members = np.unique(np.concatenate(
        [top["p1"].to_numpy(), top["p2"].to_numpy()]).astype(np.int64))
    mem_ref = ray.put(members)

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey"])

    def tag(batch: pa.Table) -> pa.Table:
        from ..state.bcast import cached_get

        mem = cached_get(mem_ref)
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _sorted_membership(mem, pk)
        okm, pkm = ok[m], pk[m]
        # member rows + one sentinel row per order (for N)
        ok2 = np.concatenate([okm, np.unique(ok)])
        pk2 = np.concatenate([pkm, np.full(len(np.unique(ok)), -1,
                                           dtype=np.int64)])
        # stride matches basket_pairs' partkey bound (pk < 2^31), not
        # the former 2^21 that broke past TPC-H SF ~10 (review finding)
        assert (len(ok2) == 0
                or (ok2.max() < (1 << 32)
                    and pk2.max() < (1 << 31) - 1)), \
            "basket_lift key packing assumes ok < 2^32, pk < 2^31-1"
        key = ok2 * np.int64(1 << 31) + (pk2 + 1)
        uk = np.unique(key)
        ok3 = uk >> 31
        pk3 = (uk & ((1 << 31) - 1)) - 1
        part = _part_of(ok3, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, ok3, pk3 = part[ordp], ok3[ordp], pk3[ordp]
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "ok": pa.array(ok3[a_:b_]),
                "pk": pa.array(pk3[a_:b_])})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def merge(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"ok": pa.array([], type=pa.int64()),
             "pk": pa.array([], type=pa.int64())})
        ok = t["ok"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = t["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ok):
            return pa.table({"pk": pa.array([], type=pa.int64()),
                             "pn": pa.array([], type=pa.int64())})
        key = ok * np.int64(1 << 21) + (pk + 1)
        uk = np.unique(key)            # global distinct (order, part)
        pk2 = ((uk & ((1 << 21) - 1)) - 1).astype(np.int64)
        u, cnt = np.unique(pk2, return_counts=True)
        return pa.table({"pk": pa.array(u),
                         "pn": pa.array(cnt.astype(np.int64))})

    cnts = (li.map_batches(tag, batch_format="pyarrow", batch_size=None)
            .groupby("part")
            .map_groups(merge, batch_format="pandas")
            .groupby("pk").aggregate(Sum("pn", alias_name="n"))) \
        .to_pandas()
    nmap = dict(zip(cnts["pk"].astype(int), cnts["n"].astype(int)))
    N = nmap.pop(-1, 0)
    lift = [float(round_half_away(np.float64(
        float(int(r["n_orders"])) * float(N)
        / (float(nmap[int(r["p1"])]) * float(nmap[int(r["p2"])])))))
        for _, r in top.iterrows()]
    return ray.data.from_arrow(pa.table({
        "p1": pa.array(top["p1"].to_numpy().astype(np.int64)),
        "p2": pa.array(top["p2"].to_numpy().astype(np.int64)),
        "n_orders": pa.array(top["n_orders"].to_numpy()
                             .astype(np.int64)),
        "lift": pa.array(lift, type=pa.float64()),
    }))


def basket_lift_sql(k: int = 100) -> str:
    """Oracle for :func:`basket_lift` — lift over the same top-k pair
    selection, one mirrored float expression."""
    return f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pr AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
       FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
                          AND a.l_partkey < b.l_partkey),
top AS (SELECT p1, p2, CAST(count(*) AS BIGINT) AS n_orders
        FROM pr GROUP BY 1, 2
        ORDER BY n_orders DESC, p1, p2 LIMIT {k}),
na AS (SELECT l_partkey,
              CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n
       FROM lp GROUP BY 1),
nn AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n
       FROM lineitem)
SELECT t.p1, t.p2, t.n_orders,
       round(CAST(t.n_orders AS DOUBLE) * CAST(nn.n AS DOUBLE)
             / (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE)), 6) AS lift
FROM top t JOIN na a ON a.l_partkey = t.p1
JOIN na b ON b.l_partkey = t.p2
CROSS JOIN nn ORDER BY 1, 2"""


def customer_concentration(sf_dir: str, top_frac: float = 0.01,
                           money_bucket: int = 1 << 20,
                           n_parts: int = 64):
    """Revenue concentration: the share of lifetime revenue held by the
    top ``top_frac`` of customers (by revenue, custkey tie-break) —
    ONE row (n_customers, total_cents, top_cents, top_share).  The
    inequality statistic ("do 1% of customers carry the book?").

    Scale plan: customer revenue cents finish inside ONE custkey blob
    co-partition and materialize once (customer-cardinality, the rfm
    contract); a bucket pass aggregates (count, cents) per revenue
    range — bounded by value SPREAD — so the driver locates the
    top-cut rank's bucket from exclusive offsets; full buckets above
    the cut contribute their exact sums and ONLY the cut bucket's
    customers (~1/spread of the table) are fetched and sorted.  All
    arithmetic is integer; the share is the single mirrored division;
    the cut size ceil(top_frac * n) is the same double ceil on both
    engines.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table
    from ..state.bcast import cached_get
    from .text import round_half_away

    VB = np.int64(money_bucket)

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_totalprice"])

    def tag(batch: pa.Table) -> pa.Table:
        c = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = np.rint(batch["o_totalprice"]
                        .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        u, inv = np.unique(c, return_inverse=True)
        ps = np.zeros(len(u), dtype=np.int64)
        np.add.at(ps, inv, cents)
        part = _part_of(u, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, u, ps = part[ordp], u[ordp], ps[ordp]
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1,
             [len(part)]]) if len(part) else np.array([0, 0])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "c": pa.array(u[a_:b_]), "m": pa.array(ps[a_:b_])})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def merge(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"c": pa.array([], type=pa.int64()),
             "m": pa.array([], type=pa.int64())})
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = t["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(c):
            return pa.table({"c": pa.array([], type=pa.int64()),
                             "m": pa.array([], type=pa.int64())})
        order = np.argsort(c, kind="stable")
        c, m = c[order], m[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(c[1:] != c[:-1]) + 1]).astype(np.int64)
        return pa.table({"c": pa.array(c[starts]),
                         "m": pa.array(np.add.reduceat(m, starts))})

    cust = (orders.map_batches(tag, batch_format="pyarrow",
                               batch_size=None)
            .groupby("part")
            .map_groups(merge, batch_format="pandas")).materialize()

    def buckets(batch: pa.Table) -> pa.Table:
        m = batch["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        assert len(m) == 0 or m.min() >= 0, \
            "customer_concentration assumes non-negative revenue"
        vb = m // VB
        u, inv = np.unique(vb, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, m)
        return pa.table({
            "vb": pa.array(u),
            "pn": pa.array(np.bincount(inv, minlength=len(u))
                           .astype(np.int64)),
            "ph": pa.array(s // (1 << 31)),
            "pl": pa.array(s % (1 << 31)),
        })

    bk = (cust.map_batches(buckets, batch_format="pyarrow",
                           batch_size=None)
          .groupby("vb").aggregate(Sum("pn", alias_name="n"),
                                   Sum("ph"), Sum("pl"))).to_pandas() \
        .sort_values("vb", ignore_index=True)
    n_cust = int(bk["n"].sum()) if len(bk) else 0
    total = sum(((int(h) << 31) + int(l))
                for h, l in zip(bk.get("sum(ph)", []),
                                bk.get("sum(pl)", [])))
    if n_cust == 0:
        return ray.data.from_arrow(pa.table({
            "n_customers": pa.array([0], type=pa.int64()),
            "total_cents": pa.array([0], type=pa.int64()),
            "top_cents": pa.array([0], type=pa.int64()),
            "top_share": pa.array([None], type=pa.float64())}))
    k = int(np.ceil(np.float64(top_frac) * np.float64(n_cust)))
    rstar = n_cust - k                       # 0-based ascending rank cut
    cum = np.concatenate([[0], np.cumsum(bk["n"].to_numpy())])
    bstar = int(np.searchsorted(cum, rstar, side="right") - 1)
    # full buckets strictly above the cut bucket
    top = sum(((int(h) << 31) + int(l))
              for h, l in zip(bk["sum(ph)"][bstar + 1:],
                              bk["sum(pl)"][bstar + 1:]))
    vb_star = int(bk["vb"].iloc[bstar])
    vb_ref = ray.put(vb_star)

    def fetch(batch: pa.Table) -> pa.Table:
        vbs = cached_get(vb_ref)
        m = batch["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (m // VB) == vbs
        return pa.table({"c": pa.array(c[keep]),
                         "m": pa.array(m[keep])})

    cand = (cust.map_batches(fetch, batch_format="pyarrow",
                             batch_size=None)).to_pandas() \
        .sort_values(["m", "c"], ignore_index=True)
    off = rstar - int(cum[bstar])
    top += int(cand["m"][off:].sum())
    share = float(round_half_away(np.float64(
        float(top) / float(total))))
    return ray.data.from_arrow(pa.table({
        "n_customers": pa.array([n_cust], type=pa.int64()),
        "total_cents": pa.array([total], type=pa.int64()),
        "top_cents": pa.array([top], type=pa.int64()),
        "top_share": pa.array([share], type=pa.float64()),
    }))


def customer_concentration_sql(top_frac: float = 0.01) -> str:
    """Oracle for :func:`customer_concentration` — rank window with the
    same double-ceil cut."""
    return f"""
WITH c AS (SELECT o_custkey,
                  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                       AS BIGINT) AS cents
           FROM orders GROUP BY 1),
m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(cents AS HUGEINT)) AS BIGINT) AS total
      FROM c),
r AS (SELECT cents,
             row_number() OVER (ORDER BY cents, o_custkey) - 1 AS rk
      FROM c),
t AS (SELECT CAST(coalesce(sum(CAST(r.cents AS HUGEINT)), 0) AS BIGINT)
        AS top
      FROM r CROSS JOIN m
      WHERE r.rk >= m.n - CAST(ceil({top_frac!r} * m.n) AS BIGINT))
SELECT m.n AS n_customers, m.total AS total_cents, t.top AS top_cents,
       round(CAST(t.top AS DOUBLE) / CAST(m.total AS DOUBLE), 6)
         AS top_share
FROM m CROSS JOIN t"""


def return_rates(sf_dir: str, z: float = 1.96, min_lines: int = 20):
    """Per-part return rate with a Wilson-score lower bound — for parts
    with at least ``min_lines`` lineitems: (p_partkey, n_lines,
    n_returned, rate, wilson_low), partkey-sorted.  Ranking by the
    Wilson lower bound instead of the raw rate is the standard fix for
    small-sample quality flags.

    Exactness: (n, returned) counts are exact integers from per-batch
    partials into ONE part-dimension-cardinality groupby; the Wilson
    chain is evaluated in the identical op order on both engines
    (same z literal -> same doubles), and rate/wilson_low are the only
    float columns.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table
    from .text import round_half_away

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_returnflag"])

    def partial(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        r = pc.equal(batch["l_returnflag"], "R") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(pk, return_inverse=True)
        nr = np.zeros(len(u), dtype=np.int64)
        np.add.at(nr, inv, r)
        return pa.table({
            "p_partkey": pa.array(u),
            "pn": pa.array(np.bincount(inv, minlength=len(u))
                           .astype(np.int64)),
            "pr": pa.array(nr),
        })

    m = (li.map_batches(partial, batch_format="pyarrow",
                        batch_size=None)
         .groupby("p_partkey")
         .aggregate(Sum("pn", alias_name="n_lines"),
                    Sum("pr", alias_name="n_returned"))).to_pandas()
    m = m[m["n_lines"] >= min_lines].sort_values("p_partkey",
                                                 ignore_index=True)
    Z = np.float64(z)
    Z2 = Z * Z
    rate, wl = [], []
    for n_, r_ in zip(m["n_lines"], m["n_returned"]):
        nf = np.float64(float(int(n_)))
        p = np.float64(float(int(r_))) / nf
        a = Z2 / (np.float64(2.0) * nf)
        bb = p * (np.float64(1.0) - p) / nf \
            + Z2 / (np.float64(4.0) * nf * nf)
        w = (p + a - Z * np.sqrt(bb)) / (np.float64(1.0) + Z2 / nf)
        rate.append(float(round_half_away(p)))
        wl.append(float(round_half_away(np.float64(w))))
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "p_partkey": pa.array(m["p_partkey"].to_numpy().astype(np.int64)
                              if len(m) else np.empty(0, np.int64)),
        "n_lines": pa.array(m["n_lines"].to_numpy().astype(np.int64)
                            if len(m) else np.empty(0, np.int64)),
        "n_returned": pa.array(m["n_returned"].to_numpy()
                               .astype(np.int64) if len(m)
                               else np.empty(0, np.int64)),
        "rate": pa.array(rate, type=pa.float64()),
        "wilson_low": pa.array(wl, type=pa.float64()),
    }))


def return_rates_sql(z: float = 1.96, min_lines: int = 20) -> str:
    """Oracle for :func:`return_rates` — the identical Wilson chain."""
    return f"""
WITH c AS (SELECT l_partkey AS p_partkey,
                  CAST(count(*) AS BIGINT) AS n_lines,
                  CAST(coalesce(sum(CASE WHEN l_returnflag = 'R'
                                         THEN 1 ELSE 0 END), 0)
                       AS BIGINT) AS n_returned
           FROM lineitem GROUP BY 1
           HAVING count(*) >= {min_lines}),
w AS (SELECT p_partkey, n_lines, n_returned,
             CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE) AS p,
             CAST(n_lines AS DOUBLE) AS nf
      FROM c)
SELECT p_partkey, n_lines, n_returned, round(p, 6) AS rate,
       round((p + {z!r} * {z!r} / (2.0 * nf)
              - {z!r} * sqrt(p * (1.0 - p) / nf
                             + {z!r} * {z!r} / (4.0 * nf * nf)))
             / (1.0 + {z!r} * {z!r} / nf), 6) AS wilson_low
FROM w ORDER BY 1"""


def revenue_growth(sf_dir: str):
    """Month-over-month revenue growth: total order value per calendar
    month with the LAG growth ratio — (month, revenue_cents, growth);
    growth = round(rev/prev - 1, 6), NULL for the first month.  The
    simplest time-series KPI every warehouse publishes.

    Exactness: cents sums ride wrap-safe hi/lo int64 lanes through ONE
    calendar-bounded month groupby; the driver's LAG over the sorted
    bounded series mirrors the window, and growth is the single
    mirrored float chain.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table
    from .text import round_half_away

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        mk = ts.astype("datetime64[M]").astype(np.int64)
        cents = np.rint(batch["o_totalprice"]
                        .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        u, inv = np.unique(mk, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, cents)
        return pa.table({
            "m": pa.array(u),
            "ph": pa.array(s // (1 << 31)),
            "pl": pa.array(s % (1 << 31)),
        })

    m = (orders.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
         .groupby("m").aggregate(Sum("ph"), Sum("pl"))).to_pandas() \
        .sort_values("m", ignore_index=True)
    months = m["m"].to_numpy().astype("datetime64[M]") \
        .astype("datetime64[us]") if len(m) else \
        np.empty(0, "datetime64[us]")
    rev = [((int(h) << 31) + int(l))
           for h, l in zip(m.get("sum(ph)", []), m.get("sum(pl)", []))]
    growth = [None]
    for i in range(1, len(rev)):
        if rev[i - 1] == 0:
            # DuckDB double division by zero yields NaN (not an error):
            # mirror it instead of raising ZeroDivisionError
            growth.append(float("nan"))
        else:
            growth.append(float(round_half_away(np.float64(
                float(rev[i]) / float(rev[i - 1]) - np.float64(1.0)))))
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "month": pa.array(months),
        "revenue_cents": pa.array(rev, type=pa.int64()),
        "growth": pa.array(growth[:len(rev)], type=pa.float64()),
    }))


REVENUE_GROWTH_SQL = """
WITH r AS (SELECT date_trunc('month', o_orderdate) AS month,
                  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                       AS BIGINT) AS revenue_cents
           FROM orders GROUP BY 1),
l AS (SELECT month, revenue_cents,
             lag(revenue_cents) OVER (ORDER BY month) AS prev
      FROM r)
SELECT month, revenue_cents,
       CASE WHEN prev IS NULL THEN NULL ELSE
         round(CAST(revenue_cents AS DOUBLE) / CAST(prev AS DOUBLE)
               - 1.0, 6) END AS growth
FROM l ORDER BY month"""


def benford_law(sf_dir: str):
    """Benford's-law audit of order totals: the distribution of the
    FIRST significant digit of o_totalprice (in exact cents) against the
    Benford expectation log10(1 + 1/d) — the classic fraud / synthetic-
    data screen.  Output: (digit, n_orders, obs_p, benford_p) for the
    digits that occur.

    Exactness: cents = rint(price * 100) as everywhere; the leading
    digit comes from a bounded INTEGER divide-down loop (≤ 19 rounds for
    int64 — no float log10 on the data path), mirrored in SQL by
    substr(CAST(cents AS VARCHAR), 1, 1).  Per-batch bincount partials
    ride ONE digit-cardinality (≤ 10 keys) groupby; the share division
    float(n)/float(total) and the log10 reference column evaluate the
    identical expression chains both engines.
    """
    import math

    from ray.data.aggregate import Sum

    from ..sources.readers import read_table
    from .text import round_half_away

    orders = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch["o_totalprice"]
                        .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        v = np.abs(cents)
        while (v >= 10).any():
            big = v >= 10
            v[big] //= 10
        n = np.bincount(v, minlength=10).astype(np.int64)
        has = n > 0
        return pa.table({
            "digit": pa.array(np.flatnonzero(has).astype(np.int64)),
            "pn": pa.array(n[has]),
        })

    g = (orders.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
         .groupby("digit").aggregate(Sum("pn", alias_name="n_orders")))

    def finish(batch: pa.Table) -> pa.Table:
        d = batch["digit"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n_orders"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        total = int(n.sum())
        obs = [float(round_half_away(np.float64(
            float(int(x)) / float(total)))) for x in n] if total else []
        ben = [float(round_half_away(np.float64(
            math.log10(1.0 + 1.0 / float(int(x)))))) if x > 0 else None
            for x in d]
        return pa.table({
            "digit": pa.array(d),
            "n_orders": pa.array(n),
            "obs_p": pa.array(obs, type=pa.float64()),
            "benford_p": pa.array(ben, type=pa.float64()),
        })

    return g.repartition(1).map_batches(finish, batch_format="pyarrow",
                                        batch_size=None)


BENFORD_LAW_SQL = """
WITH c AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
           FROM orders),
d AS (SELECT CAST(substr(CAST(abs(cents) AS VARCHAR), 1, 1) AS BIGINT)
             AS digit FROM c),
g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_orders FROM d
      GROUP BY 1),
t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS tot FROM g)
SELECT digit, n_orders,
       round(CAST(n_orders AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS obs_p,
       CASE WHEN digit > 0 THEN
         round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)
       ELSE NULL END AS benford_p
FROM g CROSS JOIN t ORDER BY digit"""


def new_vs_repeat(sf_dir: str, n_parts: int = 64):
    """New-vs-returning revenue split per calendar month: every order is
    "new" iff it falls in its customer's FIRST active month (cohort
    month), else "repeat" — (month, new_revenue_cents,
    repeat_revenue_cents, n_new, n_repeat).  The acquisition-vs-
    retention KPI split next to :func:`revenue_growth`.

    Scale plan: per-batch (custkey, month) cent/count partials ride ONE
    custkey-hashed blob co-partition (the first month of a customer
    needs every partial of that customer — never a customer-cardinality
    Ray sort row); each merge block resolves first months, classifies
    its partials and emits (month, lanes) rows, and the final groupby is
    calendar-bounded.  Cent sums ride wrap-safe hi/lo int64 lanes
    (per-merge-block month sums stay < 2^63: bounded by per-partition
    revenue, i.e. total revenue / n_parts).
    """
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate",
                                 "o_totalprice"])

    def tag(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mk = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[M]").astype(np.int64)
        cents = np.rint(batch["o_totalprice"]
                        .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        key = ck * 4096 + (mk % 4096)          # months fit 12 bits
        order = np.argsort(key, kind="stable")
        key, ck, mk, cents = key[order], ck[order], mk[order], \
            cents[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(key[1:] != key[:-1]) + 1]) \
            .astype(np.int64) if len(key) else np.empty(0, np.int64)
        if not len(starts):
            return pa.table({
                "part": pa.array([], type=pa.int32()),
                "blob": pa.array([], type=pa.large_binary()),
            })
        cku = ck[starts]
        mku = mk[starts]
        su = np.add.reduceat(cents, starts)
        nu = np.diff(np.append(starts, len(key)))
        part = _part_of(cku, n_parts).astype(np.int64)
        ordp = np.argsort(part, kind="stable")
        part, cku, mku, su, nu = part[ordp], cku[ordp], mku[ordp], \
            su[ordp], nu[ordp]
        bstarts = np.concatenate(
            [[0], np.flatnonzero(part[1:] != part[:-1]) + 1, [len(part)]])
        rows_p, rows_b = [], []
        for a_, b_ in zip(bstarts[:-1], bstarts[1:]):
            if b_ <= a_:
                continue
            rows_p.append(int(part[a_]))
            rows_b.append(_ipc_bytes(pa.table({
                "c": pa.array(cku[a_:b_]), "m": pa.array(mku[a_:b_]),
                "s": pa.array(su[a_:b_]),
                "n": pa.array(nu[a_:b_].astype(np.int64))})))
        return pa.table({
            "part": pa.array(rows_p, type=pa.int32()),
            "blob": pa.array(rows_b, type=pa.large_binary()),
        })

    def merge(df) -> pa.Table:
        tabs = [_ipc_table(b) for b in df["blob"]]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"c": pa.array([], type=pa.int64()),
             "m": pa.array([], type=pa.int64()),
             "s": pa.array([], type=pa.int64()),
             "n": pa.array([], type=pa.int64())})
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = t["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table({
            "m": pa.array([], type=pa.int64()),
            "nh": pa.array([], type=pa.int64()),
            "nl": pa.array([], type=pa.int64()),
            "rh": pa.array([], type=pa.int64()),
            "rl": pa.array([], type=pa.int64()),
            "nn": pa.array([], type=pa.int64()),
            "nr": pa.array([], type=pa.int64()),
        })
        if not len(c):
            return empty
        order = np.argsort(c, kind="stable")
        c, m, s, n = c[order], m[order], s[order], n[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(c[1:] != c[:-1]) + 1]).astype(np.int64)
        first = np.minimum.reduceat(m, starts)
        isn = m == np.repeat(first, np.diff(np.append(starts, len(c))))
        mu, inv = np.unique(m, return_inverse=True)
        k = len(mu)
        rev_new = np.zeros(k, dtype=np.int64)
        rev_rep = np.zeros(k, dtype=np.int64)
        n_new = np.zeros(k, dtype=np.int64)
        n_rep = np.zeros(k, dtype=np.int64)
        np.add.at(rev_new, inv[isn], s[isn])
        np.add.at(rev_rep, inv[~isn], s[~isn])
        np.add.at(n_new, inv[isn], n[isn])
        np.add.at(n_rep, inv[~isn], n[~isn])
        return pa.table({
            "m": pa.array(mu),
            "nh": pa.array(rev_new // (1 << 31)),
            "nl": pa.array(rev_new % (1 << 31)),
            "rh": pa.array(rev_rep // (1 << 31)),
            "rl": pa.array(rev_rep % (1 << 31)),
            "nn": pa.array(n_new),
            "nr": pa.array(n_rep),
        })

    g = (orders.map_batches(tag, batch_format="pyarrow", batch_size=None)
         .groupby("part")
         .map_groups(merge, batch_format="pandas")
         .groupby("m").aggregate(Sum("nh"), Sum("nl"), Sum("rh"),
                                 Sum("rl"), Sum("nn"), Sum("nr"))) \
        .to_pandas().sort_values("m", ignore_index=True)
    months = g["m"].to_numpy().astype("datetime64[M]") \
        .astype("datetime64[us]") if len(g) else \
        np.empty(0, "datetime64[us]")
    new_rev = [(int(h) << 31) + int(l)
               for h, l in zip(g.get("sum(nh)", []), g.get("sum(nl)", []))]
    rep_rev = [(int(h) << 31) + int(l)
               for h, l in zip(g.get("sum(rh)", []), g.get("sum(rl)", []))]
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "month": pa.array(months),
        "new_revenue_cents": pa.array(new_rev, type=pa.int64()),
        "repeat_revenue_cents": pa.array(rep_rev, type=pa.int64()),
        "n_new": pa.array(g["sum(nn)"].to_numpy().astype(np.int64)
                          if len(g) else np.empty(0, np.int64)),
        "n_repeat": pa.array(g["sum(nr)"].to_numpy().astype(np.int64)
                             if len(g) else np.empty(0, np.int64)),
    }))


NEW_VS_REPEAT_SQL = """
WITH o AS (SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
                  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
           FROM orders),
f AS (SELECT o_custkey, min(m) AS fm FROM o GROUP BY 1),
c AS (SELECT o.m, CASE WHEN o.m = f.fm THEN 1 ELSE 0 END AS isn, o.cents
      FROM o JOIN f USING (o_custkey))
SELECT m AS month,
  CAST(coalesce(sum(CASE WHEN isn = 1 THEN cents END), 0) AS BIGINT)
    AS new_revenue_cents,
  CAST(coalesce(sum(CASE WHEN isn = 0 THEN cents END), 0) AS BIGINT)
    AS repeat_revenue_cents,
  CAST(count(CASE WHEN isn = 1 THEN 1 END) AS BIGINT) AS n_new,
  CAST(count(CASE WHEN isn = 0 THEN 1 END) AS BIGINT) AS n_repeat
FROM c GROUP BY 1 ORDER BY 1"""


def nation_flow(sf_dir: str, n_parts: int = 64):
    """Trade-flow matrix: revenue per (customer nation, supplier
    nation) — (cust_nation, supp_nation, revenue_microcents, n_lines),
    both-name-sorted.  The full |N|^2 generalization of Q5's
    one-dimensional rollup and Q7's two-nation volume.

    Scale plan: the supplier -> nation map broadcasts once (dimension);
    lineitem pre-aggregates per (orderkey, supp_nation) in-batch —
    revenue in the exact integer microcent domain — and rides ONE
    orderkey co-partition against orders x customer (broadcast customer
    map below the same size threshold revenue_by_nation documents, the
    co-partition lane existing above it); only |N|^2 cell partials on
    wrap-safe hi/lo lanes reach the final groupby (Q5's plain int64
    microcent Sum would wrap around 1e21 at the 100 TB design point).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table
    from ..state.bcast import cached_get

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    skeys_nf = pc.cast(sup["s_suppkey"], pa.int64()) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    snat_nf = pc.cast(sup["s_nationkey"], pa.int64()) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    _o = np.argsort(skeys_nf)
    smap_ref = ray.put((skeys_nf[_o], snat_nf[_o]))

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey",
                             "l_extendedprice", "l_discount"])

    def li_partial(batch: pa.Table) -> pa.Table:
        skeys_s, snat_s = cached_get(smap_ref)
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ext = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = (np.rint(ext * 100.0).astype(np.int64)
               * np.rint((1.0 - disc) * 100.0).astype(np.int64))
        # vectorized suppkey -> nationkey attach (product_profit shape)
        pos = np.minimum(np.searchsorted(skeys_s, sk),
                         max(0, len(skeys_s) - 1))
        assert len(sk) == 0 or bool((skeys_s[pos] == sk).all()), \
            "lineitem references a suppkey absent from supplier (FK)"
        sn = snat_s[pos]
        key = ok * np.int64(32) + sn        # nations < 32 by contract
        assert len(sn) == 0 or sn.max() < 32, \
            "nation_flow key packing assumes nationkey < 32"
        u, inv = np.unique(key, return_inverse=True)
        rv = np.zeros(len(u), dtype=np.int64)
        np.add.at(rv, inv, rev)
        return pa.table({
            "o_orderkey": pa.array((u // 32).astype(np.int64)),
            "sn": pa.array((u % 32).astype(np.int64)),
            "rev": pa.array(rv),
            "n": pa.array(np.bincount(inv, minlength=len(u))
                          .astype(np.int64)),
        })

    li_agg = li.map_batches(li_partial, batch_format="pyarrow",
                            batch_size=None)

    ct = pq.read_table(f"{sf_dir}/customer.parquet",
                       columns=["c_custkey", "c_nationkey"])
    ct = pa.table({"c_custkey": ct["c_custkey"],
                   "c_nationkey": pc.cast(ct["c_nationkey"],
                                          pa.int64())})
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey"])
    oc = broadcast_hash_join(orders, ct, on="o_custkey",
                             build_on="c_custkey", how="inner") \
        .select_columns(["o_orderkey", "c_nationkey"])

    j = copartition_hash_join(li_agg, oc, on="o_orderkey",
                              n_parts=n_parts)

    def cells(batch: pa.Table) -> pa.Table:
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sn = batch["sn"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = batch["rev"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = cn * np.int64(32) + sn
        u, inv = np.unique(key, return_inverse=True)
        rv = np.zeros(len(u), dtype=np.int64)
        np.add.at(rv, inv, rev)
        nn = np.zeros(len(u), dtype=np.int64)
        np.add.at(nn, inv, n)
        return pa.table({
            "cell": pa.array(u.astype(np.int64)),
            "rh": pa.array(rv // (1 << 31)),
            "rl": pa.array(rv % (1 << 31)),
            "pn": pa.array(nn),
        })

    m = (j.map_batches(cells, batch_format="pyarrow", batch_size=None)
         .groupby("cell")
         .aggregate(Sum("rh"), Sum("rl"),
                    Sum("pn", alias_name="n_lines"))).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nm = dict(zip(pc.cast(nat["n_nationkey"], pa.int64()).to_pylist(),
                  nat["n_name"].to_pylist()))
    m["cust_nation"] = [nm[int(c) // 32] for c in m["cell"]]
    m["supp_nation"] = [nm[int(c) % 32] for c in m["cell"]]
    m["revenue_microcents"] = [((int(h) << 31) + int(l))
                               for h, l in zip(m["sum(rh)"],
                                               m["sum(rl)"])]
    m = m.sort_values(["cust_nation", "supp_nation"],
                      ignore_index=True)
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "cust_nation": pa.array(m["cust_nation"], type=pa.string()),
        "supp_nation": pa.array(m["supp_nation"], type=pa.string()),
        "revenue_microcents": pa.array(m["revenue_microcents"],
                                       type=pa.int64()),
        "n_lines": pa.array(m["n_lines"].to_numpy().astype(np.int64)
                            if len(m) else np.empty(0, np.int64)),
    }))


NATION_FLOW_SQL = """
WITH r AS (SELECT l.l_orderkey, s.s_nationkey AS sn,
                  CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(round((1 - l.l_discount) * 100, 0) AS BIGINT)
                    AS rev
           FROM lineitem l
           JOIN supplier s ON s.s_suppkey = l.l_suppkey),
oc AS (SELECT o.o_orderkey, c.c_nationkey AS cn
       FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
j AS (SELECT oc.cn, r.sn, r.rev
      FROM r JOIN oc ON oc.o_orderkey = r.l_orderkey)
SELECT nc.n_name AS cust_nation, ns.n_name AS supp_nation,
       CAST(sum(CAST(rev AS HUGEINT)) AS BIGINT) AS revenue_microcents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM j JOIN nation nc ON nc.n_nationkey = j.cn
JOIN nation ns ON ns.n_nationkey = j.sn
GROUP BY 1, 2 ORDER BY 1, 2"""


def rank_corr_qty_discount(sf_dir: str):
    """Rank correlation between line-item quantity and discount — ONE
    row (n_rows, spearman_rho, kendall_tau): Spearman's rho (Pearson
    over midranks, tie-corrected by construction) and Kendall's tau-b.
    The "is the discount schedule actually volume-based?" audit: both
    statistics are invariant to any monotone rescaling of either
    column, so they see through dollar-vs-percent encodings that wreck
    a raw Pearson.

    Exactness: both statistics reduce ENTIRELY to the (quantity,
    discount-cent) contingency table — midranks are doubled-integer
    cumulative counts, every Spearman moment and every Kendall
    concordant/discordant/tie count folds in PYTHON BIG INTS (HUGEINT
    in the oracle), and each statistic is ONE mirrored float chain
    (num / (sqrt(d1) * sqrt(d2))).  Values enter the table via
    round(q) and round(d * 100) on identical doubles.  NULL quantity /
    discount rows drop on both engines; NULL statistics on degenerate
    (constant-column) inputs.

    Scale shape: per-batch packed (q, cent) bincount partials, ONE
    value-spread-bounded groupby (~50 x 11 cells), scalar driver
    finish — the contingency never grows with the corpus.
    """
    import math

    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table
    from .text import round_half_away

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_quantity", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        if batch["l_quantity"].null_count:
            batch = batch.filter(pc.is_valid(batch["l_quantity"]))
        if batch["l_discount"].null_count:
            batch = batch.filter(pc.is_valid(batch["l_discount"]))
        z = pa.array([], type=pa.int64())
        if not len(batch):
            return pa.table({"q": z, "c": z, "pn": z})
        from .text import round_half_away as rha

        q = rha(batch["l_quantity"].to_numpy(zero_copy_only=False), 0) \
            .astype(np.int64)
        d = rha(batch["l_discount"].to_numpy(zero_copy_only=False)
                * 100.0, 0).astype(np.int64)
        # documented packing contract: corrupt data must fail loudly,
        # not alias contingency cells (review finding)
        if len(q) and (int(q.min()) < 0 or int(d.min()) < 0
                       or int(d.max()) >= 1024):
            raise ValueError("rank_corr_qty_discount: quantity/discount "
                             "outside the 0 <= q, 0 <= d < 1024 "
                             "packing contract")
        key = q * np.int64(1024) + d
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({"q": pa.array((u // 1024).astype(np.int64)),
                         "c": pa.array((u % 1024).astype(np.int64)),
                         "pn": pa.array(cnt.astype(np.int64))})

    h = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby(["q", "c"])
         .aggregate(Sum("pn", alias_name="w"))).to_pandas()
    n_rows = int(h["w"].sum()) if len(h) else 0
    rho = tau = None
    if n_rows > 1:
        qs = h.groupby("q", sort=True)["w"].sum()
        cs = h.groupby("c", sort=True)["w"].sum()

        def rank2_of(marg):
            vals = marg.index.to_numpy().astype(np.int64)
            cnts = [int(x) for x in marg]
            r2, cum = {}, 0
            for v_, c_ in zip(vals, cnts):
                r2[int(v_)] = 2 * cum + c_ + 1
                cum += c_
            return r2

        r2q = rank2_of(qs)
        r2c = rank2_of(cs)
        sx = sy = sxx = syy = sxy = 0
        for q_, c_, w_ in zip(h["q"], h["c"], h["w"]):
            w_ = int(w_)
            x = r2q[int(q_)]
            y = r2c[int(c_)]
            sx += w_ * x
            sy += w_ * y
            sxx += w_ * x * x
            syy += w_ * y * y
            sxy += w_ * x * y
        num = n_rows * sxy - sx * sy
        d1 = n_rows * sxx - sx * sx
        d2 = n_rows * syy - sy * sy
        if d1 > 0 and d2 > 0:
            rho = float(round_half_away(np.float64(
                float(num) / (math.sqrt(float(d1))
                              * math.sqrt(float(d2))))))
        # Kendall tau-b from the same contingency: concordant /
        # discordant pair counts in exact ints
        cells = [(int(q_), int(c_), int(w_))
                 for q_, c_, w_ in zip(h["q"], h["c"], h["w"])]
        conc = disc = 0
        for i, (qa, ca, wa) in enumerate(cells):
            for qb, cb, wb in cells[i + 1:]:
                if qa == qb or ca == cb:
                    continue
                if (qa < qb) == (ca < cb):
                    conc += wa * wb
                else:
                    disc += wa * wb
        n0 = n_rows * (n_rows - 1) // 2
        n1 = sum(int(t) * (int(t) - 1) // 2 for t in qs)
        n2 = sum(int(t) * (int(t) - 1) // 2 for t in cs)
        if n0 > n1 and n0 > n2:
            tau = float(round_half_away(np.float64(
                float(conc - disc) / (math.sqrt(float(n0 - n1))
                                      * math.sqrt(float(n0 - n2))))))
    return ray.data.from_arrow(pa.table({
        "n_rows": pa.array([n_rows], type=pa.int64()),
        "spearman_rho": pa.array([rho], type=pa.float64()),
        "kendall_tau": pa.array([tau], type=pa.float64()),
    }))


RANK_CORR_QTY_DISCOUNT_SQL = """
WITH d AS (SELECT CAST(round(l_quantity) AS BIGINT) AS q,
                  CAST(round(l_discount * 100.0) AS BIGINT) AS c
           FROM lineitem
           WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
h AS (SELECT q, c, CAST(count(*) AS HUGEINT) AS w FROM d GROUP BY 1, 2),
qm AS (SELECT q, CAST(sum(w) AS HUGEINT) AS t,
              2 * (sum(sum(w)) OVER (ORDER BY q
                                     ROWS UNBOUNDED PRECEDING)
                   - sum(w)) + sum(w) + 1 AS r2
       FROM h GROUP BY 1),
cm AS (SELECT c, CAST(sum(w) AS HUGEINT) AS t,
              2 * (sum(sum(w)) OVER (ORDER BY c
                                     ROWS UNBOUNDED PRECEDING)
                   - sum(w)) + sum(w) + 1 AS r2
       FROM h GROUP BY 1),
nn AS (SELECT CAST(coalesce(sum(w), 0) AS HUGEINT) AS n FROM h),
mom AS (SELECT CAST(sum(h.w * qm.r2) AS HUGEINT) AS sx,
               CAST(sum(h.w * cm.r2) AS HUGEINT) AS sy,
               CAST(sum(h.w * qm.r2 * qm.r2) AS HUGEINT) AS sxx,
               CAST(sum(h.w * cm.r2 * cm.r2) AS HUGEINT) AS syy,
               CAST(sum(h.w * qm.r2 * cm.r2) AS HUGEINT) AS sxy
        FROM h JOIN qm USING (q) JOIN cm USING (c)),
kd AS (SELECT
         CAST(coalesce(sum(CASE WHEN (a.q < b.q) = (a.c < b.c)
                                THEN a.w * b.w END), 0) AS HUGEINT)
           AS conc,
         CAST(coalesce(sum(CASE WHEN (a.q < b.q) <> (a.c < b.c)
                                THEN a.w * b.w END), 0) AS HUGEINT)
           AS disc
       FROM h a JOIN h b
         ON (a.q < b.q OR (a.q = b.q AND a.c < b.c))
        AND a.q <> b.q AND a.c <> b.c),
ties AS (SELECT (SELECT CAST(sum(t * (t - 1) // 2) AS HUGEINT) FROM qm)
                  AS n1,
                (SELECT CAST(sum(t * (t - 1) // 2) AS HUGEINT) FROM cm)
                  AS n2)
SELECT CAST(nn.n AS BIGINT) AS n_rows,
       CASE WHEN nn.n <= 1
                 OR nn.n * mom.sxx - mom.sx * mom.sx <= 0
                 OR nn.n * mom.syy - mom.sy * mom.sy <= 0 THEN NULL
            ELSE round(CAST(nn.n * mom.sxy - mom.sx * mom.sy AS DOUBLE)
                       / (sqrt(CAST(nn.n * mom.sxx - mom.sx * mom.sx
                                    AS DOUBLE))
                          * sqrt(CAST(nn.n * mom.syy - mom.sy * mom.sy
                                      AS DOUBLE))), 6) END
         AS spearman_rho,
       CASE WHEN nn.n <= 1
                 OR nn.n * (nn.n - 1) // 2 - ties.n1 <= 0
                 OR nn.n * (nn.n - 1) // 2 - ties.n2 <= 0 THEN NULL
            ELSE round(CAST(kd.conc - kd.disc AS DOUBLE)
                       / (sqrt(CAST(nn.n * (nn.n - 1) // 2 - ties.n1
                                    AS DOUBLE))
                          * sqrt(CAST(nn.n * (nn.n - 1) // 2 - ties.n2
                                      AS DOUBLE))), 6) END
         AS kendall_tau
FROM nn CROSS JOIN mom CROSS JOIN kd CROSS JOIN ties"""


def kruskal_wallis_qty(sf_dir: str):
    """Kruskal-Wallis rank test of line-item quantity across return
    flags — ONE row (n_rows, n_groups, h_stat, h_adj): the
    nonparametric one-way "are these distributions the same?" test
    (the k-group generalization of Mann-Whitney), tie-corrected.  The
    returns-audit question ("do returned lines skew to different
    quantities?") without any normality assumption.

    Exactness: everything reduces to the (flag, quantity) contingency
    (flags x <= ~50 quantities): doubled midranks and per-group rank
    sums are exact int64, the tie sum T = sum(t^3 - t) is exact, the
    per-group fold (R_g/2)^2 / n_g is ORDER-PINNED ascending flag
    (list_reduce mirror), and H / the tie correction are one mirrored
    float chain.  NULL flag / quantity rows drop; NULL statistics when
    N <= 1, a single group, or all values tied.

    Scale shape: per-batch packed (flag, q) counts, a tiny bounded
    groupby, scalar driver finish.
    """
    import math

    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table
    from .text import round_half_away

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        if batch["l_returnflag"].null_count:
            batch = batch.filter(pc.is_valid(batch["l_returnflag"]))
        if batch["l_quantity"].null_count:
            batch = batch.filter(pc.is_valid(batch["l_quantity"]))
        empty = pa.table({"flag": pa.array([], type=pa.string()),
                          "q": pa.array([], type=pa.int64()),
                          "pn": pa.array([], type=pa.int64())})
        if not len(batch):
            return empty
        from .text import round_half_away as rha

        q = rha(batch["l_quantity"].to_numpy(zero_copy_only=False), 0) \
            .astype(np.int64)
        flag = batch["l_returnflag"].to_pandas().astype(str).to_numpy()
        fcodes, funiq = pd.factorize(pd.Series(flag))
        # packing contract guard: a quantity outside 20 bits would
        # silently corrupt the (flag, q) histogram (review finding)
        if len(q) and (int(q.min()) < 0 or int(q.max()) >= (1 << 20)):
            raise ValueError("kruskal_wallis_qty: quantity outside the "
                             "0 <= q < 2^20 packing contract")
        key = fcodes.astype(np.int64) * np.int64(1 << 20) + q
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "flag": pa.array(funiq[(u >> 20).astype(np.int64)],
                             type=pa.string()),
            "q": pa.array((u & ((1 << 20) - 1)).astype(np.int64)),
            "pn": pa.array(cnt.astype(np.int64)),
        })

    h = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby(["flag", "q"])
         .aggregate(Sum("pn", alias_name="c"))).to_pandas()
    n_rows = int(h["c"].sum()) if len(h) else 0
    n_groups = int(h["flag"].nunique()) if len(h) else 0
    h_stat = h_adj = None
    if n_rows > 1 and n_groups > 1:
        g = h.groupby("q", sort=True)["c"].sum()
        vals = g.index.to_numpy().astype(np.int64)
        gc = [int(x) for x in g]
        r2, cum = {}, 0
        for v_, c_ in zip(vals, gc):
            r2[int(v_)] = 2 * cum + c_ + 1
            cum += c_
        tie_t = sum(c_ ** 3 - c_ for c_ in gc)
        nf = float(n_rows)
        acc = 0.0
        for flag_, grp in h.groupby("flag", sort=True):  # ascending flag
            ng = int(grp["c"].sum())
            rg2 = sum(int(c_) * r2[int(q_)]
                      for q_, c_ in zip(grp["q"], grp["c"]))
            t1 = float(rg2) / 2.0
            acc = acc + (t1 * t1) / float(ng)
        hs = 12.0 / (nf * (nf + 1.0)) * acc - 3.0 * (nf + 1.0)
        corr = 1.0 - float(tie_t) / (nf * nf * nf - nf)
        h_stat = float(round_half_away(np.float64(hs)))
        if corr > 0.0:
            h_adj = float(round_half_away(np.float64(hs / corr)))
    return ray.data.from_arrow(pa.table({
        "n_rows": pa.array([n_rows], type=pa.int64()),
        "n_groups": pa.array([n_groups], type=pa.int64()),
        "h_stat": pa.array([h_stat], type=pa.float64()),
        "h_adj": pa.array([h_adj], type=pa.float64()),
    }))


KRUSKAL_WALLIS_QTY_SQL = """
WITH d AS (SELECT l_returnflag AS flag,
                  CAST(round(l_quantity) AS BIGINT) AS q
           FROM lineitem
           WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL),
h AS (SELECT flag, q, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1, 2),
g AS (SELECT q, CAST(sum(c) AS BIGINT) AS c FROM h GROUP BY 1),
r AS (SELECT q, 2 * (sum(c) OVER (ORDER BY q
                                  ROWS UNBOUNDED PRECEDING) - c)
             + c + 1 AS rank2
      FROM g),
nt AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n,
              CAST(coalesce(sum(c * c * c - c), 0) AS BIGINT) AS t,
              CAST((SELECT count(DISTINCT flag) FROM h) AS BIGINT) AS k
       FROM g),
s AS (SELECT h.flag, CAST(sum(h.c) AS BIGINT) AS ng,
             CAST(sum(h.c * r.rank2) AS BIGINT) AS rg2
      FROM h JOIN r USING (q) GROUP BY 1),
f AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        list((CAST(rg2 AS DOUBLE) / 2.0) * (CAST(rg2 AS DOUBLE) / 2.0)
             / CAST(ng AS DOUBLE) ORDER BY flag)),
        (a, x) -> a + x) AS acc
      FROM s)
SELECT nt.n AS n_rows, nt.k AS n_groups,
       CASE WHEN nt.n <= 1 OR nt.k <= 1 THEN NULL
            ELSE round(12.0 / (CAST(nt.n AS DOUBLE)
                               * (CAST(nt.n AS DOUBLE) + 1.0)) * f.acc
                       - 3.0 * (CAST(nt.n AS DOUBLE) + 1.0), 6) END
         AS h_stat,
       CASE WHEN nt.n <= 1 OR nt.k <= 1
                 OR 1.0 - CAST(nt.t AS DOUBLE)
                          / (CAST(nt.n AS DOUBLE) * CAST(nt.n AS DOUBLE)
                             * CAST(nt.n AS DOUBLE)
                             - CAST(nt.n AS DOUBLE)) <= 0.0 THEN NULL
            ELSE round((12.0 / (CAST(nt.n AS DOUBLE)
                                * (CAST(nt.n AS DOUBLE) + 1.0)) * f.acc
                        - 3.0 * (CAST(nt.n AS DOUBLE) + 1.0))
                       / (1.0 - CAST(nt.t AS DOUBLE)
                                / (CAST(nt.n AS DOUBLE)
                                   * CAST(nt.n AS DOUBLE)
                                   * CAST(nt.n AS DOUBLE)
                                   - CAST(nt.n AS DOUBLE))), 6) END
         AS h_adj
FROM nt CROSS JOIN f"""


def revenue_seasonality(sf_dir: str):
    """Month-of-year seasonal index of order revenue — (month_of_year,
    n_orders, revenue_cents, seasonal_index): exact cents per calendar
    month bucket (1 = January) and the classical ratio-to-mean index
    12 * bucket / total (1.0 = flat seasonality).  The
    seasonal-decomposition step sitting under revenue_growth's
    month-over-month deltas (growth can't tell drift from December).

    Exactness: cents lift via rint (pricing_summary contract);
    month-of-year is integer epoch-month % 12 (+1, matching SQL
    month()); the index is ONE mirrored float chain from exact ints;
    NULL orderdate / totalprice drop.  Assumes dates >= 1970 (epoch
    month % 12, the standing // truncation family assumption).

    Scale shape: per-batch 12-cell partials, a 12-row groupby, tiny
    finish.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table
    from .text import round_half_away

    ds = read_table(sf_dir, "orders",
                    columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        for c in ("o_orderdate", "o_totalprice"):
            if batch[c].null_count:
                batch = batch.filter(pc.is_valid(batch[c]))
        z = pa.array([], type=pa.int64())
        if not len(batch):
            return pa.table({"moy": z, "pn": z, "pc_": z})
        mon = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[M]").astype(np.int64)
        moy = (mon % 12 + 1).astype(np.int64)
        cents = np.rint(batch["o_totalprice"]
                        .to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        pn = np.zeros(12, dtype=np.int64)
        pc_ = np.zeros(12, dtype=np.int64)
        np.add.at(pn, moy - 1, 1)
        np.add.at(pc_, moy - 1, cents)
        has = pn > 0
        return pa.table({
            "moy": pa.array((np.arange(12) + 1)[has].astype(np.int64)),
            "pn": pa.array(pn[has]),
            "pc_": pa.array(pc_[has]),
        })

    m = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby("moy")
         .aggregate(Sum("pn", alias_name="n_orders"),
                    Sum("pc_", alias_name="revenue_cents"))).to_pandas()
    if "moy" not in m.columns:      # empty input loses the schema
        m = pd.DataFrame({c: pd.Series(dtype=np.int64)
                          for c in ("moy", "n_orders", "revenue_cents")})
    m = m.sort_values("moy", ignore_index=True)
    total = int(m["revenue_cents"].sum()) if len(m) else 0
    idx = [float(round_half_away(np.float64(
        (12.0 * float(int(r))) / float(total))))
        if total else None for r in m["revenue_cents"]]
    return ray.data.from_arrow(pa.table({
        "month_of_year": pa.array(m["moy"].to_numpy().astype(np.int64)
                                  if len(m) else np.empty(0, np.int64)),
        "n_orders": pa.array(m["n_orders"].to_numpy().astype(np.int64)
                             if len(m) else np.empty(0, np.int64)),
        "revenue_cents": pa.array(m["revenue_cents"].to_numpy()
                                  .astype(np.int64)
                                  if len(m) else np.empty(0, np.int64)),
        "seasonal_index": pa.array(idx, type=pa.float64()),
    }))


REVENUE_SEASONALITY_SQL = """
WITH o AS (SELECT CAST(month(o_orderdate) AS BIGINT) AS moy,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders
           WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
m AS (SELECT moy, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS revenue_cents
      FROM o GROUP BY 1),
t AS (SELECT CAST(coalesce(sum(revenue_cents), 0) AS BIGINT) AS total
      FROM m)
SELECT moy AS month_of_year, n_orders, revenue_cents,
       CASE WHEN t.total = 0 THEN NULL
            ELSE round((12.0 * CAST(revenue_cents AS DOUBLE))
                       / CAST(t.total AS DOUBLE), 6) END
         AS seasonal_index
FROM m CROSS JOIN t ORDER BY moy"""
