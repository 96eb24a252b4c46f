"""Distributed execution paths for the domain-graph operators.

Every public function here takes the ``(src_domain, dst_domain,
n_links)`` DISTINCT-pair edge aggregate that
``webgraph.domain_link_graph`` produces (the aggregate guarantees each
directed pair appears exactly once — the dedup the single-task
finishers re-derive from lists is free here) and returns the SAME
schema and — except for the documented HITS normalization caveat —
BIT-IDENTICAL values as the corresponding single-task finisher in
``webgraph.py``.  The round-4 review flagged the ``repartition(1)``
finishers as the one scale-grade anti-pattern family left in the repo:
fine at a 20-domain vocabulary, a hard wall at a real crawl's ~1e8
domains / 1e10 edges.  These are the promised scale shapes:

- **pagerank / HITS / BFS** — per-iteration bucketed contribution
  shuffles: the rank/frontier state is a ``(node, ...)`` table
  co-partitioned by node-key hash, each iteration is one
  ``copartition_hash_join`` (edges x state on src) plus one
  ``groupby(part)`` contribution reduce; no stage ever holds the full
  graph (the ``dedup._cc_label_propagation`` round structure).
- **triangles / clustering / co-citation / coupling / link-Jaccard /
  rich-club** — (group -> item-pair) fan-out shuffles over the
  inverted adjacency (the ``near_dup_pairs_exact`` inverted-index
  shape), with the forward/min-degree orientation for triangle
  closure so each triangle is generated exactly once.
- **reciprocity / assortativity** — canonical-pair co-partition plus
  degree-moment lanes (no pair ever meets its mirror outside its own
  bucket; big-int moments ride hi/lo int64 lanes or per-bucket
  decimal-string partials, the ``emb_dim_stats`` wrap-safe pattern).

Exactness: integer statistics are exact end-to-end; single float
divisions happen once, in the same op order as the single-task path;
PageRank's per-target fold is ORDER-PINNED to ascending (dst, src)
domain strings and evaluated by :func:`_seq_segment_fold`, whose
stepped vectorized accumulation performs the exact same sequence of
IEEE additions as the single-task ``while`` loop — the equivalence
suite (tests/test_webgraph_dist.py) asserts bit-equality.  The one
exception: HITS' FINAL L1 normalization constant is a single global
sequential fold in the single-task path; the distributed path sums
exact per-bucket ``Fraction`` partials (emitted as strings) and
converts once, giving the correctly-rounded true sum — equal to the
sequential fold on every tested graph, guaranteed within 1 ulp
otherwise (documented in :func:`hits_dist`).

Node/pair shuffle keys are 64-bit blake2b digests of the domain
strings (``dedup.fnv1a_bytes``); key collisions would need ~2^32
domains in one bucket (the repo-wide digest-key contract,
``dedup.content_digest``).

Degenerate inputs: callers guarantee at least one edge row —
``method="auto"`` always routes empty/tiny aggregates to the exact
single-task path, so only :func:`pagerank_dist` (whose n_nodes==0
guard is load-bearing for dangling-only graphs) handles emptiness
explicitly.

Reference: no analogue — engine-side design obligation (SURVEY §2.8);
the single-task finishers in webgraph.py carry the reference anchors.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pyarrow as pa

from .join import _part_of, copartition_hash_join

# Above this many aggregate edges the method="auto" dispatchers in
# webgraph.py switch from the single-task exact finisher to these
# distributed paths (the dedup.near_dup_clusters method="auto" pattern).
DIST_EDGE_THRESHOLD = 200_000

_LO30 = np.int64((1 << 30) - 1)


def _key64(doms: np.ndarray) -> np.ndarray:
    """int64 blake2b-64 keys for an object array of domain strings
    (shared digest-key infra: dedup.key64_strings)."""
    from .dedup import key64_strings

    return key64_strings(doms)


def _pair_key64(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Canonical-pair key: blake2b-64 of the LENGTH-PREFIXED pair
    encoding ``<len(u)>:<u>|<v>`` (callers pass u < v).  The length
    prefix makes the encoding injective for arbitrary domain strings —
    ("a", "b|c") and ("a|b", "c") must not share a key (the same
    aliasing class the flag-prefixed group keys close in analytics.py);
    only the 2^-64 digest contract remains."""
    joined = np.array(
        [f"{len(a)}:{a}|{b}" for a, b in zip(u.tolist(), v.tolist())],
        dtype=object)
    return _key64(joined)


def _seq_segment_fold(seg_sorted: np.ndarray, values: np.ndarray):
    """Sequential (left, from 0.0) per-segment IEEE fold.

    ``seg_sorted`` must be contiguous per segment and ``values`` in the
    pinned row order.  The stepped accumulation (one vectorized ``+=``
    per rank within segment) performs exactly the additions
    ``acc = ((0.0 + v0) + v1) + ...`` per segment in order — bit-equal
    to the single-task Python loop, parallel over segments instead of
    rows.  Returns (segment_start_indices, per-segment fold)."""
    n = len(seg_sorted)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0)
    starts = np.flatnonzero(
        np.concatenate([[True], seg_sorted[1:] != seg_sorted[:-1]]))
    lens = np.diff(np.concatenate([starts, [n]]))
    acc = np.zeros(len(starts))
    # compact the active-segment arrays each step so total work is
    # O(rows), not O(segments x max_segment_length): one hub target
    # must not make every short segment pay per-step cost
    cur = starts.copy()
    rem = lens.copy()
    idx = np.arange(len(starts), dtype=np.int64)
    while len(cur):
        acc[idx] += values[cur]
        cur += 1
        rem -= 1
        keep = rem > 0
        cur, rem, idx = cur[keep], rem[keep], idx[keep]
    return starts, acc


def _from_arrow(tbl: pa.Table):
    import ray.data

    return ray.data.from_arrow(tbl)


def _und_edges(edges, n_parts: int):
    """Distinct undirected simple edges, sharded by canonical-pair
    hash: (part, pk, u, v) with u < v, self-loops dropped.  Both
    directions of a pair land in one bucket, so the per-bucket
    drop_duplicates IS the global distinct."""
    import pandas as pd

    P = int(n_parts)

    def tag(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["src_domain"].to_pylist(), dtype=object)
        d = np.asarray(batch["dst_domain"].to_pylist(), dtype=object)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.where(s < d, s, d)
        hi = np.where(s < d, d, s)
        pk = _pair_key64(lo, hi)
        return pa.table({
            "part": pa.array(_part_of(pk, P)),
            "pk": pa.array(pk),
            "u": pa.array(lo, type=pa.string()),
            "v": pa.array(hi, type=pa.string()),
        })

    def dedup(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.drop_duplicates(subset=["pk"], ignore_index=True)

    return (edges.map_batches(tag, batch_format="pyarrow",
                              batch_size=None)
            .groupby("part").map_groups(dedup, batch_format="pandas"))


def _degrees(und, n_parts: int):
    """(part, nk, node, dg) degree table from the distinct undirected
    edge shards — endpoint fan-out keyed by node hash, per-bucket
    unique-counts."""
    import pandas as pd

    P = int(n_parts)

    def fan(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["u"].to_pylist(), dtype=object)
        v = np.asarray(batch["v"].to_pylist(), dtype=object)
        node = np.concatenate([u, v])
        nk = _key64(node)
        return pa.table({
            "part": pa.array(_part_of(nk, P)),
            "nk": pa.array(nk),
            "node": pa.array(node, type=pa.string()),
        })

    def count(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby(["nk", "node"], sort=False).size().reset_index()
        g.columns = ["nk", "node", "dg"]
        g["part"] = df["part"].iloc[0] if len(df) else 0
        g["dg"] = g["dg"].astype(np.int64)
        return g[["part", "nk", "node", "dg"]]

    return (und.map_batches(fan, batch_format="pyarrow", batch_size=None)
            .groupby("part").map_groups(count, batch_format="pandas"))


def _edges_with_degrees(und, deg, n_parts: int, carry=()):
    """Attach BOTH endpoint degrees to the distinct undirected edge
    shards via two ``copartition_hash_join`` passes (on u -> dgu, rekey
    by v -> dgv).  ``carry`` names und columns to ride through.  Shared
    by assortativity / the triangle core / rich-club — one place to fix
    key derivation or add hot-key salting."""
    deg_u = deg.map_batches(
        lambda b: pa.table({"k": b["nk"], "dgu": b["dg"]}),
        batch_format="pyarrow", batch_size=None)
    deg_v = deg.map_batches(
        lambda b: pa.table({"k": b["nk"], "dgv": b["dg"]}),
        batch_format="pyarrow", batch_size=None)

    def key_u(batch: pa.Table) -> pa.Table:
        cols = {"k": pa.array(_key64(np.asarray(
            batch["u"].to_pylist(), dtype=object))),
            "v2": batch["v"]}
        for c in carry:
            cols[c] = batch[c]
        return pa.table(cols)

    ju = copartition_hash_join(
        und.map_batches(key_u, batch_format="pyarrow", batch_size=None),
        deg_u, on="k", n_parts=int(n_parts))

    def key_v(batch: pa.Table) -> pa.Table:
        cols = {"k": pa.array(_key64(np.asarray(
            batch["v2"].to_pylist(), dtype=object))),
            "dgu": batch["dgu"]}
        for c in carry:
            cols[c] = batch[c]
        return pa.table(cols)

    return copartition_hash_join(
        ju.map_batches(key_v, batch_format="pyarrow", batch_size=None),
        deg_v, on="k", n_parts=int(n_parts))


def reciprocity_dist(edges, n_parts: int = 32):
    """Distributed :func:`webgraph.domain_reciprocity`: canonical-pair
    co-partition — a directed edge and its mirror always share a
    bucket, so per-bucket (edge count, mutual count) partials are exact
    and the driver finish folds ``n_parts`` rows."""
    import pandas as pd

    from .text import round_half_away

    P = int(n_parts)

    def tag(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["src_domain"].to_pylist(), dtype=object)
        d = np.asarray(batch["dst_domain"].to_pylist(), dtype=object)
        keep = s != d
        s, d = s[keep], d[keep]
        fwd = (s < d)
        lo = np.where(fwd, s, d)
        hi = np.where(fwd, d, s)
        pk = _pair_key64(lo, hi)
        return pa.table({
            "part": pa.array(_part_of(pk, P)),
            "pk": pa.array(pk),
            "fwd": pa.array(fwd.astype(np.int8)),
        })

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        # input is the distinct directed aggregate: per pk at most one
        # fwd=1 and one fwd=0 row; mutual pairs contribute 2 edges each
        g = df.groupby("pk")["fwd"].nunique()
        return pd.DataFrame({"n_edges": [np.int64(len(df))],
                             "n_rec": [np.int64(2 * int((g == 2).sum()))]})

    parts = (edges.map_batches(tag, batch_format="pyarrow",
                               batch_size=None)
             .groupby("part").map_groups(partial, batch_format="pandas")
             .to_pandas())                       # n_parts rows, bounded
    n_edges = int(parts["n_edges"].sum()) if len(parts) else 0
    n_rec = int(parts["n_rec"].sum()) if len(parts) else 0
    r = None if n_edges == 0 else float(round_half_away(
        np.float64(float(n_rec) / float(n_edges)), 6))
    return _from_arrow(pa.table({
        "n_edges": pa.array([n_edges], type=pa.int64()),
        "n_reciprocal": pa.array([n_rec], type=pa.int64()),
        "reciprocity": pa.array([r], type=pa.float64()),
    }))


def assortativity_dist(edges, n_parts: int = 32):
    """Distributed :func:`webgraph.domain_assortativity`.

    The three single-endpoint moments collapse to degree-HISTOGRAM
    sums (sum over edges of deg_u + deg_v == sum over nodes of deg^2,
    likewise deg^2 + deg^2 -> deg^3), folded in Python big ints over
    the distinct-degree-bounded histogram (deg^3 overflows int64 at
    web-scale degrees); only Sxy needs the per-edge degree pair — the
    shared :func:`_edges_with_degrees` co-partition — whose product
    fits int64 and rides hi/lo lanes (the emb_dim_stats wrap-safe
    pattern)."""
    from .text import round_half_away

    und = _und_edges(edges, n_parts).materialize()
    deg = _degrees(und, n_parts).materialize()
    hist = _deg_histogram(deg)
    n_nodes = sum(hist.values())
    m2 = sum(c * v for v, c in hist.items())              # sum deg == 2E
    sx = sum(c * v * v for v, c in hist.items())          # sum deg^2
    sxx = sum(c * v * v * v for v, c in hist.items())     # sum deg^3

    jv = _edges_with_degrees(und, deg, n_parts)

    def sxy_lanes(batch: pa.Table) -> pa.Table:
        a = batch["dgu"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["dgv"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = a * b                         # <= n_nodes^2 — fits int64
        return pa.table({"hi": pa.array([np.int64(np.sum(p >> 30))]),
                         "lo": pa.array([np.int64(np.sum(p & _LO30))])})

    lanes = jv.map_batches(sxy_lanes, batch_format="pyarrow",
                           batch_size=None).to_pandas()  # per-batch rows
    sxy = 2 * ((int(lanes["hi"].sum()) << 30) + int(lanes["lo"].sum())) \
        if len(lanes) else 0
    n_edges = m2 // 2

    num = m2 * sxy - sx * sx
    den = m2 * sxx - sx * sx
    r = None if den == 0 else float(round_half_away(
        np.float64(float(num) / float(den)), 6))
    return _from_arrow(pa.table({
        "n_nodes": pa.array([n_nodes], type=pa.int64()),
        "n_edges": pa.array([n_edges], type=pa.int64()),
        "assortativity": pa.array([r], type=pa.float64()),
    }))


def bfs_depth_dist(edges, seed: str = "src0.example.com",
                   max_depth: int = 20, n_parts: int = 32):
    """Distributed :func:`webgraph.domain_bfs_depth`: iterative frontier
    expansion — edges shard ONCE by src-key hash; each level is one
    frontier-x-edges co-partition (matched out-neighbors) plus one
    label co-partition (min-depth dedup against the visited set), the
    textbook bucketed BFS.  Integer depths are order-free, so the
    result is exactly the single-task BFS."""
    import pandas as pd

    P = int(n_parts)

    def tag_edges(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["src_domain"].to_pylist(), dtype=object)
        d = np.asarray(batch["dst_domain"].to_pylist(), dtype=object)
        keep = s != d
        s, d = s[keep], d[keep]
        sk = _key64(s)
        return pa.table({
            "part": pa.array(_part_of(sk, P)),
            "sk": pa.array(sk),
            "dst": pa.array(d, type=pa.string()),
        })

    eds = edges.map_batches(tag_edges, batch_format="pyarrow",
                            batch_size=None).materialize()

    seed_k = int(_key64(np.array([seed], dtype=object))[0])
    # part is int32 EVERYWHERE (matching _part_of) so the per-level
    # unions never mix block schemas
    labels = _from_arrow(pa.table({
        "part": pa.array(_part_of(np.array([seed_k], dtype=np.int64),
                                  P)),
        "nk": pa.array([seed_k], type=pa.int64()),
        "node": pa.array([seed], type=pa.string()),
        "depth": pa.array([0], type=pa.int64()),
    })).materialize()
    frontier = labels

    k = 0
    while k < max_depth and frontier.count() > 0:
        k += 1

        def expand(df: "pd.DataFrame", _k=k) -> pa.Table:
            # typed Arrow return (matchless buckets stay string-typed)
            fr = df[df["kind"] == 1]
            ed = df[df["kind"] == 0]
            hit = ed[ed["sk"].isin(set(fr["nk"].tolist()))]
            dst = np.unique(hit["dst"].to_numpy(dtype=object)
                            .astype(object))
            nk = _key64(dst)
            return pa.table({
                "part": pa.array(_part_of(nk, P)),
                "nk": pa.array(nk),
                "node": pa.array(dst, type=pa.string()),
                "depth": pa.array(np.full(len(dst), _k,
                                          dtype=np.int64))})

        fr_tag = frontier.map_batches(
            lambda b: pa.table({
                "part": b["part"], "kind": pa.array(
                    np.ones(len(b), dtype=np.int8)),
                "sk": b["nk"], "nk": b["nk"], "node": b["node"],
                "dst": pa.array([""] * len(b), type=pa.string())}),
            batch_format="pyarrow", batch_size=None)
        ed_tag = eds.map_batches(
            lambda b: pa.table({
                "part": b["part"], "kind": pa.array(
                    np.zeros(len(b), dtype=np.int8)),
                "sk": b["sk"], "nk": b["sk"], "node": b["dst"],
                "dst": b["dst"]}),
            batch_format="pyarrow", batch_size=None)
        cand = (fr_tag.union(ed_tag).groupby("part")
                .map_groups(expand, batch_format="pandas"))

        def newly(df: "pd.DataFrame") -> pa.Table:
            old = df[df["kind"] == 1]
            new = df[df["kind"] == 0]
            new = new[~new["nk"].isin(set(old["nk"].tolist()))]
            new = new.drop_duplicates(subset=["nk"])
            return pa.table({
                "part": pa.array(new["part"].to_numpy(np.int32)),
                "nk": pa.array(new["nk"].to_numpy(np.int64)),
                "node": pa.array(new["node"].to_numpy(dtype=object),
                                 type=pa.string()),
                "depth": pa.array(new["depth"].to_numpy(np.int64))})

        cand_tag = cand.map_batches(
            lambda b: pa.table({
                "part": b["part"], "kind": pa.array(
                    np.zeros(len(b), dtype=np.int8)),
                "nk": b["nk"], "node": b["node"], "depth": b["depth"]}),
            batch_format="pyarrow", batch_size=None)
        lab_tag = labels.map_batches(
            lambda b: pa.table({
                "part": b["part"], "kind": pa.array(
                    np.ones(len(b), dtype=np.int8)),
                "nk": b["nk"], "node": b["node"], "depth": b["depth"]}),
            batch_format="pyarrow", batch_size=None)
        # block-count bound per level (see pagerank_dist)
        frontier = (cand_tag.union(lab_tag).groupby("part")
                    .map_groups(newly, batch_format="pandas")
                    .repartition(P).materialize())
        if frontier.count() > 0:
            labels = labels.union(frontier).repartition(P).materialize()

    # distributed finish: the reachable set is O(N) at web scale, so
    # the label table must never form a driver frame (review finding) —
    # rename + distributed sort, like pagerank_dist/clustering_dist
    return labels.map_batches(
        lambda b: pa.table({"domain": b["node"], "depth": b["depth"]}),
        batch_format="pyarrow", batch_size=None).sort("domain")


def pagerank_dist(edges, damping: float = 0.85, iters: int = 20,
                  n_parts: int = 32):
    """Distributed :func:`webgraph.domain_pagerank`: the standard
    bucketed power iteration — transition edges shard once by src-key,
    the rank state is a (node, out, r) table sharded by node-key, and
    each iteration is one ``copartition_hash_join`` (edges x rank on
    src -> contributions t*r) plus one contribution ``groupby(part)``
    whose per-target fold is ORDER-PINNED ascending (dst, src) and
    evaluated with :func:`_seq_segment_fold` — the identical IEEE
    addition sequence as the single-task loop, so ranks are
    bit-identical.  Per-iteration shuffle volume is O(E + N) rows; no
    task ever holds the graph."""
    import pandas as pd

    from .text import round_half_away

    P = int(n_parts)

    def tag_edges(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["src_domain"].to_pylist(), dtype=object)
        d = np.asarray(batch["dst_domain"].to_pylist(), dtype=object)
        sk = _key64(s)
        return pa.table({
            "part": pa.array(_part_of(sk, P)),
            "sk": pa.array(sk),
            "src": pa.array(s, type=pa.string()),
            "dst": pa.array(d, type=pa.string()),
            "n": batch["n_links"],
        })

    tagged = edges.map_batches(tag_edges, batch_format="pyarrow",
                               batch_size=None)

    def per_src(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.reset_index(drop=True)
        out = df.groupby("sk", sort=False)["n"].transform("sum") \
            .to_numpy(np.int64)
        # identical float op order to the single-task finisher:
        # t = float(n) / float(out[src])
        t = df["n"].to_numpy(np.int64).astype(np.float64) \
            / out.astype(np.float64)
        ed = pd.DataFrame({
            "kind": np.full(len(df), 0, dtype=np.int8),
            "sk": df["sk"].to_numpy(np.int64),
            "src": df["src"].to_numpy(dtype=object),
            "dst": df["dst"].to_numpy(dtype=object),
            "t": t, "out": np.zeros(len(df), dtype=np.int64)})
        first = ~df["sk"].duplicated().to_numpy()
        node = pd.DataFrame({
            "kind": np.full(int(first.sum()), 1, dtype=np.int8),
            "sk": df["sk"].to_numpy(np.int64)[first],
            "src": df["src"].to_numpy(dtype=object)[first],
            "dst": np.full(int(first.sum()), "", dtype=object),
            "t": np.zeros(int(first.sum())),
            "out": out[first]})
        both = pd.concat([ed, node], ignore_index=True)
        both.insert(0, "part", df["part"].iloc[0] if len(df) else 0)
        return both

    def keep_kind(k):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return batch.filter(pc.equal(batch["kind"], k))
        return fn

    shard = tagged.groupby("part").map_groups(
        per_src, batch_format="pandas").materialize()
    edges_t = shard.map_batches(keep_kind(0), batch_format="pyarrow",
                                batch_size=None)
    nodes = shard.map_batches(keep_kind(1), batch_format="pyarrow",
                              batch_size=None).map_batches(
        lambda b: pa.table({"part": b["part"], "nk": b["sk"],
                            "node": b["src"], "out": b["out"]}),
        batch_format="pyarrow", batch_size=None).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return _from_arrow(pa.table({
            "domain": pa.array([], type=pa.string()),
            "out_links": pa.array([], type=pa.int64()),
            "pagerank": pa.array([], type=pa.float64())}))

    # drop edges whose target has no out-links (standard dangling
    # simplification, matching the single-task path and the oracle)
    ekey = edges_t.map_batches(
        lambda b: pa.table({
            "k": pa.array(_key64(np.asarray(b["dst"].to_pylist(),
                                            dtype=object))),
            "sk": b["sk"], "src": b["src"], "dst": b["dst"],
            "t": b["t"]}),
        batch_format="pyarrow", batch_size=None)
    nkey = nodes.map_batches(lambda b: pa.table({"k": b["nk"]}),
                             batch_format="pyarrow", batch_size=None)
    edges_kept = copartition_hash_join(
        ekey, nkey, on="k", n_parts=P, how="semi").map_batches(
        lambda b: pa.table({"sk": b["sk"], "src": b["src"],
                            "dst": b["dst"], "t": b["t"]}),
        batch_format="pyarrow", batch_size=None).materialize()

    nf = float(n_nodes)
    base = (1.0 - damping) / nf
    state = nodes.map_batches(
        lambda b: pa.table({"part": b["part"], "nk": b["nk"],
                            "node": b["node"], "out": b["out"],
                            "r": pa.array(np.full(len(b), 1.0 / nf))}),
        batch_format="pyarrow", batch_size=None).materialize()

    for _ in range(iters):
        rk = state.map_batches(
            lambda b: pa.table({"k": b["nk"], "r": b["r"]}),
            batch_format="pyarrow", batch_size=None)
        ek = edges_kept.map_batches(
            lambda b: pa.table({"k": b["sk"], "src": b["src"],
                                "dst": b["dst"], "t": b["t"]}),
            batch_format="pyarrow", batch_size=None)
        joined = copartition_hash_join(ek, rk, on="k", n_parts=P)

        def contrib(b: pa.Table) -> pa.Table:
            # hash dst ONCE per batch (part + nk share it) — this is
            # the hottest per-iteration stage
            nk = _key64(np.asarray(b["dst"].to_pylist(), dtype=object))
            return pa.table({
                "part": pa.array(_part_of(nk, P)),
                "kind": pa.array(np.zeros(len(b), dtype=np.int8)),
                "nk": pa.array(nk),
                "node": b["dst"], "aux": b["src"],
                "val": pa.array(
                    b["t"].to_numpy(zero_copy_only=False)
                    * b["r"].to_numpy(zero_copy_only=False)),
                "out": pa.array(np.zeros(len(b), dtype=np.int64))})

        contrib = joined.map_batches(contrib, batch_format="pyarrow",
                                     batch_size=None)
        st_tag = state.map_batches(
            lambda b: pa.table({
                "part": b["part"],
                "kind": pa.array(np.ones(len(b), dtype=np.int8)),
                "nk": b["nk"], "node": b["node"],
                "aux": pa.array([""] * len(b), type=pa.string()),
                "val": b["r"], "out": b["out"]}),
            batch_format="pyarrow", batch_size=None)

        def update(df: "pd.DataFrame") -> "pd.DataFrame":
            uni = df[df["kind"] == 1]
            con = df[df["kind"] == 0]
            if len(con):
                con = con.sort_values(["node", "aux"], kind="stable")
                node_arr = con["node"].to_numpy(dtype=object)
                seg = pd.factorize(pd.Series(node_arr))[0].astype(np.int64)
                starts, folds = _seq_segment_fold(
                    seg, con["val"].to_numpy(np.float64))
                accs = pd.Series(folds, index=node_arr[starts]) \
                    .reindex(uni["node"].to_numpy(dtype=object)) \
                    .fillna(0.0).to_numpy(np.float64)
            else:
                accs = np.zeros(len(uni))
            # same vectorized float64 ops as the single-task
            # r = base + damping * acc
            r_new = base + damping * accs
            return pd.DataFrame({"part": uni["part"], "nk": uni["nk"],
                                 "node": uni["node"], "out": uni["out"],
                                 "r": r_new})

        # repartition bounds the block count at P per iteration —
        # without it each groupby inherits the union's ever-growing
        # block structure and per-iteration task counts compound
        state = (contrib.union(st_tag).groupby("part")
                 .map_groups(update, batch_format="pandas")
                 .repartition(P).materialize())

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "domain": batch["node"],
            "out_links": batch["out"],
            "pagerank": pa.array(round_half_away(
                batch["r"].to_numpy(zero_copy_only=False), 9)),
        })

    return state.map_batches(finish, batch_format="pyarrow",
                             batch_size=None).sort("domain")


def hits_dist(edges, iters: int = 10, n_parts: int = 32):
    """Distributed :func:`webgraph.domain_hits`: same bucketed-iteration
    machinery as :func:`pagerank_dist`, with TWO contribution shuffles
    per Jacobi round (incoming h -> authority, outgoing a -> hub), each
    fold ORDER-PINNED (ascending src per target, ascending dst per
    source) via :func:`_seq_segment_fold` — the iteration is bit-equal
    to the single-task path.

    Normalization caveat: the single-task finisher computes the final
    L1 constants sa/sh as ONE global sequential fold ascending domain —
    an inherently serial shape.  Here each bucket emits its EXACT
    partial sum as a ``Fraction`` string and the driver folds the
    n_parts fractions exactly, converting to float once: the
    correctly-rounded TRUE sum, which can differ from the serial fold
    by <= a few ulps (never more than the fold's own accumulated
    error).  The equivalence suite checks the rounded outputs agree to
    1e-9 (they are bit-equal on every tested graph)."""
    import pandas as pd

    from .text import round_half_away

    P = int(n_parts)

    def tag_edges(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["src_domain"].to_pylist(), dtype=object)
        d = np.asarray(batch["dst_domain"].to_pylist(), dtype=object)
        sk = _key64(s)
        return pa.table({
            "part": pa.array(_part_of(sk, P)),
            "sk": pa.array(sk),
            "src": pa.array(s, type=pa.string()),
            "dst": pa.array(d, type=pa.string()),
        })

    tagged = edges.map_batches(tag_edges, batch_format="pyarrow",
                               batch_size=None).materialize()

    def distinct_src(df: "pd.DataFrame") -> "pd.DataFrame":
        u = df.drop_duplicates(subset=["sk"]).reset_index(drop=True)
        return pd.DataFrame({"part": u["part"], "nk": u["sk"],
                             "node": u["src"]})

    nodes = tagged.groupby("part").map_groups(
        distinct_src, batch_format="pandas").materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return _from_arrow(pa.table({
            "domain": pa.array([], type=pa.string()),
            "authority": pa.array([], type=pa.float64()),
            "hub": pa.array([], type=pa.float64())}))

    # fwd = distinct directed edges with dst in the src set (self-loops
    # stay, exactly like the single-task finisher)
    ekey = tagged.map_batches(
        lambda b: pa.table({
            "k": pa.array(_key64(np.asarray(b["dst"].to_pylist(),
                                            dtype=object))),
            "sk": b["sk"], "src": b["src"], "dst": b["dst"]}),
        batch_format="pyarrow", batch_size=None)
    nkey = nodes.map_batches(lambda b: pa.table({"k": b["nk"]}),
                             batch_format="pyarrow", batch_size=None)
    fwd = copartition_hash_join(ekey, nkey, on="k", n_parts=P,
                                how="semi").map_batches(
        lambda b: pa.table({
            "sk": b["sk"], "src": b["src"],
            "dk": b["k"], "dst": b["dst"]}),
        batch_format="pyarrow", batch_size=None).materialize()

    state = nodes.map_batches(
        lambda b: pa.table({"part": b["part"], "nk": b["nk"],
                            "node": b["node"],
                            "a": pa.array(np.full(len(b), 1.0)),
                            "h": pa.array(np.full(len(b), 1.0))}),
        batch_format="pyarrow", batch_size=None).materialize()

    for _ in range(iters):
        sk_state = state.map_batches(
            lambda b: pa.table({"k": b["nk"], "hS": b["h"]}),
            batch_format="pyarrow", batch_size=None)
        dk_state = state.map_batches(
            lambda b: pa.table({"k": b["nk"], "aS": b["a"]}),
            batch_format="pyarrow", batch_size=None)
        in_j = copartition_hash_join(
            fwd.map_batches(lambda b: pa.table({
                "k": b["sk"], "tgt": b["dst"], "oth": b["src"]}),
                batch_format="pyarrow", batch_size=None),
            sk_state, on="k", n_parts=P)
        out_j = copartition_hash_join(
            fwd.map_batches(lambda b: pa.table({
                "k": b["dk"], "tgt": b["src"], "oth": b["dst"]}),
                batch_format="pyarrow", batch_size=None),
            dk_state, on="k", n_parts=P)

        def contrib(kind, val_col):
            def fn(batch: pa.Table) -> pa.Table:
                nk = _key64(np.asarray(batch["tgt"].to_pylist(),
                                       dtype=object))
                return pa.table({
                    "part": pa.array(_part_of(nk, P)),
                    "kind": pa.array(np.full(len(batch), kind,
                                             dtype=np.int8)),
                    "nk": pa.array(nk), "node": batch["tgt"],
                    "aux": batch["oth"],
                    "v1": batch[val_col],
                    "v2": pa.array(np.zeros(len(batch)))})
            return fn

        na_rows = in_j.map_batches(contrib(0, "hS"),
                                   batch_format="pyarrow",
                                   batch_size=None)
        nh_rows = out_j.map_batches(contrib(1, "aS"),
                                    batch_format="pyarrow",
                                    batch_size=None)
        st_tag = state.map_batches(
            lambda b: pa.table({
                "part": b["part"],
                "kind": pa.array(np.full(len(b), 2, dtype=np.int8)),
                "nk": b["nk"], "node": b["node"],
                "aux": pa.array([""] * len(b), type=pa.string()),
                "v1": b["a"], "v2": b["h"]}),
            batch_format="pyarrow", batch_size=None)

        def update(df: "pd.DataFrame") -> "pd.DataFrame":
            uni = df[df["kind"] == 2].reset_index(drop=True)
            unodes = uni["node"].to_numpy(dtype=object)

            def fold(sub):
                if not len(sub):
                    return np.zeros(len(uni))
                sub = sub.sort_values(["node", "aux"], kind="stable")
                arr = sub["node"].to_numpy(dtype=object)
                seg = pd.factorize(pd.Series(arr))[0].astype(np.int64)
                starts, folds = _seq_segment_fold(
                    seg, sub["v1"].to_numpy(np.float64))
                return pd.Series(folds, index=arr[starts]) \
                    .reindex(unodes).fillna(0.0).to_numpy(np.float64)

            na = fold(df[df["kind"] == 0])
            nh = fold(df[df["kind"] == 1])
            return pd.DataFrame({"part": uni["part"], "nk": uni["nk"],
                                 "node": unodes, "a": na, "h": nh})

        # block-count bound per iteration (see pagerank_dist)
        state = (na_rows.union(nh_rows).union(st_tag).groupby("part")
                 .map_groups(update, batch_format="pandas")
                 .repartition(P).materialize())

    def partial_sums(df: "pd.DataFrame") -> "pd.DataFrame":
        sa = sum(Fraction(float(x)) for x in df["a"])
        sh = sum(Fraction(float(x)) for x in df["h"])
        return pd.DataFrame({"sa": [str(sa)], "sh": [str(sh)]})

    sums = state.groupby("part").map_groups(
        partial_sums, batch_format="pandas").to_pandas()
    sa = float(sum(Fraction(x) for x in sums["sa"]))
    sh = float(sum(Fraction(x) for x in sums["sh"]))

    def finish(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        h = batch["h"].to_numpy(zero_copy_only=False)
        auth = (pa.array(np.full(len(batch), None, dtype=object))
                if sa == 0.0 else
                pa.array(round_half_away(a / sa, 9)))
        hub = (pa.array(np.full(len(batch), None, dtype=object))
               if sh == 0.0 else
               pa.array(round_half_away(h / sh, 9)))
        return pa.table({"domain": batch["node"],
                         "authority": auth.cast(pa.float64()),
                         "hub": hub.cast(pa.float64())})

    return state.map_batches(finish, batch_format="pyarrow",
                             batch_size=None).sort("domain")


def common_pairs_dist(edges, group_col: str, item_col: str,
                      n_parts: int = 32, hot_group_cap: int | None = None):
    """Distributed co-citation / bibliographic coupling: the (group ->
    item-pair) fan-out shuffle of the near-dup inverted index — shard
    the distinct edge aggregate by group key, emit each group's
    C(deg, 2) ordered item pairs (vectorized ``triu_indices`` per
    group), count pairs under a pair-key shuffle.  Self-loops
    participate like any edge (the single-task contract).  Exact
    integers end-to-end.

    ``hot_group_cap``: optional skew valve — a group with more than
    this many distinct items contributes only its lexicographically
    first ``cap`` items (the near_dup hot-bucket contract, default
    off = exact)."""
    import pandas as pd

    P = int(n_parts)

    def tag(batch: pa.Table) -> pa.Table:
        g = np.asarray(batch[group_col].to_pylist(), dtype=object)
        it = np.asarray(batch[item_col].to_pylist(), dtype=object)
        gk = _key64(g)
        return pa.table({
            "part": pa.array(_part_of(gk, P)),
            "gk": pa.array(gk),
            "item": pa.array(it, type=pa.string()),
        })

    def fan_pairs(df: "pd.DataFrame") -> pa.Table:
        # typed Arrow return: a pair-less bucket must not emit
        # null-type string columns into the pair-count shuffle
        d1s, d2s = [], []
        for _, sub in df.groupby("gk", sort=False):
            items = np.unique(sub["item"].to_numpy(dtype=object))
            if hot_group_cap is not None and len(items) > hot_group_cap:
                items = items[:hot_group_cap]
            if len(items) < 2:
                continue
            i, j = np.triu_indices(len(items), k=1)
            d1s.append(items[i])
            d2s.append(items[j])
        if not d1s:
            d1 = d2 = np.empty(0, dtype=object)
        else:
            d1 = np.concatenate(d1s)
            d2 = np.concatenate(d2s)
        pk = _pair_key64(d1, d2) if len(d1) \
            else np.empty(0, dtype=np.int64)
        return pa.table({"part": pa.array(_part_of(pk, P)),
                         "d1": pa.array(d1, type=pa.string()),
                         "d2": pa.array(d2, type=pa.string())})

    def count_pairs(df: "pd.DataFrame") -> pa.Table:
        g = df.groupby(["d1", "d2"], sort=False).size().reset_index()
        g.columns = ["d1", "d2", "n_common"]
        return pa.table({
            "part": pa.array(np.full(
                len(g), df["part"].iloc[0] if len(df) else 0,
                dtype=np.int32)),
            "d1": pa.array(g["d1"].to_numpy(dtype=object),
                           type=pa.string()),
            "d2": pa.array(g["d2"].to_numpy(dtype=object),
                           type=pa.string()),
            "n_common": pa.array(g["n_common"].to_numpy(np.int64))})

    return (edges.map_batches(tag, batch_format="pyarrow",
                              batch_size=None)
            .groupby("part").map_groups(fan_pairs, batch_format="pandas")
            .groupby("part").map_groups(count_pairs,
                                        batch_format="pandas")
            .map_batches(lambda b: b.select(["d1", "d2", "n_common"]),
                         batch_format="pyarrow", batch_size=None))


def cocitation_dist(edges, n_parts: int = 32,
                    hot_group_cap: int | None = None):
    """Distributed :func:`webgraph.domain_cocitation` (shared source).
    Sorted (d1, d2) like the single-task finisher, so auto dispatch
    never changes row order."""
    return common_pairs_dist(edges, "src_domain", "dst_domain",
                             n_parts, hot_group_cap).sort(["d1", "d2"])


def coupling_dist(edges, n_parts: int = 32,
                  hot_group_cap: int | None = None):
    """Distributed :func:`webgraph.domain_coupling` (shared target).
    Sorted (d1, d2) like the single-task finisher."""
    return common_pairs_dist(edges, "dst_domain", "src_domain",
                             n_parts, hot_group_cap).sort(["d1", "d2"])


def _tri_node_counts(edges, n_parts: int):
    """Shared triangle core: forward (min-degree-orientation) triangle
    enumeration over the distinct undirected simple edge shards.

    Returns (und, deg, tri) where tri = (part, nk, node, t) per-node
    triangle counts (nodes with zero triangles absent — callers
    left-join against deg).  Each undirected edge is oriented from its
    lower (degree, domain) endpoint; every triangle is generated
    exactly once as a wedge at its minimum endpoint and closed by a
    canonical-pair co-partition against the edge set — the standard
    edge-iterator shape whose per-node fan-out is bounded by the
    oriented out-degree (O(sqrt(E)) on any graph), the hot-node-proof
    form of the wedge join."""
    import pandas as pd

    P = int(n_parts)
    und = _und_edges(edges, P).materialize()
    deg = _degrees(und, P).materialize()

    jv = _edges_with_degrees(und, deg, P, carry=("u", "v"))

    def orient(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["u"].to_pylist(), dtype=object)
        v = np.asarray(batch["v"].to_pylist(), dtype=object)
        a = batch["dgu"].to_numpy(zero_copy_only=False).astype(np.int64)
        b_ = batch["dgv"].to_numpy(zero_copy_only=False).astype(np.int64)
        # center = lower (degree, domain) endpoint; u < v already
        u_first = (a < b_) | (a == b_)
        c = np.where(u_first, u, v)
        x = np.where(u_first, v, u)
        ck = _key64(c)
        return pa.table({
            "part": pa.array(_part_of(ck, P)),
            "ck": pa.array(ck),
            "c": pa.array(c, type=pa.string()),
            "x": pa.array(x, type=pa.string()),
        })

    def wedge_pairs(df: "pd.DataFrame") -> pa.Table:
        # returns a TYPED Arrow table: a bucket with no wedges must not
        # degrade string columns to null-type blocks (union() below)
        cs, xs, ys = [], [], []
        for _, sub in df.groupby("ck", sort=False):
            out = np.sort(sub["x"].to_numpy(dtype=object))
            if len(out) < 2:
                continue
            i, j = np.triu_indices(len(out), k=1)
            cs.append(np.repeat(sub["c"].iloc[0], len(i)))
            xs.append(out[i])
            ys.append(out[j])
        if not cs:
            c = x = y = np.empty(0, dtype=object)
            pk = np.empty(0, dtype=np.int64)
        else:
            c = np.concatenate(cs)
            x = np.concatenate(xs)
            y = np.concatenate(ys)
            pk = _pair_key64(x, y)              # out lists sorted: x < y
        return pa.table({
            "part": pa.array(_part_of(pk, P)),
            "pk": pa.array(pk),
            "kind": pa.array(np.zeros(len(pk), dtype=np.int8)),
            "c": pa.array(c, type=pa.string()),
            "x": pa.array(x, type=pa.string()),
            "y": pa.array(y, type=pa.string())})

    cand = (jv.map_batches(orient, batch_format="pyarrow",
                           batch_size=None)
            .groupby("part").map_groups(wedge_pairs,
                                        batch_format="pandas"))
    und_tag = und.map_batches(
        lambda b: pa.table({
            "part": b["part"], "pk": b["pk"],
            "kind": pa.array(np.ones(len(b), dtype=np.int8)),
            "c": pa.array([""] * len(b), type=pa.string()),
            "x": pa.array([""] * len(b), type=pa.string()),
            "y": pa.array([""] * len(b), type=pa.string())}),
        batch_format="pyarrow", batch_size=None)

    def close(df: "pd.DataFrame") -> pa.Table:
        have = set(df.loc[df["kind"] == 1, "pk"].tolist())
        hit = df[(df["kind"] == 0) & df["pk"].isin(have)]
        node = np.concatenate([hit["c"].to_numpy(dtype=object),
                               hit["x"].to_numpy(dtype=object),
                               hit["y"].to_numpy(dtype=object)])
        nk = _key64(node)
        return pa.table({"part": pa.array(_part_of(nk, P)),
                         "nk": pa.array(nk),
                         "node": pa.array(node, type=pa.string())})

    def per_node(df: "pd.DataFrame") -> pa.Table:
        g = df.groupby(["nk", "node"], sort=False).size().reset_index()
        g.columns = ["nk", "node", "t"]
        return pa.table({
            "part": pa.array(np.full(
                len(g), df["part"].iloc[0] if len(df) else 0,
                dtype=np.int32)),
            "nk": pa.array(g["nk"].to_numpy(np.int64)),
            "node": pa.array(g["node"].to_numpy(dtype=object),
                             type=pa.string()),
            "t": pa.array(g["t"].to_numpy(np.int64))})

    tri = (cand.union(und_tag).groupby("part")
           .map_groups(close, batch_format="pandas")
           .groupby("part").map_groups(per_node, batch_format="pandas")
           .materialize())
    return und, deg, tri


def _deg_histogram(deg) -> "dict[int, int]":
    """Global (degree value -> node count) histogram via per-bucket
    partials — rows bounded by distinct degree values, never nodes."""
    import pandas as pd

    def part_hist(df: "pd.DataFrame") -> "pd.DataFrame":
        vals, cnts = np.unique(df["dg"].to_numpy(np.int64),
                               return_counts=True)
        return pd.DataFrame({"dg": vals.astype(np.int64),
                             "cnt": cnts.astype(np.int64)})

    h = deg.groupby("part").map_groups(
        part_hist, batch_format="pandas").to_pandas()
    out: dict = {}
    for v, c in zip(h["dg"].tolist(), h["cnt"].tolist()):
        out[int(v)] = out.get(int(v), 0) + int(c)
    return out


def triangles_dist(edges, n_parts: int = 32):
    """Distributed :func:`webgraph.domain_triangles` global census.
    T from the forward enumeration (== trace(A^3)/6 exactly), wedges
    from the degree histogram in Python big ints, one mirrored float
    division."""
    import pandas as pd

    from .text import round_half_away

    und, deg, tri = _tri_node_counts(edges, n_parts)
    n_edges = und.count()
    hist = _deg_histogram(deg)
    n_nodes = sum(hist.values())
    wedges = sum(c * (v * (v - 1)) for v, c in hist.items()) // 2

    tsum = tri.map_batches(
        lambda b: pa.table({"s": pa.array(
            [np.int64(np.sum(b["t"].to_numpy(zero_copy_only=False)))])}),
        batch_format="pyarrow", batch_size=None).to_pandas()
    tri_total = int(tsum["s"].sum()) // 3 if len(tsum) else 0

    clus = (None if wedges == 0 else
            float(round_half_away(np.float64(
                float(3 * tri_total) / float(wedges)))))
    return _from_arrow(pa.table({
        "n_nodes": pa.array([n_nodes], type=pa.int64()),
        "n_edges": pa.array([n_edges], type=pa.int64()),
        "n_wedges": pa.array([wedges], type=pa.int64()),
        "n_triangles": pa.array([tri_total], type=pa.int64()),
        "clustering": pa.array([clus], type=pa.float64()),
    }))


def clustering_dist(edges, n_parts: int = 32):
    """Distributed :func:`webgraph.domain_clustering`: per-node triangle
    counts from the shared forward core, left-joined onto the degree
    table (zero-fill), identical division + rounding."""
    from .text import round_half_away

    _, deg, tri = _tri_node_counts(edges, n_parts)
    trik = tri.map_batches(
        lambda b: pa.table({"k": b["nk"], "t": b["t"]}),
        batch_format="pyarrow", batch_size=None)
    degk = deg.map_batches(
        lambda b: pa.table({"k": b["nk"], "node": b["node"],
                            "dg": b["dg"]}),
        batch_format="pyarrow", batch_size=None)
    j = copartition_hash_join(degk, trik, on="k", n_parts=int(n_parts),
                              how="left")

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        dg = batch["dg"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pc.fill_null(batch["t"], 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        clus = [None if int(d_) < 2 else
                float(round_half_away(np.float64(
                    float(2 * int(tt)) / float(int(d_) * (int(d_) - 1)))))
                for tt, d_ in zip(t, dg)]
        return pa.table({
            "domain": batch["node"],
            "degree": pa.array(dg),
            "n_triangles": pa.array(t),
            "clustering": pa.array(clus, type=pa.float64()),
        })

    return j.map_batches(finish, batch_format="pyarrow",
                         batch_size=None).sort("domain")


def link_jaccard_dist(edges, k: int = 20, n_parts: int = 32):
    """Distributed :func:`webgraph.domain_link_jaccard`: neighbor-pair
    fan-out over the inverted undirected adjacency (shared-neighbor
    counting, the common_pairs shape), degree joins for |union|, a
    canonical-pair left join for the adjacency flag, and per-batch
    top-k partials merged on the driver (P*k rows, never the pair
    table)."""
    import pandas as pd

    from .text import round_half_away

    P = int(n_parts)
    und = _und_edges(edges, P).materialize()
    deg = _degrees(und, P).materialize()

    # inverted adjacency rows (shared neighbor b -> endpoint a)
    inv = und.map_batches(
        lambda b: pa.table({
            "src_domain": pa.array(np.concatenate(
                [np.asarray(b["u"].to_pylist(), dtype=object),
                 np.asarray(b["v"].to_pylist(), dtype=object)]),
                type=pa.string()),
            "dst_domain": pa.array(np.concatenate(
                [np.asarray(b["v"].to_pylist(), dtype=object),
                 np.asarray(b["u"].to_pylist(), dtype=object)]),
                type=pa.string())}),
        batch_format="pyarrow", batch_size=None)
    common = common_pairs_dist(inv, "src_domain", "dst_domain", P)

    deg_1 = deg.map_batches(
        lambda b: pa.table({"k": b["nk"], "dg1": b["dg"]}),
        batch_format="pyarrow", batch_size=None)
    deg_2 = deg.map_batches(
        lambda b: pa.table({"k": b["nk"], "dg2": b["dg"]}),
        batch_format="pyarrow", batch_size=None)
    c1 = common.map_batches(lambda b: pa.table({
        "k": pa.array(_key64(np.asarray(b["d1"].to_pylist(),
                                        dtype=object))),
        "d1": b["d1"], "d2": b["d2"], "n_common": b["n_common"]}),
        batch_format="pyarrow", batch_size=None)
    j1 = copartition_hash_join(c1, deg_1, on="k", n_parts=P)
    c2 = j1.map_batches(lambda b: pa.table({
        "k": pa.array(_key64(np.asarray(b["d2"].to_pylist(),
                                        dtype=object))),
        "d1": b["d1"], "d2": b["d2"], "n_common": b["n_common"],
        "dg1": b["dg1"]}), batch_format="pyarrow", batch_size=None)
    j2 = copartition_hash_join(c2, deg_2, on="k", n_parts=P)

    adj = und.map_batches(
        lambda b: pa.table({"k": b["pk"],
                            "adj": pa.array(np.ones(len(b),
                                                    dtype=np.int8))}),
        batch_format="pyarrow", batch_size=None)
    c3 = j2.map_batches(lambda b: pa.table({
        "k": pa.array(_pair_key64(
            np.asarray(b["d1"].to_pylist(), dtype=object),
            np.asarray(b["d2"].to_pylist(), dtype=object))),
        "d1": b["d1"], "d2": b["d2"], "n_common": b["n_common"],
        "dg1": b["dg1"], "dg2": b["dg2"]}),
        batch_format="pyarrow", batch_size=None)
    j3 = copartition_hash_join(c3, adj, on="k", n_parts=P, how="left")

    _TOPK_SCHEMA = pa.schema([
        ("d1", pa.string()), ("d2", pa.string()),
        ("n_common", pa.int64()), ("n_union", pa.int64()),
        ("jac", pa.float64()), ("is_adjacent", pa.bool_())])

    def topk_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if not len(batch):
            # typed empty (the matchless-bucket convention): from_pandas
            # on an empty frame would infer null-typed string columns
            return _TOPK_SCHEMA.empty_table()
        common_ = batch["n_common"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        union = (batch["dg1"].to_numpy(zero_copy_only=False)
                 .astype(np.int64)
                 + batch["dg2"].to_numpy(zero_copy_only=False)
                 .astype(np.int64) - common_)
        jac = common_.astype(np.float64) / union.astype(np.float64)
        isadj = pc.fill_null(batch["adj"], 0).to_numpy(
            zero_copy_only=False).astype(np.int8) > 0
        df = pd.DataFrame({
            "d1": batch["d1"].to_numpy(zero_copy_only=False),
            "d2": batch["d2"].to_numpy(zero_copy_only=False),
            "n_common": common_, "n_union": union, "jac": jac,
            "is_adjacent": isadj})
        df = df.sort_values(["jac", "d1", "d2"],
                            ascending=[False, True, True],
                            kind="stable").head(k)
        return pa.Table.from_pandas(
            df, preserve_index=False).select(
            _TOPK_SCHEMA.names).cast(_TOPK_SCHEMA)

    parts = j3.map_batches(topk_partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()  # <= P*k rows
    parts = parts.sort_values(["jac", "d1", "d2"],
                              ascending=[False, True, True],
                              kind="stable").head(k)
    return _from_arrow(pa.table({
        "d1": pa.array(parts["d1"].tolist(), type=pa.string()),
        "d2": pa.array(parts["d2"].tolist(), type=pa.string()),
        "n_common": pa.array(parts["n_common"].to_numpy(np.int64)),
        "n_union": pa.array(parts["n_union"].to_numpy(np.int64)),
        "jaccard": pa.array([
            float(round_half_away(np.float64(x)))
            for x in parts["jac"].tolist()], type=pa.float64()),
        "is_adjacent": pa.array(parts["is_adjacent"].tolist(),
                                type=pa.bool_()),
    }))


def rich_club_dist(edges, n_parts: int = 32):
    """Distributed :func:`webgraph.rich_club`: both curves come from
    HISTOGRAM suffix sums — the degree histogram gives N_k, the
    per-edge min-endpoint-degree histogram gives E_k — so the driver
    finish is bounded by the distinct degree values, never nodes or
    edges.  Python big-int counts, identical float divisions."""
    import pandas as pd

    from .text import round_half_away

    P = int(n_parts)
    und = _und_edges(edges, P).materialize()
    deg = _degrees(und, P).materialize()
    hist = _deg_histogram(deg)

    jv = _edges_with_degrees(und, deg, P)

    def min_hist(batch: pa.Table) -> pa.Table:
        a = batch["dgu"].to_numpy(zero_copy_only=False).astype(np.int64)
        b_ = batch["dgv"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.minimum(a, b_)
        vals, cnts = np.unique(m, return_counts=True)
        return pa.table({"m": pa.array(vals.astype(np.int64)),
                         "cnt": pa.array(cnts.astype(np.int64))})

    mh = jv.map_batches(min_hist, batch_format="pyarrow",
                        batch_size=None).to_pandas()
    mhist: dict = {}
    for v, c in zip(mh["m"].tolist(), mh["cnt"].tolist()):
        mhist[int(v)] = mhist.get(int(v), 0) + int(c)

    # true suffix sums over the SORTED histograms: O(D log D) driver
    # work, not a full-histogram rescan per threshold
    ks = sorted(hist)
    ksuf = {}
    run = 0
    for v in reversed(ks):
        run += hist[v]
        ksuf[v] = run                   # nodes with degree >= v
    mvals = sorted(mhist)
    msuf = {}
    run = 0
    for v in reversed(mvals):
        run += mhist[v]
        msuf[v] = run                   # edges with min-degree >= v
    rows = {"k": [], "n_nodes": [], "n_edges": [], "phi": []}
    for i, kk in enumerate(ks):
        # degree > kk == degree >= next distinct degree
        nk_ = ksuf[ks[i + 1]] if i + 1 < len(ks) else 0
        pos = np.searchsorted(np.asarray(mvals), kk, side="right")
        ek = msuf[mvals[pos]] if pos < len(mvals) else 0
        rows["k"].append(kk)
        rows["n_nodes"].append(nk_)
        rows["n_edges"].append(ek)
        rows["phi"].append(
            float(round_half_away(np.float64(
                float(2 * ek) / float(nk_ * (nk_ - 1)))))
            if nk_ > 1 else None)
    return _from_arrow(pa.table({
        "k": pa.array(rows["k"], type=pa.int64()),
        "n_nodes": pa.array(rows["n_nodes"], type=pa.int64()),
        "n_edges": pa.array(rows["n_edges"], type=pa.int64()),
        "phi": pa.array(rows["phi"], type=pa.float64()),
    }))
