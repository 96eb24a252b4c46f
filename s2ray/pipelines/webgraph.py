"""Web-graph operators over the synthetic crawl: deterministic outlink
derivation (SQL-mirrored exactly like the pages synth itself,
``sources/pages.py:84``), vectorized domain extraction from URLs, and
domain-level graph analytics — weighted edge counts and PageRank.

Scale shape: edges are NEVER materialized corpus-sized.  Each batch
pre-aggregates its (src_domain, dst_domain) pairs down to the domain
adjacency matrix (20 x 20 = 400 cells for this corpus's fixed source
vocabulary), so the shuffle moves O(batches x 400) rows regardless of
corpus size, and the domain-level graph then fits in one bounded final
task — the same vocabulary-bounded argument as
``analytics.domain_lang_entropy`` and the grid-bounded argument of
``cluster.grid_smooth``.  At a web-scale domain vocabulary (~100M
domains) the partial stays per-batch-bounded and the PageRank step
switches to the standard bucketed power iteration (contribution shuffle
keyed by dst); the 20-domain final task here is the exact-oracle path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Knuth multiplicative constant — the same public-domain mixer the pages
# synth uses for geo (sources/pages.py:41); 97 de-correlates the fanout.
_LINK_MUL = 2654435761
_LINK_C = 97
_MOD32 = 4294967296
_N_SRC = 20


def _outlink_dst_idx(uid: np.ndarray, j: int) -> np.ndarray:
    """Deterministic link-target domain index for outlink slot j.

    Pure int64 arithmetic (uid < 2^31.7 keeps uid * MUL inside int64 —
    the same bound the geo synth already imposes), mirrored 1:1 in the
    oracle SQL.
    """
    return ((uid * _LINK_MUL + j * _LINK_C) % _MOD32) % _N_SRC


def _edge_partials(batch: pa.Table) -> pa.Table:
    """documents rows -> per-batch (src_domain, dst_domain, n) partials.

    Each page carries 1 + page_id % 3 outlinks (slots j with
    j < 1 + page_id % 3).  The src domain is EXTRACTED from the page url
    with the same regex kernel the crawl analytics use
    (analytics.url_domain_counts), not read from the source column — the
    url is the only field a real crawl record would carry.
    """
    uid = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    url = pc.binary_join_element_wise(
        pa.scalar("https://"), batch["source"],
        pa.scalar(".example.com/doc/"),
        pc.cast(pa.array(uid), pa.string()), pa.scalar(""))
    dom = pc.struct_field(
        pc.extract_regex(url, r"https://(?P<d>[^/]+)/"), "d")
    dom_codes = pc.cast(dom, pa.string()).dictionary_encode()
    src_code = dom_codes.combine_chunks().indices.to_numpy(
        zero_copy_only=False).astype(np.int64)
    src_vocab = dom_codes.combine_chunks().dictionary.to_pylist()

    fan = 1 + uid % 3
    packs = []
    for j in range(3):
        keep = j < fan
        dst = _outlink_dst_idx(uid[keep], j)
        packs.append(src_code[keep] * _N_SRC + dst)
    packed = np.concatenate(packs)
    u, c = np.unique(packed, return_counts=True)
    return pa.table({
        "src_domain": pa.array([src_vocab[int(p) // _N_SRC] for p in u],
                               type=pa.string()),
        "dst_domain": pa.array([f"src{int(p) % _N_SRC}.example.com"
                                for p in u], type=pa.string()),
        "n": pa.array(c.astype(np.int64)),
    })


def _read_link_source(sf_dir: str):
    """Pruned read: the link graph needs ONLY doc_id + source (the url is
    derived, the html/text columns never leave storage)."""
    import ray
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return ds.repartition(max(8, 2 * ncpu))


def domain_link_graph(sf_dir: str):
    """Domain-level link graph of the crawl: (src_domain, dst_domain,
    n_links) — the classic web-graph construction (extract outlinks,
    aggregate to the domain adjacency).  Outlinks are derived
    deterministically from page_id (slot rule j < 1 + page_id % 3,
    target ((page_id * 2654435761 + j * 97) % 2^32) % 20), mirrored in
    the oracle CTE exactly like the pages synth derives geo.

    Exact integer counts only — hash-stable under any partial order.
    """
    from ray.data.aggregate import Sum

    return (_read_link_source(sf_dir)
            .map_batches(_edge_partials, batch_format="pyarrow",
                         batch_size=None)
            .groupby(["src_domain", "dst_domain"])
            .aggregate(Sum("n", alias_name="n_links")))


def _dispatch_edges(edges, method: str, dist_edge_threshold: int | None):
    """Shared method="auto" dispatch (the dedup.near_dup_clusters
    pattern): materialize the vocabulary-bounded edge aggregate, count
    it, and pick the single-task exact finisher below the threshold or
    the distributed path (webgraph_dist) above it.  Returns
    (materialized edges, resolved method)."""
    if method == "auto":
        from .webgraph_dist import DIST_EDGE_THRESHOLD

        edges = edges.materialize()
        thr = (DIST_EDGE_THRESHOLD if dist_edge_threshold is None
               else dist_edge_threshold)
        method = "exact" if edges.count() <= thr else "distributed"
    if method not in ("exact", "distributed"):
        raise ValueError(f"unknown method {method!r}")
    return edges, method


def domain_pagerank(sf_dir: str, damping: float = 0.85, iters: int = 20,
                    method: str = "auto",
                    dist_edge_threshold: int | None = None):
    """Dispatching wrapper over :func:`pagerank_from_edges` — see it and
    :func:`webgraph_dist.pagerank_dist` for the two execution paths."""
    return pagerank_from_edges(domain_link_graph(sf_dir), damping=damping,
                               iters=iters, method=method,
                               dist_edge_threshold=dist_edge_threshold)


def pagerank_from_edges(edges, damping: float = 0.85, iters: int = 20,
                        method: str = "auto",
                        dist_edge_threshold: int | None = None):
    """PageRank over the domain link graph — an ITERATIVE graph algorithm
    under the exact SQL gate (the oracle unrolls the power iteration as a
    recursive CTE).  Output: (domain, out_links, pagerank) per domain.

    Exactness: the transition weights t = float(n)/float(out) and the
    iteration r' = (1.0 - damping)/n_f + damping * fold are evaluated in
    the identical IEEE op order on both engines; the per-target fold over
    incoming contributions t * r is ORDER-PINNED to ascending src domain
    (sequential left fold from 0.0 here, list_reduce over
    list(... ORDER BY s) in SQL).  The SQL recursion carries zero-weight
    self-edges so every node survives the join each iteration; the engine
    omits them because adding +0.0 anywhere in a nonnegative IEEE sum is
    an exact identity.  Edges whose target domain has no pages (hence no
    out-links) are dropped on both sides (standard dangling-node
    simplification).  The final task is bounded by the domain vocabulary
    (20 nodes / <=400 edges), never the corpus; above
    ``dist_edge_threshold`` aggregate edges (method="auto") the same
    iteration runs as the bucketed contribution shuffle of
    :func:`webgraph_dist.pagerank_dist`, whose order-pinned stepped
    fold keeps the ranks bit-identical (equivalence pytest:
    tests/test_webgraph_dist.py).
    """
    from .text import round_half_away

    edges, method = _dispatch_edges(edges, method, dist_edge_threshold)
    if method == "distributed":
        from .webgraph_dist import pagerank_dist

        return pagerank_dist(edges, damping=damping, iters=iters)

    def power_iter(batch: pa.Table) -> pa.Table:
        if not len(batch):
            # empty edge table (zero-row / all-null-source corpus):
            # np.array([]) masks are float64 and would raise as indices
            return pa.table({
                "domain": pa.array([], type=pa.string()),
                "out_links": pa.array([], type=pa.int64()),
                "pagerank": pa.array([], type=pa.float64()),
            })
        s = np.asarray(batch["src_domain"].to_pylist(), dtype=object)
        d = np.asarray(batch["dst_domain"].to_pylist(), dtype=object)
        n = batch["n_links"].to_numpy(zero_copy_only=False).astype(np.int64)
        nodes = sorted(set(s.tolist()))
        idx = {dom: i for i, dom in enumerate(nodes)}
        nn = len(nodes)
        out = np.zeros(nn, dtype=np.int64)
        for si, ni in zip(s.tolist(), n.tolist()):
            out[idx[si]] += ni
        keep = np.array([dd in idx for dd in d.tolist()])
        es = np.array([idx[x] for x in s[keep].tolist()], dtype=np.int64)
        ed = np.array([idx[x] for x in d[keep].tolist()], dtype=np.int64)
        en = n[keep]
        t = en.astype(np.float64) / out[es].astype(np.float64)
        # pin the fold order: contributions grouped by dst, ascending src
        order = np.lexsort((es, ed))
        es, ed, t = es[order], ed[order], t[order]
        nf = float(nn)
        base = (1.0 - damping) / nf
        r = np.full(nn, 1.0 / nf)
        for _ in range(iters):
            acc = np.zeros(nn)
            pos = 0
            while pos < len(ed):
                end = pos
                dd = ed[pos]
                sacc = 0.0
                while end < len(ed) and ed[end] == dd:
                    sacc += t[end] * r[es[end]]
                    end += 1
                acc[dd] = sacc
                pos = end
            r = base + damping * acc
        return pa.table({
            "domain": pa.array(nodes, type=pa.string()),
            "out_links": pa.array(out),
            "pagerank": pa.array(round_half_away(r, 9)),
        })

    return edges.repartition(1).map_batches(power_iter,
                                            batch_format="pyarrow",
                                            batch_size=None)


def domain_triangles(sf_dir: str, method: str = "auto",
                     dist_edge_threshold: int | None = None):
    """Dispatching wrapper over :func:`triangles_from_edges`."""
    return triangles_from_edges(domain_link_graph(sf_dir), method=method,
                                dist_edge_threshold=dist_edge_threshold)


def triangles_from_edges(edges, method: str = "auto",
                         dist_edge_threshold: int | None = None):
    """Triangle census of the UNDIRECTED simple domain graph (self-loops
    dropped, direction and weights collapsed): ONE row (n_nodes, n_edges,
    n_wedges, n_triangles, clustering) where clustering is the global
    clustering coefficient 3 * triangles / wedges (NULL when the graph
    has no wedges).  The subgraph-counting primitive of web-graph
    analysis, complementing :func:`domain_pagerank`.

    Exactness: triangles = trace(A^3) / 6 over the exact 0/1 adjacency
    (int64 matmul — exact far beyond any domain vocabulary), wedges =
    sum(deg * (deg - 1)) // 2 in Python big ints, and the one float
    division float(3T) / float(W) mirrors the SQL CAST-then-divide.
    Runs in the same vocabulary-bounded final task as the other domain
    ops; above ``dist_edge_threshold`` aggregate edges (method="auto")
    it becomes the min-degree-oriented edge-iterator enumeration of
    :func:`webgraph_dist.triangles_dist` (bit-equal integers).
    """
    from .text import round_half_away

    edges, method = _dispatch_edges(edges, method, dist_edge_threshold)
    if method == "distributed":
        from .webgraph_dist import triangles_dist

        return triangles_dist(edges)

    def census(batch: pa.Table) -> pa.Table:
        s = batch["src_domain"].to_pylist()
        d = batch["dst_domain"].to_pylist()
        und = {(min(a, b), max(a, b)) for a, b in zip(s, d) if a != b}
        nodes = sorted({x for e in und for x in e})
        idx = {x: i for i, x in enumerate(nodes)}
        nn = len(nodes)
        a = np.zeros((nn, nn), dtype=np.int64)
        for u, v in und:
            a[idx[u], idx[v]] = 1
            a[idx[v], idx[u]] = 1
        tri = int(np.trace(a @ a @ a)) // 6
        deg = a.sum(axis=1)
        wedges = sum(int(x) * (int(x) - 1) for x in deg) // 2
        clus = (None if wedges == 0 else
                float(round_half_away(np.float64(
                    float(3 * tri) / float(wedges)))))
        return pa.table({
            "n_nodes": pa.array([nn], type=pa.int64()),
            "n_edges": pa.array([len(und)], type=pa.int64()),
            "n_wedges": pa.array([wedges], type=pa.int64()),
            "n_triangles": pa.array([tri], type=pa.int64()),
            "clustering": pa.array([clus], type=pa.float64()),
        })

    return edges.repartition(1).map_batches(census, batch_format="pyarrow",
                                            batch_size=None)


def domain_hits(sf_dir: str, iters: int = 10, method: str = "auto",
                dist_edge_threshold: int | None = None):
    """Dispatching wrapper over :func:`hits_from_edges`."""
    return hits_from_edges(domain_link_graph(sf_dir), iters=iters,
                           method=method,
                           dist_edge_threshold=dist_edge_threshold)


def hits_from_edges(edges, iters: int = 10, method: str = "auto",
                    dist_edge_threshold: int | None = None):
    """HITS hubs & authorities over the UNWEIGHTED domain digraph —
    Kleinberg's other eigenvector, next to :func:`domain_pagerank`:
    Jacobi iterations a' = A^T h, h' = A a (simultaneous update from the
    previous vector pair), run UNNORMALIZED for ``iters`` rounds (the
    0/1 adjacency bounds growth by lambda^k <= n_nodes^k — float-safe
    for any domain vocabulary at 10 rounds) and L1-normalized ONCE at
    the end.  Output: (domain, authority, hub).

    Exactness: every per-node fold (incoming h ascending src, outgoing a
    ascending dst, and the two final normalization sums ascending
    domain) is ORDER-PINNED as a sequential left fold from 0.0; the
    recursive-CTE oracle reproduces the same sequences via list_reduce
    over list(... ORDER BY dir, s), with zero-weight filler elements
    that are exact identities (x * 0.0 = +0.0 and x + 0.0 = x for the
    nonnegative values here).  Same vocabulary-bounded final task as the
    other domain-graph ops; above ``dist_edge_threshold`` aggregate
    edges (method="auto") the iteration runs as the bucketed double
    contribution shuffle of :func:`webgraph_dist.hits_dist` (bit-equal
    iteration; the final L1 constant is the correctly-rounded true sum
    — see its docstring).
    """
    from .text import round_half_away

    edges, method = _dispatch_edges(edges, method, dist_edge_threshold)
    if method == "distributed":
        from .webgraph_dist import hits_dist

        return hits_dist(edges, iters=iters)

    def hits(batch: pa.Table) -> pa.Table:
        s = batch["src_domain"].to_pylist()
        d = batch["dst_domain"].to_pylist()
        nodes = sorted(set(s))
        idx = {x: i for i, x in enumerate(nodes)}
        nn = len(nodes)
        fwd = sorted({(idx[a], idx[b]) for a, b in zip(s, d) if b in idx})
        es = np.array([e[0] for e in fwd], dtype=np.int64)
        ed = np.array([e[1] for e in fwd], dtype=np.int64)
        a = np.full(nn, 1.0)
        h = np.full(nn, 1.0)
        # fwd sorted by (src, dst): ascending src per dst needs re-sort
        in_order = np.lexsort((es, ed))    # incoming lists ascending src
        out_order = np.lexsort((ed, es))   # outgoing lists ascending dst
        for _ in range(iters):
            na = np.zeros(nn)
            for i in in_order.tolist():    # sequential fold, pinned order
                na[ed[i]] += h[es[i]]
            nh = np.zeros(nn)
            for i in out_order.tolist():
                nh[es[i]] += a[ed[i]]
            a, h = na, nh
        sa = 0.0
        sh = 0.0
        for i in range(nn):                # ascending domain
            sa += a[i]
            sh += h[i]
        auth = [None if sa == 0.0 else
                float(round_half_away(np.float64(a[i] / sa), 9))
                for i in range(nn)]
        hub = [None if sh == 0.0 else
               float(round_half_away(np.float64(h[i] / sh), 9))
               for i in range(nn)]
        return pa.table({
            "domain": pa.array(nodes, type=pa.string()),
            "authority": pa.array(auth, type=pa.float64()),
            "hub": pa.array(hub, type=pa.float64()),
        })

    return edges.repartition(1).map_batches(hits, batch_format="pyarrow",
                                            batch_size=None)


def domain_hits_sql(cte: str, iters: int = 10) -> str:
    """Recursive-CTE mirror of :func:`domain_hits` (see its docstring for
    the order-pinning and zero-filler identities)."""
    rec_cte = cte.replace("WITH ", "WITH RECURSIVE ", 1)
    return f"""{rec_cte}, {_EDGE_SQL},
nodes AS (SELECT DISTINCT s FROM e),
fw AS (SELECT DISTINCT s, d FROM e WHERE d IN (SELECT s FROM nodes)),
ed AS (SELECT s, d, 0 AS dir, 1.0 AS w FROM fw
       UNION ALL SELECT d, s, 1, 1.0 FROM fw
       UNION ALL SELECT s, s, 0, 0.0 FROM nodes
       UNION ALL SELECT s, s, 1, 0.0 FROM nodes),
pr(d, a, h, k) AS (
  SELECT s, CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE), 0 FROM nodes
  UNION ALL
  SELECT ed.d,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(CASE WHEN ed.dir = 0 THEN pr.h * ed.w ELSE 0.0 END
                ORDER BY ed.dir, ed.s)), (x, y) -> x + y),
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(CASE WHEN ed.dir = 1 THEN pr.a * ed.w ELSE 0.0 END
                ORDER BY ed.dir, ed.s)), (x, y) -> x + y),
         pr.k + 1
  FROM pr JOIN ed ON ed.s = pr.d
  WHERE pr.k < {iters}
  GROUP BY ed.d, pr.k),
fin AS (SELECT d, a, h FROM pr WHERE k = {iters}),
nm AS (SELECT
  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(a ORDER BY d)),
              (x, y) -> x + y) AS sa,
  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(h ORDER BY d)),
              (x, y) -> x + y) AS sh FROM fin)
SELECT d AS domain,
       CASE WHEN nm.sa = 0.0 THEN NULL ELSE round(a / nm.sa, 9) END
         AS authority,
       CASE WHEN nm.sh = 0.0 THEN NULL ELSE round(h / nm.sh, 9) END AS hub
FROM fin CROSS JOIN nm"""


def domain_reciprocity(sf_dir: str, method: str = "auto",
                       dist_edge_threshold: int | None = None):
    """Dispatching wrapper over :func:`reciprocity_from_edges`."""
    return reciprocity_from_edges(
        domain_link_graph(sf_dir), method=method,
        dist_edge_threshold=dist_edge_threshold)


def reciprocity_from_edges(edges, method: str = "auto",
                           dist_edge_threshold: int | None = None):
    """Edge reciprocity of the domain digraph — the classic directed-graph
    statistic (what fraction of links are mutual): ONE row (n_edges,
    n_reciprocal, reciprocity) over the distinct directed edge set with
    self-loops dropped.  reciprocity = n_reciprocal / n_edges (NULL on an
    empty graph).

    Exactness: both counts are exact integers over the vocabulary-bounded
    edge set (the membership test is a set lookup, mirrored as a SQL
    self-join); the single float division is evaluated in the oracle's
    CAST-then-divide op order.  Same vocabulary-bounded final task as the
    other domain-graph ops; above ``dist_edge_threshold`` aggregate
    edges (method="auto") it runs as the canonical-pair co-partition of
    :func:`webgraph_dist.reciprocity_dist` (bit-equal).
    """
    from .text import round_half_away

    edges, method = _dispatch_edges(edges, method, dist_edge_threshold)
    if method == "distributed":
        from .webgraph_dist import reciprocity_dist

        return reciprocity_dist(edges)

    def recip(batch: pa.Table) -> pa.Table:
        if not len(batch):
            ed = set()
        else:
            s = batch["src_domain"].to_pylist()
            d = batch["dst_domain"].to_pylist()
            ed = {(a, b) for a, b in zip(s, d) if a != b}
        n_edges = len(ed)
        n_rec = sum(1 for a, b in ed if (b, a) in ed)
        r = None if n_edges == 0 else float(round_half_away(
            np.float64(float(n_rec) / float(n_edges)), 6))
        return pa.table({
            "n_edges": pa.array([n_edges], type=pa.int64()),
            "n_reciprocal": pa.array([n_rec], type=pa.int64()),
            "reciprocity": pa.array([r], type=pa.float64()),
        })

    return edges.repartition(1).map_batches(recip, batch_format="pyarrow",
                                            batch_size=None)


def domain_assortativity(sf_dir: str, method: str = "auto",
                         dist_edge_threshold: int | None = None):
    """Dispatching wrapper over :func:`assortativity_from_edges`."""
    return assortativity_from_edges(
        domain_link_graph(sf_dir), method=method,
        dist_edge_threshold=dist_edge_threshold)


def assortativity_from_edges(edges, method: str = "auto",
                             dist_edge_threshold: int | None = None):
    """Degree assortativity of the UNDIRECTED simple domain graph —
    Newman's r: the Pearson correlation of endpoint degrees over the
    symmetrized edge list (each undirected edge contributes both
    orderings, the standard formulation).  ONE row (n_nodes, n_edges,
    assortativity); NULL when the degree variance is zero (e.g. a
    regular graph).  Negative r = hubs link to leaves (typical web
    graphs), positive = hubs link to hubs.

    Exactness: degrees and all four moments (m2, Sx, Sxx, Sxy) are exact
    Python big ints (HUGEINT in the oracle); by symmetry Sy = Sx and
    Syy = Sxx, so r = (m2*Sxy - Sx^2) / (m2*Sxx - Sx^2) — numerator and
    denominator are computed exactly, then ONE float division in the
    oracle's CAST-then-divide order.  Vocabulary-bounded final task;
    above ``dist_edge_threshold`` aggregate edges (method="auto") the
    degree-table co-partition joins of
    :func:`webgraph_dist.assortativity_dist` run instead (bit-equal).
    """
    from .text import round_half_away

    edges, method = _dispatch_edges(edges, method, dist_edge_threshold)
    if method == "distributed":
        from .webgraph_dist import assortativity_dist

        return assortativity_dist(edges)

    def assort(batch: pa.Table) -> pa.Table:
        und = set()
        if len(batch):
            s = batch["src_domain"].to_pylist()
            d = batch["dst_domain"].to_pylist()
            und = {(min(a, b), max(a, b)) for a, b in zip(s, d) if a != b}
        deg: dict = {}
        for u, v in und:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        m2 = 2 * len(und)
        sx = sum(deg[u] + deg[v] for u, v in und)
        sxx = sum(deg[u] ** 2 + deg[v] ** 2 for u, v in und)
        sxy = sum(2 * deg[u] * deg[v] for u, v in und)
        num = m2 * sxy - sx * sx
        den = m2 * sxx - sx * sx
        r = None if den == 0 else float(round_half_away(
            np.float64(float(num) / float(den)), 6))
        return pa.table({
            "n_nodes": pa.array([len(deg)], type=pa.int64()),
            "n_edges": pa.array([len(und)], type=pa.int64()),
            "assortativity": pa.array([r], type=pa.float64()),
        })

    return edges.repartition(1).map_batches(assort,
                                            batch_format="pyarrow",
                                            batch_size=None)


def domain_bfs_depth(sf_dir: str, seed: str = "src0.example.com",
                     max_depth: int = 20, method: str = "auto",
                     dist_edge_threshold: int | None = None):
    """Dispatching wrapper over :func:`bfs_depth_from_edges`."""
    return bfs_depth_from_edges(
        domain_link_graph(sf_dir), seed=seed, max_depth=max_depth,
        method=method, dist_edge_threshold=dist_edge_threshold)


def bfs_depth_from_edges(edges, seed: str = "src0.example.com",
                         max_depth: int = 20, method: str = "auto",
                         dist_edge_threshold: int | None = None):
    """Directed BFS hop distance from a seed domain over the domain
    digraph — the shortest-path primitive of web-graph analysis
    (crawl-frontier depth): (domain, depth) for every domain reachable
    from ``seed`` within ``max_depth`` hops, seed itself at depth 0.
    Self-loops are dropped (they never shorten a path).

    Exactness: pure integer BFS over the vocabulary-bounded edge set; the
    oracle's recursive CTE enumerates (node, k) states with UNION
    dedup and takes min(k) per node — identical to BFS depth because any
    node reachable at depth j is enumerated at j before the k-cap.
    Above ``dist_edge_threshold`` aggregate edges (method="auto") the
    standard iterative frontier expansion of
    :func:`webgraph_dist.bfs_depth_dist` runs instead (one frontier +
    one label co-partition per level; bit-equal integer depths).
    """
    edges, method = _dispatch_edges(edges, method, dist_edge_threshold)
    if method == "distributed":
        from .webgraph_dist import bfs_depth_dist

        return bfs_depth_dist(edges, seed=seed, max_depth=max_depth)

    def bfs(batch: pa.Table) -> pa.Table:
        adj: dict = {}
        if len(batch):
            s = batch["src_domain"].to_pylist()
            d = batch["dst_domain"].to_pylist()
            for a, b in zip(s, d):
                if a != b:
                    adj.setdefault(a, []).append(b)
        depth = {seed: 0}
        frontier = [seed]
        k = 0
        while frontier and k < max_depth:
            k += 1
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in depth:
                        depth[v] = k
                        nxt.append(v)
            frontier = nxt
        doms = sorted(depth)
        return pa.table({
            "domain": pa.array(doms, type=pa.string()),
            "depth": pa.array([depth[x] for x in doms], type=pa.int64()),
        })

    return edges.repartition(1).map_batches(bfs, batch_format="pyarrow",
                                            batch_size=None)


_EDGE_SQL = (
    "e AS (SELECT "
    "regexp_extract(url, 'https://([^/]+)/', 1) AS s, "
    "'src' || CAST(((page_id * 2654435761 + j.j * 97) "
    "% 4294967296) % 20 AS VARCHAR) || '.example.com' AS d "
    "FROM pages_geo CROSS JOIN (VALUES (0),(1),(2)) AS j(j) "
    "WHERE j.j < 1 + page_id % 3)")


def domain_reciprocity_sql(cte: str) -> str:
    """Oracle: distinct-edge self-join; CAST-then-divide like the engine."""
    return f"""{cte}, {_EDGE_SQL},
ed AS (SELECT DISTINCT s, d FROM e WHERE s <> d),
mk AS (SELECT ed.s, ed.d,
       CASE WHEN r.s IS NULL THEN 0 ELSE 1 END AS rec
       FROM ed LEFT JOIN ed r ON r.s = ed.d AND r.d = ed.s)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(coalesce(sum(rec), 0) AS BIGINT) AS n_reciprocal,
       CASE WHEN count(*) = 0 THEN NULL ELSE
         round(CAST(coalesce(sum(rec), 0) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) END AS reciprocity
FROM mk"""


def domain_assortativity_sql(cte: str) -> str:
    """Oracle: HUGEINT moments over the symmetrized undirected edge list
    (Sy = Sx and Syy = Sxx by symmetry, exactly like the engine)."""
    return f"""{cte}, {_EDGE_SQL},
und AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
        FROM e WHERE s <> d),
deg AS (SELECT x, CAST(count(*) AS HUGEINT) AS dg FROM
        (SELECT u AS x FROM und UNION ALL SELECT v FROM und) GROUP BY 1),
j AS (SELECT du.dg AS a, dv.dg AS b
      FROM und JOIN deg du ON du.x = und.u JOIN deg dv ON dv.x = und.v),
m AS (SELECT CAST(2 * count(*) AS HUGEINT) AS m2,
             CAST(coalesce(sum(a + b), 0) AS HUGEINT) AS sx,
             CAST(coalesce(sum(a * a + b * b), 0) AS HUGEINT) AS sxx,
             CAST(coalesce(sum(2 * a * b), 0) AS HUGEINT) AS sxy
      FROM j)
SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM und) AS BIGINT) AS n_edges,
       CASE WHEN m.m2 * m.sxx - m.sx * m.sx = 0 THEN NULL ELSE
         round(CAST(m.m2 * m.sxy - m.sx * m.sx AS DOUBLE)
               / CAST(m.m2 * m.sxx - m.sx * m.sx AS DOUBLE), 6) END
         AS assortativity
FROM m"""


def domain_bfs_depth_sql(cte: str, seed: str = "src0.example.com",
                         max_depth: int = 20) -> str:
    """Oracle: recursive (node, k) state enumeration with UNION dedup;
    min(k) per node == BFS depth within the hop cap."""
    rec_cte = cte.replace("WITH ", "WITH RECURSIVE ", 1)
    return f"""{rec_cte}, {_EDGE_SQL},
ed AS (SELECT DISTINCT s, d FROM e WHERE s <> d),
r(d, k) AS (
  SELECT '{seed}', 0
  UNION
  SELECT ed.d, r.k + 1 FROM r JOIN ed ON ed.s = r.d
  WHERE r.k < {max_depth}
)
SELECT d AS domain, CAST(min(k) AS BIGINT) AS depth FROM r GROUP BY 1"""


def _common_neighbor_pairs(batch: pa.Table, group_col: str,
                           item_col: str) -> pa.Table:
    """Shared helper for co-citation / bibliographic coupling: given the
    distinct edge table, count for every item pair (i1 < i2) the number
    of distinct group values that link to both.  Runs in the
    vocabulary-bounded final task (<= vocab^2 pairs); at web scale this
    is the standard (group -> item-pair) fan-out shuffle with hot-group
    caps, same shape as the near-dup inverted index."""
    from collections import defaultdict

    pairs: dict = defaultdict(int)
    if len(batch):
        g = batch[group_col].to_pylist()
        it = batch[item_col].to_pylist()
        by_g: dict = defaultdict(set)
        for a, b in zip(g, it):
            by_g[a].add(b)
        for items in by_g.values():
            s = sorted(items)
            for x in range(len(s)):
                for y in range(x + 1, len(s)):
                    pairs[(s[x], s[y])] += 1
    ks = sorted(pairs)
    return pa.table({
        "d1": pa.array([k[0] for k in ks], type=pa.string()),
        "d2": pa.array([k[1] for k in ks], type=pa.string()),
        "n_common": pa.array([pairs[k] for k in ks], type=pa.int64()),
    })


def domain_cocitation(sf_dir: str, method: str = "auto",
                      dist_edge_threshold: int | None = None):
    """Co-citation counts on the domain digraph — for every target pair
    (d1 < d2), how many distinct domains link to BOTH (Small's classic
    similarity signal: strongly co-cited pages are topically related).
    Output: (d1, d2, n_common), pairs with n_common >= 1 only.
    Exact integers end-to-end; self-loops participate like any edge
    (mirrored in the oracle's unfiltered distinct edge set).  Above
    ``dist_edge_threshold`` aggregate edges (method="auto") the
    (source -> target-pair) fan-out shuffle of
    :func:`webgraph_dist.cocitation_dist` runs instead (bit-equal)."""
    return cocitation_from_edges(domain_link_graph(sf_dir), method=method,
                                 dist_edge_threshold=dist_edge_threshold)


def cocitation_from_edges(edges, method: str = "auto",
                          dist_edge_threshold: int | None = None):
    edges, method = _dispatch_edges(edges, method, dist_edge_threshold)
    if method == "distributed":
        from .webgraph_dist import cocitation_dist

        return cocitation_dist(edges)
    return edges.repartition(1).map_batches(
        lambda b: _common_neighbor_pairs(b, "src_domain", "dst_domain"),
        batch_format="pyarrow", batch_size=None)


def domain_coupling(sf_dir: str, method: str = "auto",
                    dist_edge_threshold: int | None = None):
    """Bibliographic coupling on the domain digraph — for every source
    pair (d1 < d2), how many distinct domains BOTH link to (Kessler's
    dual of co-citation).  Output: (d1, d2, n_common), pairs with
    n_common >= 1 only.  Exact integers end-to-end.  Above
    ``dist_edge_threshold`` aggregate edges (method="auto") the
    (target -> source-pair) fan-out shuffle of
    :func:`webgraph_dist.coupling_dist` runs instead (bit-equal)."""
    return coupling_from_edges(domain_link_graph(sf_dir), method=method,
                               dist_edge_threshold=dist_edge_threshold)


def coupling_from_edges(edges, method: str = "auto",
                        dist_edge_threshold: int | None = None):
    edges, method = _dispatch_edges(edges, method, dist_edge_threshold)
    if method == "distributed":
        from .webgraph_dist import coupling_dist

        return coupling_dist(edges)
    return edges.repartition(1).map_batches(
        lambda b: _common_neighbor_pairs(b, "dst_domain", "src_domain"),
        batch_format="pyarrow", batch_size=None)


def domain_cocitation_sql(cte: str) -> str:
    """Oracle: distinct-edge self-join on shared source, ordered pair."""
    return f"""{cte}, {_EDGE_SQL},
ed AS (SELECT DISTINCT s, d FROM e)
SELECT a.d AS d1, b.d AS d2, CAST(count(*) AS BIGINT) AS n_common
FROM ed a JOIN ed b ON a.s = b.s AND a.d < b.d GROUP BY 1, 2"""


def domain_coupling_sql(cte: str) -> str:
    """Oracle: distinct-edge self-join on shared target, ordered pair."""
    return f"""{cte}, {_EDGE_SQL},
ed AS (SELECT DISTINCT s, d FROM e)
SELECT a.s AS d1, b.s AS d2, CAST(count(*) AS BIGINT) AS n_common
FROM ed a JOIN ed b ON a.d = b.d AND a.s < b.s GROUP BY 1, 2"""


def domain_components(sf_dir: str, min_links: int = 7):
    """Connected components of the thresholded domain backbone graph —
    the web-graph community primitive: keep undirected domain links with
    at least ``min_links`` observed edges (backbone extraction), run
    hash-min label propagation, and report every domain of the FULL
    graph with its component — (domain, component_id, component_size),
    singletons included.  component_id is the member domain with the
    minimum numeric index (min-label convention, matching the oracle's
    recursive min-reachability CTE).

    Scale shape: the edge stream is the domain-adjacency aggregate
    (vocabulary-bounded, never corpus-sized); components run on the
    DISTRIBUTED label-propagation machinery (dedup._cc_label_propagation
    — per-round state is the (node, label) table co-partitioned by node
    hash, no driver edge list), which at a ~100M-domain web vocabulary
    is the only path that works; the final attach of singleton domains
    and component sizes touches vocabulary-bounded tables only.
    """
    import pandas as pd
    import ray.data

    from .dedup import _cc_label_propagation

    edges = domain_link_graph(sf_dir).materialize()

    def to_pairs(batch: pa.Table) -> pa.Table:
        n = batch["n_links"].to_numpy(zero_copy_only=False)
        keep = batch.filter(pa.array(n >= min_links))
        a = pc.cast(pc.struct_field(pc.extract_regex(
            keep["src_domain"], r"src(?P<i>\d+)"), "i"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        b = pc.cast(pc.struct_field(pc.extract_regex(
            keep["dst_domain"], r"src(?P<i>\d+)"), "i"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"i": pa.array(a), "j": pa.array(b)})

    pairs = edges.map_batches(to_pairs, batch_format="pyarrow",
                              batch_size=None)
    lab = _cc_label_propagation(pairs).to_pandas()   # vocab-bounded

    # full node universe (src OR dst of ANY edge, threshold ignored)
    et = edges.to_pandas()                           # vocab-bounded
    idx = np.union1d(
        et["src_domain"].str.extract(r"src(\d+)")[0].astype(np.int64),
        et["dst_domain"].str.extract(r"src(\d+)")[0].astype(np.int64))
    comp = dict(zip(lab["node"].astype(np.int64),
                    lab["label"].astype(np.int64)))
    cid = np.array([comp.get(int(v), int(v)) for v in idx],
                   dtype=np.int64)
    sizes = pd.Series(cid).value_counts()
    return ray.data.from_arrow(pa.table({
        "domain": pa.array([f"src{int(v)}.example.com" for v in idx],
                           type=pa.string()),
        "component_id": pa.array(
            [f"src{int(c)}.example.com" for c in cid], type=pa.string()),
        "component_size": pa.array(
            sizes[cid].to_numpy().astype(np.int64)),
    }))


def domain_components_sql(cte: str, min_links: int = 7) -> str:
    """Oracle for :func:`domain_components` — recursive min-reachability
    over the same thresholded undirected backbone, singleton-preserving."""
    rec_cte = cte.replace("WITH ", "WITH RECURSIVE ", 1)
    return (
        f"{rec_cte}, {_EDGE_SQL}, "
        "ew AS (SELECT s, d, count(*) AS n FROM e GROUP BY 1, 2), "
        "nd AS (SELECT DISTINCT CAST(regexp_extract(x, 'src(\\d+)', 1) "
        "AS BIGINT) AS v FROM "
        "(SELECT s AS x FROM ew UNION SELECT d FROM ew)), "
        f"ee AS (SELECT CAST(regexp_extract(s, 'src(\\d+)', 1) AS BIGINT) "
        "AS a, CAST(regexp_extract(d, 'src(\\d+)', 1) AS BIGINT) AS b "
        f"FROM ew WHERE n >= {min_links}), "
        "und AS (SELECT a, b FROM ee UNION SELECT b AS a, a AS b FROM ee), "
        "reach(v, r) AS (SELECT v, v FROM nd UNION "
        "SELECT reach.v, und.b FROM reach JOIN und ON und.a = reach.r), "
        "comp AS (SELECT v, min(r) AS c FROM reach GROUP BY v), "
        "cs AS (SELECT c, CAST(count(*) AS BIGINT) AS n FROM comp "
        "GROUP BY c) "
        "SELECT 'src' || CAST(comp.v AS VARCHAR) || '.example.com' "
        "AS domain, "
        "'src' || CAST(comp.c AS VARCHAR) || '.example.com' "
        "AS component_id, cs.n AS component_size "
        "FROM comp JOIN cs ON cs.c = comp.c ORDER BY comp.v"
    )


def domain_clustering(sf_dir: str, method: str = "auto",
                      dist_edge_threshold: int | None = None):
    """Dispatching wrapper over :func:`clustering_from_edges`."""
    return clustering_from_edges(domain_link_graph(sf_dir), method=method,
                                 dist_edge_threshold=dist_edge_threshold)


def clustering_from_edges(edges, method: str = "auto",
                          dist_edge_threshold: int | None = None):
    """Per-node local clustering coefficient of the undirected simple
    domain graph — (domain, degree, n_triangles, clustering) with
    clustering = 2 * t / (deg * (deg - 1)), NULL for degree-1 nodes.
    The node-level refinement of :func:`domain_triangles`' global
    census (same graph, same exactness argument).

    Exactness: per-node triangle counts are diag(A^3) / 2 over the
    exact 0/1 adjacency in the vocabulary-bounded final task; the one
    float division mirrors the SQL CAST-then-divide.  Above
    ``dist_edge_threshold`` aggregate edges (method="auto") the
    min-degree-oriented per-node edge-iterator count of
    :func:`webgraph_dist.clustering_dist` runs instead (bit-equal),
    same switch as domain_triangles.
    """
    from .text import round_half_away

    edges, method = _dispatch_edges(edges, method, dist_edge_threshold)
    if method == "distributed":
        from .webgraph_dist import clustering_dist

        return clustering_dist(edges)

    def census(batch: pa.Table) -> pa.Table:
        s = batch["src_domain"].to_pylist()
        d = batch["dst_domain"].to_pylist()
        und = {(min(a, b), max(a, b)) for a, b in zip(s, d) if a != b}
        nodes = sorted({x for e in und for x in e})
        idx = {x: i for i, x in enumerate(nodes)}
        nn = len(nodes)
        a = np.zeros((nn, nn), dtype=np.int64)
        for u, v in und:
            a[idx[u], idx[v]] = 1
            a[idx[v], idx[u]] = 1
        tri = (np.diagonal(a @ a @ a) // 2).astype(np.int64)
        deg = a.sum(axis=1).astype(np.int64)
        clus = [None if int(dg) < 2 else
                float(round_half_away(np.float64(
                    float(2 * int(t)) / float(int(dg) * (int(dg) - 1)))))
                for t, dg in zip(tri, deg)]
        return pa.table({
            "domain": pa.array(nodes, type=pa.string()),
            "degree": pa.array(deg),
            "n_triangles": pa.array(tri),
            "clustering": pa.array(clus, type=pa.float64()),
        })

    return edges.repartition(1).map_batches(census, batch_format="pyarrow",
                                            batch_size=None)


def domain_clustering_sql(cte: str) -> str:
    """Oracle for :func:`domain_clustering` — ordered neighbor-pair
    self-join per node with the undirected membership check."""
    return f"""{cte}, {_EDGE_SQL},
und AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
        FROM e WHERE s <> d),
nb AS (SELECT u AS x, v AS y FROM und
       UNION ALL SELECT v, u FROM und),
deg AS (SELECT x, CAST(count(*) AS BIGINT) AS dg FROM nb GROUP BY 1),
tr AS (SELECT a.x, CAST(count(*) AS BIGINT) AS t
       FROM nb a JOIN nb b ON b.x = a.x AND b.y > a.y
       JOIN und c ON c.u = a.y AND c.v = b.y
       GROUP BY 1)
SELECT deg.x AS domain, deg.dg AS degree,
       coalesce(tr.t, 0) AS n_triangles,
       CASE WHEN deg.dg < 2 THEN NULL ELSE
         round(CAST(2 * coalesce(tr.t, 0) AS DOUBLE)
               / CAST(deg.dg * (deg.dg - 1) AS DOUBLE), 6) END
         AS clustering
FROM deg LEFT JOIN tr ON tr.x = deg.x ORDER BY 1"""


def domain_link_jaccard(sf_dir: str, k: int = 20, method: str = "auto",
                        dist_edge_threshold: int | None = None):
    """Dispatching wrapper over :func:`link_jaccard_from_edges`."""
    return link_jaccard_from_edges(
        domain_link_graph(sf_dir), k=k, method=method,
        dist_edge_threshold=dist_edge_threshold)


def link_jaccard_from_edges(edges, k: int = 20, method: str = "auto",
                            dist_edge_threshold: int | None = None):
    """Neighborhood-Jaccard similarity on the UNDIRECTED simple domain
    graph: for every domain pair with a shared neighbor, the Jaccard
    similarity of their neighbor sets, flagged by whether the pair is
    ALREADY linked — top ``k`` rows (d1, d2, n_common, n_union,
    jaccard, is_adjacent) by (jaccard DESC, d1, d2).  High-jaccard
    non-adjacent rows are the classic link-prediction candidates;
    high-jaccard adjacent rows are redundancy (the synthetic domain
    graph is near-complete, so the flag — not a non-adjacency filter —
    keeps the operator live on it).  Complements cocitation/coupling,
    which score the directed co-reference structure.

    Exactness: neighbor sets come from the exact distinct undirected
    edge set (self-loops dropped); intersection/union counts are exact
    integers (|union| = deg1 + deg2 - common) and jaccard is one
    mirrored float division; ordering compares identical doubles with
    the (d1, d2) tie-break.

    Scale shape: vocabulary-bounded final task; above
    ``dist_edge_threshold`` aggregate edges (method="auto") the
    bucketed common-neighbor join of
    :func:`webgraph_dist.link_jaccard_dist` runs instead (bit-equal
    values; P*k-bounded driver merge for the top-k).
    """
    from .text import round_half_away

    edges, method = _dispatch_edges(edges, method, dist_edge_threshold)
    if method == "distributed":
        from .webgraph_dist import link_jaccard_dist

        return link_jaccard_dist(edges, k=k)

    def predict(batch: pa.Table) -> pa.Table:
        s = batch["src_domain"].to_pylist()
        d = batch["dst_domain"].to_pylist()
        und = {(min(a, b), max(a, b)) for a, b in zip(s, d) if a != b}
        nodes = sorted({x for e_ in und for x in e_})
        nbr = {x: set() for x in nodes}
        for a, b in und:
            nbr[a].add(b)
            nbr[b].add(a)
        rows = []
        for i, a in enumerate(nodes):
            for b in nodes[i + 1:]:
                common = len(nbr[a] & nbr[b])
                if common < 1:
                    continue
                union = len(nbr[a]) + len(nbr[b]) - common
                rows.append((float(common) / float(union), a, b,
                             common, union, (a, b) in und))
        rows.sort(key=lambda r: (-r[0], r[1], r[2]))
        rows = rows[:k]
        return pa.table({
            "d1": pa.array([r[1] for r in rows], type=pa.string()),
            "d2": pa.array([r[2] for r in rows], type=pa.string()),
            "n_common": pa.array([r[3] for r in rows], type=pa.int64()),
            "n_union": pa.array([r[4] for r in rows], type=pa.int64()),
            "jaccard": pa.array(
                [float(round_half_away(np.float64(r[0]))) for r in rows],
                type=pa.float64()),
            "is_adjacent": pa.array([bool(r[5]) for r in rows],
                                    type=pa.bool_()),
        })

    return edges.repartition(1).map_batches(predict,
                                            batch_format="pyarrow",
                                            batch_size=None)


def domain_link_jaccard_sql(cte: str, k: int = 20) -> str:
    """Oracle: undirected distinct simple edges -> neighbor-set
    intersection counts on shared-neighbor pairs with the adjacency
    flag, identical float order."""
    return f"""{cte}, {_EDGE_SQL},
ed AS (SELECT DISTINCT s, d FROM e WHERE s <> d),
und AS (SELECT s AS a, d AS b FROM ed UNION SELECT d, s FROM ed),
deg AS (SELECT a, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
common AS (SELECT x.a AS d1, y.a AS d2,
                  CAST(count(*) AS BIGINT) AS n_common
           FROM und x JOIN und y ON x.b = y.b AND x.a < y.a
           GROUP BY 1, 2),
sc AS (SELECT c.d1, c.d2, c.n_common,
              da.deg + db.deg - c.n_common AS n_union,
              CAST(c.n_common AS DOUBLE)
              / CAST(da.deg + db.deg - c.n_common AS DOUBLE) AS j,
              EXISTS (SELECT 1 FROM und z
                      WHERE z.a = c.d1 AND z.b = c.d2) AS is_adjacent
       FROM common c JOIN deg da ON da.a = c.d1
                     JOIN deg db ON db.a = c.d2)
SELECT d1, d2, n_common, CAST(n_union AS BIGINT) AS n_union,
       round(j, 6) AS jaccard, is_adjacent
FROM sc
QUALIFY row_number() OVER (ORDER BY j DESC, d1, d2) <= {k}
ORDER BY j DESC, d1, d2"""


def rich_club(sf_dir: str, method: str = "auto",
              dist_edge_threshold: int | None = None):
    """Dispatching wrapper over :func:`rich_club_from_edges`."""
    return rich_club_from_edges(domain_link_graph(sf_dir), method=method,
                                dist_edge_threshold=dist_edge_threshold)


def rich_club_from_edges(edges, method: str = "auto",
                         dist_edge_threshold: int | None = None):
    """Rich-club coefficient profile of the UNDIRECTED simple domain
    graph: for every degree threshold k present, the edge density
    among nodes of degree > k — (k, n_nodes, n_edges, phi) with
    phi = 2*E_k / (N_k * (N_k - 1)).  A rising phi(k) means the hubs
    wire to each other (the "rich club" of reference webs); flat phi
    means hub links spread evenly.  Completes the degree-structure
    family (assortativity is its correlation summary; this is the
    curve).

    Exactness: degrees, subgraph node/edge counts and the single
    density division are exact integers per threshold; thresholds are
    the distinct degrees (rows bounded by max degree).  Self-loops
    drop, direction and weights collapse — the domain_triangles graph
    contract.

    Scale shape: vocabulary-bounded final task; above
    ``dist_edge_threshold`` aggregate edges (method="auto") both curves
    come from histogram suffix sums in
    :func:`webgraph_dist.rich_club_dist` (bit-equal; driver finish
    bounded by distinct degree values).
    """
    from .text import round_half_away

    edges, method = _dispatch_edges(edges, method, dist_edge_threshold)
    if method == "distributed":
        from .webgraph_dist import rich_club_dist

        return rich_club_dist(edges)

    def profile(batch: pa.Table) -> pa.Table:
        s = batch["src_domain"].to_pylist()
        d = batch["dst_domain"].to_pylist()
        und = {(min(a, b), max(a, b)) for a, b in zip(s, d) if a != b}
        deg = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        ks = sorted(set(deg.values()))
        rows = {"k": [], "n_nodes": [], "n_edges": [], "phi": []}
        for k in ks:
            club = {x for x, dg in deg.items() if dg > k}
            nk = len(club)
            ek = sum(1 for a, b in und if a in club and b in club)
            rows["k"].append(k)
            rows["n_nodes"].append(nk)
            rows["n_edges"].append(ek)
            rows["phi"].append(
                float(round_half_away(np.float64(
                    float(2 * ek) / float(nk * (nk - 1)))))
                if nk > 1 else None)
        return pa.table({
            "k": pa.array(rows["k"], type=pa.int64()),
            "n_nodes": pa.array(rows["n_nodes"], type=pa.int64()),
            "n_edges": pa.array(rows["n_edges"], type=pa.int64()),
            "phi": pa.array(rows["phi"], type=pa.float64()),
        })

    return edges.repartition(1).map_batches(profile,
                                            batch_format="pyarrow",
                                            batch_size=None)


def rich_club_sql(cte: str) -> str:
    """Oracle: distinct simple undirected edges -> degree table ->
    per-threshold subgraph node/edge counts, identical float division."""
    return f"""{cte}, {_EDGE_SQL},
ed AS (SELECT DISTINCT s, d FROM e WHERE s <> d),
und AS (SELECT least(s, d) AS a, greatest(s, d) AS b FROM ed
        GROUP BY 1, 2),
deg AS (SELECT x AS node, CAST(count(*) AS BIGINT) AS dg
        FROM (SELECT a AS x FROM und UNION ALL SELECT b FROM und)
        GROUP BY 1),
ks AS (SELECT DISTINCT dg AS k FROM deg),
nn AS (SELECT ks.k, CAST(count(deg.node) AS BIGINT) AS n_nodes
       FROM ks LEFT JOIN deg ON deg.dg > ks.k GROUP BY 1),
ue AS (SELECT und.a, da.dg AS dga, db.dg AS dgb
       FROM und JOIN deg da ON da.node = und.a
                JOIN deg db ON db.node = und.b),
ee AS (SELECT ks.k, CAST(count(ue.a) AS BIGINT) AS n_edges
       FROM ks LEFT JOIN ue ON ue.dga > ks.k AND ue.dgb > ks.k
       GROUP BY 1)
SELECT nn.k AS k, nn.n_nodes,
       coalesce(ee.n_edges, 0) AS n_edges,
       CASE WHEN nn.n_nodes <= 1 THEN NULL
            ELSE round(CAST(2 * coalesce(ee.n_edges, 0) AS DOUBLE)
                       / CAST(nn.n_nodes * (nn.n_nodes - 1) AS DOUBLE),
                       6) END AS phi
FROM nn LEFT JOIN ee USING (k) ORDER BY k"""
