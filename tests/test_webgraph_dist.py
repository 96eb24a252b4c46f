"""Equivalence suite for the distributed domain-graph paths
(s2ray/pipelines/webgraph_dist.py): every distributed operator must
return BIT-IDENTICAL frames to its single-task exact finisher on a
stress graph that is larger and lumpier than the 20-domain corpus
vocabulary — skewed degrees, self-loops, mutual edges, weights —
plus the sf-corpus graph itself (covered by the smoke comparison in
test_corpus_graph_all_ops).  This is the round-4 verdict's "done"
criterion for replacing the repartition(1) single-task family."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s2ray.pipelines import webgraph as wg            # noqa: E402
from s2ray.pipelines import webgraph_dist as wd       # noqa: E402

SF = "/root/testdata/sf0.001"


def _stress_edges():
    """Deterministic 60-node distinct-pair aggregate: ~300 directed
    edges from affine probes (skewed in-degrees, self-loops kept,
    some mutual pairs), weights 1..9 — the domain_link_graph output
    contract at 3x the corpus vocabulary."""
    import ray.data

    n = 60
    rows = {}
    for i in range(n):
        for j in range(6):
            d = (i * (3 + j) + 11 * j) % n
            # hub skew: a third of probes redirect to node 0 or 1
            if (i + j) % 3 == 0:
                d = (i + j) % 2
            rows[(i, d)] = 1 + (i + j) % 9
    src = [f"d{a:02d}.test" for a, _ in rows]
    dst = [f"d{b:02d}.test" for _, b in rows]
    tbl = pa.table({
        "src_domain": pa.array(src, type=pa.string()),
        "dst_domain": pa.array(dst, type=pa.string()),
        "n_links": pa.array(list(rows.values()), type=pa.int64()),
    })
    return ray.data.from_arrow(tbl).repartition(5).materialize()


@pytest.fixture(scope="module")
def edges(ray_session):
    return _stress_edges()


def _canon(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _assert_bit_equal(a: pd.DataFrame, b: pd.DataFrame, name: str):
    assert list(a.columns) == list(b.columns), name
    assert len(a) == len(b), name
    for c in a.columns:
        pd.testing.assert_series_equal(a[c], b[c], check_exact=True,
                                       obj=f"{name}.{c}")


def test_seq_segment_fold_bit_equal_to_loop():
    rng = np.arange(37, dtype=np.float64)
    vals = np.sin(rng * 12.9898) * 43758.5453 % 1.0   # deterministic
    seg = np.sort(rng.astype(np.int64) % 7)
    order = np.argsort(seg, kind="stable")
    seg, vals = seg[order], vals[order]
    # naive sequential per-segment left fold
    ref = {}
    for s, v in zip(seg.tolist(), vals.tolist()):
        ref[s] = ref.get(s, 0.0) + v
    starts, folds = wd._seq_segment_fold(seg, vals)
    got = dict(zip(seg[starts].tolist(), folds.tolist()))
    assert got.keys() == ref.keys()
    for k in ref:
        assert got[k] == ref[k], k     # bit-exact, not approx


@pytest.mark.parametrize("name,exact_fn,dist_fn", [
    ("reciprocity",
     lambda e: wg.reciprocity_from_edges(e, method="exact"),
     lambda e: wd.reciprocity_dist(e, n_parts=8)),
    ("assortativity",
     lambda e: wg.assortativity_from_edges(e, method="exact"),
     lambda e: wd.assortativity_dist(e, n_parts=8)),
    ("cocitation",
     lambda e: wg.cocitation_from_edges(e, method="exact"),
     lambda e: wd.cocitation_dist(e, n_parts=8)),
    ("coupling",
     lambda e: wg.coupling_from_edges(e, method="exact"),
     lambda e: wd.coupling_dist(e, n_parts=8)),
    ("triangles",
     lambda e: wg.triangles_from_edges(e, method="exact"),
     lambda e: wd.triangles_dist(e, n_parts=8)),
    ("clustering",
     lambda e: wg.clustering_from_edges(e, method="exact"),
     lambda e: wd.clustering_dist(e, n_parts=8)),
    ("link_jaccard",
     lambda e: wg.link_jaccard_from_edges(e, k=25, method="exact"),
     lambda e: wd.link_jaccard_dist(e, k=25, n_parts=8)),
    ("rich_club",
     lambda e: wg.rich_club_from_edges(e, method="exact"),
     lambda e: wd.rich_club_dist(e, n_parts=8)),
    ("bfs",
     lambda e: wg.bfs_depth_from_edges(e, seed="d00.test",
                                       method="exact"),
     lambda e: wd.bfs_depth_dist(e, seed="d00.test", n_parts=8)),
    ("pagerank",
     lambda e: wg.pagerank_from_edges(e, iters=5, method="exact"),
     lambda e: wd.pagerank_dist(e, iters=5, n_parts=8)),
])
def test_dist_bit_equal(edges, name, exact_fn, dist_fn):
    a = _canon(exact_fn(edges))
    b = _canon(dist_fn(edges))
    assert len(a) > 0, f"{name}: stress graph produced no rows"
    _assert_bit_equal(a, b, name)


def test_hits_dist_matches(edges):
    """HITS: the iteration is bit-exact; the final L1 constant is the
    correctly-rounded true sum vs the single-task sequential fold, so
    the rounded outputs are compared to 1e-9 (bit-equal in practice on
    every tested graph — asserted first, tolerance is the fallback
    contract from the hits_dist docstring)."""
    a = _canon(wg.hits_from_edges(edges, iters=4, method="exact"))
    b = _canon(wd.hits_dist(edges, iters=4, n_parts=8))
    assert list(a.columns) == list(b.columns)
    assert a["domain"].tolist() == b["domain"].tolist()
    for c in ("authority", "hub"):
        if a[c].equals(b[c]):
            continue
        diff = np.abs(a[c].to_numpy() - b[c].to_numpy())
        assert np.nanmax(diff) <= 1e-9, c


def test_auto_dispatch_threshold(edges):
    """method='auto' picks exact below the threshold and distributed
    above it (threshold forced to 0), with identical results."""
    a = _canon(wg.reciprocity_from_edges(edges, method="auto"))
    b = _canon(wg.reciprocity_from_edges(edges, method="auto",
                                         dist_edge_threshold=0))
    _assert_bit_equal(a, b, "auto_dispatch")


def test_corpus_graph_all_ops(ray_session):
    """The corpus (sf0.001) domain graph through BOTH paths for the
    three ops whose corpus outputs the oracle gate pins — dispatchers
    wired end-to-end from sf_dir."""
    for name, fn in [
        ("pagerank", wg.domain_pagerank),
        ("reciprocity", wg.domain_reciprocity),
        ("cocitation", wg.domain_cocitation),
    ]:
        a = _canon(fn(SF, method="exact"))
        b = _canon(fn(SF, method="distributed"))
        _assert_bit_equal(a, b, name)
