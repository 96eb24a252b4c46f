"""Cell-keyed inverted edge index (reference S2EdgeIndex semantics).

The reference file is a corrupted half-translation (S2EdgeIndex.php:102-143);
semantics re-implemented from its embedded Java fragments:

- computeIndex: per-edge one-level covering -> parallel (cell, edge) arrays
  sorted by cell (S2EdgeIndex.php:85-147)
- getCovering(a, b): containing-cell fast path (:344-349), else the 4 vertex
  neighbors of the edge midpoint at the MIN_WIDTH level of the edge length
  (:366-374); whole-face fallback for huge edges (:351-361)
- containingCell: smallest common ancestor, sentinel across faces (:252-291)
- findCandidateCrossings: query covering -> ancestor point-lookups +
  descendant range scans over the sorted arrays (:225-244, 430-544)
- predictAdditionalCalls cost model: brute force below ~100 edges
  (:161-204: 30ns crossing vs 1200ns insert + ~3ms lookup)

Vectorized storage: numpy uint64 cell keys + int32 edge ids, queried with
searchsorted — the same candidate-generation pattern the distributed
cell-range join uses (SURVEY.md par.2.6).
"""

from __future__ import annotations

import numpy as np

from . import cellid as ci
from . import edges as eg
from . import sphere

_U = np.uint64

# cost-model constants (reference S2EdgeIndex.php:161-204)
BRUTE_FORCE_MAX_EDGES = 100


def containing_cell2(id1: np.uint64, id2: np.uint64):
    """Smallest cell containing both leaf cells; None across faces."""
    if (id1 >> _U(61)) != (id2 >> _U(61)):
        return None
    x = np.uint64(id1) ^ np.uint64(id2)
    if x == 0:
        return np.uint64(id1)
    # highest differing bit -> common prefix length in 2-bit steps below bit 61
    hb = 63 - int(x).bit_length() + 1  # leading zeros
    prefix_bits = hb - 3  # bits below the face field that agree
    level = min(ci.MAX_LEVEL, prefix_bits // 2)
    return ci.parent(np.array([id1], dtype=np.uint64), level)[0]


class EdgeIndex:
    """Index of M directed edges (a[i] -> b[i]) for crossing-candidate
    queries."""

    def __init__(self, a: np.ndarray, b: np.ndarray):
        self.a = np.asarray(a, dtype=np.float64)
        self.b = np.asarray(b, dtype=np.float64)
        self.num_edges = len(self.a)
        self.use_brute_force = self.num_edges < BRUTE_FORCE_MAX_EDGES
        cells = []
        eids = []
        for i in range(self.num_edges):
            for c in self.edge_covering(self.a[i], self.b[i]):
                cells.append(c)
                eids.append(i)
        cells = np.array(cells, dtype=np.uint64)
        eids = np.array(eids, dtype=np.int32)
        order = np.argsort(cells, kind="stable")
        self.cells = cells[order]
        self.edge_ids = eids[order]
        self.cell_range_min = ci.range_min(self.cells)
        self.cell_range_max = ci.range_max(self.cells)

    @staticmethod
    def edge_covering(a: np.ndarray, b: np.ndarray) -> list:
        """One-level covering of edge AB (S2EdgeIndex::getCovering)."""
        edge_len = float(sphere.angle_between(a, b))
        ideal_level = sphere.MIN_WIDTH.get_max_level(edge_len)
        leaf_a = np.uint64(ci.from_xyz(*[np.array([v]) for v in a])[0])
        leaf_b = np.uint64(ci.from_xyz(*[np.array([v]) for v in b])[0])
        # containing-cell fast path
        cc = containing_cell2(leaf_a, leaf_b)
        if cc is not None:
            cc_level = int(ci.level(np.array([cc]))[0])
            if cc_level >= ideal_level - 2:
                return [cc]
        if ideal_level == 0:
            # huge edge: whole-sphere fallback (6 face cells)
            return [np.uint64((f << 61) | (1 << 60)) for f in range(6)]
        # 4 vertex neighbors of the midpoint at the ideal level, clamped
        # to MAX_LEVEL-1 (reference actualLevel): get_vertex_neighbors
        # requires a level strictly coarser than the leaf level, and an
        # unclamped 30 would shift by -1 (numpy yields 0) and collapse the
        # covering to a single midpoint leaf missing the endpoints
        actual_level = min(ideal_level, ci.MAX_LEVEL - 1)
        mid = sphere.normalize(a + b)
        leaf_mid = ci.from_xyz(*[np.array([v]) for v in mid])
        ids, _counts = ci.get_vertex_neighbors(leaf_mid, actual_level)
        return list(ids)

    def candidate_edges(self, qa: np.ndarray, qb: np.ndarray) -> np.ndarray:
        """Edge ids that may cross edge (qa, qb) — superset guarantee.

        Ancestor lookups + descendant range scans of the query covering
        (S2EdgeIndex::findCandidateCrossings semantics).
        """
        if self.use_brute_force or len(self.cells) == 0:
            return np.arange(self.num_edges, dtype=np.int32)
        cover = self.edge_covering(qa, qb)
        out = []
        for c in cover:
            c = np.uint64(c)
            # descendants (and self) of c in the index: ids in [rmin, rmax]
            rmin = ci.range_min(np.array([c]))[0]
            rmax = ci.range_max(np.array([c]))[0]
            lo = np.searchsorted(self.cells, rmin, side="left")
            hi = np.searchsorted(self.cells, rmax, side="right")
            if hi > lo:
                out.append(self.edge_ids[lo:hi])
            # ancestors of c: point lookups per level
            lvl = int(ci.level(np.array([c]))[0])
            for anc_level in range(0, lvl):
                anc = ci.parent(np.array([c]), anc_level)[0]
                lo = np.searchsorted(self.cells, anc, side="left")
                hi = np.searchsorted(self.cells, anc, side="right")
                if hi > lo:
                    out.append(self.edge_ids[lo:hi])
        if not out:
            return np.empty(0, dtype=np.int32)
        return np.unique(np.concatenate(out))

    def crossing_edges(self, qa: np.ndarray, qb: np.ndarray) -> np.ndarray:
        """Edge ids with robustCrossing > 0 against (qa, qb)."""
        cand = self.candidate_edges(qa, qb)
        if len(cand) == 0:
            return cand
        from .pip import _crossings_edge_vs_edges

        cr = _crossings_edge_vs_edges(qa, qb, self.a[cand], self.b[cand])
        return cand[cr > 0]


def self_intersections(a: np.ndarray, b: np.ndarray) -> list[tuple[int, int]]:
    """All pairs (i, j), i<j, of edges that properly cross — the core of
    S2Polygon::isValid pairwise-crossing checks (S2Polygon.php:161-197).
    Uses the index when the cost model says so."""
    index = EdgeIndex(a, b)
    pairs = []
    for i in range(len(a)):
        hits = index.crossing_edges(a[i], b[i])
        for j in hits:
            if j > i:
                pairs.append((i, int(j)))
    return pairs
