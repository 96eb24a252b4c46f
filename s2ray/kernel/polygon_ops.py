"""Exact polygon boolean operations: intersection / union / difference,
plus the S2PolygonBuilder edge-soup assembler they need.

Implements the reference's dead spec (the PHP file ships these only as
commented-out Java):
- clipEdge / addIntersection      /root/reference/src/S2Polygon.php:530-588
- clipBoundary                    /root/reference/src/S2Polygon.php:590-640
- initToIntersection / initToUnion  S2Polygon.php:646-710
- S2PolygonBuilder (DIRECTED_XOR: addEdge, mergeVertices, assembleLoop
  taking leftmost turns, assembleLoops, assemblePolygon)
                                  /root/reference/src/S2PolygonBuilder.php:44-360
Difference is not present even as comments in the reference; it follows the
same upstream construction: boundary of A clipped to the exterior of B plus
the REVERSED boundary of B clipped to the interior of A.

Scale note: boolean ops run on driver-side query geometry (dozens-to-
thousands of vertices), never per row — the per-row operators consume the
RESULT polygon via the broadcast-join machinery.  Vertex merge is therefore
the simple O(V^2) union-find; the edge-crossing scans are vectorized
one-edge-vs-all (pip._crossings_edge_vs_edges).
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from . import edges as edgeutil
from . import sphere
from .pip import Loop, Polygon, _crossings_edge_vs_edges

# reference: S2EdgeUtil.php:23
DEFAULT_INTERSECTION_TOLERANCE = 1.5e-15


class PolygonBuilder:
    """Directed-XOR edge-soup assembler (S2PolygonBuilder.php:44-360)."""

    def __init__(self, merge_radius: float = DEFAULT_INTERSECTION_TOLERANCE,
                 xor_edges: bool = True):
        self.merge_radius = float(merge_radius)
        self.xor_edges = xor_edges
        self._points: dict[bytes, np.ndarray] = {}
        self._edges: dict[bytes, Counter] = {}

    def _key(self, v: np.ndarray) -> bytes:
        k = v.tobytes()
        if k not in self._points:
            self._points[k] = np.asarray(v, dtype=np.float64)
        return k

    # -- edge multiset ------------------------------------------------------

    def add_edge(self, v0: np.ndarray, v1: np.ndarray) -> None:
        """S2PolygonBuilder::addEdge (S2PolygonBuilder.php:198-229):
        degenerate edges ignored; with xor_edges an existing opposite edge
        cancels instead of inserting."""
        k0, k1 = self._key(v0), self._key(v1)
        if k0 == k1:
            return
        if self.xor_edges and self._edges.get(k1, Counter()).get(k0, 0) > 0:
            self._erase_edge(k1, k0)
            return
        self._edges.setdefault(k0, Counter())[k1] += 1

    def _erase_edge(self, k0: bytes, k1: bytes) -> None:
        c = self._edges[k0]
        c[k1] -= 1
        if c[k1] <= 0:
            del c[k1]
        if not c:
            del self._edges[k0]

    def n_edges(self) -> int:
        return sum(sum(c.values()) for c in self._edges.values())

    # -- vertex merging ------------------------------------------------------

    def merge_vertices(self) -> None:
        """Collapse clusters of vertices within merge_radius (chord metric)
        to one representative and re-add affected edges (XOR applies on
        re-insertion) — S2PolygonBuilder mergeVertices/moveVertices."""
        keys = [k for k in self._points
                if k in self._edges or any(k in c for c in self._edges.values())]
        if not keys:
            return
        pts = np.stack([self._points[k] for k in keys])
        # chord length bound for an angle of merge_radius
        chord = 2.0 * np.sin(0.5 * self.merge_radius)
        parent = list(range(len(keys)))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        d2 = chord * chord
        for i in range(len(keys)):
            diff = pts[i + 1:] - pts[i]
            close = np.flatnonzero(
                np.einsum("ij,ij->i", diff, diff) <= d2) + i + 1
            for j in close:
                ri, rj = find(i), find(int(j))
                if ri != rj:
                    parent[rj] = ri
        merge_map: dict[bytes, bytes] = {}
        for i, k in enumerate(keys):
            r = find(i)
            if r != i:
                merge_map[k] = keys[r]
        if not merge_map:
            return
        moved = []
        for k0, c in list(self._edges.items()):
            for k1, cnt in list(c.items()):
                if k0 in merge_map or k1 in merge_map:
                    moved.extend([(k0, k1)] * cnt)
        for k0, k1 in moved:
            self._erase_edge(k0, k1)
        for k0, k1 in moved:
            self.add_edge(self._points[merge_map.get(k0, k0)],
                          self._points[merge_map.get(k1, k1)])

    # -- loop assembly -------------------------------------------------------

    def _assemble_loop(self, k0: bytes, k1: bytes, unused: list):
        """Take leftmost turns; stop at the first repeated vertex
        (S2PolygonBuilder::assembleLoop, S2PolygonBuilder.php:425-500)."""
        path = [k0, k1]
        index = {k1: 1}
        while len(path) >= 2:
            k0, k1 = path[-2], path[-1]
            v0, v1 = self._points[k0], self._points[k1]
            k2 = None
            for cand in self._edges.get(k1, ()):  # leftmost outgoing edge
                if cand == k0:
                    continue
                if k2 is None or sphere.ordered_ccw(
                        v0, self._points[k2], self._points[cand], v1):
                    k2 = cand
            if k2 is None:
                unused.append((k0, k1))
                self._erase_edge(k0, k1)
                index.pop(k1, None)
                path.pop()
            elif k2 not in index:
                index[k2] = len(path)
                path.append(k2)
            else:
                path = path[index[k2]:]
                return [self._points[k] for k in path]
        return None

    def _erase_loop(self, loop_keys: list[bytes]) -> None:
        n = len(loop_keys)
        for i in range(n):
            self._erase_edge(loop_keys[i], loop_keys[(i + 1) % n])

    def assemble_loops(self) -> tuple[list[Loop], list]:
        """(loops, unused_edges) — S2PolygonBuilder.php:264-326."""
        self.merge_vertices()
        unused: list = []
        loops: list[Loop] = []
        while self._edges:
            k0 = next(iter(self._edges))
            k1 = next(iter(self._edges[k0]))
            verts = self._assemble_loop(k0, k1, unused)
            if verts is None:
                continue
            keys = [v.tobytes() for v in verts]
            self._erase_loop(keys)
            if len(verts) >= 3:
                loops.append(Loop(np.stack(verts)))
        return loops, unused

    def assemble_polygon(self) -> tuple[Polygon | None, list]:
        """(polygon-or-None, unused_edges); loops are normalized and fed to
        the XOR-parity Polygon (S2PolygonBuilder.php:327-357)."""
        loops, unused = self.assemble_loops()
        if not loops:
            return None, unused
        return Polygon(loops, normalize=True), unused


# ---------------------------------------------------------------------------
# boundary clipping (S2Polygon.php:530-640 dead spec)

def _directed_loops(p: Polygon, reverse: bool):
    """Each loop's vertex ring in directed-boundary order: shells CCW,
    holes CW (stored loops are normalized CCW-small; odd nesting depth =
    hole), optionally reversed."""
    for i, lp in enumerate(p.loops):
        hole = p.loop_depth(i) % 2 == 1
        verts = lp.vertices
        if hole ^ reverse:
            verts = verts[::-1]
        yield verts


def _clip_edge(a0, a1, b_a, b_b, add_shared_edges: bool) -> list:
    """Intersection parameters of edge (a0,a1) with the directed edge set
    (b_a[i], b_b[i]) — spec 'clipEdge'/'addIntersection'
    (S2Polygon.php:530-588).  Vectorized candidate scan; exact refinement
    per crossing edge."""
    out = []
    cr = _crossings_edge_vs_edges(a0, a1, b_a, b_b)
    for j in np.flatnonzero(cr >= 0):
        b0, b1 = b_a[j], b_b[j]
        if cr[j] > 0:
            x = edgeutil.get_intersection(a0, a1, b0, b1)
            t = edgeutil.get_distance_fraction(x, a0, a1)
            out.append((float(t), x))
        elif edgeutil.vertex_crossing(a0, a1, b0, b1):
            t = 0.0 if (np.array_equal(a0, b0) or np.array_equal(a0, b1)) \
                else 1.0
            if not add_shared_edges and np.array_equal(a1, b1):
                t = 1.0
            out.append((t, a0 if t == 0.0 else a1))
    return out


def clip_boundary(a: Polygon, reverse_a: bool, b: Polygon, reverse_b: bool,
                  invert_b: bool, add_shared_edges: bool,
                  builder: PolygonBuilder) -> None:
    """Clip A's directed boundary to the interior (or exterior when
    invert_b) of B and add the surviving pieces to ``builder`` —
    spec 'clipBoundary' (S2Polygon.php:590-640)."""
    b_a = np.concatenate([v for v in _directed_loops(b, reverse_b)])
    b_b = np.concatenate([np.roll(v, -1, axis=0)
                          for v in _directed_loops(b, reverse_b)])
    for verts in _directed_loops(a, reverse_a):
        n = len(verts)
        inside = bool(b.contains_point(verts[0])) ^ invert_b
        for j in range(n):
            a0 = verts[j]
            a1 = verts[(j + 1) % n]
            inters = _clip_edge(a0, a1, b_a, b_b, add_shared_edges)
            if inside:
                inters.append((0.0, a0))
            inside = (len(inters) & 1) == 1
            if inside:
                inters.append((1.0, a1))
            # sort by (t, point) = ParametrizedS2Point ordering; emit pairs
            inters.sort(key=lambda tp: (tp[0], tuple(tp[1])))
            for i in range(1, len(inters), 2):
                builder.add_edge(inters[i - 1][1], inters[i][1])


# ---------------------------------------------------------------------------
# public ops (spec S2Polygon.php:646-710; result None == empty region)

def polygon_intersection(a: Polygon, b: Polygon,
                         merge_radius: float = DEFAULT_INTERSECTION_TOLERANCE):
    """A n B: boundary of A clipped to the interior of B + boundary of B
    clipped to the interior of A + one copy of shared directed edges."""
    if not a.bound.intersects_rect(b.bound):
        return None
    builder = PolygonBuilder(merge_radius)
    clip_boundary(a, False, b, False, False, True, builder)
    clip_boundary(b, False, a, False, False, False, builder)
    return builder.assemble_polygon()[0]


def polygon_union(a: Polygon, b: Polygon,
                  merge_radius: float = DEFAULT_INTERSECTION_TOLERANCE):
    """A u B: each boundary clipped to the other's exterior."""
    builder = PolygonBuilder(merge_radius)
    clip_boundary(a, False, b, False, True, True, builder)
    clip_boundary(b, False, a, False, True, False, builder)
    return builder.assemble_polygon()[0]


def polygon_difference(a: Polygon, b: Polygon,
                       merge_radius: float = DEFAULT_INTERSECTION_TOLERANCE):
    """A \\ B = A n ~B: boundary of A clipped to the exterior of B + the
    REVERSED boundary of B clipped to the interior of A (upstream
    construction; absent from the reference even as comments)."""
    if not a.bound.intersects_rect(b.bound):
        return a
    builder = PolygonBuilder(merge_radius)
    clip_boundary(a, False, b, True, True, True, builder)
    clip_boundary(b, True, a, False, False, False, builder)
    return builder.assemble_polygon()[0]


def destructive_union(polygons: list[Polygon],
                      merge_radius: float = DEFAULT_INTERSECTION_TOLERANCE):
    """Union of many polygons, smallest-first pairwise (spec
    'destructiveUnion', S2Polygon.php:712-780)."""
    import heapq

    heap = [(p.get_num_vertices() if hasattr(p, "get_num_vertices")
             else sum(len(lp.vertices) for lp in p.loops), i, p)
            for i, p in enumerate(polygons)]
    heapq.heapify(heap)
    counter = len(heap)
    while len(heap) > 1:
        na, _, pa = heapq.heappop(heap)
        nb, _, pb = heapq.heappop(heap)
        u = polygon_union(pa, pb, merge_radius)
        if u is None:
            continue
        heapq.heappush(heap, (na + nb, counter, u))
        counter += 1
    return heap[0][2] if heap else None
