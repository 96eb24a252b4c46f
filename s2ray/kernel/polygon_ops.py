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
    """Edge-soup assembler (S2PolygonBuilder.php:44-360).

    Supports the reference's three Options presets:
      DIRECTED_XOR     (default) — directed edges, duplicate opposite pairs
                       cancel; used by the boolean ops' clipBoundary output.
      UNDIRECTED_XOR   — edge orientation unknown; shared boundary pairs
                       cancel (symmetric difference of sloppy loops).
      UNDIRECTED_UNION — orientation unknown, duplicates kept (seamless
                       union of polygons cut into pieces along shared
                       borders that are counted twice).
    Plus ``validate`` (reject self-crossing assembled loops into
    unused_edges, S2PolygonBuilder.php:478-489) and vertex merging within
    ``merge_radius`` (mergeVertices/moveVertices/PointIndex,
    S2PolygonBuilder.php:565-716).
    """

    def __init__(self, merge_radius: float = DEFAULT_INTERSECTION_TOLERANCE,
                 xor_edges: bool = True, undirected_edges: bool = False,
                 validate: bool = False):
        self.merge_radius = float(merge_radius)
        self.xor_edges = xor_edges
        self.undirected_edges = undirected_edges
        self.validate = validate
        self._points: dict[bytes, np.ndarray] = {}
        self._edges: dict[bytes, Counter] = {}

    # Options presets (S2PolygonBuilder.php:57-105)
    @classmethod
    def directed_xor(cls, merge_radius: float = 0.0, **kw) -> "PolygonBuilder":
        return cls(merge_radius=merge_radius, xor_edges=True,
                   undirected_edges=False, **kw)

    @classmethod
    def undirected_xor(cls, merge_radius: float = 0.0, **kw) -> "PolygonBuilder":
        return cls(merge_radius=merge_radius, xor_edges=True,
                   undirected_edges=True, **kw)

    @classmethod
    def undirected_union(cls, merge_radius: float = 0.0, **kw) -> "PolygonBuilder":
        return cls(merge_radius=merge_radius, xor_edges=False,
                   undirected_edges=True, **kw)

    def _key(self, v: np.ndarray) -> bytes:
        k = v.tobytes()
        if k not in self._points:
            self._points[k] = np.asarray(v, dtype=np.float64)
        return k

    # -- edge multiset ------------------------------------------------------

    def add_edge(self, v0: np.ndarray, v1: np.ndarray) -> None:
        """S2PolygonBuilder::addEdge (S2PolygonBuilder.php:198-229):
        degenerate edges ignored; with xor_edges an existing opposite edge
        cancels instead of inserting; undirected edges are stored in both
        directions."""
        k0, k1 = self._key(v0), self._key(v1)
        if k0 == k1:
            return
        if self.xor_edges and self._edges.get(k1, Counter()).get(k0, 0) > 0:
            self._erase_edge(k1, k0)
            return
        self._edges.setdefault(k0, Counter())[k1] += 1
        if self.undirected_edges:
            self._edges.setdefault(k1, Counter())[k0] += 1

    def add_loop(self, loop: Loop, sign: int | None = None) -> None:
        """All edges of the loop; holes (sign -1) contribute reversed edges
        so shells are CCW and holes CW (S2PolygonBuilder.php:231-247).
        Standalone default mirrors S2Loop::sign() for depth-0 loops: -1 only
        for inverted loops (area > 2pi)."""
        n = len(loop.vertices)
        if sign is None:
            sign = -1 if loop.area() > 2.0 * np.pi else 1
        for i in range(n, 0, -1):
            self.add_edge(loop.vertices[i % n],
                          loop.vertices[(i + sign) % n])

    def add_polygon(self, polygon: Polygon) -> None:
        """Shells and holes with opposite orientations, holes = odd nesting
        depth (S2PolygonBuilder.php:249-259)."""
        for i, lp in enumerate(polygon.loops):
            self.add_loop(lp, sign=-1 if polygon.loop_depth(i) % 2 else 1)

    def _erase_edge(self, k0: bytes, k1: bytes) -> None:
        c = self._edges[k0]
        c[k1] -= 1
        if c[k1] <= 0:
            del c[k1]
        if not c:
            del self._edges[k0]
        if self.undirected_edges:
            c = self._edges.get(k1)
            if c is not None and c.get(k0, 0) > 0:
                c[k0] -= 1
                if c[k0] <= 0:
                    del c[k0]
                if not c:
                    del self._edges[k1]

    def n_edges(self) -> int:
        return sum(sum(c.values()) for c in self._edges.values())

    # -- vertex merging ------------------------------------------------------

    def merge_vertices(self) -> None:
        """Collapse clusters of vertices within merge_radius (chord metric)
        to one representative and re-add affected edges (XOR applies on
        re-insertion) — S2PolygonBuilder mergeVertices/moveVertices.

        Clusters are the connected components of the <=merge_radius pair
        graph (same semantics as the reference's marked BFS).  Candidate
        pairs come from a brute O(V^2) scan for small V, or from the
        reference's PointIndex scheme for large V: bucket by the ancestor
        cell at the deepest level whose cells fully contain a 2r disc, so
        any pair within r shares a vertex-neighbor bucket
        (S2PolygonBuilder.php:643-716)."""
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
        n = len(keys)
        if n <= 512:
            for i in range(n):
                diff = pts[i + 1:] - pts[i]
                close = np.flatnonzero(
                    np.einsum("ij,ij->i", diff, diff) <= d2) + i + 1
                for j in close:
                    ri, rj = find(i), find(int(j))
                    if ri != rj:
                        parent[rj] = ri
        else:
            from . import cellid as cid
            level = min(sphere.MIN_WIDTH.get_max_level(2.0 * self.merge_radius),
                        cid.MAX_LEVEL - 1)
            leaf = cid.from_xyz(pts[:, 0], pts[:, 1], pts[:, 2])
            own = cid.parent(leaf, level)
            nbr_ids, counts = cid.get_vertex_neighbors(leaf, level)
            offs = np.concatenate([[0], np.cumsum(counts)])
            bucket: dict[int, list[int]] = {}
            for i, c in enumerate(own.tolist()):
                bucket.setdefault(c, []).append(i)
            for i in range(n):
                cand: list[int] = []
                for c in nbr_ids[offs[i]:offs[i + 1]].tolist():
                    cand.extend(bucket.get(c, ()))
                if not cand:
                    continue
                ca = np.asarray(cand, dtype=np.int64)
                ca = ca[ca > i]
                if not len(ca):
                    continue
                diff = pts[ca] - pts[i]
                close = ca[np.einsum("ij,ij->i", diff, diff) <= d2]
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
                    # undirected edges are stored in both directions; move
                    # only one copy of each (the reference's v0.lessThan(v1)
                    # guard, S2PolygonBuilder.php:530-535) — erase/add
                    # handle the sibling themselves
                    if self.undirected_edges and k0 > k1:
                        continue
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
                if self.validate and not self._cycle_is_simple(path):
                    # self-crossing loop => bad input: reject the whole
                    # cycle into unused (S2PolygonBuilder.php:478-489)
                    n = len(path)
                    for i in range(n):
                        unused.append((path[i - 1], path[i]))
                    self._erase_loop(path)
                    return None
                return [self._points[k] for k in path]
        return None

    def _cycle_is_simple(self, path_keys: list[bytes]) -> bool:
        """True iff the closed cycle has >= 3 vertices and no proper
        edge self-crossing (S2Loop::isValid subset used by the builder)."""
        if len(path_keys) < 3:
            return False
        from .edgeindex import self_intersections
        pts = np.stack([self._points[k] for k in path_keys])
        return len(self_intersections(pts, np.roll(pts, -1, axis=0))) == 0

    def _erase_loop(self, loop_keys: list[bytes]) -> None:
        # tolerant of already-erased edges: the undirected CW-retry path can
        # consume some of the cycle's edges as dead ends before giving up
        n = len(loop_keys)
        for i in range(n):
            k0, k1 = loop_keys[i], loop_keys[(i + 1) % n]
            if self._edges.get(k0, {}).get(k1, 0) > 0:
                self._erase_edge(k0, k1)

    def assemble_loops(self) -> tuple[list[Loop], list]:
        """(loops, unused_edges) — S2PolygonBuilder.php:264-326.  With
        undirected edges a clockwise accidental loop is re-assembled from
        its reverse starting edge until normalized (each retry is interior
        to the last, so it terminates)."""
        self.merge_vertices()
        unused: list = []
        loops: list[Loop] = []
        while self._edges:
            k0 = next(iter(self._edges))
            k1 = next(iter(self._edges[k0]))
            verts = self._assemble_loop(k0, k1, unused)
            if verts is None:
                continue
            if self.undirected_edges:
                while (len(verts) >= 3
                       and Loop(np.stack(verts)).area() > 2.0 * np.pi):
                    redo = self._assemble_loop(verts[1].tobytes(),
                                               verts[0].tobytes(), unused)
                    if redo is None:
                        # bad input: the reverse retry dead-ended.  Keep the
                        # normalized complement so the polygon's XOR parity
                        # still describes the intended (small) region.
                        verts = list(np.stack(verts)[::-1])
                        break
                    verts = redo
            keys = [v.tobytes() for v in verts]
            self._erase_loop(keys)
            if len(verts) >= 3:
                loops.append(Loop(np.stack(verts)))
        return loops, unused

    def assemble_polygon(self) -> tuple[Polygon | None, list]:
        """(polygon-or-None, unused_edges); directed loops are normalized
        (undirected assembly already yields CCW loops) and fed to the
        XOR-parity Polygon; with ``validate`` an invalid loop set is
        rejected into unused_edges (S2PolygonBuilder.php:327-390)."""
        loops, unused = self.assemble_loops()
        if not loops:
            return None, unused
        # normalize unconditionally: undirected assembly yields CCW loops
        # already (normalized() is then a no-op), and any loop that slipped
        # through inverted must not flip the XOR parity to the complement
        poly = Polygon(loops, normalize=True)
        if self.validate and not poly.is_valid():
            for lp in loops:
                n = len(lp.vertices)
                for i in range(n):
                    unused.append((lp.vertices[i - 1].tobytes(),
                                   lp.vertices[i].tobytes()))
            return None, unused
        return poly, unused


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
