"""Loops, polygons and vectorized point-in-polygon (crossing parity).

The reference's S2Loop/S2Polygon are empty shells whose semantics live in
the in-file commented Java spec; this module implements that *intended*
behavior (SURVEY.md meta-finding):

- point containment = parity of edgeOrVertexCrossing from S2::origin()
  to the point over all loop edges, bootstrapped by originInside
  (spec S2Loop.php:601-631, 794-817)
- loop bound = RectBounder + pole-containment fixups (spec S2Loop.php:819-845)
- polygon containment = XOR of loop containments (spec S2Polygon.php:330-335)

Vectorization: the parity scan iterates over loop edges (M) and vectorizes
over probe points (N) — one robust-crossing pass per edge, numpy all the way.
"""

from __future__ import annotations

import math

import numpy as np

from . import edges, sphere
from .interval import R1Interval, S1Interval
from .region import Cap, Cell, LatLngRect


class Loop:
    """Single closed loop; CCW order = interior on the left.

    vertices: (M, 3) float64 unit vectors.
    """

    def __init__(self, vertices: np.ndarray):
        v = np.asarray(vertices, dtype=np.float64)
        if v.shape[0] < 3:
            raise ValueError("loop needs >= 3 vertices")
        self.vertices = v
        self._edges_a = v
        self._edges_b = np.roll(v, -1, axis=0)
        self._edge_index = None
        self.origin_inside = self._init_origin()
        self.bound = self._init_bound()

    @staticmethod
    def from_latlng_degrees(latlng_pairs) -> "Loop":
        arr = np.asarray(latlng_pairs, dtype=np.float64)
        x, y, z = sphere.latlng_to_xyz(
            sphere.degrees_to_radians(arr[:, 0]),
            sphere.degrees_to_radians(arr[:, 1]))
        return Loop(np.stack([x, y, z], axis=1))

    # -- init (spec S2Loop.php:794-845) ------------------------------------

    def _init_origin(self) -> bool:
        v0, v1, v2 = self.vertices[0], self.vertices[1], self.vertices[2]
        v1_inside = bool(sphere.ordered_ccw(sphere.ortho(v1), v0, v2, v1))
        self.origin_inside = False  # temporary for the bootstrap call
        contains_v1 = self._contains_point_scalar(v1)
        return v1_inside != contains_v1

    def _init_bound(self) -> LatLngRect:
        rb = edges.RectBounder()
        for k in range(len(self.vertices)):
            rb.add_point(self.vertices[k])
        rb.add_point(self.vertices[0])
        b = rb.get_bound()
        if self._contains_point_scalar(np.array([0.0, 0.0, 1.0])):
            b = LatLngRect(R1Interval(b.lat.lo, math.pi / 2), S1Interval.full())
        if b.lng.is_full() and self._contains_point_scalar(
                np.array([0.0, 0.0, -1.0])):
            b = LatLngRect(R1Interval(-math.pi / 2, b.lat.hi), b.lng)
        return b

    # -- containment -------------------------------------------------------

    def _parity_scan(self, pts: np.ndarray) -> np.ndarray:
        """Vectorized crossing-parity core over (N,3) points (no bound
        prefilter; spec S2Loop.php:601-631 incl. vertex-crossing rule).

        Two vectorization orientations with automatic selection:
        many points -> loop edges, vectorize over points;
        few points vs many edges -> per point, vectorize over edges
        (otherwise cell-predicate calls against a 1000-edge loop pay a
        Python-loop per edge for a 4-point batch).
        """
        pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))
        o = edges.origin()
        n_edges = len(self.vertices)
        if len(pts) * 8 < n_edges:
            out = np.empty(len(pts), dtype=bool)
            for t in range(len(pts)):
                cr = _crossings_edge_vs_edges(o, pts[t],
                                              self._edges_a, self._edges_b)
                inside = bool(self.origin_inside) ^ bool((cr > 0).sum() & 1)
                for j in np.nonzero(cr == 0)[0]:
                    inside ^= edges.vertex_crossing(
                        o, pts[t], self._edges_a[j], self._edges_b[j])
                out[t] = inside
            return out
        inside = np.full(len(pts), self.origin_inside, dtype=bool)
        for k in range(n_edges):
            cr = edges.robust_crossing_one_to_many(
                self._edges_a[k], self._edges_b[k], o, pts)
            inside ^= cr > 0
            shared = cr == 0
            if shared.any():
                for t in np.nonzero(shared)[0]:
                    inside[t] ^= edges.vertex_crossing(
                        o, pts[t], self._edges_a[k], self._edges_b[k])
        return inside

    def _contains_point_scalar(self, p: np.ndarray) -> bool:
        return bool(self._parity_scan(np.asarray(p)[None, :])[0])

    def contains_point(self, p: np.ndarray) -> bool:
        if not self.bound.contains_point(p):
            return False
        return self._contains_point_scalar(p)

    def contains_points_xyz(self, pts: np.ndarray) -> np.ndarray:
        """Vectorized parity over (N,3) points (bound prefilter + per-edge
        robust-crossing sweep; shared-vertex rows fall back to scalar)."""
        pts = np.asarray(pts, dtype=np.float64)
        n = len(pts)
        lat, lng = sphere.xyz_to_latlng(pts[:, 0], pts[:, 1], pts[:, 2])
        cand = self.bound.contains_points(lat, lng)
        out = np.zeros(n, dtype=bool)
        if not cand.any():
            return out
        idx = np.nonzero(cand)[0]
        out[idx] = self._parity_scan(pts[idx])
        return out

    def contains_latlng_degrees(self, lat_deg, lng_deg) -> np.ndarray:
        x, y, z = sphere.latlng_to_xyz(
            sphere.degrees_to_radians(lat_deg), sphere.degrees_to_radians(lng_deg))
        return self.contains_points_xyz(np.stack(
            [np.atleast_1d(x), np.atleast_1d(y), np.atleast_1d(z)], axis=1))

    # -- edge crossing against a cell --------------------------------------

    @property
    def edge_index(self):
        """Lazy cell-keyed edge index; built only when the reference cost
        model favours it (>= ~100 edges, S2EdgeIndex.php:161-204)."""
        if self._edge_index is None:
            from .edgeindex import EdgeIndex

            self._edge_index = EdgeIndex(self._edges_a, self._edges_b)
        return self._edge_index

    def _crosses_cell_boundary(self, cell: Cell) -> bool:
        verts = [cell.get_vertex(k) for k in range(4)]
        use_index = len(self.vertices) >= 100
        for k in range(4):
            a, b = verts[k], verts[(k + 1) & 3]
            if use_index:
                if len(self.edge_index.crossing_edges(a, b)):
                    return True
                continue
            cr = _crossings_edge_vs_edges(a, b, self._edges_a, self._edges_b)
            if np.any(cr > 0):
                return True
        return False

    def _any_vertex_in_cell(self, cell: Cell) -> bool:
        return bool(cell.contains_points_vec(self.vertices).any())

    # -- region protocol ---------------------------------------------------

    def get_rect_bound(self) -> LatLngRect:
        return self.bound

    def get_cap_bound(self) -> Cap:
        return self.bound.get_cap_bound()

    def _cell_vertices_inside(self, cell: Cell) -> np.ndarray:
        verts = np.array([cell.get_vertex(k) for k in range(4)])
        return self.contains_points_xyz(verts)

    def may_intersect_cell(self, cell: Cell) -> bool:
        if not self.bound.intersects_rect(cell.get_rect_bound()):
            return False
        if self._cell_vertices_inside(cell).any():
            return True
        if self._any_vertex_in_cell(cell):
            return True
        return self._crosses_cell_boundary(cell)

    def contains_cell(self, cell: Cell) -> bool:
        if not self.bound.contains_rect(cell.get_rect_bound()):
            if not self.bound.intersects_rect(cell.get_rect_bound()):
                return False
        if not self._cell_vertices_inside(cell).all():
            return False
        if self._crosses_cell_boundary(cell):
            return False
        # An inverted loop (area > 2pi) can have all cell vertices inside and
        # no boundary crossing while its ring — the hole — sits wholly inside
        # the cell; a boundary vertex inside the cell detects that case
        # (reference S2Loop::contains(S2Cell) via full containment check).
        if self._any_vertex_in_cell(cell):
            return False
        return True

    # -- loop-pair relations (spec S2Loop.php:365-522, 880-912) -------------

    def _find_vertex(self, p: np.ndarray) -> int:
        hits = np.nonzero((self.vertices == p).all(axis=1))[0]
        return int(hits[0]) if len(hits) else -1

    def _check_edge_crossings(self, other: "Loop", wedge_fn) -> int:
        """-1 if any edges properly cross; else min of wedge_fn over shared
        vertices (1 if none).  Spec: S2Loop::checkEdgeCrossings
        (S2Loop.php:880-912)."""
        result = 1
        na = len(self.vertices)
        nb = len(other.vertices)
        for i in range(na):
            a0 = self._edges_a[i]
            a1 = self._edges_b[i]
            cr = _crossings_edge_vs_edges(a0, a1, other._edges_a, other._edges_b)
            if np.any(cr > 0):
                return -1
            for j in np.nonzero(cr == 0)[0]:
                b0 = other._edges_a[j]
                b1 = other._edges_b[j]
                # shared vertex must be a1 == b0-side midpoint ab1 with
                # neighbours a0 -> ab1 -> a2 and b0 -> ab1 -> b2
                if np.array_equal(a1, b1):
                    a2 = self._edges_b[(i + 1) % na]
                    b2 = other._edges_b[(j + 1) % nb]
                    result = min(result, wedge_fn(a0, a1, a2, b0, b2))
        return result

    def contains_loop(self, b: "Loop") -> bool:
        """A contains B (spec S2Loop::contains(S2Loop), S2Loop.php:365-417)."""
        if not self.bound.contains_rect(b.bound):
            return False
        if not self.contains_point(b.vertices[0]) and \
                self._find_vertex(b.vertices[0]) < 0:
            return False
        return self._check_edge_crossings(b, edges.wedge_contains) > 0

    def intersects_loop(self, b: "Loop") -> bool:
        """A intersects B (spec S2Loop::intersects, S2Loop.php:419-470)."""
        if not self.bound.intersects_rect(b.bound):
            return False
        if len(b.vertices) < len(self.vertices):
            return b.intersects_loop(self)
        if self.contains_point(b.vertices[0]) and \
                self._find_vertex(b.vertices[0]) < 0:
            return True
        if self._check_edge_crossings(b, edges.wedge_intersects) < 0:
            return True
        if b.bound.contains_rect(self.bound):
            if b.contains_point(self.vertices[0]) and \
                    b._find_vertex(self.vertices[0]) < 0:
                return True
        return False

    def contains_nested(self, b: "Loop") -> bool:
        """Containment for non-crossing loops (spec S2Loop.php:472-492)."""
        m = self._find_vertex(b.vertices[1])
        if m < 0:
            return self.contains_point(b.vertices[1])
        return edges.wedge_contains(
            self.vertices[m - 1], self.vertices[m],
            self.vertices[(m + 1) % len(self.vertices)],
            b.vertices[0], b.vertices[2 % len(b.vertices)]) > 0

    def contains_or_crosses(self, b: "Loop") -> int:
        """+1 contains, 0 disjoint-or-contained-by, -1 boundaries cross
        (spec S2Loop.php:494-522)."""
        if not self.bound.intersects_rect(b.bound):
            return 0
        result = self._check_edge_crossings(b, edges.wedge_contains_or_crosses)
        if result <= 0:
            return result
        if not self.bound.contains_rect(b.bound):
            return 0
        if not self.contains_point(b.vertices[0]) and \
                self._find_vertex(b.vertices[0]) < 0:
            return 0
        return 1

    def invert(self) -> "Loop":
        """The complement loop (reversed vertex order)."""
        return Loop(self.vertices[::-1].copy())

    def normalized(self) -> "Loop":
        """This loop, or its complement, whichever has area <= 2pi."""
        if self.area() > 2 * math.pi:
            return self.invert()
        return self

    # -- measures (spec S2Loop.php:258-319) --------------------------------

    def area(self) -> float:
        """Signed area sum around vertex(0) mapped to [0, 4pi)."""
        return self.get_area_centroid()[0]

    def get_area_centroid(self):
        """(area, area-weighted true centroid vector) — spec
        S2Loop::getAreaCentroid (S2Loop.php:258-319): signed triangle fan
        around vertex(0) with true-centroid accumulation."""
        # Origin slightly displaced from vertex(0) so fan triangles stay
        # numerically stable when the loop holds antipodal vertex pairs
        # (reference lines 281-287).
        origin_v = np.array(self.vertices[0], dtype=np.float64)
        axis = (int(np.argmax(np.abs(origin_v))) + 1) % 3
        origin_v[axis] += math.e * 1e-10
        origin_v = origin_v / np.linalg.norm(origin_v)
        n = len(self.vertices)
        total = 0.0
        centroid = np.zeros(3)
        for i in range(1, n + 1):
            va = self.vertices[i - 1]
            vb = self.vertices[i % n]
            total += float(sphere.signed_area(origin_v, va, vb))
            # true_centroid is already area-premultiplied AND
            # orientation-signed; accumulate it unmodified — the negative-
            # area case needs no centroid negation either (the integral of
            # position over the whole sphere is zero, reference 304-312)
            centroid += np.asarray(sphere.true_centroid(origin_v, va, vb),
                                   dtype=np.float64)
        if total < 0:
            total += 4 * math.pi
        return total, centroid


def _crossings_edge_vs_edges(a, b, c_arr, d_arr) -> np.ndarray:
    """robustCrossing of one edge (a,b) against N edges (c_i, d_i)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c_arr = np.asarray(c_arr, dtype=np.float64)
    d_arr = np.asarray(d_arr, dtype=np.float64)
    a_cross_b = np.cross(a, b)
    acb = -sphere.robust_ccw(np.broadcast_to(a, c_arr.shape),
                             np.broadcast_to(b, c_arr.shape), c_arr,
                             a_cross_b=np.broadcast_to(a_cross_b, c_arr.shape))
    bda = sphere.robust_ccw(np.broadcast_to(a, d_arr.shape),
                            np.broadcast_to(b, d_arr.shape), d_arr,
                            a_cross_b=np.broadcast_to(a_cross_b, d_arr.shape))
    out = np.full(len(c_arr), -1, dtype=np.int64)
    degenerate = (acb == 0) | (bda == 0)
    maybe = (bda == acb) & ~degenerate
    if maybe.any():
        idx = np.nonzero(maybe)[0]
        ccd = np.cross(c_arr[idx], d_arr[idx])
        cbd = -sphere.robust_ccw(c_arr[idx], d_arr[idx],
                                 np.broadcast_to(b, (len(idx), 3)), a_cross_b=ccd)
        dac = sphere.robust_ccw(c_arr[idx], d_arr[idx],
                                np.broadcast_to(a, (len(idx), 3)), a_cross_b=ccd)
        good = (cbd == acb[idx]) & (dac == acb[idx])
        out[idx[good]] = 1
    out[degenerate] = 0
    return out


class IndexedLoop:
    """Cell-indexed PIP for large loops: O(edges-near-cell) per probe point
    instead of O(all edges).

    Build (once, e.g. in an actor __init__): a normalized covering of the
    loop's bound region; per covering cell, the loop-containment parity of
    the cell CENTER (full scan, build-time only) and the subset of loop
    edges that may intersect the cell.  Query: locate the point's covering
    cell (searchsorted); since S2 cells are geodesically convex (bounded by
    4 great circles), the geodesic center->P stays inside the cell, so only
    cell-local edges can cross it:
        contains(P) = center_parity(cell) XOR crossings(center->P, local edges).
    Points outside the covering are outside the loop (covering superset).
    """

    # refinement: split covering cells holding more edges than this (the
    # probe pays O(local edges) per point, so this bounds per-point cost —
    # the same adaptive-subdivision idea as S2ShapeIndex's edge budget)
    MAX_EDGES_PER_CELL = 16
    # absolute refinement depth cap (termination on degenerate bunching)
    MAX_REFINE_LEVEL = 18

    def _cell_edges(self, cid: int, cand: np.ndarray) -> np.ndarray:
        """Subset of candidate edge ids that may intersect cell `cid`:
        endpoint inside, or crossing a cell boundary edge (cells are
        convex, so any other intersection implies a boundary crossing).
        `cand` restricts the test to a parent cell's edge set — an edge
        meeting a child must meet the parent."""
        cell = Cell(cid)
        a = self.loop._edges_a[cand]
        b = self.loop._edges_b[cand]
        hit = cell.contains_points_vec(a)
        verts = [cell.get_vertex(k) for k in range(4)]
        for k in range(4):
            cr = _crossings_edge_vs_edges(verts[k], verts[(k + 1) & 3], a, b)
            hit |= cr >= 0  # include shared-vertex/degenerate cases
        return cand[hit]

    def __init__(self, loop: Loop, max_cells: int = 256):
        from . import cellid as ci
        from . import cellunion
        from .coverer import covering_of

        self.loop = loop
        cov = cellunion.normalize(covering_of(loop, max_cells=max_cells))
        all_ids = np.arange(len(loop._edges_a), dtype=np.int64)
        stack = [(int(cid), None) for cid in cov]
        out_cells = []
        out_edges = []
        while stack:
            cid, cand = stack.pop()
            eids = self._cell_edges(cid, all_ids if cand is None else cand)
            lv = int(ci.level(np.array([cid], dtype=np.uint64))[0])
            if (len(eids) > self.MAX_EDGES_PER_CELL
                    and lv < self.MAX_REFINE_LEVEL):
                for ch in ci.children(np.array([cid], dtype=np.uint64))[0]:
                    stack.append((int(ch), eids))
            else:
                out_cells.append(cid)
                out_edges.append(eids)
        cells_arr = np.array(out_cells, dtype=np.uint64)
        starts_all = ci.range_min(cells_arr)
        order = np.argsort(starts_all)
        cov = cells_arr[order]
        self.cells = cov
        self.starts = starts_all[order]
        self.ends = ci.range_max(cov)
        self.local_edges = [out_edges[i] for i in order]
        self.centers = np.array([Cell(int(c)).get_center() for c in cov])
        # one vectorized O(E) parity pass over all cell centers at once
        self.center_parity = loop.contains_points_xyz(self.centers)
        # CSR layout of local_edges so the query expands (point, edge)
        # pairs without any per-cell python work
        self.edge_counts = np.array([len(e) for e in self.local_edges],
                                    dtype=np.int64)
        self.edge_offsets = np.concatenate(
            [[0], np.cumsum(self.edge_counts[:-1])]).astype(np.int64)
        self.edge_flat = (np.concatenate(self.local_edges)
                          if len(cov) else np.empty(0, dtype=np.int64)) \
            .astype(np.int64)

    def contains_points_xyz(self, pts: np.ndarray) -> np.ndarray:
        """One vectorized pass: covering lookup (searchsorted), then EVERY
        (covered point, local edge of its cell) pair goes through a single
        robust_crossing_pairwise call — no per-cell or per-edge python
        loops (the old form cost O(points x distinct-cells) in mask scans
        and dominated dense spatial joins)."""
        from . import cellid as ci

        pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))
        n = len(pts)
        leaf = ci.from_xyz(pts[:, 0], pts[:, 1], pts[:, 2])
        pos = np.searchsorted(self.starts, leaf, side="right")
        inside_cov = pos > 0
        cell_idx = np.maximum(pos, 1) - 1
        inside_cov &= leaf <= self.ends[cell_idx]
        out = np.zeros(n, dtype=bool)
        rows = np.nonzero(inside_cov)[0]
        if not len(rows):
            return out
        cidx = cell_idx[rows]
        counts = self.edge_counts[cidx]
        total = int(counts.sum())
        flips = np.zeros(n, dtype=np.int64)
        if total:
            pair_rows = np.repeat(rows, counts)
            # ragged arange: position of each pair within its point's group
            cum = np.concatenate([[0], np.cumsum(counts[:-1])]) \
                .astype(np.int64)
            within = np.arange(total, dtype=np.int64) - np.repeat(cum, counts)
            eids = self.edge_flat[np.repeat(self.edge_offsets[cidx], counts)
                                  + within]
            o = np.repeat(self.centers[cidx], counts, axis=0)
            cr = edges.robust_crossing_pairwise(
                self.loop._edges_a[eids], self.loop._edges_b[eids],
                o, pts[pair_rows])
            flips += np.bincount(pair_rows[cr > 0], minlength=n)
            for s in np.nonzero(cr == 0)[0]:   # shared-vertex pairs: rare
                r = pair_rows[s]
                if edges.vertex_crossing(
                        self.centers[cell_idx[r]], pts[r],
                        self.loop._edges_a[eids[s]],
                        self.loop._edges_b[eids[s]]):
                    flips[r] += 1
        out[rows] = self.center_parity[cidx] ^ (flips[rows] % 2 == 1)
        return out

    def contains_latlng_degrees(self, lat_deg, lng_deg) -> np.ndarray:
        x, y, z = sphere.latlng_to_xyz(
            sphere.degrees_to_radians(lat_deg), sphere.degrees_to_radians(lng_deg))
        return self.contains_points_xyz(np.stack(
            [np.atleast_1d(x), np.atleast_1d(y), np.atleast_1d(z)], axis=1))


class IndexedPolygon:
    """XOR of IndexedLoops — drop-in for Polygon.contains_latlng_degrees on
    large polygons (built once per worker/actor, e.g. in a join probe
    actor's __init__)."""

    def __init__(self, polygon: "Polygon", max_cells: int = 256):
        self.polygon = polygon
        self.indexed = [IndexedLoop(lp, max_cells=max_cells)
                        for lp in polygon.loops]

    def contains_points_xyz(self, pts: np.ndarray) -> np.ndarray:
        out = np.zeros(len(np.atleast_2d(pts)), dtype=bool)
        for il in self.indexed:
            out ^= il.contains_points_xyz(pts)
        return out

    def contains_latlng_degrees(self, lat_deg, lng_deg) -> np.ndarray:
        x, y, z = sphere.latlng_to_xyz(
            sphere.degrees_to_radians(lat_deg), sphere.degrees_to_radians(lng_deg))
        return self.contains_points_xyz(np.stack(
            [np.atleast_1d(x), np.atleast_1d(y), np.atleast_1d(z)], axis=1))

    # region protocol delegates to the exact polygon (used by the coverer)
    def get_rect_bound(self):
        return self.polygon.get_rect_bound()

    def get_cap_bound(self):
        return self.polygon.get_cap_bound()

    def contains_cell(self, cell) -> bool:
        return self.polygon.contains_cell(cell)

    def may_intersect_cell(self, cell) -> bool:
        return self.polygon.may_intersect_cell(cell)


class Polygon:
    """Multi-loop polygon; interior = XOR of loop interiors
    (spec S2Polygon.php:330-335: parity over loops)."""

    def __init__(self, loops: list[Loop], normalize: bool = True):
        if not loops:
            raise ValueError("polygon needs >= 1 loop")
        if normalize:
            # Store every loop as its "small" (area <= 2pi) CCW region so the
            # XOR parity rule yields shell-minus-holes semantics (canonical
            # S2Polygon normalization; spec S2Polygon.php:100-143 stores
            # shells/holes by nesting depth with normalized orientation).
            loops = [lp.normalized() for lp in loops]
        self.loops = loops
        bound = LatLngRect.empty()
        for lp in loops:
            bound = bound.union(lp.get_rect_bound())
        self.bound = bound

    @staticmethod
    def from_latlng_loops(loops_deg) -> "Polygon":
        return Polygon([Loop.from_latlng_degrees(lp) for lp in loops_deg])

    def contains_point(self, p: np.ndarray) -> bool:
        inside = False
        for lp in self.loops:
            inside ^= lp.contains_point(p)
        return inside

    def contains_points_xyz(self, pts: np.ndarray) -> np.ndarray:
        out = np.zeros(len(pts), dtype=bool)
        for lp in self.loops:
            out ^= lp.contains_points_xyz(pts)
        return out

    def contains_latlng_degrees(self, lat_deg, lng_deg) -> np.ndarray:
        x, y, z = sphere.latlng_to_xyz(
            sphere.degrees_to_radians(lat_deg), sphere.degrees_to_radians(lng_deg))
        return self.contains_points_xyz(np.stack(
            [np.atleast_1d(x), np.atleast_1d(y), np.atleast_1d(z)], axis=1))

    # -- polygon-pair relations (spec S2Polygon.php:318-413, 956-1024) ------

    def has_holes(self) -> bool:
        return any(self.loop_depth(i) % 2 == 1 for i in range(len(self.loops)))

    def _shells(self):
        return [lp for i, lp in enumerate(self.loops) if self.loop_depth(i) % 2 == 0]

    def _holes(self):
        return [lp for i, lp in enumerate(self.loops) if self.loop_depth(i) % 2 == 1]

    def _contains_or_crosses_loop(self, b: Loop) -> int:
        """Spec S2Polygon::containsOrCrosses (S2Polygon.php:956-968)."""
        inside = False
        for lp in self.loops:
            result = lp.contains_or_crosses(b)
            if result < 0:
                return -1
            if result > 0:
                inside = not inside
        return 1 if inside else 0

    def _any_loop_contains(self, b: Loop) -> bool:
        return any(lp.contains_loop(b) for lp in self.loops)

    def contains_polygon(self, b: "Polygon") -> bool:
        """A contains B (spec S2Polygon::contains, S2Polygon.php:318-375)."""
        if len(self.loops) == 1 and len(b.loops) == 1:
            return self.loops[0].contains_loop(b.loops[0])
        if not self.bound.contains_rect(b.bound):
            if not self.bound.lng.union(b.bound.lng).is_full():
                return False
        if not self.has_holes() and not b.has_holes():
            return all(self._any_loop_contains(lp) for lp in b.loops)
        # every shell of B contained by an odd number of loops of A, and
        # every hole of B not intersecting A
        if not all(self._contains_or_crosses_loop(lp) > 0 for lp in b._shells()):
            return False
        return all(self._contains_or_crosses_loop(lp) == 0 for lp in b._holes())

    def intersects_polygon(self, b: "Polygon") -> bool:
        """A intersects B (spec S2Polygon::intersects, S2Polygon.php:380-413)."""
        if len(self.loops) == 1 and len(b.loops) == 1:
            return self.loops[0].intersects_loop(b.loops[0])
        if not self.bound.intersects_rect(b.bound):
            return False
        if not self.has_holes() and not b.has_holes():
            return any(la.intersects_loop(lb)
                       for la in self.loops for lb in b.loops)
        return (any(self._contains_or_crosses_loop(lp) != 0 for lp in b._shells())
                or any(b._contains_or_crosses_loop(lp) != 0 for lp in self._shells()))

    def is_valid(self) -> bool:
        """S2Polygon::isValid semantics (S2Polygon.php:161-197): no duplicate
        undirected edges across loops, no pairwise proper edge crossings."""
        from .edgeindex import self_intersections

        seen = set()
        all_a, all_b = [], []
        for lp in self.loops:
            if len(lp.vertices) < 3:
                return False
            for k in range(len(lp.vertices)):
                a = lp._edges_a[k]
                b = lp._edges_b[k]
                key = tuple(sorted((a.tobytes(), b.tobytes())))
                if key in seen:
                    return False
                seen.add(key)
                all_a.append(a)
                all_b.append(b)
        return len(self_intersections(np.array(all_a), np.array(all_b))) == 0

    def loop_depth(self, i: int) -> int:
        """Nesting depth = number of other loops containing loop i's vertex
        (spec S2Polygon.php:906-955 builds the nesting forest the same way)."""
        depth = 0
        v = self.loops[i].vertices[0]
        for j, lp in enumerate(self.loops):
            if j != i and lp.contains_point(v):
                depth += 1
        return depth

    def area(self) -> float:
        """XOR-region area: even-depth loops add, odd-depth subtract."""
        total = 0.0
        for i, lp in enumerate(self.loops):
            sign = 1.0 if self.loop_depth(i) % 2 == 0 else -1.0
            total += sign * lp.area()
        return total

    # region protocol
    def get_rect_bound(self) -> LatLngRect:
        return self.bound

    def get_cap_bound(self) -> Cap:
        return self.bound.get_cap_bound()

    def may_intersect_cell(self, cell: Cell) -> bool:
        if not self.bound.intersects_rect(cell.get_rect_bound()):
            return False
        if any(self.contains_point(cell.get_vertex(k)) for k in range(4)):
            return True
        for lp in self.loops:
            if lp._any_vertex_in_cell(cell):
                return True
            if lp._crosses_cell_boundary(cell):
                return True
        return False

    def contains_cell(self, cell: Cell) -> bool:
        if not self.bound.intersects_rect(cell.get_rect_bound()):
            return False
        if not all(self.contains_point(cell.get_vertex(k)) for k in range(4)):
            return False
        for lp in self.loops:
            if lp._crosses_cell_boundary(cell):
                return False
            if lp._any_vertex_in_cell(cell):
                return False
        return True
