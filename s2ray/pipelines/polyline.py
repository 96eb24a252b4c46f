"""Polyline operators: arclength, interpolation, point->polyline distance.

Implements the S2Polyline spec (the reference file is an empty shell; the
semantics live in the commented Java at S2Polyline.php:84-231):
- arclength = sum of vertex angles
- interpolate(t) = point at fraction t of the arclength
- distance join: min over segments of getDistance (S2EdgeUtil.php:271-309),
  vectorized over probe points per segment.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..kernel import edges, sphere


class Polyline:
    def __init__(self, vertices: np.ndarray):
        v = np.asarray(vertices, dtype=np.float64)
        if v.shape[0] < 2:
            raise ValueError("polyline needs >= 2 vertices")
        self.vertices = v
        self._seg_angles = np.array([
            float(sphere.angle_between(v[i], v[i + 1]))
            for i in range(len(v) - 1)
        ])
        # robust cross products per segment, precomputed once
        self._seg_cross = [sphere.robust_cross_prod(v[i], v[i + 1])
                           for i in range(len(v) - 1)]
        rb = edges.RectBounder()
        for vv in v:
            rb.add_point(vv)
        self.bound = rb.get_bound()

    @staticmethod
    def from_latlng_degrees(latlng_pairs) -> "Polyline":
        arr = np.asarray(latlng_pairs, dtype=np.float64)
        x, y, z = sphere.latlng_to_xyz(
            sphere.degrees_to_radians(arr[:, 0]),
            sphere.degrees_to_radians(arr[:, 1]))
        return Polyline(np.stack([x, y, z], axis=1))

    def arclength_radians(self) -> float:
        """Spec: S2Polyline::getArclengthAngle (S2Polyline.php:84-96)."""
        return float(self._seg_angles.sum())

    def interpolate(self, t: float) -> np.ndarray:
        """Point at fraction t in [0,1] of arclength (spec S2Polyline.php:98-128)."""
        if t <= 0:
            return self.vertices[0]
        target = t * self.arclength_radians()
        for i, ang in enumerate(self._seg_angles):
            if target < ang:
                # slerp within segment i
                a, b = self.vertices[i], self.vertices[i + 1]
                f = target / ang if ang > 0 else 0.0
                sin_ang = math.sin(ang)
                if sin_ang == 0:
                    return a
                p = (math.sin((1 - f) * ang) / sin_ang) * a \
                    + (math.sin(f * ang) / sin_ang) * b
                return sphere.normalize(p)
            target -= ang
        return self.vertices[-1]

    def distance_radians(self, pts: np.ndarray) -> np.ndarray:
        """Min angle from each point (N,3) to the polyline."""
        pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))
        best = np.full(len(pts), np.inf)
        for i in range(len(self.vertices) - 1):
            d = edges.distance_point_to_edge(
                pts, self.vertices[i], self.vertices[i + 1],
                a_cross_b=self._seg_cross[i])
            best = np.minimum(best, d)
        return best

    def distance_m(self, lat_deg, lng_deg, radius_m: float = 6371000.0) -> np.ndarray:
        x, y, z = sphere.latlng_to_xyz(
            sphere.degrees_to_radians(lat_deg), sphere.degrees_to_radians(lng_deg))
        pts = np.stack([np.atleast_1d(x), np.atleast_1d(y), np.atleast_1d(z)], axis=1)
        return self.distance_radians(pts) * radius_m

    # -- region protocol (so RegionCoverer can tile polylines) -------------

    def get_rect_bound(self):
        return self.bound

    def get_cap_bound(self):
        return self.get_rect_bound().get_cap_bound()

    def contains_cell(self, cell) -> bool:
        return False  # a curve contains no 2D cell

    def may_intersect_cell(self, cell) -> bool:
        from ..kernel.pip import _crossings_edge_vs_edges

        if not self.bound.intersects_rect(cell.get_rect_bound()):
            return False
        for v in self.vertices:
            if cell.contains_point(v):
                return True
        verts = [cell.get_vertex(k) for k in range(4)]
        for k in range(4):
            cr = _crossings_edge_vs_edges(
                verts[k], verts[(k + 1) & 3],
                self.vertices[:-1], self.vertices[1:])
            if np.any(cr > 0):
                return True
        return False

    def project(self, p: np.ndarray):
        """Closest point on the polyline + segment index (spec
        S2Polyline.php:176-231)."""
        best_d = np.inf
        best_pt = self.vertices[0]
        best_i = 0
        for i in range(len(self.vertices) - 1):
            cp = edges.closest_point_on_edge(p, self.vertices[i],
                                             self.vertices[i + 1])
            d = float(sphere.angle_between(p, cp))
            if d < best_d:
                best_d, best_pt, best_i = d, cp, i
        return best_pt, best_i


def polyline_distance_join(pages_ds, polyline: Polyline, max_dist_m: float,
                           keep_cols=("page_id", "url")):
    """Pages within max_dist_m of the polyline, with their distance.

    Broadcast pattern: the polyline (with precomputed segment cross
    products) ships once via ray.put; each batch computes vectorized
    min-over-segments distances.
    """
    import ray

    line_ref = ray.put(polyline)
    cols = list(keep_cols)

    def stage(batch: pa.Table, line_ref=line_ref) -> pa.Table:
        line = ray.get(line_ref)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        d = line.distance_m(lat, lng)
        mask = d <= max_dist_m
        out = batch.select(cols).filter(pa.array(mask))
        return out.append_column("dist_m", pa.array(d[mask], type=pa.float64()))

    return pages_ds.map_batches(stage, batch_format="pyarrow", batch_size=None)
