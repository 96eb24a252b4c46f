"""Region types: Cell, Cap, LatLngRect + the S2Region predicate protocol.

Scalar (per-region) objects used by the coverer and join build side, with
vectorized point-membership methods (``contains_points``) for the probe side.

Reference parity:
- S2Cell geometry          S2Cell.php:496-514 (init), 126-257 (vertices/edges),
                           341-460 (bounds); u/v edge normals reimplemented
                           from the commented spec S2Projections.php:273-319.
- S2Cap                    S2Cap.php:42-368 (+ the missing isFull/intersects/
                           contains(S2Point) reimplemented from the Java spec
                           the file calls into, S2Cap.php:177,196,227,359).
- S2LatLngRect             S2LatLngRect.php:26-599 (live parts) with the
                           duplicate/Java-corrupt members rewritten from the
                           in-file spec.
"""

from __future__ import annotations

import math
from typing import Protocol

import numpy as np

from . import cellid as ci
from . import sphere
from .interval import M_PI, R1Interval, S1Interval

M_PI_2 = math.pi / 2
M_PI_4 = math.pi / 4

# reference S2Cell.php:5-15
MAX_CELL_SIZE = 1 << 30
CELL_MAX_ERROR = 1.0 / (1 << 51)
POLE_MIN_LAT = math.asin(math.sqrt(1.0 / 3.0)) - CELL_MAX_ERROR
# reference S2Cap.php:3
ROUND_UP = 1.0 + 1.0 / (1 << 52)


# ---------------------------------------------------------------------------
# face frame axes (reference S2Projections.php:325-367 + commented
# getUNorm/getVNorm spec at :273-319)

def get_u_axis(face: int) -> np.ndarray:
    return np.array(
        [(0, 1, 0), (-1, 0, 0), (-1, 0, 0), (0, 0, -1), (0, 0, -1), (0, 1, 0)][face],
        dtype=np.float64,
    )


def get_v_axis(face: int) -> np.ndarray:
    return np.array(
        [(0, 0, 1), (0, 0, 1), (0, -1, 0), (0, -1, 0), (1, 0, 0), (1, 0, 0)][face],
        dtype=np.float64,
    )


def get_u_norm(face: int, u: float) -> np.ndarray:
    """Normal of the plane through the u-line (spec S2Projections.php:287-302)."""
    return np.array(
        [(u, -1.0, 0.0), (1.0, u, 0.0), (1.0, 0.0, u),
         (-u, 0.0, 1.0), (0.0, -u, 1.0), (0.0, -1.0, -u)][face],
        dtype=np.float64,
    )


def get_v_norm(face: int, v: float) -> np.ndarray:
    """Normal of the plane through the v-line (spec S2Projections.php:304-319)."""
    return np.array(
        [(-v, 0.0, 1.0), (0.0, -v, 1.0), (0.0, -1.0, -v),
         (v, -1.0, 0.0), (1.0, v, 0.0), (1.0, 0.0, v)][face],
        dtype=np.float64,
    )


def face_uv_to_xyz1(face: int, u: float, v: float) -> np.ndarray:
    x, y, z = ci.face_uv_to_xyz(np.array([face]), np.array([u]), np.array([v]))
    return np.array([x[0], y[0], z[0]], dtype=np.float64)


def face_xyz_to_uv(face: int, p: np.ndarray):
    """None if p is not on the hemisphere of the face (S2Cell.php:474-485 path)."""
    if face < 3:
        if p[face] <= 0:
            return None
    elif p[face - 3] >= 0:
        return None
    u, v = ci.valid_face_xyz_to_uv(np.array([face]), *[np.array([c]) for c in p])
    return float(u[0]), float(v[0])


# ---------------------------------------------------------------------------

class Region(Protocol):
    """The reference's extension surface (S2Region.php:3-29)."""

    def get_cap_bound(self) -> "Cap": ...
    def get_rect_bound(self) -> "LatLngRect": ...
    def contains_cell(self, cell: "Cell") -> bool: ...
    def may_intersect_cell(self, cell: "Cell") -> bool: ...


class Cell:
    """Geometric realization of a cell id (reference S2Cell.php)."""

    __slots__ = ("id", "face", "level", "orientation", "uv")

    def __init__(self, cell_id: int):
        self.id = np.uint64(cell_id)
        arr = np.array([cell_id], dtype=np.uint64)
        f, i, j, orient = ci.to_face_ij_orientation(arr, want_orientation=True)
        self.face = int(f[0])
        self.level = int(ci.level(arr)[0])
        self.orientation = int(orient[0])
        cell_size = 1 << (ci.MAX_LEVEL - self.level)
        ij = (int(i[0]), int(j[0]))
        self.uv = np.empty((2, 2), dtype=np.float64)
        for d in range(2):
            sij_lo = (ij[d] & -cell_size) * 2 - MAX_CELL_SIZE
            sij_hi = sij_lo + cell_size * 2
            self.uv[d][0] = float(ci.st_to_uv((1.0 / MAX_CELL_SIZE) * sij_lo))
            self.uv[d][1] = float(ci.st_to_uv((1.0 / MAX_CELL_SIZE) * sij_hi))

    @staticmethod
    def from_face(face: int) -> "Cell":
        return Cell(int((face << 61) | (1 << 60)))

    def get_vertex_raw(self, k: int) -> np.ndarray:
        """CCW order SW, SE, NE, NW (S2Cell.php:138-141)."""
        return face_uv_to_xyz1(
            self.face, self.uv[0][(k >> 1) ^ (k & 1)], self.uv[1][k >> 1]
        )

    def get_vertex(self, k: int) -> np.ndarray:
        return sphere.normalize(self.get_vertex_raw(k))

    def get_edge_raw(self, k: int) -> np.ndarray:
        """Inward-facing edge normal (S2Cell.php:155-170)."""
        if k == 0:
            return get_v_norm(self.face, self.uv[1][0])       # South
        if k == 1:
            return get_u_norm(self.face, self.uv[0][1])       # East
        if k == 2:
            return -get_v_norm(self.face, self.uv[1][1])      # North
        return -get_u_norm(self.face, self.uv[0][0])          # West

    def get_center(self) -> np.ndarray:
        return sphere.normalize(self.get_center_raw())

    def get_center_raw(self) -> np.ndarray:
        x, y, z = ci.to_point_raw(np.array([self.id], dtype=np.uint64))
        return np.array([x[0], y[0], z[0]])

    def contains_point(self, p: np.ndarray) -> bool:
        """S2Cell::contains(S2Point) (S2Cell.php:474-485)."""
        uv = face_xyz_to_uv(self.face, p)
        if uv is None:
            return False
        u, v = uv
        return (self.uv[0][0] <= u <= self.uv[0][1]
                and self.uv[1][0] <= v <= self.uv[1][1])

    def contains_points_vec(self, pts: np.ndarray) -> np.ndarray:
        """Vectorized contains over (N,3) points."""
        pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))
        comp = pts[:, self.face % 3]
        on_face = comp > 0 if self.face < 3 else comp < 0
        face_arr = np.full(len(pts), self.face, dtype=np.int64)
        u, v = ci.valid_face_xyz_to_uv(face_arr, pts[:, 0], pts[:, 1], pts[:, 2])
        ok = (on_face & (u >= self.uv[0][0]) & (u <= self.uv[0][1])
              & (v >= self.uv[1][0]) & (v <= self.uv[1][1]))
        return np.asarray(ok, dtype=bool)

    def subdivide(self) -> list["Cell"]:
        """The 4 children in traversal order (S2Cell::subdivide,
        S2Cell.php:181-212)."""
        child_ids = ci.children(np.array([self.id], dtype=np.uint64))[0]
        return [Cell(int(c)) for c in child_ids]

    # areas (S2Cell.php:265-319)
    def average_area(self) -> float:
        return sphere.AVG_AREA.get_value(self.level)

    def approx_area(self) -> float:
        if self.level < 2:
            return self.average_area()
        flat_area = 0.5 * float(np.linalg.norm(np.cross(
            self.get_vertex(2) - self.get_vertex(0),
            self.get_vertex(3) - self.get_vertex(1))))
        # reference: min(1.0, flatArea * M_1_PI) — the cap is 1, not 1/pi
        return flat_area * 2 / (1 + math.sqrt(1 - min(1.0, flat_area / M_PI)))

    def exact_area(self) -> float:
        v0, v1, v2, v3 = (self.get_vertex(k) for k in range(4))
        return float(sphere.triangle_area(v0, v1, v2)) + float(
            sphere.triangle_area(v0, v2, v3))

    # region protocol
    def get_cap_bound(self) -> "Cap":
        u = 0.5 * (self.uv[0][0] + self.uv[0][1])
        v = 0.5 * (self.uv[1][0] + self.uv[1][1])
        cap = Cap(sphere.normalize(face_uv_to_xyz1(self.face, u, v)), 0.0)
        for k in range(4):
            cap = cap.add_point(self.get_vertex(k))
        return cap

    def get_rect_bound(self) -> "LatLngRect":
        """S2Cell::getRectBound (S2Cell.php:384-460)."""
        if self.level > 0:
            u = self.uv[0][0] + self.uv[0][1]
            v = self.uv[1][0] + self.uv[1][1]
            i = 1 if u > 0 else 0
            j = 1 if v > 0 else 0
            if get_u_axis(self.face)[2] == 0:
                i = 1 if u < 0 else 0
            if get_v_axis(self.face)[2] == 0:
                j = 1 if v < 0 else 0
            lat = R1Interval.from_point_pair(
                self._get_latitude(i, j), self._get_latitude(1 - i, 1 - j))
            lat = lat.expanded(CELL_MAX_ERROR).intersection(LatLngRect.full_lat())
            if lat.lo == -M_PI_2 or lat.hi == M_PI_2:
                return LatLngRect(lat, S1Interval.full())
            lng = S1Interval.from_point_pair(
                self._get_longitude(i, 1 - j), self._get_longitude(1 - i, j))
            return LatLngRect(lat, lng.expanded(CELL_MAX_ERROR))
        face_rects = [
            (R1Interval(-M_PI_4, M_PI_4), S1Interval(-M_PI_4, M_PI_4)),
            (R1Interval(-M_PI_4, M_PI_4), S1Interval(M_PI_4, 3 * M_PI_4)),
            (R1Interval(POLE_MIN_LAT, M_PI_2), S1Interval(-M_PI, M_PI)),
            (R1Interval(-M_PI_4, M_PI_4), S1Interval(3 * M_PI_4, -3 * M_PI_4)),
            (R1Interval(-M_PI_4, M_PI_4), S1Interval(-3 * M_PI_4, -M_PI_4)),
            (R1Interval(-M_PI_2, -POLE_MIN_LAT), S1Interval(-M_PI, M_PI)),
        ]
        lat, lng = face_rects[self.face]
        return LatLngRect(lat, lng)

    def _get_latitude(self, i: int, j: int) -> float:
        p = face_uv_to_xyz1(self.face, self.uv[0][i], self.uv[1][j])
        return math.atan2(p[2], math.sqrt(p[0] * p[0] + p[1] * p[1]))

    def _get_longitude(self, i: int, j: int) -> float:
        p = face_uv_to_xyz1(self.face, self.uv[0][i], self.uv[1][j])
        return math.atan2(p[1], p[0])

    def contains_cell(self, cell: "Cell") -> bool:
        return bool(ci.contains(np.array([self.id]), np.array([cell.id]))[0])

    def may_intersect_cell(self, cell: "Cell") -> bool:
        return bool(ci.intersects(np.array([self.id]), np.array([cell.id]))[0])


class Cap:
    """Spherical disc: axis + height h = 2 sin^2(theta/2) (S2Cap.php:13-65)."""

    __slots__ = ("axis", "height")

    def __init__(self, axis: np.ndarray, height: float):
        self.axis = np.asarray(axis, dtype=np.float64)
        self.height = float(height)

    @staticmethod
    def from_axis_angle(axis: np.ndarray, angle_rad: float) -> "Cap":
        d = math.sin(0.5 * angle_rad)
        return Cap(axis, 2 * d * d)

    @staticmethod
    def from_axis_height(axis: np.ndarray, height: float) -> "Cap":
        return Cap(axis, height)

    @staticmethod
    def from_axis_area(axis: np.ndarray, area: float) -> "Cap":
        return Cap(axis, area / (2 * M_PI))

    @staticmethod
    def from_latlng_radius(lat_deg: float, lng_deg: float, radius_m: float,
                           earth_radius_m: float = 6371000.0) -> "Cap":
        x, y, z = sphere.latlng_to_xyz(
            math.radians(lat_deg), math.radians(lng_deg))
        return Cap.from_axis_angle(
            np.array([x, y, z], dtype=np.float64), radius_m / earth_radius_m)

    @staticmethod
    def empty() -> "Cap":
        return Cap(np.array([1.0, 0.0, 0.0]), -1.0)

    @staticmethod
    def full() -> "Cap":
        return Cap(np.array([1.0, 0.0, 0.0]), 2.0)

    def is_empty(self) -> bool:
        return self.height < 0

    def is_full(self) -> bool:
        """Missing in the port (called at S2Cap.php:177); Java spec: h >= 2."""
        return self.height >= 2

    def is_valid(self) -> bool:
        return abs(float(np.dot(self.axis, self.axis)) - 1.0) <= 1e-14 and self.height <= 2

    def angle(self) -> float:
        if self.is_empty():
            return -1.0
        return 2 * math.asin(math.sqrt(0.5 * max(0.0, self.height)))

    def area(self) -> float:
        return 2 * M_PI * max(0.0, self.height)

    def complement(self) -> "Cap":
        c_height = -1.0 if self.is_full() else 2 - max(self.height, 0.0)
        return Cap(-self.axis, c_height)

    def contains_point(self, p: np.ndarray) -> bool:
        """Java spec (called at S2Cap.php:227): |axis-p|^2 <= 2h."""
        d = self.axis - p
        return float(np.dot(d, d)) <= 2 * self.height

    def interior_contains_point(self, p: np.ndarray) -> bool:
        d = self.axis - p
        return self.is_full() or float(np.dot(d, d)) < 2 * self.height

    def contains_points(self, x, y, z) -> np.ndarray:
        """Vectorized membership over point columns (the join probe)."""
        dx = self.axis[0] - np.asarray(x, dtype=np.float64)
        dy = self.axis[1] - np.asarray(y, dtype=np.float64)
        dz = self.axis[2] - np.asarray(z, dtype=np.float64)
        return dx * dx + dy * dy + dz * dz <= 2 * self.height

    def contains_latlng_degrees(self, lat_deg, lng_deg) -> np.ndarray:
        x, y, z = sphere.latlng_to_xyz(
            sphere.degrees_to_radians(lat_deg), sphere.degrees_to_radians(lng_deg))
        return self.contains_points(x, y, z)

    def contains_cap(self, other: "Cap") -> bool:
        if self.is_full() or other.is_empty():
            return True
        return self.angle() >= float(
            sphere.angle_between(self.axis, other.axis)) + other.angle()

    def intersects_cap(self, other: "Cap") -> bool:
        """Java spec (called at S2Cap.php:196)."""
        if self.is_empty() or other.is_empty():
            return False
        return self.angle() + other.angle() >= float(
            sphere.angle_between(self.axis, other.axis))

    def interior_intersects_cap(self, other: "Cap") -> bool:
        return not self.complement().contains_cap(other)

    def add_point(self, p: np.ndarray) -> "Cap":
        """S2Cap::addPoint (S2Cap.php:238-256)."""
        if self.is_empty():
            return Cap(np.asarray(p, dtype=np.float64), 0.0)
        d = self.axis - p
        dist2 = float(np.dot(d, d))
        height = max(self.height, ROUND_UP * 0.5 * dist2)
        return Cap(self.axis, height)

    def add_cap(self, other: "Cap") -> "Cap":
        dist = float(sphere.angle_between(self.axis, other.axis)) + other.angle()
        d = math.sin(0.5 * min(M_PI, dist))
        return Cap(self.axis, max(self.height, ROUND_UP * 2 * d * d))

    def expanded(self, distance_rad: float) -> "Cap":
        if self.is_empty():
            return Cap.empty()
        return Cap.from_axis_angle(self.axis, self.angle() + distance_rad)

    # region protocol (S2Cap.php:285-368 + Java spec for the missing private
    # intersects(cell, vertices))
    def get_cap_bound(self) -> "Cap":
        return self

    def get_rect_bound(self) -> "LatLngRect":
        if self.is_empty():
            return LatLngRect.empty()
        axis_lat, axis_lng = sphere.xyz_to_latlng(*self.axis)
        axis_lat, axis_lng = float(axis_lat), float(axis_lng)
        cap_angle = self.angle()
        all_longitudes = False
        lat_lo = axis_lat - cap_angle
        lat_hi = axis_lat + cap_angle
        lng_lo, lng_hi = -M_PI, M_PI
        if lat_lo <= -M_PI_2:
            lat_lo = -M_PI_2
            all_longitudes = True
        if lat_hi >= M_PI_2:
            lat_hi = M_PI_2
            all_longitudes = True
        if not all_longitudes:
            sin_a = math.sqrt(self.height * (2 - self.height))
            sin_c = math.cos(axis_lat)
            if sin_a <= sin_c:
                angle_a = math.asin(sin_a / sin_c)
                lng_lo = math.remainder(axis_lng - angle_a, 2 * M_PI)
                lng_hi = math.remainder(axis_lng + angle_a, 2 * M_PI)
        return LatLngRect(R1Interval(lat_lo, lat_hi),
                          S1Interval.make(lng_lo, lng_hi))

    def contains_cell(self, cell: Cell) -> bool:
        vertices = [cell.get_vertex(k) for k in range(4)]
        for v in vertices:
            if not self.contains_point(v):
                return False
        return not self.complement()._intersects_cell(cell, vertices)

    def may_intersect_cell(self, cell: Cell) -> bool:
        vertices = [cell.get_vertex(k) for k in range(4)]
        for v in vertices:
            if self.contains_point(v):
                return True
        return self._intersects_cell(cell, vertices)

    def _intersects_cell(self, cell: Cell, vertices) -> bool:
        """True if the cap intersects any point of cell excluding vertices
        (Java spec for the private S2Cap.intersects)."""
        if self.height >= 1:
            return False  # sphere-center containment handled elsewhere
        if self.is_empty():
            return False
        if cell.contains_point(self.axis):
            return True
        sin2_angle = self.height * (2 - self.height)
        for k in range(4):
            edge = cell.get_edge_raw(k)
            dot = float(np.dot(self.axis, edge))
            if dot > 0:
                continue
            if dot * dot > sin2_angle * float(np.dot(edge, edge)):
                return False
            direction = np.cross(edge, self.axis)
            if (float(np.dot(direction, vertices[k])) < 0
                    and float(np.dot(direction, vertices[(k + 1) & 3])) > 0):
                return True
        return False


class LatLngRect:
    """Latitude-longitude rectangle (reference S2LatLngRect.php, with the
    unparseable members rewritten from the in-file Java spec)."""

    __slots__ = ("lat", "lng")

    def __init__(self, lat: R1Interval, lng: S1Interval):
        self.lat = lat
        self.lng = lng

    @staticmethod
    def full_lat() -> R1Interval:
        return R1Interval(-M_PI_2, M_PI_2)

    @staticmethod
    def full() -> "LatLngRect":
        return LatLngRect(LatLngRect.full_lat(), S1Interval.full())

    @staticmethod
    def empty() -> "LatLngRect":
        return LatLngRect(R1Interval.empty(), S1Interval.empty())

    @staticmethod
    def from_degrees(lat_lo: float, lng_lo: float, lat_hi: float,
                     lng_hi: float) -> "LatLngRect":
        return LatLngRect(
            R1Interval(math.radians(lat_lo), math.radians(lat_hi)),
            S1Interval.make(math.radians(lng_lo), math.radians(lng_hi)),
        )

    @staticmethod
    def from_point_pair(lat1: float, lng1: float, lat2: float, lng2: float) -> "LatLngRect":
        return LatLngRect(
            R1Interval.from_point_pair(lat1, lat2),
            S1Interval.from_point_pair(lng1, lng2),
        )

    def is_empty(self) -> bool:
        return self.lat.is_empty()

    def is_full(self) -> bool:
        return (self.lat.lo == -M_PI_2 and self.lat.hi == M_PI_2
                and self.lng.is_full())

    def contains_latlng(self, lat_rad: float, lng_rad: float) -> bool:
        return self.lat.contains(lat_rad) and self.lng.contains(lng_rad)

    def contains_point(self, p: np.ndarray) -> bool:
        lat, lng = sphere.xyz_to_latlng(*p)
        return self.contains_latlng(float(lat), float(lng))

    def contains_points(self, lat_rad, lng_rad) -> np.ndarray:
        """Vectorized membership (radians)."""
        lat = np.asarray(lat_rad, dtype=np.float64)
        lng = np.asarray(lng_rad, dtype=np.float64)
        in_lat = (lat >= self.lat.lo) & (lat <= self.lat.hi)
        if self.lng.is_inverted():
            in_lng = (lng >= self.lng.lo) | (lng <= self.lng.hi)
        else:
            in_lng = (lng >= self.lng.lo) & (lng <= self.lng.hi)
        return in_lat & in_lng

    def contains_rect(self, other: "LatLngRect") -> bool:
        return (self.lat.contains_interval(other.lat)
                and self.lng.contains_interval(other.lng))

    def intersects_rect(self, other: "LatLngRect") -> bool:
        return (self.lat.intersects(other.lat)
                and self.lng.intersects(other.lng))

    def union(self, other: "LatLngRect") -> "LatLngRect":
        return LatLngRect(self.lat.union(other.lat), self.lng.union(other.lng))

    def intersection(self, other: "LatLngRect") -> "LatLngRect":
        lat = self.lat.intersection(other.lat)
        lng = self.lng.intersection(other.lng)
        if lat.is_empty() or lng.is_empty():
            return LatLngRect.empty()
        return LatLngRect(lat, lng)

    def add_point(self, lat_rad: float, lng_rad: float) -> "LatLngRect":
        return LatLngRect(self.lat.add_point(lat_rad),
                          self.lng.add_point(lng_rad))

    def expanded(self, lat_rad: float, lng_rad: float) -> "LatLngRect":
        lat = self.lat.expanded(lat_rad).intersection(LatLngRect.full_lat())
        if lat.is_empty():
            return LatLngRect.empty()
        return LatLngRect(lat, self.lng.expanded(lng_rad))

    def get_vertex(self, k: int) -> np.ndarray:
        """Vertices CCW: (lo,lo),(lo,hi),(hi,hi),(hi,lo) in (lat,lng)."""
        lat = self.lat.lo if k < 2 else self.lat.hi
        lng = self.lng.lo if k in (0, 3) else self.lng.hi
        x, y, z = sphere.latlng_to_xyz(lat, lng)
        return np.array([x, y, z], dtype=np.float64)

    def get_distance_latlng(self, lat_rad, lng_rad) -> np.ndarray:
        """Min great-circle distance (radians) from points to this
        non-empty rect, vectorized over (lat_rad, lng_rad) arrays.

        Reference semantics: S2LatLngRect::getDistance(S2LatLng)
        (S2LatLngRect.php:222-243): when the point's longitude lies inside
        the rect's lng interval the shortest path runs along a meridian
        (pure latitude clamp); otherwise it is the point-to-edge distance
        to the nearer of the two longitudinal boundary edges, selected by
        membership in the S1 interval from lng.hi to the complement
        center.
        """
        from . import edges

        if self.is_empty():
            raise ValueError("getDistance on an empty rect")
        lat = np.atleast_1d(np.asarray(lat_rad, dtype=np.float64))
        lng = np.atleast_1d(np.asarray(lng_rad, dtype=np.float64))
        out = np.empty(len(lat), dtype=np.float64)
        if self.lng.is_full():
            in_lng = np.ones(len(lng), dtype=bool)
        elif self.lng.is_inverted():
            in_lng = (lng >= self.lng.lo) | (lng <= self.lng.hi)
        else:
            in_lng = (lng >= self.lng.lo) & (lng <= self.lng.hi)
        out[in_lng] = np.maximum(
            0.0, np.maximum(lat[in_lng] - self.lat.hi,
                            self.lat.lo - lat[in_lng]))
        rest = ~in_lng
        if rest.any():
            # which boundary edge is nearer in longitude-space: the S1
            # interval from lng.hi to the complement center holds exactly
            # the longitudes closer to the hi edge
            # PHP S1Interval::complement returns FULL for a point interval
            # (center 0), else the swapped interval
            comp_center = (0.0 if self.lng.lo == self.lng.hi
                           else S1Interval(self.lng.hi, self.lng.lo)
                           .get_center())
            iv = S1Interval(self.lng.hi, comp_center)
            lr = lng[rest]
            if iv.is_inverted():
                use_hi = (lr >= iv.lo) | (lr <= iv.hi)
            else:
                use_hi = (lr >= iv.lo) & (lr <= iv.hi)
            px, py, pz = sphere.latlng_to_xyz(lat[rest], lng[rest])
            pts = np.stack([px, py, pz], axis=1)
            d = np.empty(len(lr), dtype=np.float64)
            for sel, a_lng in ((~use_hi, self.lng.lo), (use_hi, self.lng.hi)):
                if not sel.any():
                    continue
                lo_pt = np.array(sphere.latlng_to_xyz(self.lat.lo, a_lng),
                                 dtype=np.float64)
                hi_pt = np.array(sphere.latlng_to_xyz(self.lat.hi, a_lng),
                                 dtype=np.float64)
                cross = np.array(sphere.latlng_to_xyz(0.0, a_lng - M_PI_2),
                                 dtype=np.float64)
                d[sel] = edges.distance_point_to_edge(
                    pts[sel], lo_pt, hi_pt, a_cross_b=cross)
            out[rest] = d
        return out

    def get_distance_rect(self, other: "LatLngRect") -> float:
        """Min great-circle distance (radians) between two non-empty rects
        (S2LatLngRect::getDistance(S2LatLngRect), S2LatLngRect.php:250-305):
        0 on intersection; a pure latitude gap when the lng intervals
        overlap; otherwise the min of the four point-to-edge distances
        between the nearest pair of longitudinal boundary edges."""
        from . import edges

        a, b = self, other
        if a.is_empty() or b.is_empty():
            raise ValueError("getDistance on an empty rect")
        if a.lng.intersects(b.lng):
            if a.lat.intersects(b.lat):
                return 0.0
            if a.lat.lo > b.lat.hi:
                lo, hi = b.lat.hi, a.lat.lo
            else:
                lo, hi = a.lat.hi, b.lat.lo
            return float(hi - lo)
        lo_hi = S1Interval.from_point_pair(a.lng.lo, b.lng.hi)
        hi_lo = S1Interval.from_point_pair(a.lng.hi, b.lng.lo)
        if lo_hi.get_length() < hi_lo.get_length():
            a_lng, b_lng = a.lng.lo, b.lng.hi
        else:
            a_lng, b_lng = a.lng.hi, b.lng.lo
        a_lo = np.array(sphere.latlng_to_xyz(a.lat.lo, a_lng), dtype=np.float64)
        a_hi = np.array(sphere.latlng_to_xyz(a.lat.hi, a_lng), dtype=np.float64)
        a_cross = np.array(sphere.latlng_to_xyz(0.0, a_lng - M_PI_2),
                           dtype=np.float64)
        b_lo = np.array(sphere.latlng_to_xyz(b.lat.lo, b_lng), dtype=np.float64)
        b_hi = np.array(sphere.latlng_to_xyz(b.lat.hi, b_lng), dtype=np.float64)
        b_cross = np.array(sphere.latlng_to_xyz(0.0, b_lng - M_PI_2),
                           dtype=np.float64)
        return float(min(
            edges.distance_point_to_edge(a_lo, b_lo, b_hi, a_cross_b=b_cross)[0],
            edges.distance_point_to_edge(a_hi, b_lo, b_hi, a_cross_b=b_cross)[0],
            edges.distance_point_to_edge(b_lo, a_lo, a_hi, a_cross_b=a_cross)[0],
            edges.distance_point_to_edge(b_hi, a_lo, a_hi, a_cross_b=a_cross)[0],
        ))

    # region protocol (Java spec)
    def get_cap_bound(self) -> Cap:
        if self.is_empty():
            return Cap.empty()
        # Either a cap around a pole, or a cap around the center point.
        if self.lat.lo + self.lat.hi < 0:
            pole_z, pole_angle = -1.0, M_PI_2 + self.lat.hi
        else:
            pole_z, pole_angle = 1.0, M_PI_2 - self.lat.lo
        pole_cap = Cap.from_axis_angle(
            np.array([0.0, 0.0, pole_z]), pole_angle)
        # The vertex-based mid cap is only valid when the lng span is <= pi
        # (reference: IEEEremainder(lngSpan, 2*pi) >= 0 guard); for wider
        # spans the 4 vertices do not bound the rect's lng extremes.  A
        # full-longitude rect (span == 2*pi) also passes the remainder test
        # (remainder(2*pi, 2*pi) == 0) yet its vertices collapse to one
        # meridian, so it must be excluded explicitly.
        if (not self.lng.is_full()
                and math.remainder(self.lng.get_length(), 2 * M_PI) >= 0):
            mid_x, mid_y, mid_z = sphere.latlng_to_xyz(
                self.lat.get_center(), self.lng.get_center())
            mid_cap = Cap(np.array([float(mid_x), float(mid_y), float(mid_z)]), 0.0)
            for k in range(4):
                mid_cap = mid_cap.add_point(self.get_vertex(k))
            if mid_cap.height < pole_cap.height:
                return mid_cap
        return pole_cap

    def get_rect_bound(self) -> "LatLngRect":
        return self

    def contains_cell(self, cell: Cell) -> bool:
        return self.contains_rect(cell.get_rect_bound())

    def may_intersect_cell(self, cell: Cell) -> bool:
        return self.intersects_rect(cell.get_rect_bound())
