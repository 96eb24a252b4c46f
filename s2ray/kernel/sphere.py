"""Vectorized spherical-geometry math kernel (numpy, no Ray).

Re-implements (from scratch, vectorized) the scalar math of the reference
library's ``S2``/``S2Point``/``S2LatLng``/``S1Angle`` classes:

- lat/lng (radians or degrees) <-> unit xyz direction vectors
  (reference: S2LatLng.php:138-143, S2LatLng.php:66-68)
- E5/E6/E7 fixed-point codecs (reference: S1Angle.php:43-59,152-172)
- vector algebra on (N,3) float64 arrays (reference: S2Point.php:18-152)
- orientation predicates simpleCCW/robustCCW with the exact-fallback chain
  (reference: S2.php:470-746)
- spherical triangle area / centroid (reference: S2.php:276-450)
- Metric: physical size <-> cell level (reference: S2.php:815-886)

All functions accept scalars or numpy arrays and are fully vectorized.
"""

from __future__ import annotations

import math

import numpy as np

# ---------------------------------------------------------------------------
# constants

M_PI = math.pi
M_1_PI = 1.0 / math.pi
M_PI_2 = math.pi / 2.0
M_PI_4 = math.pi / 4.0
M_SQRT2 = math.sqrt(2.0)
M_E = math.e

MAX_LEVEL = 30

# robustCCW determinant threshold: 1.6e-15 = 2*14*2**-54  (reference S2.php:499-506)
_CCW_DET_THRESHOLD = 1.6e-15


# ---------------------------------------------------------------------------
# lat/lng <-> xyz

def latlng_to_xyz(lat_rad, lng_rad):
    """(lat, lng) radians -> unit direction vectors, as (x, y, z) arrays.

    Reference: S2LatLng::toPoint (S2LatLng.php:138-143).
    """
    lat = np.asarray(lat_rad, dtype=np.float64)
    lng = np.asarray(lng_rad, dtype=np.float64)
    cosphi = np.cos(lat)
    return np.cos(lng) * cosphi, np.sin(lng) * cosphi, np.sin(lat)


def xyz_to_latlng(x, y, z):
    """Direction vectors -> (lat, lng) radians.

    Reference: S2LatLng(S2Point) ctor (S2LatLng.php:66-68):
    lat = atan2(z, sqrt(x^2+y^2)), lng = atan2(y, x).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    lat = np.arctan2(z, np.sqrt(x * x + y * y))
    lng = np.arctan2(y, x)
    return lat, lng


def degrees_to_radians(deg):
    return np.asarray(deg, dtype=np.float64) * (math.pi / 180.0)


def radians_to_degrees(rad):
    return np.asarray(rad, dtype=np.float64) * (180.0 / math.pi)


def e6_to_radians(e6):
    """E6 fixed-point -> radians (reference: S1Angle::e6/degrees, S1Angle.php:43-50)."""
    return degrees_to_radians(np.asarray(e6, dtype=np.float64) * 1e-6)


def e7_to_radians(e7):
    return degrees_to_radians(np.asarray(e7, dtype=np.float64) * 1e-7)


def e5_to_radians(e5):
    return degrees_to_radians(np.asarray(e5, dtype=np.float64) * 1e-5)


# ---------------------------------------------------------------------------
# (N,3) vector helpers.  Points are represented as numpy arrays of shape
# (..., 3); these mirror S2Point.php:18-152.

def dot(a, b):
    return np.einsum("...i,...i->...", a, b)


def cross(a, b):
    return np.cross(a, b)


def norm(a):
    return np.sqrt(dot(a, a))


def normalize(a):
    n = norm(a)
    n = np.where(n == 0.0, 1.0, n)
    return a / n[..., None]


def robust_cross_prod(a, b):
    """Numerically stable cross product for nearly (anti)parallel points.

    Reference semantics: S2.php (robustCrossProd): (b+a) x (b-a) == 2 (a x b)
    with better orthogonality guarantees; falls back to ortho(a) when the
    result is zero.
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    x = np.cross(a + b, b - a)
    # fall back for exactly-degenerate rows
    bad = np.einsum("...i,...i->...", x, x) == 0.0
    if np.any(bad):
        x = np.array(x, copy=True)
        if x.ndim == 1:
            return ortho(a)
        x[bad] = ortho(a[bad])
    return x


def ortho(a):
    """A unit vector orthogonal to a (reference: S2Point::ortho, S2Point.php:84-97)."""
    a = np.atleast_2d(np.asarray(a, dtype=np.float64))
    k = np.argmax(np.abs(a), axis=-1)
    k = (k + 1) % 3
    # reference perturbation vector (0.012, 0.0053, 0.00457) with the
    # chosen component forced to 1 — guarantees a non-degenerate cross
    # product even for inputs lying exactly on a coordinate plane
    temp = np.empty_like(a)
    temp[:, 0] = 0.012
    temp[:, 1] = 0.0053
    temp[:, 2] = 0.00457
    temp[np.arange(len(a)), k] = 1.0
    out = normalize(np.cross(a, temp))
    return out if out.shape[0] > 1 else out[0]


# ---------------------------------------------------------------------------
# orientation predicates (reference: S2.php:470-746)

def simple_ccw_det(a, b, c):
    """det = (c x a) . b  (reference: S2::simpleCCW, S2.php:470-488)."""
    return dot(np.cross(c, a), b)


def simple_ccw(a, b, c):
    return simple_ccw_det(a, b, c) > 0


def _planar_ccw_scalar(a, b):
    """+1 if edge AB is CCW around the 2D origin (S2::planarCCW,
    S2.php:667-691): reduce magnitude via a +/- b first (cancellation
    trick), then one stable 2D cross product."""
    sab = -1 if a[0] * b[0] + a[1] * b[1] > 0 else 1
    vab = (a[0] + sab * b[0], a[1] + sab * b[1])
    da = a[0] * a[0] + a[1] * a[1]
    db = b[0] * b[0] + b[1] * b[1]
    if da < db or (da == db and _lex_less(a, b)):
        sign = (a[0] * vab[1] - a[1] * vab[0]) * sab
    else:
        sign = vab[0] * b[1] - vab[1] * b[0]
    if sign > 0:
        return 1
    if sign < 0:
        return -1
    return 0


def _lex_less(a, b):
    # S2Point::lessThan semantics (S2Point.php:120-136)
    for i in range(len(a)):
        if a[i] < b[i]:
            return True
        if b[i] < a[i]:
            return False
    return False


def _planar_ordered_ccw_scalar(a, b, c):
    """Sign of the sum of the three pairwise planarCCW values
    (S2::planarOrderedCCW, S2.php:693-710)."""
    sum_ = (_planar_ccw_scalar(a, b) + _planar_ccw_scalar(b, c)
            + _planar_ccw_scalar(c, a))
    if sum_ > 0:
        return 1
    if sum_ < 0:
        return -1
    return 0


def _expensive_ccw_scalar(a, b, c):
    """Exact fallback for robustCCW (reference: S2::expensiveCCW,
    S2.php:566-665), mirrored structurally:

    1. zero iff two points are identical;
    2. stable determinant via difference vectors (a +/- b, chosen to reduce
       magnitude) with the vertex opposite the longest edge as origin;
    3. symbolic perturbation: planarOrderedCCW on the YZ, then ZX, then XY
       projections.
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    if np.array_equal(a, b) or np.array_equal(b, c) or np.array_equal(c, a):
        return 0
    sab = -1 if float(np.dot(a, b)) > 0 else 1
    sbc = -1 if float(np.dot(b, c)) > 0 else 1
    sca = -1 if float(np.dot(c, a)) > 0 else 1
    vab = a + sab * b
    vbc = b + sbc * c
    vca = c + sca * a
    dab = float(np.dot(vab, vab))
    dbc = float(np.dot(vbc, vbc))
    dca = float(np.dot(vca, vca))
    if dca < dbc or (dca == dbc and _lex_less(a, b)):
        if dab < dbc or (dab == dbc and _lex_less(a, c)):
            sign = float(np.dot(np.cross(vab, vca), a)) * sab  # BC longest
        else:
            sign = float(np.dot(np.cross(vca, vbc), c)) * sca  # AB longest
    elif dab < dca or (dab == dca and _lex_less(b, c)):
        sign = float(np.dot(np.cross(vbc, vab), b)) * sbc      # CA longest
    else:
        sign = float(np.dot(np.cross(vca, vbc), c)) * sca      # AB longest
    if sign > 0:
        return 1
    if sign < 0:
        return -1
    # Exactly-degenerate points: symbolic perturbation.  DELIBERATE
    # DEVIATION from the reference's YZ/ZX/XY planarOrderedCCW chain: the
    # engine's vectorized parity-scan PIP (pip.py) breaks ties with the
    # convention below (canonical sort + projected orientation), and both
    # conventions are antisymmetric/cyclic-consistent — what matters is that
    # every consumer uses the same one.
    return _symbolic_ccw_scalar(a, b, c)


def _symbolic_ccw_scalar(a, b, c):
    """Deterministic orientation for exactly-coplanar-with-origin triples:
    canonical cyclic order by lexicographic sort (sign-flipping per swap),
    projection onto the dominant axis of a x b, planar orientation with the
    engine's perturbation rule, compensated-determinant last resort."""
    perm_sign = 1
    pa, pb, pc = a, b, c
    if _lex_less(pc, pb):
        pb, pc = pc, pb
        perm_sign = -perm_sign
    if _lex_less(pb, pa):
        pa, pb = pb, pa
        perm_sign = -perm_sign
    if _lex_less(pc, pb):
        pb, pc = pc, pb
        perm_sign = -perm_sign
    axb = np.cross(pa, pb)
    k = int(np.argmax(np.abs(axb)))
    i, j = (k + 1) % 3, (k + 2) % 3
    if axb[k] < 0:
        i, j = j, i
    a2 = (pa[i], pa[j])
    b2 = (pb[i], pb[j])
    c2 = (pc[i], pc[j])
    ccw = _legacy_planar_ordered_ccw(a2, b2, c2)
    if ccw == 0:
        det = _det_exact(pa, pb, pc)
        ccw = 1 if det > 0 else (-1 if det < 0 else 1)
    return ccw * perm_sign


def _legacy_planar_ccw(a, b):
    """Engine-convention planar orientation (round-1 semantics; the
    perturbation tie-breaks differ from reference planarCCW)."""
    sab = 1 if a[0] * b[0] + a[1] * b[1] > 0 else -1
    vab = (a[0] + sab * b[0], a[1] + sab * b[1])
    da = a[0] * a[0] + a[1] * a[1]
    db = b[0] * b[0] + b[1] * b[1]
    if da < db or (da == db and _lex_less(a, b)):
        outer = vab[0] * b[1] - vab[1] * b[0]
    else:
        outer = a[0] * vab[1] - a[1] * vab[0]
    if outer > 0:
        return 1
    if outer < 0:
        return -1
    return 0


def _legacy_planar_ordered_ccw(a, b, c):
    sum_ = 0
    if b[0] >= 0 and c[0] < 0:
        sum_ += 1
    if c[0] >= 0 and a[0] < 0:
        sum_ += 1
    if a[0] >= 0 and b[0] < 0:
        sum_ += 1
    if sum_ % 2 != 0:
        return 1 if sum_ == 1 else -1
    ab = _legacy_planar_ccw(a, b)
    bc = _legacy_planar_ccw(b, c)
    ca = _legacy_planar_ccw(c, a)
    if ab > 0 or bc > 0 or ca > 0:
        return 1
    if ab < 0 or bc < 0 or ca < 0:
        return -1
    return 0


def _det_exact(a, b, c):
    """3x3 determinant via compensated summation of products."""
    terms = [
        a[0] * b[1] * c[2], -a[0] * b[2] * c[1],
        -a[1] * b[0] * c[2], a[1] * b[2] * c[0],
        a[2] * b[0] * c[1], -a[2] * b[1] * c[0],
    ]
    return math.fsum(terms)


def robust_ccw(a, b, c, a_cross_b=None):
    """Vectorized robustCCW: +1/-1/0 (reference: S2::robustCCW, S2.php:520-564).

    Fast path: determinant with the 1.6e-15 threshold; rows inside the
    threshold fall back to the scalar expensive path.
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    if a_cross_b is None:
        a_cross_b = np.cross(a, b)
    det = np.einsum("...i,...i->...", a_cross_b, c)
    scalar_in = det.ndim == 0
    det = np.atleast_1d(det)
    out = np.where(det > _CCW_DET_THRESHOLD, 1, np.where(det < -_CCW_DET_THRESHOLD, -1, 0))
    near = out == 0
    if np.any(near):
        aa = np.broadcast_to(a, det.shape + (3,))
        bb = np.broadcast_to(b, det.shape + (3,))
        cc = np.broadcast_to(c, det.shape + (3,))
        idx = np.nonzero(near)[0]
        for t in idx:
            out[t] = _expensive_ccw_scalar(aa[t], bb[t], cc[t])
    return int(out[0]) if scalar_in else out


def ordered_ccw(a, b, c, o):
    """True if edges OA, OB, OC are in CCW order (reference: S2::orderedCCW, S2.php:745-758)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    o = np.asarray(o, dtype=np.float64)
    sum_ = np.zeros(np.broadcast(a[..., 0], b[..., 0], c[..., 0], o[..., 0]).shape, dtype=np.int64)
    sum_ = sum_ + (robust_ccw(b, o, a) >= 0)
    sum_ = sum_ + (robust_ccw(c, o, b) >= 0)
    sum_ = sum_ + (robust_ccw(a, o, c) > 0)
    return sum_ >= 2


# ---------------------------------------------------------------------------
# angles / distance

def angle_between(a, b):
    """Angle in radians between unit vectors (reference: S2Point::angle -> atan2(|axb|, a.b))."""
    c = np.cross(a, b)
    return np.arctan2(norm(c), dot(a, b))


def haversine_distance_m(lat1, lng1, lat2, lng2, radius_m=6371000.0):
    """Great-circle distance in meters, exact op order of the reference smoke
    test (tests/SmokeTest.php:12-21): hav = (1-cos(d))/2; 2R asin(sqrt(...))."""
    lat1 = np.asarray(lat1, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    lng1 = np.asarray(lng1, dtype=np.float64)
    lng2 = np.asarray(lng2, dtype=np.float64)
    hav_lat = (1.0 - np.cos(lat1 - lat2)) / 2.0
    hav_lng = (1.0 - np.cos(lng1 - lng2)) / 2.0
    angle = hav_lat + np.cos(lat1) * np.cos(lat2) * hav_lng
    return 2.0 * radius_m * np.arcsin(np.sqrt(angle))


def great_circle_bearing(lat1, lng1, lat2, lng2):
    """Initial bearing (radians) — reference SmokeTest.php:23-30."""
    cos_latb = np.cos(lat2)
    dlon = lng2 - lng1
    y = np.sin(dlon) * cos_latb
    x = np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * cos_latb * np.cos(dlon)
    return np.arctan2(y, x)


def great_circle_destination(lat1, lng1, bearing, distance_m, radius_m=6371000.0):
    """Destination point — reference SmokeTest.php:32-47."""
    cos_d = np.cos(distance_m / radius_m)
    sin_d = np.sin(distance_m / radius_m)
    sin_lat = np.sin(lat1)
    cos_lat = np.cos(lat1)
    lat = np.arcsin(sin_lat * cos_d + cos_lat * sin_d * np.cos(bearing))
    lng = lng1 + np.arctan2(np.sin(bearing) * sin_d * cos_lat, cos_d - sin_lat * np.sin(lat))
    return lat, lng


# ---------------------------------------------------------------------------
# area / centroid (reference: S2.php:276-450)

def triangle_area(a, b, c):
    """Area of spherical triangle ABC (l'Huilier; Girard fallback for big
    triangles) — reference S2::area (S2.php:276-331)."""
    sa = angle_between(b, c)
    sb = angle_between(c, a)
    sc = angle_between(a, b)
    s = 0.5 * (sa + sb + sc)
    big = s >= 3e-4
    # l'Huilier
    s2 = 0.5 * s
    dmin = s - np.maximum(sa, np.maximum(sb, sc))
    with np.errstate(invalid="ignore"):
        lh = 4.0 * np.arctan(np.sqrt(np.maximum(
            0.0,
            np.tan(s2) * np.tan(s2 - 0.5 * sa) * np.tan(s2 - 0.5 * sb) * np.tan(s2 - 0.5 * sc),
        )))
    out = np.asarray(lh, dtype=np.float64)
    # Girard for spherically-large SKINNY triangles (dmin < 1e-2*s^5),
    # where l'Huilier's tan(s-s_i) term suffers total cancellation; keep
    # Girard only if it agrees the triangle is skinny (dmin < 0.1*s*area).
    consider = big & (dmin < 1e-2 * s * s * s * s * s)
    if np.any(consider):
        area_g = np.asarray(girard_area(a, b, c), dtype=np.float64)
        cond = np.broadcast_to(consider & (dmin < s * (0.1 * area_g)),
                               out.shape)
        out = np.where(cond, np.broadcast_to(area_g, out.shape), out)
    return out


def girard_area(a, b, c):
    """Girard's formula (reference S2::girardArea, S2.php:336-352)."""
    ab = robust_cross_prod(a, b)
    bc = robust_cross_prod(b, c)
    ac = robust_cross_prod(np.asarray(a, dtype=np.float64), np.asarray(c, dtype=np.float64))
    area = (_vec_angle(ab, ac) - _vec_angle(ab, bc) + _vec_angle(bc, ac))
    return np.maximum(0.0, area)


def _vec_angle(a, b):
    return np.arctan2(norm(np.cross(a, b)), dot(a, b))


def signed_area(a, b, c):
    """Positive if CCW (reference S2::signedArea, S2.php:357-367)."""
    return triangle_area(a, b, c) * robust_ccw(a, b, c)


def planar_centroid(a, b, c):
    return (np.asarray(a) + np.asarray(b) + np.asarray(c)) / 3.0


def true_centroid(a, b, c):
    """Area-weighted true centroid of a spherical triangle (S2.php:425-450)."""
    sina = norm(np.cross(b, c))
    sinb = norm(np.cross(c, a))
    sinc = norm(np.cross(a, b))
    ra = np.where(sina == 0, 1.0, angle_between(b, c) / np.where(sina == 0, 1.0, sina))
    rb = np.where(sinb == 0, 1.0, angle_between(c, a) / np.where(sinb == 0, 1.0, sinb))
    rc = np.where(sinc == 0, 1.0, angle_between(a, b) / np.where(sinc == 0, 1.0, sinc))
    # Follow the reference formula componentwise:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    out = np.empty(np.broadcast(a, b, c).shape, dtype=np.float64)
    for k in range(3):
        i, j = (k + 1) % 3, (k + 2) % 3
        out[..., k] = 0.5 * (
            (a[..., i] * b[..., j] - a[..., j] * b[..., i]) * rc
            + (b[..., i] * c[..., j] - b[..., j] * c[..., i]) * ra
            + (c[..., i] * a[..., j] - c[..., j] * a[..., i]) * rb
        )
    return out


# ---------------------------------------------------------------------------
# Metric: physical size <-> level (reference: S2.php:815-886 + S2Projections)

class Metric:
    """Maps between physical angular sizes and cell levels.

    deriv values are for the quadratic projection (S2Projections.php comments).
    """

    def __init__(self, dim: int, deriv: float):
        self.dim = dim
        self.deriv = deriv

    def get_value(self, level: int) -> float:
        """Java-convention scalb(deriv, dim * (1 - level)) — st spans [-1,1],
        so a level-0 cell is 2 st-units wide."""
        return math.ldexp(self.deriv, self.dim * (1 - level))

    def get_closest_level(self, value: float) -> int:
        """Reference: Metric::getClosestLevel (S2.php:836-841)."""
        return self.get_min_level(math.sqrt(2) * value)

    def get_min_level(self, value: float) -> int:
        """Minimum level such that the metric is at most value (S2.php:843-866).

        Uses the IEEE-exponent trick of S2::exp (S2.php:40-48):
        exp(v) == math.frexp(v)[1].
        """
        if value <= 0:
            return MAX_LEVEL
        _, x = math.frexp(value / ((1 << self.dim) * self.deriv))
        return max(0, min(MAX_LEVEL, -((x - 1) >> (self.dim - 1))))

    def get_max_level(self, value: float) -> int:
        """Maximum level such that the metric is at least value (S2.php:868-886)."""
        if value <= 0:
            return MAX_LEVEL
        _, x = math.frexp(((1 << self.dim) * self.deriv) / value)
        return max(0, min(MAX_LEVEL, (x - 1) >> (self.dim - 1)))


# Quadratic-projection metric constants (reference: S2Projections.php:17-139
# commented spec block; values are the S2_QUADRATIC_PROJECTION branch).
MIN_AREA = Metric(2, 2 * M_SQRT2 / 9)               # 0.314
MAX_AREA = Metric(2, 0.65894981424079037)           # 0.659
AVG_AREA = Metric(2, M_PI / 6)                      # 0.524
MIN_ANGLE_SPAN = Metric(1, 2.0 / 3)                 # 0.667
MAX_ANGLE_SPAN = Metric(1, 0.85244858959960922)     # 0.852
AVG_ANGLE_SPAN = Metric(1, M_PI_4)                  # 0.785
MIN_WIDTH = Metric(1, M_SQRT2 / 3)                  # 0.471 (S2Projections.php:75-81, live)
MAX_WIDTH = Metric(1, 0.85244858959960922)          # == MAX_ANGLE_SPAN
AVG_WIDTH = Metric(1, 0.71726183644304969)          # 0.717
MIN_EDGE = Metric(1, M_SQRT2 / 3)                   # 0.471
MAX_EDGE = Metric(1, 0.85244858959960922)           # == MAX_ANGLE_SPAN
AVG_EDGE = Metric(1, 0.72960687319305303)           # 0.730
MIN_DIAG = Metric(1, 4 * M_SQRT2 / 9)               # 0.629
MAX_DIAG = Metric(1, 1.2193272972170106)            # 1.219
AVG_DIAG = Metric(1, 1.03021136949923584)           # 1.030


def approx_equals(a, b, max_error=1e-15):
    return np.abs(np.asarray(a) - np.asarray(b)) <= max_error


# ---------------------------------------------------------------------------
# E6 hex location codec (reference: tests/SmokeTest.php:49-60
# encodeLocation / decodeLocation — sprintf("%08x,%08x") of the truncated
# microdegree ints; PHP's 64-bit sprintf renders a negative int as its
# 16-char two's complement, which DuckDB's printf('%08x', BIGINT) mirrors
# exactly, so the codec is SQL-oracle-able end to end).

_HEX_DIGITS = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
_HEX_LUT = np.zeros(256, dtype=np.uint8)
for _i, _c in enumerate(b"0123456789abcdef"):
    _HEX_LUT[_c] = _i
for _i, _c in enumerate(b"ABCDEF"):
    _HEX_LUT[_c] = 10 + _i


def hex08(v: np.ndarray) -> np.ndarray:
    """Vectorized PHP ``sprintf('%08x', int64)``: 8 zero-padded hex chars
    for values in [0, 2^32), the full 16-char two's complement otherwise
    (negatives).  Returns an object array of str."""
    u = np.asarray(v, dtype=np.int64).astype(np.uint64)
    n = len(u)
    nib = np.empty((n, 16), dtype=np.uint8)
    for k in range(16):
        nib[:, k] = (u >> np.uint64(60 - 4 * k)).astype(np.uint8) & np.uint8(0xF)
    chars = _HEX_DIGITS[nib]
    wide = chars.view("S16").ravel().astype("U16").astype(object)
    narrow = np.ascontiguousarray(chars[:, 8:]).view("S8").ravel() \
        .astype("U8").astype(object)
    return np.where(u < np.uint64(1 << 32), narrow, wide)


def unhex64(strs) -> np.ndarray:
    """Vectorized PHP ``hexdec`` for 1..16-char hex strings, reinterpreted
    as int64 (two's complement — the lossless 64-bit inverse of
    :func:`hex08`; PHP's own hexdec would overflow to float there)."""
    a = np.asarray(strs, dtype="U16")
    # left-pad to 16 with '0' without per-row python: route through S16
    # (right-NUL-padded), then roll each row right by its pad width via a
    # gather on precomputed roll indices
    b = a.astype("S16").view(np.uint8).reshape(-1, 16)
    width = np.count_nonzero(b, axis=1)
    col = np.arange(16, dtype=np.int64)
    src = col[None, :] - (16 - width)[:, None]          # source col, <0 = pad
    gathered = np.where(src >= 0,
                        np.take_along_axis(b, np.maximum(src, 0), axis=1),
                        np.uint8(ord("0")))
    vals = _HEX_LUT[gathered].astype(np.uint64)
    out = np.zeros(len(a), dtype=np.uint64)
    for k in range(16):
        out = (out << np.uint64(4)) | vals[:, k]
    return out.astype(np.int64)


def encode_location_e6(lat_deg: np.ndarray, lng_deg: np.ndarray) -> np.ndarray:
    """Reference encodeLocation (SmokeTest.php:49-54): ``'%08x,%08x'`` of
    the toward-zero-truncated microdegrees."""
    lat_e6 = np.trunc(np.asarray(lat_deg, dtype=np.float64) * 1e6) \
        .astype(np.int64)
    lng_e6 = np.trunc(np.asarray(lng_deg, dtype=np.float64) * 1e6) \
        .astype(np.int64)
    la, lo = hex08(lat_e6), hex08(lng_e6)
    return np.array([f"{a},{b}" for a, b in zip(la, lo)], dtype=object)


def decode_location_e6(locs) -> tuple[np.ndarray, np.ndarray]:
    """Reference decodeLocation (SmokeTest.php:56-60): split at ',' and
    hexdec both halves; returns (lat_e6, lng_e6) int64 microdegrees (the
    reference divides by 1e6 into degrees; we keep the exact ints)."""
    locs = np.asarray(locs, dtype=object)
    la = np.empty(len(locs), dtype=object)
    lo = np.empty(len(locs), dtype=object)
    for i, s in enumerate(locs):
        a, _, b = s.partition(",")
        la[i], lo[i] = a, b
    return unhex64(la), unhex64(lo)
