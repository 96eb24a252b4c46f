"""SQL (DuckDB) generators that mirror engine semantics for oracle checks.

The driver runs ``oracle_sql()`` strings in its own DuckDB session (no UDFs
available), so every oracle must be pure ANSI-ish SQL.  This module emits a
*scalar, from-first-principles* re-implementation of the S2 point->cell-id
chain (reference: S2CellId.php:99-106 fromPoint, S2Projections.php:155-271,
S2CellId.php:650-698 fromFaceIJ) as nested SQL subselects, so the flagship
tile aggregation can be verified end-to-end against an encoder that shares
no code with the numpy kernel (s2ray/kernel/cellid.py).

The Hilbert traversal here is the textbook bit-pair recurrence (orientation
carried MSB-first, 2 bits per level) — deliberately NOT the 4-bit lookup
tables the engine uses, so a table-construction bug cannot cancel out.

Each stage is its own nested SELECT (not lateral alias chaining): DuckDB
inlines alias references textually, which makes a chained recurrence
exponentially large.
"""

from __future__ import annotations

# Hilbert sub-cell order: position -> (i,j) per orientation, and the
# orientation change per position.  These 20 numbers are the S2/Hilbert
# curve definition itself (reference: S2.php:109-140).
# IJ_TO_POS[orientation][ij] with ij = 2*i_bit + j_bit.
_IJ_TO_POS = [
    [0, 1, 3, 2],  # canonical
    [0, 3, 1, 2],  # swap
    [2, 3, 1, 0],  # invert
    [2, 1, 3, 0],  # swap+invert
]
_POS_TO_ORIENTATION = [1, 0, 0, 3]  # SWAP, none, none, INVERT+SWAP

_MAX_SIZE_HALF = 536870912          # 2^29
_MAX_IJ = 1073741823                # 2^30 - 1
_POW2_61 = 2305843009213693952


def _step_case(o: str, ij2: str) -> str:
    """One Hilbert step as a single 16-branch CASE returning the packed
    value pos*4 + new_orientation (so each level is ONE nested SELECT with a
    constant column count — deep nesting with growing SELECT * blows up the
    DuckDB planner)."""
    rows = []
    for orient in range(4):
        for ij in range(4):
            pos = _IJ_TO_POS[orient][ij]
            packed = pos * 4 + (orient ^ _POS_TO_ORIENTATION[pos])
            rows.append(f"WHEN {o} = {orient} AND {ij2} = {ij} THEN {packed}")
    return "CASE " + " ".join(rows) + " END"


def s2_cell_select(inner_sql: str, level: int = 8, lat: str = "lat",
                   lng: str = "lng", token_col: str = "cell_token",
                   id_col: str | None = "cell_id") -> str:
    """Wrap ``inner_sql`` (a relation with lat/lng degree columns) in nested
    SELECTs appending the level-``level`` S2 cell columns.

    Emits ``token_col`` (lowercase hex, trailing zeros stripped) and, when
    ``id_col`` is set, the uint64 cell id.  The intermediate ``_``-prefixed
    working columns are stripped in the final projection only if the caller
    selects explicit columns afterwards; use :func:`s2_cell_query` for a
    clean projection.
    """
    assert 1 <= level <= 30
    q = f"SELECT *, radians({lat}) AS _phi, radians({lng}) AS _theta " \
        f"FROM ({inner_sql})"
    q = ("SELECT *, cos(_phi) * cos(_theta) AS _x, "
         "cos(_phi) * sin(_theta) AS _y, sin(_phi) AS _z "
         f"FROM ({q})")
    # face = largestAbsComponent, +3 when that component is negative
    # (S2Projections.php:265-271)
    q = ("SELECT *, CASE WHEN abs(_x) > abs(_y) THEN "
         "(CASE WHEN abs(_x) > abs(_z) THEN 0 ELSE 2 END) ELSE "
         "(CASE WHEN abs(_y) > abs(_z) THEN 1 ELSE 2 END) END AS _f0 "
         f"FROM ({q})")
    q = ("SELECT *, CASE WHEN "
         "(CASE _f0 WHEN 0 THEN _x WHEN 1 THEN _y ELSE _z END) < 0 "
         f"THEN _f0 + 3 ELSE _f0 END AS _face FROM ({q})")
    # validFaceXyzToUv (S2Projections.php:229-263)
    q = ("SELECT *, "
         "CASE _face WHEN 0 THEN _y/_x WHEN 1 THEN -_x/_y "
         "WHEN 2 THEN -_x/_z WHEN 3 THEN _z/_x WHEN 4 THEN _z/_y "
         "ELSE -_y/_z END AS _u, "
         "CASE _face WHEN 0 THEN _z/_x WHEN 1 THEN _z/_y "
         "WHEN 2 THEN -_y/_z WHEN 3 THEN _y/_x WHEN 4 THEN -_x/_y "
         "ELSE -_x/_z END AS _v "
         f"FROM ({q})")
    # inverse quadratic projection uv->st (S2Projections.php:184-201)
    q = ("SELECT *, "
         "CASE WHEN _u >= 0 THEN sqrt(1 + 3*_u) - 1 "
         "ELSE 1 - sqrt(1 - 3*_u) END AS _s, "
         "CASE WHEN _v >= 0 THEN sqrt(1 + 3*_v) - 1 "
         "ELSE 1 - sqrt(1 - 3*_v) END AS _t "
         f"FROM ({q})")
    # stToIJ with PHP round() = half-away-from-zero (S2CellId.php:811-819);
    # identical float op order to kernel/cellid.py st_to_ij.
    m = float(_MAX_SIZE_HALF)
    q = (f"SELECT *, "
         f"CAST(least(greatest(floor({m!r} * _s + {m - 0.5!r} + 0.5), 0), "
         f"{_MAX_IJ}) AS BIGINT) AS _i, "
         f"CAST(least(greatest(floor({m!r} * _t + {m - 0.5!r} + 0.5), 0), "
         f"{_MAX_IJ}) AS BIGINT) AS _j "
         f"FROM ({q})")
    # Hilbert MSB-first bit-pair recurrence, one nested SELECT per level;
    # each level carries a CONSTANT set of working columns (_i, _j, _o,
    # accumulated _pos) via EXCLUDE, keeping the planner cost linear.
    # NB: DuckDB resolves a name to the FROM column when one exists, and to
    # a same-SELECT lateral alias otherwise — hence the alternating _hsA/_hsB
    # names so each level's packed step value binds to the NEW alias while
    # _o/_pos bind to the previous level's columns.
    q = (f"SELECT *, _face & 1 AS _o, CAST(0 AS BIGINT) AS _pos, 0 AS _hsB "
         f"FROM ({q})")
    for k in range(1, level + 1):
        cur, prev = ("_hsA", "_hsB") if k % 2 else ("_hsB", "_hsA")
        shift = 30 - k
        ij2 = f"(((_i >> {shift}) & 1) * 2 + ((_j >> {shift}) & 1))"
        step = _step_case("_o", ij2)
        q = (f"SELECT * EXCLUDE (_o, _pos, {prev}), {step} AS {cur}, "
             f"_pos * 4 + ({cur} >> 2) AS _pos, {cur} & 3 AS _o "
             f"FROM ({q})")
    # id = face<<61 | pos<<(2*(30-level)+1) | 1<<(2*(30-level));
    # token = 16-digit hex with trailing zeros stripped.  When the lsb shift
    # is a multiple of 4 the token is exactly the zero-padded hex of the top
    # bits as a plain BIGINT (face<<(2*level+1) | pos<<1 | 1 — always odd).
    lsb_shift = 2 * (30 - level)
    outs = []
    if lsb_shift % 4 == 0 and lsb_shift > 0:
        ndigits = (64 - lsb_shift) // 4
        outs.append(f"printf('%0{ndigits}x', _face * {1 << (2 * level + 1)}"
                    f" + _pos * 2 + 1) AS {token_col}")
    else:
        outs.append(f"rtrim(lower(lpad(to_hex(CAST(CAST(_face AS HUGEINT) * "
                    f"{_POW2_61} + CAST(_pos AS HUGEINT) * "
                    f"{1 << (lsb_shift + 1)} + {1 << lsb_shift} AS UBIGINT))"
                    f", 16, '0')), '0') AS {token_col}")
    if id_col:
        outs.append(f"CAST(CAST(_face AS HUGEINT) * {_POW2_61} + "
                    f"CAST(_pos AS HUGEINT) * {1 << (lsb_shift + 1)} + "
                    f"{1 << lsb_shift} AS UBIGINT) AS {id_col}")
    return f"SELECT *, {', '.join(outs)} FROM ({q})"


def dlit(x) -> str:
    """Float literal that PARSES AS DOUBLE: bare decimal literals become
    DECIMAL in DuckDB and chained multiplications overflow its 38-digit
    scale; an exponent suffix forces DOUBLE."""
    s = repr(float(x))
    return s if ("e" in s or "inf" in s or "nan" in s) else s + "e0"


def lsh_signature_expr(planes, emb_expr: str = "CAST(embedding AS DOUBLE[])"
                       ) -> str:
    """Integer LSH bucket id: bit b set iff dot(embedding, plane_b) > 0 —
    mirrors ann.lsh_signature (sign bits are scale-invariant, so the raw
    embedding gives the same bits as the normalized one).  Plane rows are
    inlined as DOUBLE list literals (deterministic seeded constants)."""
    terms = []
    for b, plane in enumerate(planes):
        vec = "[" + ", ".join(dlit(x) for x in plane) + "]"
        terms.append(f"(CASE WHEN list_dot_product({emb_expr}, {vec}) > 0 "
                     f"THEN {1 << b} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


M61 = 2305843009213693951  # 2^61 - 1: the sketch-hash field modulus


def token_hash_sql(tok_expr: str) -> str:
    """DuckDB expression mirroring dedup._poly_token_hash_array for one
    token string: dual 31-bit polynomial fold over codepoints, packed and
    reduced mod 2^61-1.  All intermediates fit BIGINT."""
    from ..pipelines.text import FP_MOD, FP_MUL1, FP_MUL2

    def fold(mul):
        return (f"list_reduce(list_transform(regexp_split_to_array("
                f"{tok_expr}, ''), c -> CAST(unicode(c) AS BIGINT)), "
                f"(a, b) -> (a * {mul} + b) % {FP_MOD})")

    return (f"(({fold(FP_MUL1)} * 2147483648 + {fold(FP_MUL2)}) % {M61})")


def polygon_relations_select(regions: dict) -> str:
    """One row per ordered polygon pair with its relation
    (contains / intersects / disjoint), derived from FIRST PRINCIPLES in
    SQL rather than the engine's loop-relation code paths:

    - proper edge crossing: S2's four-determinant rule — edges (a,b) and
      (c,d) cross iff det[a,c,b], det[b,d,a], det[c,b,d], det[d,a,c] all
      share one sign (robustCrossing, S2EdgeUtil.php:96-140, without the
      shared-vertex cases — the inputs are in general position);
    - membership: XOR over loops of the spherical crossing-parity PIP
      (spatial_join.loop_pip_sql) evaluated at the other polygon's
      vertices;
    - relation: contains = no crossing and every B vertex inside A;
      intersects = any crossing or any vertex of either inside the other.

    Vertex coordinates are inlined as literals (query-geometry constants);
    all arithmetic happens in DuckDB.
    """
    import math

    from ..pipelines.spatial_join import loop_pip_sql

    def edges_of(poly):
        out = []
        for lp in poly.loops:
            v = lp.vertices
            for k in range(len(v)):
                out.append((v[k], v[(k + 1) % len(v)]))
        return out

    def verts_of(poly):
        out = []
        for lp in poly.loops:
            out.extend(list(lp.vertices))
        return out

    names = sorted(regions)
    # ---- edge-pair table: one VALUES row per (ordered pair, edge of A,
    # edge of B); the four determinants are written ONCE over columns
    ep_rows = []
    for an in names:
        for bn in names:
            if an == bn:
                continue
            for a, b in edges_of(regions[an]):
                for c, d in edges_of(regions[bn]):
                    coords = ", ".join(dlit(x) for v in (a, b, c, d)
                                       for x in v)
                    ep_rows.append(f"('{an}', '{bn}', {coords})")

    def det(p, q, r):
        return (f"({p}x*({q}y*{r}z - {q}z*{r}y) - "
                f"{p}y*({q}x*{r}z - {q}z*{r}x) + "
                f"{p}z*({q}x*{r}y - {q}y*{r}x))")

    d1, d2, d3 = det("a", "c", "b"), det("b", "d", "a"), det("c", "b", "d")
    d4 = det("d", "a", "c")
    cross_cond = (f"(({d1} > 0 AND {d2} > 0 AND {d3} > 0 AND {d4} > 0) OR "
                  f"({d1} < 0 AND {d2} < 0 AND {d3} < 0 AND {d4} < 0))")
    epairs = ("epairs(a, b, ax, ay, az, bx, by, bz, cx, cy, cz, "
              "dx, dy, dz) AS (VALUES " + ", ".join(ep_rows) + ")")
    crossing = ("crossing AS (SELECT a, b, bool_or(" + cross_cond +
                ") AS crossed FROM epairs GROUP BY a, b)")
    # ---- vertex-membership tables: per TARGET polygon one VALUES list of
    # (pair a, pair b, side, lat, lng) + one XOR-parity pip expression
    member_selects = []
    for tname in names:
        target = regions[tname]
        rows = []
        for other in names:
            if other == tname:
                continue
            for v in verts_of(regions[other]):
                lat = math.asin(max(-1.0, min(1.0, float(v[2]))))
                lng = math.atan2(float(v[1]), float(v[0]))
                # side b_in_a: target is A of pair (target, other);
                # side a_in_b: target is B of pair (other, target)
                rows.append(f"('{tname}', '{other}', 'b_in_a', "
                            f"{dlit(lat)}, {dlit(lng)})")
                rows.append(f"('{other}', '{tname}', 'a_in_b', "
                            f"{dlit(lat)}, {dlit(lng)})")
        pip = [f"({loop_pip_sql(lp, lat_expr='vlat', lng_expr='vlng')})"
               for lp in target.loops]
        pip_expr = "(" + " <> ".join(pip) + ")" if len(pip) > 1 else pip[0]
        member_selects.append(
            f"SELECT a, b, side, {pip_expr} AS inside FROM (VALUES "
            + ", ".join(rows) + ") AS t(a, b, side, vlat, vlng)")
    members = ("members AS (SELECT a, b, "
               "bool_and(inside) FILTER (side = 'b_in_a') AS b_all, "
               "bool_or(inside) FILTER (side = 'b_in_a') AS b_any, "
               "bool_or(inside) FILTER (side = 'a_in_b') AS a_any "
               "FROM (" + " UNION ALL ".join(member_selects) +
               ") GROUP BY a, b)")
    return (f"WITH {epairs}, {crossing}, {members} "
            "SELECT c.a AS a, c.b AS b, "
            "CASE WHEN NOT c.crossed AND m.b_all THEN 'contains' "
            "WHEN c.crossed OR m.b_any OR m.a_any THEN 'intersects' "
            "ELSE 'disjoint' END AS relation "
            "FROM crossing c JOIN members m ON c.a = m.a AND c.b = m.b")


def polyline_distance_select(inner_sql: str, polyline, lat: str = "lat",
                             lng: str = "lng", radius_m: float = 6371000.0,
                             dist_col: str = "dist_m") -> str:
    """Wrap ``inner_sql`` in SELECTs appending the min spherical distance
    (meters) from each (lat, lng) row to ``polyline``.

    Mirrors edges.distance_point_to_edge (reference S2EdgeUtil::getDistance,
    S2EdgeUtil.php:281-309) per segment with identical float op order:
    wedge test via two simpleCCW determinants, great-circle arcsin inside
    the wedge, chord->angle endpoint distance outside.  Segment endpoint /
    cross-product constants are inlined (they are query-geometry constants,
    like the pip_join plane coefficients).
    """
    import numpy as np

    q = (f"SELECT *, cos(radians({lat})) * cos(radians({lng})) AS _px, "
         f"cos(radians({lat})) * sin(radians({lng})) AS _py, "
         f"sin(radians({lat})) AS _pz FROM ({inner_sql})")
    v = polyline.vertices
    dist_cols = []
    for k in range(len(v) - 1):
        cp = np.asarray(polyline._seg_cross[k], dtype=np.float64)
        expr = edge_distance_expr(v[k], v[k + 1], cp)
        q = f"SELECT *, {expr} AS _seg{k} FROM ({q})"
        dist_cols.append(f"_seg{k}")
    return (f"SELECT *, least({', '.join(dist_cols)}) * {radius_m!r} "
            f"AS {dist_col} FROM ({q})")


def edge_distance_expr(a, b, cp) -> str:
    """SQL CASE expression for the angle (radians) from the point columns
    (_px, _py, _pz) to the geodesic segment AB with precomputed cross CP —
    the bit-exact mirror of edges.distance_point_to_edge (reference
    S2EdgeUtil::getDistance, S2EdgeUtil.php:281-309) used by both the
    polyline- and rect-distance oracles."""
    import numpy as np

    ncp = float(np.linalg.norm(np.asarray(cp, dtype=np.float64)))
    ax, ay, az = (repr(float(t)) for t in a)
    bx, by, bz = (repr(float(t)) for t in b)
    cx, cy, cz = (repr(float(t)) for t in cp)
    # det(cp, a, x) = dot(cross(x, cp), a) > 0  AND
    # det(x, b, cp) = dot(cross(cp, x), b) > 0
    w1 = (f"((_py * {cz} - _pz * {cy}) * {ax} + "
          f"(_pz * {cx} - _px * {cz}) * {ay} + "
          f"(_px * {cy} - _py * {cx}) * {az})")
    w2 = (f"(({cy} * _pz - {cz} * _py) * {bx} + "
          f"({cz} * _px - {cx} * _pz) * {by} + "
          f"({cx} * _py - {cy} * _px) * {bz})")
    sin_dist = (f"abs(_px * {cx} + _py * {cy} + _pz * {cz}) / {ncp!r}")
    d_gc = f"asin(least(1.0, {sin_dist}))"
    da2 = (f"((_px - {ax}) * (_px - {ax}) + (_py - {ay}) * (_py - {ay})"
           f" + (_pz - {az}) * (_pz - {az}))")
    db2 = (f"((_px - {bx}) * (_px - {bx}) + (_py - {by}) * (_py - {by})"
           f" + (_pz - {bz}) * (_pz - {bz}))")
    d_end = f"2.0 * asin(least(1.0, 0.5 * sqrt(least({da2}, {db2}))))"
    return (f"CASE WHEN {w1} > 0 AND {w2} > 0 THEN {d_gc} "
            f"ELSE {d_end} END")


def rect_distance_select(inner_sql: str, rect, lat: str = "lat",
                         lng: str = "lng", radius_m: float = 6371000.0,
                         dist_col: str = "dist_m") -> str:
    """Wrap ``inner_sql`` in SELECTs appending the min spherical distance
    (meters) from each (lat, lng) row to the LatLngRect ``rect`` —
    branch-for-branch mirror of ``LatLngRect.get_distance_latlng``
    (region.py; reference S2LatLngRect::getDistance, S2LatLngRect.php:
    222-243): latitude clamp when the longitude falls inside the rect's
    lng interval, else point-to-edge distance to the nearer longitudinal
    boundary edge (selected by the hi-edge S1 interval)."""
    import math

    import numpy as np

    from ..kernel import sphere
    from ..kernel.interval import S1Interval

    m_pi_2 = math.pi / 2
    q = (f"SELECT *, radians({lat}) AS _plat, radians({lng}) AS _plng, "
         f"cos(radians({lat})) * cos(radians({lng})) AS _px, "
         f"cos(radians({lat})) * sin(radians({lng})) AS _py, "
         f"sin(radians({lat})) AS _pz FROM ({inner_sql})")
    lnglo, lnghi = float(rect.lng.lo), float(rect.lng.hi)
    latlo, lathi = float(rect.lat.lo), float(rect.lat.hi)
    if rect.lng.is_full():
        in_lng = "TRUE"
    elif rect.lng.is_inverted():
        in_lng = f"(_plng >= {lnglo!r} OR _plng <= {lnghi!r})"
    else:
        in_lng = f"(_plng >= {lnglo!r} AND _plng <= {lnghi!r})"
    clamp = f"greatest(0.0, greatest(_plat - {lathi!r}, {latlo!r} - _plat))"
    comp_center = (0.0 if lnglo == lnghi
                   else S1Interval(lnghi, lnglo).get_center())
    iv = S1Interval(lnghi, comp_center)
    if iv.is_inverted():
        use_hi = f"(_plng >= {iv.lo!r} OR _plng <= {iv.hi!r})"
    else:
        use_hi = f"(_plng >= {iv.lo!r} AND _plng <= {iv.hi!r})"
    edge = {}
    for name, a_lng in (("lo", lnglo), ("hi", lnghi)):
        lo_pt = np.array(sphere.latlng_to_xyz(latlo, a_lng), dtype=np.float64)
        hi_pt = np.array(sphere.latlng_to_xyz(lathi, a_lng), dtype=np.float64)
        cross = np.array(sphere.latlng_to_xyz(0.0, a_lng - m_pi_2),
                         dtype=np.float64)
        edge[name] = edge_distance_expr(lo_pt, hi_pt, cross)
    case = (f"CASE WHEN {in_lng} THEN {clamp} "
            f"WHEN {use_hi} THEN {edge['hi']} ELSE {edge['lo']} END")
    return f"SELECT *, ({case}) * {radius_m!r} AS {dist_col} FROM ({q})"
