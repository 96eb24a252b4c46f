"""Vectorized uint64 S2 cell-id kernel (numpy, no Ray).

From-scratch re-implementation of the reference's ``S2CellId`` +
``S2Projections`` semantics (quadratic projection, st in [-1, 1], 4-bit
Hilbert lookup tables), fully vectorized over numpy uint64 arrays.

Reference parity citations (file:line are into /root/reference/src):
- projection formulas          S2Projections.php:155-201, 207-271
- fromPoint chain              S2CellId.php:99-106
- stToIJ rounding              S2CellId.php:811-819 (PHP round = half-away-from-zero)
- fromFaceIJ / getBits         S2CellId.php:650-698
- toFaceIJOrientation/getBits1 S2CellId.php:712-782
- toPointRaw si/ti center rule S2CellId.php:123-159
- token codec                  S2CellId.php:462-512
- hierarchy ops                S2CellId.php:172-452
- lookup-table construction    S2CellId.php:978-1017 + S2.php:109-140,888

Everything stays in ``np.uint64``; Hilbert order == unsigned integer
order, so sorting / range joins are plain integer ops (no signed-bias
workarounds like the PHP port's S2CellId.php:907-920 are needed).
"""

from __future__ import annotations

import numpy as np

from . import sphere

# ---------------------------------------------------------------------------
# constants

FACE_BITS = 3
NUM_FACES = 6
MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1  # 61
MAX_SIZE = 1 << MAX_LEVEL     # 2**30

LOOKUP_BITS = 4
SWAP_MASK = 0x01
INVERT_MASK = 0x02

_U = np.uint64  # shorthand for uint64 scalar construction

WRAP_OFFSET = _U(NUM_FACES) << _U(POS_BITS)

# Hilbert sub-cell traversal tables (reference: S2.php:109-140, 888)
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # canonical order
        [0, 2, 3, 1],  # axes swapped
        [3, 2, 0, 1],  # bits inverted
        [3, 1, 0, 2],  # swapped & inverted
    ],
    dtype=np.uint64,
)
_POS_TO_ORIENTATION = np.array(
    [SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK], dtype=np.uint64
)


def _build_lookup_tables():
    """Build the 1024-entry LOOKUP_POS / LOOKUP_IJ tables.

    Reference: S2CellId::initLookupCell (S2CellId.php:978-1017). Iterative
    (stack) instead of recursive; one pass per initial orientation.
    """
    size = 1 << (2 * LOOKUP_BITS + 2)
    lookup_pos = np.zeros(size, dtype=np.uint64)
    lookup_ij = np.zeros(size, dtype=np.uint64)
    for orig in (0, SWAP_MASK, INVERT_MASK, SWAP_MASK | INVERT_MASK):
        stack = [(0, 0, 0, 0, orig)]  # (level, i, j, pos, orientation)
        while stack:
            level, i, j, pos, orientation = stack.pop()
            if level == LOOKUP_BITS:
                ij = (i << LOOKUP_BITS) + j
                lookup_pos[(ij << 2) + orig] = (pos << 2) + orientation
                lookup_ij[(pos << 2) + orig] = (ij << 2) + orientation
            else:
                for sub_pos in range(4):
                    ij = int(_POS_TO_IJ[orientation][sub_pos])
                    stack.append(
                        (
                            level + 1,
                            (i << 1) + (ij >> 1),
                            (j << 1) + (ij & 1),
                            (pos << 2) + sub_pos,
                            orientation ^ int(_POS_TO_ORIENTATION[sub_pos]),
                        )
                    )
    return lookup_pos, lookup_ij


LOOKUP_POS, LOOKUP_IJ = _build_lookup_tables()


# ---------------------------------------------------------------------------
# projection: st <-> uv <-> xyz (quadratic, st in [-1, 1])

def st_to_uv(s):
    """Quadratic projection st->uv (reference: S2Projections.php:155-178)."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.0,
        (1.0 / 3.0) * ((1.0 + s) * (1.0 + s) - 1.0),
        (1.0 / 3.0) * (1.0 - (1.0 - s) * (1.0 - s)),
    )


def uv_to_st(u):
    """Inverse quadratic projection uv->st (reference: S2Projections.php:184-201)."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0.0,
            np.sqrt(1.0 + 3.0 * u) - 1.0,
            1.0 - np.sqrt(1.0 - 3.0 * u),
        )


def xyz_to_face(x, y, z):
    """face = argmax |component|; +3 if that component is negative.

    Reference: S2Projections::xyzToFace + S2Point::largestAbsComponent
    (S2Projections.php:265-271, S2Point.php:99-111).
    """
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # largestAbsComponent: x>y ? (x>z ? 0 : 2) : (y>z ? 1 : 2)
    face = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(face, [x, y, z])
    return np.where(comp < 0.0, face + 3, face).astype(np.int64)


def valid_face_xyz_to_uv(face, x, y, z):
    """(face, xyz) -> (u, v) (reference: S2Projections.php:229-263)."""
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        return _valid_face_xyz_to_uv(face, x, y, z)


def _valid_face_xyz_to_uv(face, x, y, z):
    u = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [y / x, -x / y, -x / z, z / x, z / y],
        default=-y / z,
    )
    v = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [z / x, z / y, -y / z, y / x, -x / y],
        default=-x / z,
    )
    return u, v


def face_uv_to_xyz(face, u, v):
    """(face, u, v) -> direction vector (not unit length).

    Reference semantics (S2Projections::faceUvToXyz; the PHP switch is
    truncated at S2Projections.php:207-227 — values are the canonical ones the
    rest of the file round-trips with validFaceXyzToUv):
      f0:( 1, u, v) f1:(-u, 1, v) f2:(-u,-v, 1) f3:(-1,-v,-u) f4:( v,-1,-u) f5:( v, u,-1)
    """
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    conds = [face == 0, face == 1, face == 2, face == 3, face == 4]
    x = np.select(conds, [one, -u, -u, -one, v], default=v)
    y = np.select(conds, [u, one, -v, -v, -one], default=u)
    z = np.select(conds, [v, v, one, -u, -u], default=-one)
    return x, y, z


def st_to_ij(s):
    """st in [-1,1] -> ij in [0, 2^30-1] with PHP round() (half-away-from-zero).

    Reference: S2CellId::stToIJ (S2CellId.php:811-819).
    """
    m = float(MAX_SIZE // 2)
    x = m * np.asarray(s, dtype=np.float64) + (m - 0.5)
    # x >= -0.5 here; floor(x + 0.5) == round-half-away-from-zero for x >= 0,
    # and the x in [-0.5, 0) disagreement is erased by the clamp to >= 0.
    ij = np.floor(x + 0.5)
    return np.clip(ij, 0.0, 2.0 * m - 1.0).astype(np.int64)


def ij_to_st_min(i):
    """Lower-corner st of leaf cell i: 1/MAX_SIZE * (2i - MAX_SIZE) is the
    si/ti form; plain leaf lower bound in st is (2i - MAX_SIZE)/MAX_SIZE/... —
    helper for cell uv bounds (see cell.py)."""
    return (2.0 * np.asarray(i, dtype=np.float64) - MAX_SIZE) / MAX_SIZE


# ---------------------------------------------------------------------------
# Hilbert encode/decode

def from_face_ij(face, i, j):
    """(face, i, j) -> leaf cell id. Vectorized S2CellId::fromFaceIJ
    (S2CellId.php:650-698)."""
    face = np.asarray(face, dtype=np.uint64)
    iu = np.asarray(i, dtype=np.uint64)
    ju = np.asarray(j, dtype=np.uint64)
    n0 = np.zeros_like(face)
    n1 = face << _U(POS_BITS - 33)
    bits = face & _U(SWAP_MASK)
    mask = _U((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        ks = _U(k * LOOKUP_BITS)
        bits = bits + (((iu >> ks) & mask) << _U(LOOKUP_BITS + 2))
        bits = bits + (((ju >> ks) & mask) << _U(2))
        bits = LOOKUP_POS[bits]
        out = (bits >> _U(2)) << _U((k & 3) * 2 * LOOKUP_BITS)
        if k >= 4:
            n1 = n1 | out
        else:
            n0 = n0 | out
        bits = bits & _U(SWAP_MASK | INVERT_MASK)
    return (((n1 << _U(32)) + n0) << _U(1)) + _U(1)


def to_face_ij_orientation(cell_id, want_orientation=False):
    """id -> (face, i, j[, orientation]). Vectorized S2CellId::toFaceIJOrientation
    (S2CellId.php:712-782)."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    face = (cid >> _U(POS_BITS)).astype(np.uint64)
    bits = face & _U(SWAP_MASK)
    i = np.zeros_like(cid)
    j = np.zeros_like(cid)
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * LOOKUP_BITS) if k == 7 else LOOKUP_BITS
        shift = _U(k * 2 * LOOKUP_BITS + 1)
        bits = bits + (((cid >> shift) & _U((1 << (2 * nbits)) - 1)) << _U(2))
        bits = LOOKUP_IJ[bits]
        ks = _U(k * LOOKUP_BITS)
        i = i + ((bits >> _U(LOOKUP_BITS + 2)) << ks)
        j = j + (((bits >> _U(2)) & _U((1 << LOOKUP_BITS) - 1)) << ks)
        bits = bits & _U(SWAP_MASK | INVERT_MASK)
    if want_orientation:
        # suffix "00" repetitions flip the swap bit (S2CellId.php:733-746)
        lsb = cid & (~cid + _U(1))
        flip = (lsb & _U(0x1111111111111110)) != 0
        orientation = np.where(flip, bits ^ _U(SWAP_MASK), bits).astype(np.uint64)
        return face.astype(np.int64), i.astype(np.int64), j.astype(np.int64), orientation
    return face.astype(np.int64), i.astype(np.int64), j.astype(np.int64)


# ---------------------------------------------------------------------------
# encode / decode endpoints

def from_xyz(x, y, z):
    """Direction vectors -> leaf cell ids (S2CellId::fromPoint, S2CellId.php:99-106)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    face = xyz_to_face(x, y, z)
    u, v = valid_face_xyz_to_uv(face, x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    return from_face_ij(face, i, j)


def from_latlng_radians(lat, lng):
    x, y, z = sphere.latlng_to_xyz(lat, lng)
    return from_xyz(x, y, z)


def from_latlng_degrees(lat_deg, lng_deg):
    return from_latlng_radians(
        sphere.degrees_to_radians(lat_deg), sphere.degrees_to_radians(lng_deg)
    )


def to_point_raw(cell_id):
    """Cell ids -> (x, y, z) of cell centers (not unit length).

    Vectorized S2CellId::toPointRaw (S2CellId.php:123-159), including the
    delta rule: leaf -> 1, else 2 if (i ^ (id >> 2)) & 1 else 0.
    """
    cid = np.asarray(cell_id, dtype=np.uint64)
    face, i, j = to_face_ij_orientation(cid)
    is_leaf = (cid & _U(1)) != 0
    parity = ((i.astype(np.uint64) ^ (cid >> _U(2))) & _U(1)) != 0
    delta = np.where(is_leaf, 1, np.where(parity, 2, 0)).astype(np.int64)
    si = (i << 1) + delta - MAX_SIZE
    ti = (j << 1) + delta - MAX_SIZE
    k_scale = 1.0 / MAX_SIZE
    u = st_to_uv(k_scale * si)
    v = st_to_uv(k_scale * ti)
    return face_uv_to_xyz(face, u, v)


def to_latlng_radians(cell_id):
    x, y, z = to_point_raw(cell_id)
    return sphere.xyz_to_latlng(x, y, z)


def to_latlng_degrees(cell_id):
    lat, lng = to_latlng_radians(cell_id)
    return sphere.radians_to_degrees(lat), sphere.radians_to_degrees(lng)


# ---------------------------------------------------------------------------
# hierarchy algebra (vectorized bit ops; reference S2CellId.php:172-452)

def lowest_on_bit(cell_id):
    cid = np.asarray(cell_id, dtype=np.uint64)
    return cid & (~cid + _U(1))


def lowest_on_bit_for_level(level):
    lv = np.asarray(level, dtype=np.uint64)
    return _U(1) << (_U(2) * (_U(MAX_LEVEL) - lv))


def level(cell_id):
    """Subdivision level 0..30 (S2CellId::level, S2CellId.php:211-243).

    level = MAX_LEVEL - trailing_zeros(id)/2; log2 of a power of two is exact
    in float64 for all 64-bit powers.
    """
    lsb = lowest_on_bit(cell_id)
    tz = np.log2(lsb.astype(np.float64)).astype(np.int64)
    return (MAX_LEVEL - (tz >> 1)).astype(np.int64)


def is_leaf(cell_id):
    return (np.asarray(cell_id, dtype=np.uint64) & _U(1)) != 0


def is_face(cell_id):
    return (np.asarray(cell_id, dtype=np.uint64) & (lowest_on_bit_for_level(0) - _U(1))) == 0


def is_valid(cell_id):
    cid = np.asarray(cell_id, dtype=np.uint64)
    return (face(cid) < NUM_FACES) & ((lowest_on_bit(cid) & _U(0x1555555555555555)) != 0)


def face(cell_id):
    return (np.asarray(cell_id, dtype=np.uint64) >> _U(POS_BITS)).astype(np.int64)


def pos(cell_id):
    return np.asarray(cell_id, dtype=np.uint64) & (_U(0xFFFFFFFFFFFFFFFF) >> _U(FACE_BITS))


def parent(cell_id, lvl=None):
    """Ancestor at level lvl (or immediate parent).  S2CellId.php:330-345."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    if lvl is None:
        new_lsb = lowest_on_bit(cid) << _U(2)
    else:
        new_lsb = lowest_on_bit_for_level(lvl)
    return (cid & (~new_lsb + _U(1))) | new_lsb


def child_position(cell_id, lvl):
    cid = np.asarray(cell_id, dtype=np.uint64)
    lv = np.asarray(lvl, dtype=np.uint64)
    return ((cid >> (_U(2) * (_U(MAX_LEVEL) - lv) + _U(1))) & _U(3)).astype(np.int64)


def range_min(cell_id):
    """First leaf id contained in the cell (inclusive).  S2CellId.php:293-296."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    return cid - (lowest_on_bit(cid) - _U(1))


def range_max(cell_id):
    """Last leaf id contained in the cell (inclusive).  S2CellId.php:299-302."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    return cid + (lowest_on_bit(cid) - _U(1))


def contains(cell_id, other):
    """cell contains other (both valid).  S2CellId.php:310-315."""
    o = np.asarray(other, dtype=np.uint64)
    return (o >= range_min(cell_id)) & (o <= range_max(cell_id))


def intersects(cell_id, other):
    """cell intervals overlap.  S2CellId.php:317-324."""
    return (range_min(other) <= range_max(cell_id)) & (
        range_max(other) >= range_min(cell_id)
    )


def child_begin(cell_id, lvl=None):
    cid = np.asarray(cell_id, dtype=np.uint64)
    old_lsb = lowest_on_bit(cid)
    if lvl is None:
        return cid - old_lsb + (old_lsb >> _U(2))
    return cid - old_lsb + lowest_on_bit_for_level(lvl)


def child_end(cell_id, lvl=None):
    cid = np.asarray(cell_id, dtype=np.uint64)
    old_lsb = lowest_on_bit(cid)
    if lvl is None:
        return cid + old_lsb + (old_lsb >> _U(2))
    return cid + old_lsb + lowest_on_bit_for_level(lvl)


def next_id(cell_id):
    cid = np.asarray(cell_id, dtype=np.uint64)
    return cid + (lowest_on_bit(cid) << _U(1))


def prev_id(cell_id):
    cid = np.asarray(cell_id, dtype=np.uint64)
    return cid - (lowest_on_bit(cid) << _U(1))


def next_wrap(cell_id):
    n = next_id(cell_id)
    return np.where(n < WRAP_OFFSET, n, n - WRAP_OFFSET)


def prev_wrap(cell_id):
    p = prev_id(cell_id)
    return np.where(p < WRAP_OFFSET, p, p + WRAP_OFFSET)


def begin(lvl):
    return child_begin(_U(0) << _U(POS_BITS) | lowest_on_bit_for_level(0), lvl)


def end(lvl):
    return child_end(_U(5) << _U(POS_BITS) | lowest_on_bit_for_level(0), lvl)


def children(cell_id):
    """The 4 children of each id, shape (N, 4)."""
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.uint64))
    lsb = lowest_on_bit(cid) >> _U(2)
    base = cid - (lsb << _U(2))
    offs = (np.arange(4, dtype=np.uint64) * _U(2) + _U(1))[None, :]
    return base[:, None] + offs * lsb[:, None]


# ---------------------------------------------------------------------------
# neighbors (S2CellId.php:574-639, 830-886)

def _from_face_ij_wrap(face_arr, i, j):
    """Out-of-bounds (face,i,j) -> id on the adjacent face (S2CellId.php:846-869)."""
    i = np.clip(np.asarray(i, dtype=np.int64), -1, MAX_SIZE)
    j = np.clip(np.asarray(j, dtype=np.int64), -1, MAX_SIZE)
    k_scale = 1.0 / MAX_SIZE
    s = k_scale * ((i << 1) + 1 - MAX_SIZE)
    t = k_scale * ((j << 1) + 1 - MAX_SIZE)
    # NOTE (reference parity): fromFaceIJWrap feeds (s,t) straight into
    # faceUvToXyz without st->uv conversion; the distinction doesn't matter
    # just outside the face boundary.
    x, y, z = face_uv_to_xyz(face_arr, s, t)
    nface = xyz_to_face(x, y, z)
    u, v = valid_face_xyz_to_uv(nface, x, y, z)
    return from_face_ij(nface, st_to_ij(u), st_to_ij(v))


def from_face_ij_same(face_arr, i, j, same_face):
    """fromFaceIJ when in-bounds else wrap (S2CellId.php:876-886)."""
    same_face = np.asarray(same_face, dtype=bool)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    face_arr = np.asarray(face_arr, dtype=np.int64)
    out = np.empty(np.broadcast(face_arr, i, j).shape, dtype=np.uint64)
    inb = same_face
    if np.any(inb):
        out[inb] = from_face_ij(face_arr[inb] if face_arr.ndim else face_arr,
                                i[inb], j[inb])
    if np.any(~inb):
        fa = face_arr[~inb] if face_arr.ndim else face_arr
        out[~inb] = _from_face_ij_wrap(fa, i[~inb], j[~inb])
    return out


def get_edge_neighbors(cell_id):
    """4 same-level edge neighbors per id, shape (N, 4); order S, E, N, W
    (S2CellId::getEdgeNeighbors, S2CellId.php:574-587)."""
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.uint64))
    lvl = level(cid)
    size = np.int64(1) << (MAX_LEVEL - lvl)
    f, i, j = to_face_ij_orientation(cid)
    f = np.asarray(f, dtype=np.int64)
    out = np.empty((len(cid), 4), dtype=np.uint64)
    out[:, 0] = parent(from_face_ij_same(f, i, j - size, j - size >= 0), lvl)
    out[:, 1] = parent(from_face_ij_same(f, i + size, j, i + size < MAX_SIZE), lvl)
    out[:, 2] = parent(from_face_ij_same(f, i, j + size, j + size < MAX_SIZE), lvl)
    out[:, 3] = parent(from_face_ij_same(f, i - size, j, i - size >= 0), lvl)
    return out


def get_vertex_neighbors(cell_id, lvl):
    """Neighbors of the closest vertex at coarser level lvl; list of arrays
    (3 or 4 per id).  S2CellId::getVertexNeighbors (S2CellId.php:601-639).
    Returns (ids, counts): ids flat uint64, counts per input row.
    """
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.uint64))
    f, i, j = to_face_ij_orientation(cid)
    f = np.asarray(f, dtype=np.int64)
    half_size = np.int64(1) << (MAX_LEVEL - (lvl + 1))
    size = half_size << 1
    ibit = (i & half_size) != 0
    i_offset = np.where(ibit, size, -size)
    i_same = np.where(ibit, (i + size) < MAX_SIZE, (i - size) >= 0)
    jbit = (j & half_size) != 0
    j_offset = np.where(jbit, size, -size)
    j_same = np.where(jbit, (j + size) < MAX_SIZE, (j - size) >= 0)

    n0 = parent(cid, lvl)
    n1 = parent(from_face_ij_same(f, i + i_offset, j, i_same), lvl)
    n2 = parent(from_face_ij_same(f, i, j + j_offset, j_same), lvl)
    has4 = i_same | j_same
    n3 = parent(from_face_ij_same(f, i + i_offset, j + j_offset, i_same & j_same), lvl)

    ids = []
    counts = np.where(has4, 4, 3).astype(np.int64)
    for t in range(len(cid)):
        if has4[t]:
            ids.extend((n0[t], n1[t], n2[t], n3[t]))
        else:
            ids.extend((n0[t], n1[t], n2[t]))
    return np.array(ids, dtype=np.uint64), counts


def get_all_neighbors(cell_id, lvl=None):
    """All neighbors at the given level (>= cell level); vectorized over a
    single id (used by the coverer).  Canonical S2CellId::AppendAllNeighbors
    semantics built from edge/vertex neighbor primitives."""
    cid = np.uint64(cell_id)
    f, i, j = to_face_ij_orientation(np.atleast_1d(cid))
    f, i, j = int(f[0]), int(i[0]), int(j[0])
    this_level = int(level(np.atleast_1d(cid))[0])
    if lvl is None:
        lvl = this_level
    size = 1 << (MAX_LEVEL - this_level)
    # coordinates snapped to this cell's lower-left corner
    i0 = i & -size
    j0 = j & -size
    nbr_size = 1 << (MAX_LEVEL - lvl)
    out = []
    k = -nbr_size
    while True:
        if k < 0:
            same = j0 + k >= 0
        elif k >= size:
            same = j0 + k < MAX_SIZE
        else:
            same = True
            # north/south rows
            out.append(from_face_ij_same(np.array([f]), np.array([i0 + k]),
                                         np.array([j0 - nbr_size]),
                                         np.array([j0 - size >= 0]))[0])
            out.append(from_face_ij_same(np.array([f]), np.array([i0 + k]),
                                         np.array([j0 + size]),
                                         np.array([j0 + size < MAX_SIZE]))[0])
        # east/west columns + corners
        out.append(from_face_ij_same(np.array([f]), np.array([i0 - nbr_size]),
                                     np.array([j0 + k]),
                                     np.array([same and (i0 - size >= 0)]))[0])
        out.append(from_face_ij_same(np.array([f]), np.array([i0 + size]),
                                     np.array([j0 + k]),
                                     np.array([same and (i0 + size < MAX_SIZE)]))[0])
        if k >= size:
            break
        k += nbr_size
    ids = parent(np.array(out, dtype=np.uint64), lvl)
    return np.unique(ids)


def all_neighbors_same_level(cell_ids, lvl):
    """Vectorized AppendAllNeighbors for the SAME-level case (nbr level ==
    cell level), the hot path of the distance-join bucketing: each cell's
    8 surrounding candidates (edge + vertex rings collapse to the 3x3
    stencil when sizes are equal) built with the identical
    from_face_ij_same masks as the scalar loop above
    (S2CellId.php:876-917), then per-row sorted dedupe — cube-face
    corners yield 7.  Returns (flat_ids, counts): counts[r] neighbors of
    cell r, concatenated in sorted order, matching
    ``np.unique(get_all_neighbors(c, lvl))`` row by row.
    """
    cid = np.asarray(cell_ids, dtype=np.uint64)
    n = len(cid)
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    f, i, j = to_face_ij_orientation(cid)
    f = f.astype(np.int64)
    size = np.int64(1 << (MAX_LEVEL - lvl))
    i0 = i.astype(np.int64) & -size
    j0 = j.astype(np.int64) & -size
    mx = np.int64(MAX_SIZE)
    cand = np.empty((n, 8), dtype=np.uint64)
    for k, (di, dj) in enumerate(((-1, -1), (1, -1), (0, -1), (0, 1),
                                  (-1, 0), (1, 0), (-1, 1), (1, 1))):
        ii = i0 + di * size
        jj = j0 + dj * size
        same = np.ones(n, dtype=bool)
        if dj:
            same &= (jj >= 0) & (jj < mx)
        if di:
            same &= (ii >= 0) & (ii < mx)
        cand[:, k] = from_face_ij_same(f, ii, jj, same)
    cand = parent(cand.reshape(-1), lvl).reshape(n, 8)
    cand.sort(axis=1)
    keep = np.concatenate([np.ones((n, 1), dtype=bool),
                           cand[:, 1:] != cand[:, :-1]], axis=1)
    return cand[keep], keep.sum(axis=1).astype(np.int64)


# ---------------------------------------------------------------------------
# token codec (S2CellId.php:462-512)

def to_token(cell_id):
    """ids -> lowercase-hex tokens with trailing zeros stripped; 'X' for 0.

    One big-endian hexlify for the whole array, then per-row slice+rstrip
    (~4x faster than per-row format())."""
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.uint64))
    hexstr = cid.astype(">u8").tobytes().hex()
    return np.array(
        [hexstr[i << 4:(i + 1) << 4].rstrip("0") or "X"
         for i in range(len(cid))],
        dtype=object,
    )


def from_token(tokens):
    """tokens -> ids.  Invalid/oversize/'X' -> 0 (none)."""
    out = np.zeros(len(tokens), dtype=np.uint64)
    for t, tok in enumerate(tokens):
        if not tok or tok == "X" or len(tok) > 16:
            continue
        try:
            out[t] = np.uint64(int(tok.ljust(16, "0"), 16))
        except ValueError:
            pass  # non-hex token -> none (id 0)
    return out


def token_to_id(token: str) -> int:
    """Single-token convenience matching reference fromToken exactly
    (hexdec WITHOUT right-padding — S2CellId.php:462-477)."""
    if token == "X" or len(token) > 16 or not token:
        return 0
    try:
        return int(token, 16)
    except ValueError:
        return 0
