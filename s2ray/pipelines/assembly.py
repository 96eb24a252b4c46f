"""Polygon assembly from a distributed edge soup, then spatial join.

The use case from the reference's S2PolygonBuilder doc (situation 1,
S2PolygonBuilder.php:10-14): region boundaries arrive as per-piece loops —
e.g. a lake split into pieces by administrative borders, each piece
digitized separately — and must be reassembled into seamless polygons
before joining against the point table.

Ray-Data shape: the edge soup is a (small) Dataset of directed edges
tagged with region_id.  Assembly is inherently sequential per region and
the geometry side is tiny compared to the page table, so the soup is
collected to the driver, assembled with the kernel PolygonBuilder
(DIRECTED_XOR: shared internal borders appear once per piece in opposite
directions and cancel), and the resulting polygons are broadcast into the
standard probe-side spatial join (`spatial_join_broadcast`) — the same
small-side-broadcast pattern as every other region join in this engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernel import sphere
from ..kernel.pip import Loop, Polygon
from ..kernel.polygon_ops import PolygonBuilder


def split_quad_pieces(loop_deg, frac: float = 0.5):
    """Split a CCW quad [(lat0,lng0)..] into west/east pieces along the
    meridian at lng0 + frac*(lng1-lng0).  The pieces share the cut edge
    with bitwise-identical float vertices, so DIRECTED_XOR assembly cancels
    it exactly.  Returns (pieces, union_loop_deg): two 4-vertex piece loops
    and the 6-vertex union boundary the assembly must reproduce (the cut
    endpoints stay as vertices — a great-circle edge through them is not
    the same arc as the original 4-vertex edge)."""
    (la0, ln0), (la1, ln1), (la2, ln2), (la3, ln3) = loop_deg
    assert la0 == la1 and la2 == la3 and ln0 == ln3 and ln1 == ln2, \
        "split_quad_pieces expects a lat/lng-aligned CCW quad"
    lnm = ln0 + frac * (ln1 - ln0)
    west = [(la0, ln0), (la0, lnm), (la2, lnm), (la3, ln3)]
    east = [(la0, lnm), (la1, ln1), (la2, ln2), (la2, lnm)]
    union = [(la0, ln0), (la0, lnm), (la1, ln1), (la2, ln2), (la2, lnm),
             (la3, ln3)]
    return [west, east], union


def edge_soup_table(pieces_by_region: dict[str, list]) -> pa.Table:
    """Directed edge soup of all piece loops, deterministically shuffled
    (so assembly cannot rely on input order).  Columns: region_id, then the
    two unit-vector endpoints as x0..z1 float64."""
    rid, a_pts, b_pts = [], [], []
    for name in sorted(pieces_by_region):
        for piece_deg in pieces_by_region[name]:
            lp = Loop.from_latlng_degrees(piece_deg)
            v = lp.vertices
            for i in range(len(v)):
                rid.append(name)
                a_pts.append(v[i])
                b_pts.append(v[(i + 1) % len(v)])
    a = np.stack(a_pts)
    b = np.stack(b_pts)
    # deterministic shuffle: order by a multiplicative hash of the row index
    n = len(rid)
    order = np.argsort((np.arange(n, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                       >> np.uint64(32), kind="stable")
    rid = [rid[i] for i in order]
    a, b = a[order], b[order]
    return pa.table({
        "region_id": pa.array(rid, type=pa.string()),
        "x0": a[:, 0], "y0": a[:, 1], "z0": a[:, 2],
        "x1": b[:, 0], "y1": b[:, 1], "z1": b[:, 2],
    })


def assemble_regions(edges_ds, merge_radius: float = 0.0,
                     undirected: bool = False) -> dict[str, Polygon]:
    """Collect the (small) edge-soup Dataset and assemble one polygon per
    region_id.  Accepts a Ray Dataset or a pyarrow Table."""
    tbl = edges_ds.to_arrow_refs() if hasattr(edges_ds, "to_arrow_refs") else None
    if tbl is not None:
        import ray

        parts = [t for t in ray.get(tbl)]
        tbl = pa.concat_tables(parts) if parts else None
    if tbl is None:
        tbl = edges_ds
    rid = np.asarray(tbl["region_id"].to_pylist(), dtype=object)
    a = np.stack([tbl[c].to_numpy(zero_copy_only=False)
                  for c in ("x0", "y0", "z0")], axis=1)
    b = np.stack([tbl[c].to_numpy(zero_copy_only=False)
                  for c in ("x1", "y1", "z1")], axis=1)
    out: dict[str, Polygon] = {}
    for name in sorted(set(rid.tolist())):
        rows = np.flatnonzero(rid == name)
        builder = (PolygonBuilder.undirected_xor(merge_radius=merge_radius)
                   if undirected else
                   PolygonBuilder.directed_xor(merge_radius=merge_radius))
        for i in rows:
            builder.add_edge(a[i], b[i])
        poly, unused = builder.assemble_polygon()
        if unused:
            raise ValueError(
                f"region {name}: {len(unused)} edges could not be assembled")
        if poly is not None:
            out[name] = poly
    return out


def assembled_pip_join(sf_dir: str, pieces_by_region: dict[str, list],
                       keep_cols=("page_id",)):
    """End-to-end: edge soup Dataset -> assembled polygons -> broadcast PIP
    join over the pages table.  Output (keep_cols..., region_id)."""
    import ray

    from .spatial_join import spatial_join_broadcast
    from .tiles import pages_with_cells

    soup = ray.data.from_arrow(edge_soup_table(pieces_by_region))
    regions = assemble_regions(soup)
    ds = pages_with_cells(sf_dir, token_level=None)
    return spatial_join_broadcast(ds, regions, keep_cols=keep_cols)
