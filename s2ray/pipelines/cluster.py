"""Grid-based spatial clustering: occupied lat/lng grid cells joined into
8-neighbor connected components (DBSCAN at a fixed grid resolution, the
classic "snap to grid, cluster occupied cells" formulation).

Scale shape: the corpus is reduced to per-grid-cell counts by a plain
pre-aggregated groupby (the shuffle moves (cell, partial_count) rows —
grid-sized, never corpus-sized), and the adjacency + connected components
run in ONE final task over the occupied-cell table, which is bounded by
the grid resolution (64,800 cells at 1 degree; ~6.5M at 0.1 degree —
compact int64 arrays), never by corpus size.  The antimeridian is a real
adjacency (gx = -180/cd touches gx = 180/cd - 1), mirrored in the oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def grid_clusters(pages_ds, cell_deg: float = 1.0, min_pages: int = 1):
    """(cluster_id, n_cells, n_pages) per connected component of occupied
    grid cells.  cluster_id is the minimum packed key
    ``(gy + offy) * W + (gx + offx)`` over the component's cells, where
    gy = floor(lat / cell_deg), gx = floor(lng / cell_deg).

    Cells with fewer than ``min_pages`` pages are dropped BEFORE adjacency
    (DBSCAN's core-cell rule at grid granularity).
    """
    from ray.data.aggregate import Sum

    w = 360.0 / cell_deg
    assert abs(w - round(w)) < 1e-9, "cell_deg must divide 360"
    W = int(round(w))
    offx, offy = W // 2, W // 4

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        gy = np.floor(lat / cell_deg).astype(np.int64)
        gx = np.floor(lng / cell_deg).astype(np.int64)
        p = (gy + offy) * W + (gx + offx)
        u, c = np.unique(p, return_counts=True)
        return pa.table({"p": pa.array(u, type=pa.int64()),
                         "pn": pa.array(c.astype(np.int64))})

    occ = (pages_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=None)
           .groupby("p").aggregate(Sum("pn", alias_name="n")))

    def finalize(batch: pa.Table) -> pa.Table:
        from .dedup import _union_find_labels

        p = batch["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n >= min_pages
        p, n = p[keep], n[keep]
        order = np.argsort(p)
        p, n = p[order], n[order]
        gy = p // W - offy
        gx = p % W - offx
        pi, pj = [], []
        if not len(p):
            return pa.table({
                "cluster_id": pa.array([], type=pa.int64()),
                "n_cells": pa.array([], type=pa.int64()),
                "n_pages": pa.array([], type=pa.int64()),
            })
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                ngx = (gx + dx + offx) % W - offx      # antimeridian wrap
                q = (gy + dy + offy) * W + (ngx + offx)
                pos = np.searchsorted(p, q)
                pos_ok = pos < len(p)
                hit = pos_ok & (p[np.minimum(pos, len(p) - 1)] == q)
                # de-duplicate the symmetric pair: emit only p < q
                hit &= p < q
                pi.append(p[hit])
                pj.append(q[hit])
        pi = np.concatenate(pi) if pi else np.empty(0, np.int64)
        pj = np.concatenate(pj) if pj else np.empty(0, np.int64)
        if len(pi):
            lbl_nodes, lbl = _union_find_labels(pi, pj)
            lab_map = dict(zip(lbl_nodes.tolist(), lbl.tolist()))
        else:
            lab_map = {}
        labels = np.array([lab_map.get(int(x), int(x)) for x in p],
                          dtype=np.int64)
        order = np.argsort(labels, kind="stable")
        lab, nn = labels[order], n[order]
        if len(lab):
            starts = np.concatenate(
                [[0], np.flatnonzero(lab[1:] != lab[:-1]) + 1])
            cid = lab[starts]
            n_cells = np.diff(np.concatenate([starts, [len(lab)]]))
            n_pages = np.add.reduceat(nn, starts)
        else:
            cid = lab
            n_cells = np.empty(0, np.int64)
            n_pages = nn
        return pa.table({
            "cluster_id": pa.array(cid, type=pa.int64()),
            "n_cells": pa.array(n_cells.astype(np.int64)),
            "n_pages": pa.array(n_pages.astype(np.int64)),
        })

    return occ.repartition(1).map_batches(finalize, batch_format="pyarrow",
                                          batch_size=None)


def grid_smooth(pages_ds, cell_deg: float = 1.0, value: str = "count"):
    """Raster stencil over the occupied lat/lng grid: for every occupied
    cell, the 8-neighbor (Moore) convolution of page counts — (gx, gy,
    n_pages, nb_pages, nb_cells) with antimeridian wrap on gx, no wrap on
    gy.  The neighborhood-smoothing / hot-spot primitive of raster map
    layers, run on the AGGREGATED grid: the corpus streams once into a
    grid-bounded count groupby, and the stencil itself touches only the
    occupied-cell table (<= W*W/2 rows — 64800 at 1 degree — never pages;
    same bounded-final-task argument as grid_clusters; a finer-than-0.01
    degree grid would stripe by gx with one-column halo exchange).

    ``value`` picks the cell measure: "count" (pages, the default) or
    "chars" (total text codepoints — the extensive attribute surface
    the attribute-Moran variant runs on).  Column names stay n_pages /
    nb_pages either way: downstream moment combines are
    measure-agnostic.
    """
    from ray.data.aggregate import Sum

    assert value in ("count", "chars")
    w = 360.0 / cell_deg
    assert abs(w - round(w)) < 1e-9, "cell_deg must divide 360"
    W = int(round(w))
    offx, offy = W // 2, W // 4

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        gy = np.floor(lat / cell_deg).astype(np.int64)
        gx = np.floor(lng / cell_deg).astype(np.int64)
        p = (gy + offy) * W + (gx + offx)
        u, inv = np.unique(p, return_inverse=True)
        if value == "chars":
            v = pc.utf8_length(pc.fill_null(batch["text"], "")) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            s = np.zeros(len(u), dtype=np.int64)
            np.add.at(s, inv, v)
        else:
            s = np.bincount(inv, minlength=len(u)).astype(np.int64)
        return pa.table({"p": pa.array(u, type=pa.int64()),
                         "pn": pa.array(s)})

    occ = (pages_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=None)
           .groupby("p").aggregate(Sum("pn", alias_name="n"))
           .repartition(1))

    def stencil(batch: pa.Table) -> pa.Table:
        p = batch["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(p):
            return pa.table({
                "gx": pa.array([], type=pa.int64()),
                "gy": pa.array([], type=pa.int64()),
                "n_pages": pa.array([], type=pa.int64()),
                "nb_pages": pa.array([], type=pa.int64()),
                "nb_cells": pa.array([], type=pa.int64()),
            })
        order = np.argsort(p)
        p, n = p[order], n[order]
        gy = p // W - offy
        gx = p % W - offx
        nb_pages = np.zeros(len(p), dtype=np.int64)
        nb_cells = np.zeros(len(p), dtype=np.int64)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                ngx = (gx + dx + offx) % W - offx      # antimeridian wrap
                q = (gy + dy + offy) * W + (ngx + offx)
                pos = np.searchsorted(p, q)
                ok = pos < len(p)
                hit = ok & (p[np.minimum(pos, len(p) - 1)] == q)
                nb_pages[hit] += n[np.minimum(pos, len(p) - 1)][hit]
                nb_cells[hit] += 1
        return pa.table({
            "gx": pa.array(gx),
            "gy": pa.array(gy),
            "n_pages": pa.array(n),
            "nb_pages": pa.array(nb_pages),
            "nb_cells": pa.array(nb_cells),
        })

    return occ.map_batches(stencil, batch_format="pyarrow",
                           batch_size=None)


def morans_i(pages_ds, cell_deg: float = 1.0, value: str = "count"):
    """Global Moran's I spatial autocorrelation of page counts over the
    occupied lat/lng grid with binary Moore (queen) weights — THE summary
    statistic of hot-spot analysis ("are dense cells next to dense
    cells?").  Output: ONE row (n_cells, n_links, moran_i) where n_links
    is S0 = total directed neighbor links and

        I = N/S0 * sum_ij w_ij (x_i - mean)(x_j - mean)
                 / sum_i (x_i - mean)^2 .

    Exactness: with mean = T/N rational, multiplying through by N^2 makes
    both sides integers —

        I = (N^2*WXX - N*T*WSUM + T^2*S0) / (S0 * (N*SXX - T^2))

    with WXX = sum_i x_i*nb_i, WSUM = sum_i (deg_i*x_i + nb_i).  The
    per-cell facts (x, nb, deg) come straight from :func:`grid_smooth`
    (same stencil, same antimeridian wrap); the moment combine runs in
    arbitrary-precision Python ints over the grid-bounded occupied-cell
    table (<= 64800 rows at 1 degree — NEVER corpus-sized, so the
    per-row Python loop is bounded by geometry, and N^2*WXX ~ 1e24 at
    web scale cannot silently wrap the way an int64 sum would).  The
    final division converts each exact integer to float64 FIRST
    (mirroring SQL's CAST(... AS DOUBLE) / CAST(... AS DOUBLE)), then
    rounds half-away like every oracled ratio.  Degenerate inputs
    (no links, or constant counts) yield NULL like the SQL CASE.
    """
    from .text import round_half_away

    sm = grid_smooth(pages_ds, cell_deg=cell_deg, value=value)

    def combine(batch: pa.Table) -> pa.Table:
        x_np = batch["n_pages"].to_numpy(zero_copy_only=False)
        nb_np = batch["nb_pages"].to_numpy(zero_copy_only=False)
        dg_np = batch["nb_cells"].to_numpy(zero_copy_only=False)
        n = len(x_np)
        t = sxx = s0 = wxx = wsum = 0
        for x, nb, dg in zip(x_np.tolist(), nb_np.tolist(), dg_np.tolist()):
            t += x
            sxx += x * x
            s0 += dg
            wxx += x * nb
            wsum += dg * x + nb
        den = s0 * (n * sxx - t * t)
        if den == 0:
            mi = None
        else:
            num = n * n * wxx - n * t * wsum + t * t * s0
            mi = float(round_half_away(
                np.float64(float(num)) / np.float64(float(den))))
        return pa.table({
            "n_cells": pa.array([n], type=pa.int64()),
            "n_links": pa.array([s0], type=pa.int64()),
            "moran_i": pa.array([mi], type=pa.float64()),
        })

    # grid_smooth's output is one grid-bounded block; repartition(1)
    # guards the single-combine contract if that ever changes
    return sm.repartition(1).map_batches(combine, batch_format="pyarrow",
                                         batch_size=None)


def geary_c(pages_ds, cell_deg: float = 1.0, value: str = "count"):
    """Global Geary's C spatial autocorrelation of page counts over the
    occupied lat/lng grid with binary Moore (queen) weights — the
    PAIRWISE-difference companion of :func:`morans_i` (C < 1: positive
    autocorrelation, C > 1: negative; sensitive to local rather than
    global structure).  Output: ONE row (n_cells, n_links, geary_c) with

        C = (N-1) * sum_ij w_ij (x_i - x_j)^2
            / (2 * S0 * sum_i (x_i - mean)^2) .

    Exactness: the pairwise sum needs no pairwise pass — by symmetry of
    the Moore adjacency (wrap included: i wraps to j iff j wraps to i),
    sum over directed links of x_j^2 equals sum_i deg_i * x_i^2, so

        GSUM = sum_ij w_ij (x_i - x_j)^2 = 2 * (DXX - WXX)

    with DXX = sum_i deg_i * x_i^2 and WXX = sum_i x_i * nb_i — both
    straight from the :func:`grid_smooth` per-cell facts morans_i already
    consumes.  Multiplying through by N (mean = T/N rational) gives the
    all-integer form

        C = N * (N-1) * (DXX - WXX) / (S0 * (N*SXX - T^2))

    combined in arbitrary-precision Python ints over the grid-bounded
    occupied-cell table (<= 64800 rows at 1 degree — never corpus-sized;
    N*DXX ~ 1e24 at web scale would wrap int64).  The final division
    converts each exact integer to float64 FIRST (SQL's CAST(... AS
    DOUBLE) / CAST(... AS DOUBLE)), then rounds half-away like every
    oracled ratio.  Degenerate inputs (no links, or constant counts)
    yield NULL like the SQL CASE.
    """
    from .text import round_half_away

    sm = grid_smooth(pages_ds, cell_deg=cell_deg, value=value)

    def combine(batch: pa.Table) -> pa.Table:
        x_np = batch["n_pages"].to_numpy(zero_copy_only=False)
        nb_np = batch["nb_pages"].to_numpy(zero_copy_only=False)
        dg_np = batch["nb_cells"].to_numpy(zero_copy_only=False)
        n = len(x_np)
        t = sxx = s0 = wxx = dxx = 0
        for x, nb, dg in zip(x_np.tolist(), nb_np.tolist(), dg_np.tolist()):
            t += x
            sxx += x * x
            s0 += dg
            wxx += x * nb
            dxx += dg * x * x
        den = s0 * (n * sxx - t * t)
        if den == 0:
            gc = None
        else:
            num = n * (n - 1) * (dxx - wxx)
            gc = float(round_half_away(
                np.float64(float(num)) / np.float64(float(den))))
        return pa.table({
            "n_cells": pa.array([n], type=pa.int64()),
            "n_links": pa.array([s0], type=pa.int64()),
            "geary_c": pa.array([gc], type=pa.float64()),
        })

    return sm.repartition(1).map_batches(combine, batch_format="pyarrow",
                                         batch_size=None)


def getis_ord(pages_ds, cell_deg: float = 1.0):
    """Getis-Ord Gi* hotspot z-score per occupied grid cell — the LOCAL
    companion of :func:`morans_i` ("which cells are hot?"), with binary
    Moore (queen) weights INCLUDING self (the * in Gi*).  For cell i over
    the n occupied cells with counts x:

        Gi* z_i = (L_i - mean * W_i)
                  / (S * sqrt((n*W_i - W_i^2) / (n-1)))

    where W_i = deg_i + 1 (neighbor count + self), L_i = nb_i + x_i
    (neighborhood sum incl. self), mean = T/n, S^2 = SXX/n - mean^2.
    Output: (gx, gy, n_pages, gi_z) — z > ~2 marks page-count hot spots.

    Exactness: multiplying numerator and denominator by n gives

        z_i = (n*L_i - T*W_i)
              / (sqrt(n*SXX - T^2) * sqrt((n*W_i - W_i^2) / (n-1)))

    whose inputs A = n*L_i - T*W_i, B = n*SXX - T^2, C = n*W_i - W_i^2,
    D = n-1 are EXACT integers, computed in arbitrary-precision Python
    ints over the grid-bounded occupied-cell table (same argument as
    morans_i: <= 64800 rows at 1 degree, never corpus-sized; B ~ 1e24 at
    web scale would wrap int64).  Each is cast to float64 exactly as
    SQL's CAST(... AS DOUBLE) (both round-to-nearest), then one
    float division / two IEEE sqrts / one multiply in the identical op
    order — bit-for-bit against the oracle.  Degenerate cases (n = 1,
    constant counts, or a neighborhood spanning all n cells) yield NULL
    like the SQL CASE.
    """
    import math

    from .text import round_half_away

    sm = grid_smooth(pages_ds, cell_deg=cell_deg)

    def combine(batch: pa.Table) -> pa.Table:
        gx = batch["gx"].to_numpy(zero_copy_only=False)
        gy = batch["gy"].to_numpy(zero_copy_only=False)
        x_np = batch["n_pages"].to_numpy(zero_copy_only=False)
        nb_np = batch["nb_pages"].to_numpy(zero_copy_only=False)
        dg_np = batch["nb_cells"].to_numpy(zero_copy_only=False)
        n = len(x_np)
        t = sxx = 0
        xs = x_np.tolist()
        for x in xs:
            t += x
            sxx += x * x
        b = n * sxx - t * t
        d = n - 1
        sqrt_b = math.sqrt(float(b)) if b > 0 else 0.0
        z = []
        for x, nb, dg in zip(xs, nb_np.tolist(), dg_np.tolist()):
            wi = dg + 1
            c = n * wi - wi * wi
            if b <= 0 or d <= 0 or c <= 0:
                z.append(None)
                continue
            a = n * (nb + x) - t * wi
            z.append(float(round_half_away(np.float64(
                float(a) / (sqrt_b * math.sqrt(float(c) / float(d)))))))
        return pa.table({
            "gx": pa.array(gx, type=pa.int64()),
            "gy": pa.array(gy, type=pa.int64()),
            "n_pages": pa.array(x_np, type=pa.int64()),
            "gi_z": pa.array(z, type=pa.float64()),
        })

    # grid_smooth's output is one grid-bounded block; repartition(1)
    # guards the single-combine contract if that ever changes
    return sm.repartition(1).map_batches(combine, batch_format="pyarrow",
                                         batch_size=None)


def grid_kde(pages_ds, cell_deg: float = 1.0, bandwidth_m: float = 100_000.0):
    """Truncated-support Gaussian kernel density ("heatmap splatting", the
    raster rendering primitive) at 1-degree grid-cell centers: every page
    contributes w = exp(-d^2 / (2 h^2)) to its own cell and its 8 Moore
    neighbors (antimeridian-wrapped), where d is the reference haversine
    (SmokeTest.php:12-21) from the page to the TARGET cell's center.
    Output: (gx, gy, kde) over every cell receiving >= 1 contribution.

    Exactness: each contribution is quantized to 1e-9 fixed point with
    half-away rounding (SQL round()), so per-cell sums are ORDER-FREE
    int64 aggregations; the haversine/exp intermediates are evaluated in
    the engine's exact float op order, which the SQL mirror reproduces by
    binding each intermediate in a CTE with matching associativity (a
    1-ulp association difference inside exp() WOULD flip ~1 quantization
    boundary per ~5M contributions, so this is load-bearing).  Scale
    shape: 9 vectorized passes per batch -> per-batch per-cell partial
    sums -> ONE Sum groupby at occupied-grid cardinality (never pages).
    Cells beyond the pole rows (|gy| = 91) are splat-grid artifacts of
    the truncated window, identical on both engines.
    """
    from ray.data.aggregate import Sum

    from ..kernel.sphere import haversine_distance_m
    from .text import round_half_away

    w = 360.0 / cell_deg
    assert abs(w - round(w)) < 1e-9, "cell_deg must divide 360"
    W = int(round(w))
    offx, offy = W // 2, W // 4
    den = 2.0 * bandwidth_m * bandwidth_m
    _S = 1_000_000_000.0

    def splat(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        if not len(lat):
            return pa.table({"p": pa.array([], type=pa.int64()),
                             "q": pa.array([], type=pa.int64())})
        gy = np.floor(lat / cell_deg).astype(np.int64)
        gx = np.floor(lng / cell_deg).astype(np.int64)
        lat_r = np.radians(lat)
        lng_r = np.radians(lng)
        ps, qs = [], []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ty = gy + dy
                tx = (gx + dx + offx) % W - offx   # antimeridian wrap
                c_lat = np.radians((ty.astype(np.float64) + 0.5) * cell_deg)
                c_lng = np.radians((tx.astype(np.float64) + 0.5) * cell_deg)
                d = haversine_distance_m(lat_r, lng_r, c_lat, c_lng)
                q = round_half_away(
                    np.exp(-(d * d) / den) * _S, 0).astype(np.int64)
                ps.append((ty + offy) * W + (tx + offx))
                qs.append(q)
        p = np.concatenate(ps)
        q = np.concatenate(qs)
        # argsort + reduceat, NOT bincount(weights=): bincount sums in
        # float64 and would lose int exactness past 2^53 on huge blocks
        order = np.argsort(p, kind="stable")
        p, q = p[order], q[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(p[1:] != p[:-1]) + 1])
        return pa.table({"p": pa.array(p[starts]),
                         "q": pa.array(np.add.reduceat(q, starts))})

    agg = (pages_ds.map_batches(splat, batch_format="pyarrow",
                                batch_size=None)
           .groupby("p").aggregate(Sum("q", alias_name="sq")))

    def finish(batch: pa.Table) -> pa.Table:
        p = batch["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        sq = batch["sq"].to_numpy(zero_copy_only=False)
        return pa.table({
            "gx": pa.array(p % W - offx),
            "gy": pa.array(p // W - offy),
            "kde": pa.array(round_half_away(
                sq.astype(np.float64) / _S)),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def local_moran(pages_ds, cell_deg: float = 1.0):
    """Local Moran's I (LISA, Anselin 1995) per occupied grid cell — the
    cell-level decomposition of :func:`morans_i` that answers "WHICH cells
    sit in a high-high cluster / low-low cold spot / spatial outlier?".
    Binary Moore (queen) weights with antimeridian wrap, same stencil as
    grid_smooth.  Output per occupied cell: (gx, gy, n_pages, lisa,
    quadrant) where quadrant is the Moran-scatterplot label
    HH / LL / HL / LH ('EQ' when either deviation is exactly zero).

    Exactness: with mean = T/N rational, multiplying the deviation and the
    lag through by N gives

        I_i = (N*x_i - T) * (N*nb_i - deg_i*T) / (N*SXX - T^2)

    — an exact-integer numerator and denominator (the N^2-scaled central
    moment), evaluated in arbitrary-precision Python ints over the
    grid-bounded occupied-cell table (<= 64800 rows at 1 degree — the
    same bounded-final-task argument as morans_i; at web scale
    N*SXX ~ 1e24 would wrap an int64).  The quadrant label needs ONLY the
    integer signs — no float enters the classification.  The single float
    division casts each exact integer to float64 first (SQL's
    CAST(... AS DOUBLE) / CAST(... AS DOUBLE)), then rounds half-away.
    Degenerate input (constant counts) yields NULL lisa like the SQL CASE.
    """
    from .text import round_half_away

    sm = grid_smooth(pages_ds, cell_deg=cell_deg)

    def combine(batch: pa.Table) -> pa.Table:
        gx = batch["gx"].to_numpy(zero_copy_only=False)
        gy = batch["gy"].to_numpy(zero_copy_only=False)
        x_np = batch["n_pages"].to_numpy(zero_copy_only=False)
        nb_np = batch["nb_pages"].to_numpy(zero_copy_only=False)
        dg_np = batch["nb_cells"].to_numpy(zero_copy_only=False)
        n = len(x_np)
        t = sxx = 0
        xs = x_np.tolist()
        for x in xs:
            t += x
            sxx += x * x
        den = n * sxx - t * t
        lisa, quad = [], []
        for x, nb, dg in zip(xs, nb_np.tolist(), dg_np.tolist()):
            dev = n * x - t
            lag = n * nb - dg * t
            if den == 0:
                lisa.append(None)
            else:
                lisa.append(float(round_half_away(np.float64(
                    float(dev * lag) / float(den)))))
            if dev > 0 and lag > 0:
                quad.append("HH")
            elif dev < 0 and lag < 0:
                quad.append("LL")
            elif dev > 0 and lag < 0:
                quad.append("HL")
            elif dev < 0 and lag > 0:
                quad.append("LH")
            else:
                quad.append("EQ")
        return pa.table({
            "gx": pa.array(gx, type=pa.int64()),
            "gy": pa.array(gy, type=pa.int64()),
            "n_pages": pa.array(x_np, type=pa.int64()),
            "lisa": pa.array(lisa, type=pa.float64()),
            "quadrant": pa.array(quad, type=pa.string()),
        })

    # grid_smooth's output is one grid-bounded block; repartition(1)
    # guards the single-combine contract if that ever changes
    return sm.repartition(1).map_batches(combine, batch_format="pyarrow",
                                         batch_size=None)


def join_counts(pages_ds, cell_deg: float = 1.0):
    """Binary join-count statistic (Cliff & Ord) over the occupied grid:
    classify each occupied cell hot (count strictly above the occupied-cell
    mean) or cold, then count undirected Moore-adjacent pairs by class —
    ONE row (n_cells, n_hot, n_links, bb_links, ww_links, bw_links).
    The categorical companion of :func:`morans_i`: BB >> expected means
    hot cells clump (the "join counts" of classic spatial epidemiology).

    Exactness: hot_i := N*x_i > T — an integer cross-multiply, no float
    mean ever materializes.  Adjacency is enumerated over the occupied
    table with the same 8-offset searchsorted scan as grid_clusters
    (grid-bounded: <= 64800 rows at 1 degree, never corpus-sized); Moore
    adjacency with antimeridian wrap is symmetric and irreflexive at
    W >= 3, so every undirected link is seen exactly twice in the directed
    scan and the directed tallies are halved as exact even integers.
    """
    from ray.data.aggregate import Sum

    w = 360.0 / cell_deg
    assert abs(w - round(w)) < 1e-9, "cell_deg must divide 360"
    W = int(round(w))
    assert W >= 3, "join_counts needs W >= 3 (wrap self-adjacency)"
    offx, offy = W // 2, W // 4

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        gy = np.floor(lat / cell_deg).astype(np.int64)
        gx = np.floor(lng / cell_deg).astype(np.int64)
        p = (gy + offy) * W + (gx + offx)
        u, c = np.unique(p, return_counts=True)
        return pa.table({"p": pa.array(u, type=pa.int64()),
                         "pn": pa.array(c.astype(np.int64))})

    occ = (pages_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=None)
           .groupby("p").aggregate(Sum("pn", alias_name="n"))
           .repartition(1))

    def combine(batch: pa.Table) -> pa.Table:
        p = batch["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(p)
        p, n = p[order], n[order]
        nc = len(p)
        t = 0
        for x in n.tolist():
            t += x
        # hot = N*x > T in exact big-int (int64 would wrap at web scale)
        hot = np.array([nc * int(x) > t for x in n.tolist()], dtype=bool)
        gy = p // W - offy
        gx = p % W - offx
        bb = ww = bw = links = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                ngx = (gx + dx + offx) % W - offx      # antimeridian wrap
                q = (gy + dy + offy) * W + (ngx + offx)
                pos = np.searchsorted(p, q)
                ok = pos < len(p)
                hit = ok & (p[np.minimum(pos, len(p) - 1)] == q)
                bhot = hot[np.minimum(pos, len(p) - 1)]
                links += int(hit.sum())
                bb += int((hit & hot & bhot).sum())
                ww += int((hit & ~hot & ~bhot).sum())
                bw += int((hit & (hot != bhot)).sum())
        return pa.table({
            "n_cells": pa.array([nc], type=pa.int64()),
            "n_hot": pa.array([int(hot.sum())], type=pa.int64()),
            "n_links": pa.array([links // 2], type=pa.int64()),
            "bb_links": pa.array([bb // 2], type=pa.int64()),
            "ww_links": pa.array([ww // 2], type=pa.int64()),
            "bw_links": pa.array([bw // 2], type=pa.int64()),
        })

    return occ.map_batches(combine, batch_format="pyarrow",
                           batch_size=None)


def tile_mann_kendall(pages_ds, cell_deg: float = 1.0,
                      epoch_month: str = "2024-01", n_months: int = 12):
    """Mann-Kendall trend statistic per occupied grid cell over monthly
    page counts — the space-time "emerging hot spot" primitive: for each
    cell, S = sum_{i<j} sign(c_j - c_i) over the ``n_months`` zero-filled
    monthly counts starting at ``epoch_month`` (the pages corpus spans
    exactly 2024-01..2024-12 by construction, sources/pages.py warc_ts).
    S > 0 = intensifying, S < 0 = waning.  Output per occupied cell:
    (gx, gy, n_pages, mk_s, n_months_active).

    Exactness: EVERY output is an integer — counts, the sign fold, the
    active-month tally — so there is no float parity surface at all.
    Scale shape: per-batch (cell, month) partial counts packed into ONE
    int64 key (cell_key * n_months + month) -> ONE Sum groupby at
    occupied-cells x months cardinality (grid-bounded: <= 777,600 rows at
    1 degree x 12 months, never pages) -> one bounded combine task that
    evaluates the C(n_months, 2) = 66 sign comparisons VECTORIZED across
    all cells at once (a dense (cells, months) int64 matrix, ~6 MB at the
    full 1-degree grid).  A decades-long corpus (n_months ~ 500) would
    stripe the combine by cell-key range; the statistic stays exact
    because months never split across stripes.
    """
    from ray.data.aggregate import Sum

    w = 360.0 / cell_deg
    assert abs(w - round(w)) < 1e-9, "cell_deg must divide 360"
    W = int(round(w))
    offx, offy = W // 2, W // 4
    em = np.datetime64(epoch_month, "M").astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        ts = batch["warc_ts"].to_numpy(zero_copy_only=False)
        m = ts.astype("datetime64[M]").astype(np.int64) - em
        assert len(m) == 0 or (m.min() >= 0 and m.max() < n_months), \
            "warc_ts outside the declared month span"
        gy = np.floor(lat / cell_deg).astype(np.int64)
        gx = np.floor(lng / cell_deg).astype(np.int64)
        k = ((gy + offy) * W + (gx + offx)) * n_months + m
        u, c = np.unique(k, return_counts=True)
        return pa.table({"k": pa.array(u, type=pa.int64()),
                         "kn": pa.array(c.astype(np.int64))})

    agg = (pages_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=None)
           .groupby("k").aggregate(Sum("kn", alias_name="n"))
           .repartition(1))

    def combine(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(k):
            return pa.table({
                "gx": pa.array([], type=pa.int64()),
                "gy": pa.array([], type=pa.int64()),
                "n_pages": pa.array([], type=pa.int64()),
                "mk_s": pa.array([], type=pa.int64()),
                "n_months_active": pa.array([], type=pa.int64()),
            })
        p = k // n_months
        m = k % n_months
        cells, pidx = np.unique(p, return_inverse=True)
        dense = np.zeros((len(cells), n_months), dtype=np.int64)
        dense[pidx, m] = n
        s = np.zeros(len(cells), dtype=np.int64)
        for j in range(1, n_months):
            for i in range(j):
                s += np.sign(dense[:, j] - dense[:, i])
        return pa.table({
            "gx": pa.array(cells % W - offx),
            "gy": pa.array(cells // W - offy),
            "n_pages": pa.array(dense.sum(axis=1)),
            "mk_s": pa.array(s),
            "n_months_active": pa.array((dense > 0).sum(axis=1)
                                        .astype(np.int64)),
        })

    return agg.map_batches(combine, batch_format="pyarrow",
                           batch_size=None)


def lang_frontier(pages_ds, cell_deg: float = 1.0):
    """Language-frontier join counts: each occupied grid cell takes its
    DOMINANT language (count DESC, lang ASC tie-break); undirected
    Moore-adjacent cell pairs are then counted per unordered language
    pair — (lang_a, lang_b, n_links).  Off-diagonal mass maps the
    linguistic frontier zones; the categorical refinement of
    :func:`join_counts`' binary hot/cold statistic.

    Exactness: all integers.  The (cell, lang) counts ride ONE
    grid x langs bounded groupby; dominance and the 8-offset
    searchsorted adjacency scan (antimeridian wrap, the join_counts
    machinery) run in one bounded combine task, and the directed scan
    sees every undirected link exactly twice, so halving is exact.
    """
    from ray.data.aggregate import Sum

    w = 360.0 / cell_deg
    assert abs(w - round(w)) < 1e-9, "cell_deg must divide 360"
    W = int(round(w))
    assert W >= 3, "lang_frontier needs W >= 3 (wrap self-adjacency)"
    offx, offy = W // 2, W // 4

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        lang = batch["lang"].to_pandas()
        ok = lang.notna().to_numpy()
        lang = lang[ok].astype(str).to_numpy()
        gy = np.floor(lat[ok] / cell_deg).astype(np.int64)
        gx = np.floor(lng[ok] / cell_deg).astype(np.int64)
        p = (gy + offy) * W + (gx + offx)
        g = pd.DataFrame({"p": p, "lang": lang}).groupby(
            ["p", "lang"], sort=False).size().reset_index(name="pn")
        return pa.table({
            "p": pa.array(g["p"].to_numpy().astype(np.int64)),
            "lang": pa.array(g["lang"], type=pa.string()),
            "pn": pa.array(g["pn"].to_numpy().astype(np.int64)),
        })

    occ = (pages_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=None)
           .groupby(["p", "lang"]).aggregate(Sum("pn", alias_name="n"))
           .repartition(1))

    def combine(batch: pa.Table) -> pa.Table:
        p = batch["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        lang = np.asarray(batch["lang"].to_pandas(), dtype=object)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(p):
            return pa.table({
                "lang_a": pa.array([], type=pa.string()),
                "lang_b": pa.array([], type=pa.string()),
                "n_links": pa.array([], type=pa.int64())})
        # dominant lang per cell: (count DESC, lang ASC) within cell
        order = np.lexsort((lang, -n, p))
        p, lang = p[order], lang[order]
        first = np.concatenate([[True], p[1:] != p[:-1]])
        p, dom = p[first], lang[first]
        order2 = np.argsort(p)
        p, dom = p[order2], dom[order2]
        gy = p // W - offy
        gx = p % W - offx
        from collections import Counter

        cnt = Counter()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                ngx = (gx + dx + offx) % W - offx    # antimeridian wrap
                q = (gy + dy + offy) * W + (ngx + offx)
                pos = np.searchsorted(p, q)
                ok = pos < len(p)
                hit = ok & (p[np.minimum(pos, len(p) - 1)] == q)
                bdom = dom[np.minimum(pos, len(p) - 1)]
                for a_, b_ in zip(dom[hit], bdom[hit]):
                    cnt[(a_, b_) if a_ <= b_ else (b_, a_)] += 1
        keys = sorted(cnt)
        return pa.table({
            "lang_a": pa.array([k[0] for k in keys], type=pa.string()),
            "lang_b": pa.array([k[1] for k in keys], type=pa.string()),
            "n_links": pa.array([cnt[k] // 2 for k in keys],
                                type=pa.int64()),
        })

    return occ.map_batches(combine, batch_format="pyarrow",
                           batch_size=None)
