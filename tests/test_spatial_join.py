"""Spatial-join tests: broadcast vs shuffle equivalence, predicate
correctness vs brute force."""

import numpy as np
import pandas as pd
import pytest

from s2ray.kernel.pip import Polygon
from s2ray.kernel.region import Cap, LatLngRect
from s2ray.pipelines.spatial_join import (RegionIndex, exact_contains,
                                          spatial_join_broadcast,
                                          spatial_join_shuffle)
from s2ray.pipelines.tiles import pages_with_cells
from s2ray.sources.pages import CITIES_E4, derive_geo_e4, e4_to_degrees

SF = "/root/testdata/sf0.001"


def _regions():
    regs = {}
    for k, (lat_e4, lng_e4) in enumerate(CITIES_E4[:4]):
        regs[f"cap{k}"] = Cap.from_latlng_radius(
            lat_e4 / 1e4, lng_e4 / 1e4, 150000.0)
    regs["rect"] = LatLngRect.from_degrees(30.0, -10.0, 60.0, 45.0)
    regs["poly"] = Polygon.from_latlng_loops(
        [[(-40.0, 140.0), (-40.0, 160.0), (-25.0, 160.0), (-25.0, 140.0)]])
    return regs


def _brute_force(regs):
    uid = np.arange(500)
    lat_e4, lng_e4 = derive_geo_e4(uid)
    lat, lng = e4_to_degrees(lat_e4, lng_e4)
    rows = []
    for rid, region in regs.items():
        ok = exact_contains(region, lat, lng)
        for i in np.nonzero(ok)[0]:
            rows.append((int(uid[i]), rid))
    return sorted(rows)


@pytest.fixture(scope="module")
def pages(ray_session):
    return pages_with_cells(SF, token_level=None)


def test_broadcast_join_matches_brute_force(pages):
    regs = _regions()
    out = spatial_join_broadcast(pages, regs).to_pandas()
    got = sorted(zip(out["page_id"].astype(int), out["region_id"]))
    assert got == _brute_force(regs)
    assert len(got) > 10  # the city caps must actually catch hot pages


def test_shuffle_join_matches_broadcast(pages):
    regs = _regions()
    a = spatial_join_broadcast(pages, regs).to_pandas()
    b = spatial_join_shuffle(pages, regs, salt=3).to_pandas()
    ka = sorted(zip(a["page_id"].astype(int), a["region_id"]))
    kb = sorted(zip(b["page_id"].astype(int), b["region_id"]))
    assert ka == kb


def test_region_index_probe_direct():
    regs = _regions()
    idx = RegionIndex(regs)
    uid = np.arange(500)
    lat_e4, lng_e4 = derive_geo_e4(uid)
    lat, lng = e4_to_degrees(lat_e4, lng_e4)
    from s2ray.kernel import cellid

    leaf = cellid.from_latlng_degrees(lat, lng)
    rows, rids = idx.probe(leaf, lat, lng)
    got = sorted(zip(uid[rows].astype(int), rids))
    assert got == _brute_force(regs)


def test_auto_salt_shuffle_matches_broadcast(pages):
    regs = _regions()
    a = spatial_join_broadcast(pages, regs).to_pandas()
    c = spatial_join_shuffle(pages, regs, salt=4, auto_salt=True).to_pandas()
    ka = sorted(zip(a["page_id"].astype(int), a["region_id"]))
    kc = sorted(zip(c["page_id"].astype(int), c["region_id"]))
    assert ka == kc


def test_detect_hot_keys_finds_city_cells(pages):
    from s2ray.pipelines.spatial_join import detect_hot_keys
    from s2ray.kernel import cellid, keys as kmod

    hot = detect_hot_keys(pages, level=6, sample_fraction=0.5,
                          hot_threshold_frac=0.03)
    assert len(hot) >= 3  # city clusters concentrate 40% of pages in 8 cells
    # hot cells must be among the 8 city ancestor cells
    from s2ray.sources.pages import CITIES_E4
    city_cells = set()
    for la, ln in CITIES_E4:
        leaf = cellid.from_latlng_degrees(
            np.array([la / 1e4]), np.array([ln / 1e4]))
        city_cells.add(int(kmod.to_key(cellid.parent(leaf, 6))[0]))
    assert set(int(h) for h in hot) <= city_cells


def test_large_polygon_join_uses_index_and_matches(pages):
    from s2ray.kernel.pip import IndexedPolygon, Polygon
    from s2ray.pipelines.spatial_join import RegionIndex

    rng = np.random.RandomState(33)
    angles = np.sort(rng.uniform(0, 2 * np.pi, 200))
    radius = 20.0 + 5.0 * np.sin(4 * angles)
    lat = 40.0 + radius * np.sin(angles) * 0.5
    lng = 20.0 + radius * np.cos(angles)
    big_poly = Polygon.from_latlng_loops([list(zip(lat, lng))])
    regs = {"blob": big_poly}
    idx = RegionIndex(regs)
    assert isinstance(idx.regions["blob"], IndexedPolygon)
    out = spatial_join_broadcast(pages, regs).to_pandas()
    # brute force with the UNindexed polygon
    from s2ray.sources.pages import derive_geo_e4, e4_to_degrees

    uid = np.arange(500)
    la, ln = e4_to_degrees(*derive_geo_e4(uid))
    expect = set(uid[big_poly.contains_latlng_degrees(la, ln)].tolist())
    assert set(out.page_id.astype(int)) == expect
    assert len(expect) >= 2
