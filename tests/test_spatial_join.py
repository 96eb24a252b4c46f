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
