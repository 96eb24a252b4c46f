"""Parity of the DuckDB oracle generators (functions/sqlgen) with the
numpy kernels — the generators back the driver's CORRECTNESS oracles, so
they get their own direct tests (no Ray needed)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from s2ray.functions.sqlgen import (lsh_signature_expr,
                                    polyline_distance_select, s2_cell_select,
                                    token_hash_sql)
from s2ray.kernel import cellid


@pytest.mark.parametrize("level", [1, 4, 8, 13, 21, 30])
def test_s2_cell_select_bit_parity(level):
    rng = np.random.RandomState(level)
    lat = np.concatenate([rng.uniform(-89.99, 89.99, 4000),
                          [0.0, 45.0, -45.0, 89.9999, -89.9999]])
    lng = np.concatenate([rng.uniform(-180, 180, 4000),
                          [0.0, 180.0, -180.0, 90.0, -90.0]])
    df = pd.DataFrame({"lat": lat, "lng": lng})
    out = duckdb.sql(s2_cell_select("SELECT * FROM df", level=level)).df()
    leaf = cellid.from_latlng_degrees(lat, lng)
    ids = cellid.parent(leaf, level) if level < 30 else leaf
    assert (out["cell_id"].to_numpy().astype(np.uint64) == ids).all()
    assert (out["cell_token"].to_numpy() == cellid.to_token(ids)).all()


def test_polyline_distance_select_round3_parity():
    from s2ray.pipelines.polyline import Polyline

    line = Polyline.from_latlng_degrees(
        [(55.5, 37.0), (55.8, 37.7), (56.0, 38.5), (55.6, 39.5)])
    rng = np.random.RandomState(3)
    lat = rng.uniform(50, 60, 3000)
    lng = rng.uniform(33, 43, 3000)
    df = pd.DataFrame({"lat": lat, "lng": lng})
    sql = polyline_distance_select("SELECT * FROM df", line)
    got = duckdb.sql(f"SELECT dist_m FROM ({sql})").df()["dist_m"].to_numpy()
    exp = line.distance_m(lat, lng)
    assert (np.round(got, 3) == np.round(exp, 3)).all()


def test_token_hash_sql_matches_engine():
    from s2ray.pipelines.dedup import _poly_token_hash_array

    toks = ["hello", "a", "Zz9", "longer-token-with-punct!", "x" * 50]
    eng = _poly_token_hash_array(toks).astype(np.int64)
    rel = " UNION ALL ".join(
        f"SELECT {i} AS k, {token_hash_sql(repr(t))} AS h"
        for i, t in enumerate(toks))
    got = duckdb.sql(f"SELECT h FROM ({rel}) ORDER BY k").df()["h"].to_numpy()
    assert (got == eng).all()


def test_lsh_signature_expr_matches_engine():
    from s2ray.pipelines.ann import _lsh_planes, lsh_signature

    rng = np.random.RandomState(7)
    mat = rng.standard_normal((200, 16))
    planes = _lsh_planes(16, 10)
    eng = lsh_signature(mat / np.linalg.norm(mat, axis=1, keepdims=True),
                        planes)
    df = pd.DataFrame({"vec_id": np.arange(200),
                       "embedding": [list(map(float, r)) for r in mat]})
    expr = lsh_signature_expr(planes)
    got = duckdb.sql(
        f"SELECT {expr} AS sig FROM df ORDER BY vec_id").df()["sig"]
    assert (got.to_numpy() == eng.astype(np.int64)).all()
