"""Curvilinear staggered-grid dim-table module (round 4): WCOFS-pole
fixture grid, variable→grid discovery, and the staggered u/v rotation
reproducing the kernels.rotate_uv goldens through a broadcast join."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pyofs_spark.functions import kernels as K
from pyofs_spark.sources.grids import (
    GRID_LOCATIONS,
    build_curvilinear_grid,
    rotate_staggered_uv,
    variable_grid_map,
)

N_XI, N_ETA = 8, 6
RLON0, RLAT0, STEP = 18.0, -22.0, 0.5  # rotated coords over the WCOFS domain


def _grid(spark):
    return build_curvilinear_grid(
        spark, N_XI, N_ETA, RLON0, RLAT0, STEP,
        mask_fn=lambda lon, lat: lat > 30.0,
    )


def test_grid_shapes_and_coords(spark):
    g = _grid(spark)
    counts = {r.grid_name: r.n for r in
              g.groupBy("grid_name").agg(F.count("*").alias("n")).collect()}
    assert counts == {
        "rho": N_XI * N_ETA,
        "u": (N_XI - 1) * N_ETA,
        "v": N_XI * (N_ETA - 1),
        "psi": (N_XI - 1) * (N_ETA - 1),
    }
    # rho lon/lat are the unrotation of the rotated-regular lattice
    rho = {(r.i, r.j): r for r in g.filter("grid_name = 'rho'").collect()}
    lon, lat = K.rotated_pole_unrotate(
        RLON0 + (3 + 0.5) * STEP, RLAT0 + (2 + 0.5) * STEP, *(-57.6, 37.4)
    )
    assert abs(rho[(3, 2)].lon - float(lon)) < 1e-12
    assert abs(rho[(3, 2)].lat - float(lat)) < 1e-12
    # u points sit on xi-edges: between rho centers in rotated space
    u_pt = {(r.i, r.j): r for r in g.filter("grid_name = 'u'").collect()}
    assert (0, 0) in u_pt and (N_XI - 2, N_ETA - 1) in u_pt
    # mask_fn applied
    assert any(not r.mask for r in rho.values()) or all(
        r.lat > 30.0 for r in rho.values()
    )
    # angle defined on rho only, within (-pi, pi)
    assert all(np.isfinite(r.angle) for r in rho.values())
    assert all(
        r.angle is None or np.isnan(r.angle)
        for r in g.filter("grid_name != 'rho'").collect()
    )


def test_variable_grid_discovery():
    # ref wcofs.py:218-251 rules: location attr wins; bare u/v on their
    # edge grids; everything else on rho
    attrs = {
        "temp_sur": {"location": "face"},
        "u_sur": {"location": "edge1"},
        "v_sur": {"location": "edge2"},
        "vort": {"location": "node"},
        "u": {},
        "v": {},
        "zeta": {},
    }
    m = variable_grid_map(attrs)
    assert m == {
        "temp_sur": "rho", "u_sur": "u", "v_sur": "v", "vort": "psi",
        "u": "u", "v": "v", "zeta": "rho",
    }
    assert set(GRID_LOCATIONS.values()) == {"rho", "u", "v", "psi"}


def test_rotate_staggered_uv_matches_kernel(spark):
    g = _grid(spark)
    # deterministic staggered fields on the u / v grids
    u_rows = [
        (i, j, float(1 + i + 2 * j))
        for j in range(N_ETA) for i in range(N_XI - 1)
    ]
    v_rows = [
        (i, j, float(2 - i + 3 * j))
        for j in range(N_ETA - 1) for i in range(N_XI)
    ]
    u_df = spark.createDataFrame(u_rows, "i int, j int, u double")
    v_df = spark.createDataFrame(v_rows, "i int, j int, v double")
    out = rotate_staggered_uv(g, u_df, v_df)

    # numpy golden: the reference's exact array recipe (wcofs.py:362-396)
    u_arr = np.array(
        [[1 + i + 2 * j for i in range(N_XI - 1)] for j in range(N_ETA)],
        dtype=np.float64,
    )
    v_arr = np.array(
        [[2 - i + 3 * j for i in range(N_XI)] for j in range(N_ETA - 1)],
        dtype=np.float64,
    )
    ang = np.zeros((N_ETA, N_XI))
    for r in g.filter("grid_name = 'rho'").collect():
        ang[r.j, r.i] = r.angle
    east_g, north_g = K.rotate_uv(
        u_arr[:-1, :], v_arr[:, :-1], ang[:-1, :-1]
    )

    got = {(r.i, r.j): r for r in out.collect()}
    for j in range(N_ETA - 1):
        for i in range(N_XI - 1):
            assert abs(got[(i, j)].east - east_g[j, i]) < 1e-12
            assert abs(got[(i, j)].north - north_g[j, i]) < 1e-12
    # pads: east null on the last u-grid row, north null on last v-grid col
    for i in range(N_XI - 1):
        assert got[(i, N_ETA - 1)].east is None
    for j in range(N_ETA - 1):
        assert got[(N_XI - 1, j)].north is None
    assert len(got) == (N_ETA - 1) * (N_XI - 1) + (N_XI - 1) + (N_ETA - 1)

    # the grid side must broadcast (dimension-table contract)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_grid_angle_across_antimeridian(spark):
    """Round-4 review fix: with an identity pole the grid is east-aligned
    (angle ~ 0 everywhere) even where the central-difference lon pair
    straddles ±180; the unwrapped difference used to flip those cells'
    angle by ~pi."""
    g = build_curvilinear_grid(
        spark, 6, 4, rlon0=178.6, rlat0=-1.0, step=0.5,
        pole_lon=0.0, pole_lat=90.0,  # identity rotation
    )
    rho = g.filter("grid_name = 'rho'").collect()
    lons = sorted(r.lon for r in rho)
    assert lons[0] < -179 and lons[-1] > 179  # fixture really straddles
    for r in rho:
        assert abs(r.angle) < 1e-9, (r.i, r.j, r.lon, r.angle)
