"""Curvilinear staggered-grid dimension tables (round 4 — VERDICT r03
task 5; the reference's richest data structure).

The reference builds four ROMS sub-grids — rho (cell faces), u (xi
edges), v (eta edges), psi (nodes) — each with 2-D lon/lat matrices, a
land/sea mask, plus a per-cell rotation angle on rho, and discovers which
sub-grid each NetCDF variable lives on from its `location` attribute
(ref: PyOFS/model/wcofs.py:42-62 GRID_LOCATIONS/STATIC_VARIABLES,
wcofs.py:218-321 grid load + variable→grid map). This module is the
engine-side analog: ONE long-form broadcast dimension table
(grid_name, i, j, lon, lat, mask, angle) generated from the rotated-pole
transform, plus the discovery map and the staggered u/v→east/north
rotation operator that consumes it.

Scale shape: the grid is a DIMENSION (WCOFS 4-km: ~2.4M cells — a few
hundred MB as long-form rows), built once driver-side in numpy and
broadcast; every fact-side consumer (J7 stagger zip, C4 rotation, J5
masking) joins it with a BroadcastHashJoin, so no shuffle ever moves the
fact table by grid key. At a 2-km or finer grid where broadcast no longer
fits, write the same table bucketed by (grid_name, i) instead and the
joins stay co-located.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.kernels import rotated_pole_unrotate

# ref: wcofs.py:42 — NetCDF `location` attr value → sub-grid name
GRID_LOCATIONS = {"face": "rho", "edge1": "u", "edge2": "v", "node": "psi"}

# sub-grid node positions in ROTATED-grid step units, relative to the
# grid origin: (xi offset, eta offset, n_xi extent delta, n_eta delta).
# rho = cell centers; u = interior xi-edges; v = interior eta-edges;
# psi = interior nodes (standard ROMS C-grid staggering).
_STAGGER = {
    "rho": (0.5, 0.5, 0, 0),
    "u": (1.0, 0.5, -1, 0),
    "v": (0.5, 1.0, 0, -1),
    "psi": (1.0, 1.0, -1, -1),
}

WCOFS_POLE = (-57.6, 37.4)  # ref: wcofs.py:37 ROTATED_POLE


def variable_grid_map(var_attrs: dict[str, dict]) -> dict[str, str]:
    """Variable → sub-grid discovery (ref: wcofs.py:218-251): a variable
    with a `location` attribute maps through GRID_LOCATIONS; otherwise
    u/v land on their own edge grids and everything else on rho."""
    out = {}
    for name, attrs in var_attrs.items():
        loc = attrs.get("location")
        if loc is not None:
            out[name] = GRID_LOCATIONS[loc]
        else:
            out[name] = name if name in ("u", "v") else "rho"
    return out


def build_curvilinear_grid(
    spark: SparkSession,
    n_xi: int,
    n_eta: int,
    rlon0: float,
    rlat0: float,
    step: float,
    pole_lon: float = WCOFS_POLE[0],
    pole_lat: float = WCOFS_POLE[1],
    mask_fn=None,
) -> DataFrame:
    """Build the four-sub-grid dimension table: (grid_name string, i int,
    j int, lon double, lat double, mask boolean, angle double).

    The 2-D lon/lat matrices come from the rotated-pole UNROTATION of a
    regular grid in rotated coordinates (exactly how the WCOFS grid is
    defined; kernel: functions/kernels.py:rotated_pole_unrotate). `angle`
    — the local angle between the grid's xi direction and true east, the
    quantity the reference stores per rho cell and uses to rotate u/v to
    east/north (wcofs.py:371-396) — is computed by central difference
    along xi on the sphere: atan2(dlat, cos(lat)·dlon). mask defaults to
    all-sea; pass mask_fn(lon, lat)->bool for a land mask."""
    frames = []
    for gname, (ox, oy, dxi, deta) in _STAGGER.items():
        nx, ny = n_xi + dxi, n_eta + deta
        ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="xy")
        rlon = rlon0 + (ii + ox) * step
        rlat = rlat0 + (jj + oy) * step
        lon, lat = rotated_pole_unrotate(rlon, rlat, pole_lon, pole_lat)
        if gname == "rho":
            # central difference along xi at ±step/4 around each center
            lon_p, lat_p = rotated_pole_unrotate(
                rlon + step / 4, rlat, pole_lon, pole_lat
            )
            lon_m, lat_m = rotated_pole_unrotate(
                rlon - step / 4, rlat, pole_lon, pole_lat
            )
            # wrap dlon into (-180, 180]: across the antimeridian the
            # raw difference is ~±360 and would flip the angle by ~π
            dlon = (lon_p - lon_m + 180.0) % 360.0 - 180.0
            angle = np.arctan2(
                lat_p - lat_m, np.cos(np.radians(lat)) * dlon
            )
        else:
            angle = np.full(lon.shape, np.nan)
        mask = (
            mask_fn(lon, lat) if mask_fn is not None
            else np.ones(lon.shape, dtype=bool)
        )
        frames.append(
            pd.DataFrame(
                {
                    "grid_name": gname,
                    "i": ii.ravel().astype(np.int32),
                    "j": jj.ravel().astype(np.int32),
                    "lon": lon.ravel(),
                    "lat": lat.ravel(),
                    "mask": mask.ravel(),
                    "angle": angle.ravel(),
                }
            )
        )
    return spark.createDataFrame(
        pd.concat(frames, ignore_index=True),
        "grid_name string, i int, j int, lon double, lat double, "
        "mask boolean, angle double",
    )


def rotate_staggered_uv(
    grid: DataFrame, u_vals: DataFrame, v_vals: DataFrame
) -> DataFrame:
    """Staggered u/v → true east/north through the grid dim table
    (ref: wcofs.py:362-396): align u[:-1, :], v[:, :-1] and
    theta = angle[:-1, :-1] on the common (n_eta-1, n_xi-1) block, rotate
    east = u·cosθ − v·sinθ / north = u·sinθ + v·cosθ, then NaN-pad east's
    last eta row and north's last xi column back to the u/v grid shapes
    (the reference's exact concatenate-NaN step).

    u_vals: (i, j, u) on the u grid; v_vals: (i, j, v) on the v grid.
    Returns (i, j, east, north) — east null on the pad row, north null on
    the pad column. The grid side broadcasts (dimension table); the fact
    tables meet in ONE (i, j) shuffle."""
    ext = grid.groupBy().agg(
        F.max(F.when(F.col("grid_name") == "u", F.col("j"))).alias("ju"),
        F.max(F.when(F.col("grid_name") == "v", F.col("i"))).alias("iv"),
    ).collect()[0]
    if ext.ju is None or ext.iv is None:
        raise ValueError(
            "grid table must contain 'u' and 'v' sub-grid rows "
            "(build_curvilinear_grid emits all four sub-grids)"
        )
    # u grid is (n_eta, n_xi-1), v grid (n_eta-1, n_xi); the aligned block
    # u[:-1, :] / v[:, :-1] / angle[:-1, :-1] spans i,j in [0, n_xi-2] ×
    # [0, n_eta-2]
    max_i, max_j = ext.iv - 1, ext.ju - 1
    ang = grid.filter(
        (F.col("grid_name") == "rho")
        & (F.col("i") <= max_i)
        & (F.col("j") <= max_j)
    ).select("i", "j", "angle")
    uu = u_vals.filter(F.col("j") <= max_j).select("i", "j", "u")
    vv = v_vals.filter(F.col("i") <= max_i).select("i", "j", "v")
    core = (
        uu.join(vv, ["i", "j"])
        .join(F.broadcast(ang), ["i", "j"])
        .select(
            "i",
            "j",
            (
                F.col("u") * F.cos("angle") - F.col("v") * F.sin("angle")
            ).alias("east"),
            (
                F.col("u") * F.sin("angle") + F.col("v") * F.cos("angle")
            ).alias("north"),
        )
    )
    # NaN pads: east gets a null row at j = n_eta-1 (back to the u-grid
    # shape), north a null column at i = n_xi-1 (back to the v-grid shape)
    pad_row = u_vals.filter(F.col("j") > max_j).select(
        "i", "j",
        F.lit(None).cast("double").alias("east"),
        F.lit(None).cast("double").alias("north"),
    )
    pad_col = v_vals.filter(F.col("i") > max_i).select(
        "i", "j",
        F.lit(None).cast("double").alias("east"),
        F.lit(None).cast("double").alias("north"),
    )
    return core.unionByName(pad_row).unionByName(pad_col)
