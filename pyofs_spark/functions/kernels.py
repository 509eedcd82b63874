"""Reference-exact numpy kernels.

Clean-room reimplementations of the PURE MATH the reference computes (cited
per function). These are the golden-test source of truth: the Spark SQL /
pandas-UDF implementations in operators/ and plans/ must reproduce them
exactly (joins/tiles) or to documented float tolerance (derived transcendental
fields). No code is copied from the reference — each kernel is rewritten from
its published formula.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Grid interpolation (the reference's spatial-join primitive)
# ---------------------------------------------------------------------------


def regrid_nearest(
    in_lon: np.ndarray,
    in_lat: np.ndarray,
    in_val: np.ndarray,
    out_lon: np.ndarray,
    out_lat: np.ndarray,
) -> np.ndarray:
    """1-NN scattered-data regrid.

    Semantics of wcofs.interpolate_grid(..., method='nearest')
    (ref: PyOFS/model/wcofs.py:1791-1827): drop NaN source cells, then for
    every output point take the value of the nearest source point.

    Deterministic tie-break (SURVEY §7.4 risk 1): minimum squared euclidean
    distance in degrees, then minimum source index. Euclidean-in-degrees is
    what scipy.griddata uses on raw lon/lat inputs, so semantics match.
    """
    in_lon = np.asarray(in_lon, np.float64).ravel()
    in_lat = np.asarray(in_lat, np.float64).ravel()
    in_val = np.asarray(in_val, np.float64).ravel()
    keep = ~np.isnan(in_val)
    slon, slat, sval = in_lon[keep], in_lat[keep], in_val[keep]
    qlon = np.asarray(out_lon, np.float64).ravel()
    qlat = np.asarray(out_lat, np.float64).ravel()
    if len(sval) == 0:
        return np.full(qlon.shape, np.nan)
    d2 = (qlon[:, None] - slon[None, :]) ** 2 + (qlat[:, None] - slat[None, :]) ** 2
    # argmin returns the FIRST minimal index → min distance then min src index
    return sval[np.argmin(d2, axis=1)]


def bilinear_interp(
    grid_lon: np.ndarray,
    grid_lat: np.ndarray,
    grid_val: np.ndarray,
    q_lon: np.ndarray,
    q_lat: np.ndarray,
) -> np.ndarray:
    """Bilinear interpolation on a regular grid at query points.

    Semantics of xarray `.interp()` over 1-D coords
    (ref: main/tracking/particle_contour.py:249-298). grid_val is
    (nlat, nlon); queries outside the grid → NaN.
    """
    glon = np.asarray(grid_lon, np.float64)
    glat = np.asarray(grid_lat, np.float64)
    v = np.asarray(grid_val, np.float64)
    qx = np.asarray(q_lon, np.float64).ravel()
    qy = np.asarray(q_lat, np.float64).ravel()
    out = np.full(qx.shape, np.nan)
    # in-domain (boundary inclusive, like xarray .interp); indices clamped so
    # points exactly on the max edges use the last cell with t == 1
    ok = (qx >= glon[0]) & (qx <= glon[-1]) & (qy >= glat[0]) & (qy <= glat[-1])
    i = np.clip(np.searchsorted(glon, qx, side="right") - 1, 0, len(glon) - 2)
    j = np.clip(np.searchsorted(glat, qy, side="right") - 1, 0, len(glat) - 2)
    tx = (qx - glon[i]) / (glon[i + 1] - glon[i])
    ty = (qy - glat[j]) / (glat[j + 1] - glat[j])
    val = (
        v[j, i] * (1 - tx) * (1 - ty)
        + v[j, i + 1] * tx * (1 - ty)
        + v[j + 1, i] * (1 - tx) * ty
        + v[j + 1, i + 1] * tx * ty
    )
    out[ok] = val[ok]
    return out


# ---------------------------------------------------------------------------
# Vector field math
# ---------------------------------------------------------------------------


def rotate_uv(u: np.ndarray, v: np.ndarray, angle_rad: np.ndarray):
    """Rotate grid-relative velocities to east/north by per-cell grid angle.

    u' = u*cos(a) - v*sin(a);  v' = u*sin(a) + v*cos(a)
    (ref: PyOFS/model/wcofs.py:371-396; particle_contour.py:510-515)
    """
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    return u * c - v * s, u * s + v * c


def dir_mag(u: np.ndarray, v: np.ndarray):
    """Direction/magnitude from velocity components.

    dir = (atan2(u, v) + pi) * 180/pi  ∈ [0, 360);  mag = hypot(u, v)
    (ref: PyOFS/model/wcofs.py:629-633; rtofs.py:366-371; hf_radar.py:493-498)
    """
    direction = (np.arctan2(u, v) + np.pi) * (180.0 / np.pi)
    magnitude = np.hypot(u, v)
    return direction, magnitude


def geostrophic_finite_diff(ssh: np.ndarray):
    """First differences of sea level along each axis with NaN pad
    (ref: particle_contour.py:1185-1220 `.diff` then pad)."""
    d_eta = np.full_like(ssh, np.nan)
    d_xi = np.full_like(ssh, np.nan)
    d_eta[1:, :] = ssh[1:, :] - ssh[:-1, :]
    d_xi[:, 1:] = ssh[:, 1:] - ssh[:, :-1]
    return d_eta, d_xi


# ---------------------------------------------------------------------------
# Satellite SST pipeline
# ---------------------------------------------------------------------------

KELVIN_OFFSET = 273.15  # ref: viirs.py:352-353, abi.py:348-349
SSES_OFFSET = 2.048  # ref: viirs.py:359-375 (stored bias is offset by 2.048)


def sst_from_kelvin(sst_k: np.ndarray) -> np.ndarray:
    """Kelvin→Celsius with sub-zero-Kelvin discard (ref: viirs.py:332-334,352-353)."""
    sst = np.where(sst_k <= 0, np.nan, sst_k)
    return sst - KELVIN_OFFSET


def sses_correct(sst_c: np.ndarray, sses_bias: np.ndarray) -> np.ndarray:
    """Subtract SSES bias. Convention (pinned by the oracle-gated SQL twin
    sst_sses_pipeline): stored raw bias 0 (or NaN) means missing → bias 0;
    otherwise unwrap the +2.048 storage offset (ref: viirs.py:336-375)."""
    missing = np.isnan(sses_bias) | (sses_bias == 0.0)
    bias = np.where(missing, 0.0, sses_bias - SSES_OFFSET)
    return sst_c - bias


def dop_mask(dopx: np.ndarray, dopy: np.ndarray, threshold: float = 0.5) -> np.ndarray:
    """HFR DOP quality mask: keep where dopx<=θ AND dopy<=θ
    (ref: PyOFS/observation/hf_radar.py:567-587)."""
    return (dopx <= threshold) & (dopy <= threshold)


# ---------------------------------------------------------------------------
# Geodesy (ref: PyOFS/utilities.py)
# ---------------------------------------------------------------------------

WGS84_A = 6378137.0
WGS84_B = 6356752.314245


def rotated_pole_unrotate(
    rlon_deg: np.ndarray, rlat_deg: np.ndarray, pole_lon: float, pole_lat: float
):
    """Rotated-pole → true geographic coordinates (spherical trig).

    Standard CF rotated-pole unrotation (the math behind
    PyOFS/utilities.py:254-289, WCOFS pole at (-57.6, 37.4), wcofs.py:37).
    """
    rlon = np.radians(np.asarray(rlon_deg, np.float64))
    rlat = np.radians(np.asarray(rlat_deg, np.float64))
    theta = np.radians(90.0 - pole_lat)  # rotation about y axis
    phi = np.radians(pole_lon)
    x = np.cos(rlon) * np.cos(rlat)
    y = np.sin(rlon) * np.cos(rlat)
    z = np.sin(rlat)
    x2 = np.cos(theta) * x + np.sin(theta) * z
    y2 = y
    z2 = -np.sin(theta) * x + np.cos(theta) * z
    x3 = np.cos(phi) * x2 - np.sin(phi) * y2
    y3 = np.sin(phi) * x2 + np.cos(phi) * y2
    lon = np.degrees(np.arctan2(y3, x3))
    lat = np.degrees(np.arcsin(np.clip(z2, -1.0, 1.0)))
    return lon, lat


def rotated_pole_rotate(
    lon_deg: np.ndarray, lat_deg: np.ndarray, pole_lon: float, pole_lat: float
):
    """Geographic → rotated-pole (inverse of unrotate; utilities.py:208-252)."""
    lon = np.radians(np.asarray(lon_deg, np.float64))
    lat = np.radians(np.asarray(lat_deg, np.float64))
    theta = np.radians(90.0 - pole_lat)
    phi = np.radians(pole_lon)
    x = np.cos(lon) * np.cos(lat)
    y = np.sin(lon) * np.cos(lat)
    z = np.sin(lat)
    x2 = np.cos(phi) * x + np.sin(phi) * y
    y2 = -np.sin(phi) * x + np.cos(phi) * y
    z2 = z
    x3 = np.cos(theta) * x2 - np.sin(theta) * z2
    y3 = y2
    z3 = np.sin(theta) * x2 + np.cos(theta) * z2
    rlon = np.degrees(np.arctan2(y3, x3))
    rlat = np.degrees(np.arcsin(np.clip(z3, -1.0, 1.0)))
    return rlon, rlat


EARTH_R = 6378137.0  # WebMercator sphere radius


def to_web_mercator(lon_deg: np.ndarray, lat_deg: np.ndarray):
    """WGS84 → EPSG:3857 closed form (ref: utilities.py:18-21 transformer;
    particle_contour.py:139-141). x = R*lon_rad; y = R*ln(tan(pi/4+lat/2))."""
    x = EARTH_R * np.radians(np.asarray(lon_deg, np.float64))
    y = EARTH_R * np.log(np.tan(np.pi / 4.0 + np.radians(lat_deg) / 2.0))
    return x, y


def geodetic_radius(lat_deg: np.ndarray) -> np.ndarray:
    """Earth radius at geodetic latitude (ref: utilities.py:388-410)."""
    lat = np.radians(np.asarray(lat_deg, np.float64))
    a, b = WGS84_A, WGS84_B
    num = (a**2 * np.cos(lat)) ** 2 + (b**2 * np.sin(lat)) ** 2
    den = (a * np.cos(lat)) ** 2 + (b * np.sin(lat)) ** 2
    return np.sqrt(num / den)


def coriolis_frequency(lat_deg: np.ndarray) -> np.ndarray:
    """f = 2 Ω sin(lat) (ref: utilities.py:413-424)."""
    omega = 7.2921e-5
    return 2.0 * omega * np.sin(np.radians(np.asarray(lat_deg, np.float64)))


# ---------------------------------------------------------------------------
# Aggregation semantics twins
# ---------------------------------------------------------------------------


def nan_propagating_mean(stack: np.ndarray, axis: int = 0) -> np.ndarray:
    """numpy.mean — any NaN in the stack poisons the cell
    (ref: wcofs.py:420-453 data_average)."""
    return np.mean(stack, axis=axis)


def nan_skipping_mean(stack: np.ndarray, axis: int = 0) -> np.ndarray:
    """numpy.nanmean (ref: rtofs.py:525, hf_radar.py:168, viirs.py:659)."""
    with np.errstate(invalid="ignore"):
        return np.nanmean(stack, axis=axis)


def overview_pyramid(grid: np.ndarray, levels: int) -> list[np.ndarray]:
    """Repeated 2x average-downsample (ref: PyOFS/__init__.py:202-209 +
    build_overviews(Resampling.average), wcofs.py:707-711). NaN-skipping mean
    per 2x2 block, like GDAL average resampling."""
    out = []
    g = grid
    for _ in range(levels):
        h, w = g.shape
        h2, w2 = (h + 1) // 2, (w + 1) // 2
        pad = np.full((h2 * 2, w2 * 2), np.nan)
        pad[:h, :w] = g
        blocks = pad.reshape(h2, 2, w2, 2).transpose(0, 2, 1, 3).reshape(h2, w2, 4)
        with np.errstate(invalid="ignore"):
            g = np.nanmean(blocks, axis=2)
        out.append(g)
    return out


def rmse(x: np.ndarray, y: np.ndarray) -> float:
    """sqrt(nanmean((x-y)^2)) (ref: data_assimilation_validation.py:252-262)."""
    with np.errstate(invalid="ignore"):
        return float(np.sqrt(np.nanmean((x - y) ** 2)))


def r_squared(obs: np.ndarray, model: np.ndarray) -> float:
    """1 - Σ(x-y)² / Σ(x-x̄)² (ref: data_assimilation_validation.py:265-277)."""
    m = ~(np.isnan(obs) | np.isnan(model))
    x, y = obs[m], model[m]
    ss_res = np.sum((x - y) ** 2)
    ss_tot = np.sum((x - np.mean(x)) ** 2)
    return float(1.0 - ss_res / ss_tot)
