"""Golden-kernel tests: the numpy reference-exact kernels against closed-form
fixed points and internal consistency (SURVEY §5 item 1)."""

from __future__ import annotations

import numpy as np

from pyofs_spark.functions import kernels as K
from pyofs_spark.functions import polygons as P

WCOFS_POLE = (-57.6, 37.4)  # ref: PyOFS/model/wcofs.py:37


def test_rotated_pole_roundtrip():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-170, 170, 500)
    lat = rng.uniform(-80, 80, 500)
    rlon, rlat = K.rotated_pole_rotate(lon, lat, *WCOFS_POLE)
    lon2, lat2 = K.rotated_pole_unrotate(rlon, rlat, *WCOFS_POLE)
    # longitudes wrap
    dlon = (lon2 - lon + 180) % 360 - 180
    assert np.allclose(dlon, 0, atol=1e-9)
    assert np.allclose(lat2, lat, atol=1e-9)


def test_rotated_pole_fixed_point():
    # the rotated-pole north pole maps to the geographic pole location
    lon, lat = K.rotated_pole_unrotate(np.array([0.0]), np.array([90.0]), *WCOFS_POLE)
    assert abs(lat[0] - WCOFS_POLE[1]) < 1e-9
    dlon = (lon[0] - WCOFS_POLE[0] + 180) % 360 - 180
    assert abs(dlon) < 1e-9


def test_rotate_uv_identity_and_quarter_turn():
    u, v = np.array([1.0, 2.0]), np.array([0.0, -1.0])
    u0, v0 = K.rotate_uv(u, v, np.zeros(2))
    assert np.allclose(u0, u) and np.allclose(v0, v)
    u9, v9 = K.rotate_uv(u, v, np.full(2, np.pi / 2))
    assert np.allclose(u9, -v, atol=1e-12) and np.allclose(v9, u, atol=1e-12)


def test_dir_mag_quadrants():
    # ref convention: dir = (atan2(u, v) + pi) * 180/pi  (wcofs.py:629-633)
    d, m = K.dir_mag(np.array([0.0, 1.0, 0.0, -1.0]), np.array([1.0, 0.0, -1.0, 0.0]))
    assert np.allclose(d, [180.0, 270.0, 360.0, 90.0] if d[2] == 360.0 else [180.0, 270.0, 0.0, 90.0])
    assert np.allclose(m, 1.0)


def test_regrid_nearest_basic_and_ties():
    # two source points equidistant from query → min index wins
    in_lon = np.array([0.0, 2.0])
    in_lat = np.array([0.0, 0.0])
    vals = np.array([10.0, 20.0])
    out = K.regrid_nearest(in_lon, in_lat, vals, np.array([1.0]), np.array([0.0]))
    assert out[0] == 10.0  # tie → first (min source index)
    # NaN sources dropped
    out2 = K.regrid_nearest(in_lon, in_lat, np.array([np.nan, 20.0]), np.array([0.1]), np.array([0.0]))
    assert out2[0] == 20.0


def test_bilinear_exact_on_plane():
    # bilinear reproduces a plane exactly
    glon = np.linspace(0, 4, 5)
    glat = np.linspace(0, 3, 4)
    gv = glat[:, None] * 2.0 + glon[None, :] * 3.0
    q_lon = np.array([0.5, 1.7, 3.99, 4.0, 4.2])
    q_lat = np.array([0.5, 2.3, 0.01, 3.0, 1.0])
    out = K.bilinear_interp(glon, glat, gv, q_lon, q_lat)
    expect = q_lat * 2.0 + q_lon * 3.0
    assert np.allclose(out[:4], expect[:4], atol=1e-12)
    assert np.isnan(out[4])  # outside grid


def test_sses_and_kelvin():
    sst_c = K.sst_from_kelvin(np.array([283.15, -1.0, 0.0]))
    assert np.isclose(sst_c[0], 10.0)
    assert np.isnan(sst_c[1]) and np.isnan(sst_c[2])
    corrected = K.sses_correct(np.array([10.0]), np.array([2.548]))
    assert np.isclose(corrected[0], 9.5)  # bias = 2.548 - 2.048 = 0.5
    # stored raw bias 0 and NaN both mean missing → bias 0 (the convention
    # pinned by the oracle-gated sst_sses_pipeline SQL twin)
    zero_nan = K.sses_correct(np.array([10.0, 10.0]), np.array([0.0, np.nan]))
    assert np.allclose(zero_nan, [10.0, 10.0])


def test_mean_semantics():
    stack = np.array([[1.0, np.nan], [3.0, 4.0]])
    prop = K.nan_propagating_mean(stack, axis=0)
    skip = K.nan_skipping_mean(stack, axis=0)
    assert prop[0] == 2.0 and np.isnan(prop[1])
    assert skip[0] == 2.0 and skip[1] == 4.0


def test_overview_pyramid():
    g = np.arange(16, dtype=float).reshape(4, 4)
    lv = K.overview_pyramid(g, 2)
    assert lv[0].shape == (2, 2) and lv[1].shape == (1, 1)
    assert np.isclose(lv[0][0, 0], np.mean([0, 1, 4, 5]))
    assert np.isclose(lv[1][0, 0], np.mean(lv[0]))


def test_rmse_r2():
    x = np.array([1.0, 2.0, 3.0, np.nan])
    y = np.array([1.5, 2.5, 2.5, 9.9])
    assert np.isclose(K.rmse(x, y), np.sqrt(np.nanmean((x - y) ** 2)))
    assert K.r_squared(x, x) == 1.0


def test_web_mercator_fixed_points():
    x, y = K.to_web_mercator(np.array([0.0, 180.0]), np.array([0.0, 0.0]))
    assert np.isclose(x[0], 0.0) and np.isclose(y[0], 0.0)
    assert np.isclose(x[1], 20037508.342789244)


def test_pip_numpy_fixtures():
    # inside concave coastal polygon
    assert P.pip_numpy(np.array([-122.0]), np.array([36.0]), P.COASTAL_POLY)[0]
    # outside
    assert not P.pip_numpy(np.array([-100.0]), np.array([36.0]), P.COASTAL_POLY)[0]
    # donut: inside ring → outside polygon (even-odd)
    assert not P.pip_numpy(np.array([-150.0]), np.array([20.0]), P.DONUT_POLY)[0]
    # donut: between rings → inside
    assert P.pip_numpy(np.array([-157.0]), np.array([20.0]), P.DONUT_POLY)[0]
    # antimeridian lobes
    assert P.pip_numpy(np.array([175.0]), np.array([0.0]), P.ANTIMERIDIAN_POLY_EAST)[0]
    assert P.pip_numpy(np.array([-175.0]), np.array([0.0]), P.ANTIMERIDIAN_POLY_WEST)[0]
