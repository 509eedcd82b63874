"""Advection property tests against the closed-form Rankine vortex
(the reference's one analytic fixture, particle_contour.py:118-192)."""

from __future__ import annotations

import numpy as np

from pyofs_spark.operators.advection import (
    circle_contour,
    contour_metrics,
    rankine_vortex,
    respace_contour_pandas,
    track_contour,
)


def test_rankine_solid_rotation_preserves_contour(spark):
    """A contour inside the solid-body core rotates rigidly: radius, area
    and perimeter are conserved (the reference's sanity property)."""
    field = rankine_vortex(0.0, 0.0, radius=10_000.0, peak_speed=1.0)
    # circle of radius 2km around a point 4km from center → fully in core
    seed = circle_contour(spark, 1.0, 4_000.0, 0.0, 2_000.0, n_vertices=48)
    # core angular velocity ω = peak/R = 1e-4 rad/s; 100 steps of 60s
    traj = track_contour(spark, seed, field, t0=0.0, dt=60.0, n_steps=100, order=4)
    m = {r.step: r for r in contour_metrics(traj).collect()}
    a0, p0 = m[0].area, m[0].perimeter
    aN, pN = m[100].area, m[100].perimeter
    assert abs(aN - a0) / a0 < 1e-3
    assert abs(pN - p0) / p0 < 1e-3
    # centroid rotated by ω·t around origin
    last = traj.filter("step = 100").toPandas()
    cx, cy = last["x"].mean(), last["y"].mean()
    omega = 1.0 / 10_000.0
    theta = omega * 60.0 * 100
    ex, ey = 4_000.0 * np.cos(theta), 4_000.0 * np.sin(theta)
    assert np.hypot(cx - ex, cy - ey) < 25.0  # <25 m after 6000 s (RK4)


def test_rk_order_accuracy(spark):
    """RK4 must beat RK1 on the same problem (order-of-accuracy sanity)."""
    field = rankine_vortex(0.0, 0.0, radius=10_000.0, peak_speed=1.0)
    seed = circle_contour(spark, 1.0, 4_000.0, 0.0, 1_000.0, n_vertices=8)
    errs = {}
    omega = 1e-4
    for order in (1, 4):
        traj = track_contour(spark, seed, field, 0.0, 300.0, 20, order=order)
        last = traj.filter("step = 20").toPandas()
        theta = omega * 300.0 * 20
        cx, cy = last["x"].mean(), last["y"].mean()
        errs[order] = np.hypot(cx - 4_000.0 * np.cos(theta), cy - 4_000.0 * np.sin(theta))
    assert errs[4] < errs[1] / 10


def test_respace_preserves_shape(spark):
    field = rankine_vortex(0.0, 0.0, 10_000.0, 1.0)
    seed = circle_contour(spark, 1.0, 0.0, 0.0, 3_000.0, n_vertices=12)
    traj = track_contour(spark, seed, field, 0.0, 60.0, 2)
    re = respace_contour_pandas(traj, n_out=36)
    pdf = re.toPandas()
    assert set(pdf["step"]) == {0, 1, 2}
    # re-spaced vertices stay on the circle (radius 3000) at step 0
    s0 = pdf[pdf["step"] == 0]
    r = np.hypot(s0["x"], s0["y"])
    assert len(s0) == 36
    # linear interp between 12 coarse vertices cuts chords: worst-case sag
    # is r*cos(pi/12) ≈ 0.966 r — tolerance covers geometry, not error
    assert np.allclose(r, 3_000.0, rtol=0.04)
    # equal spacing: consecutive arc distances all similar
    xs, ys = s0.sort_values("vertex_idx")["x"].to_numpy(), s0.sort_values("vertex_idx")["y"].to_numpy()
    seg = np.hypot(np.diff(xs), np.diff(ys))
    assert seg.std() / seg.mean() < 0.05


def test_grouped_equals_driver_loop(spark):
    """The long-horizon shape (whole step loop inside one applyInPandas
    group per contour — one shuffle, O(1) plan) must agree bit-for-bit with
    the driver loop: the per-step math is the same elementwise numpy RK."""
    from pyofs_spark.operators.advection import track_contour_grouped

    field = rankine_vortex(0.0, 0.0, 10_000.0, 1.0)
    seeds = circle_contour(spark, 1.0, 4_000.0, 0.0, 2_000.0, n_vertices=16).unionByName(
        circle_contour(spark, 2.0, -3_000.0, 1_000.0, 1_500.0, n_vertices=16)
    )
    a = track_contour(spark, seeds, field, 0.0, 60.0, 25, order=4).toPandas()
    b = track_contour_grouped(spark, seeds, field, 0.0, 60.0, 25, order=4).toPandas()
    key = ["contour_id", "step", "vertex_idx"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) == 2 * 16 * 26
    np.testing.assert_array_equal(a["x"].to_numpy(), b["x"].to_numpy())
    np.testing.assert_array_equal(a["y"].to_numpy(), b["y"].to_numpy())
    # long horizon smoke: 400 steps in one pass, plan stays O(1)
    long = track_contour_grouped(spark, seeds, field, 0.0, 60.0, 400, order=2)
    assert long.filter("step = 400").count() == 32


def test_gridded_field_matches_analytic(spark):
    """grid_field (bilinear space + linear time interp, the reference's
    per-RK-stage composition) reproduces the analytic trajectory when the
    time dependence is linear between snapshots and the grid is fine
    (ref: particle_contour.py:401-465)."""
    from pyofs_spark.operators.advection import grid_field, sample_field_to_grid

    base = rankine_vortex(0.0, 0.0, radius=10_000.0, peak_speed=1.0)

    def scaled(x, y, t):
        u, v = base(x, y, t)
        s = 1.0 + t / 2400.0  # linear ramp -> time interp is EXACT
        return s * u, s * v

    gx = np.arange(-12_000.0, 12_001.0, 250.0)
    gy = np.arange(-12_000.0, 12_001.0, 250.0)
    times = np.array([0.0, 300.0, 600.0, 900.0, 1200.0])
    us, vs = sample_field_to_grid(scaled, times, gx, gy)
    gridded = grid_field(times, gx, gy, us, vs)

    seed = circle_contour(spark, 1.0, 4_000.0, 0.0, 2_000.0, n_vertices=24)
    tg = track_contour(spark, seed, gridded, 0.0, 120.0, 10, order=4)
    ta = track_contour(spark, seed, scaled, 0.0, 120.0, 10, order=4)
    g = tg.filter("step = 10").toPandas().sort_values("vertex_idx")
    a = ta.filter("step = 10").toPandas().sort_values("vertex_idx")
    d = np.hypot(g["x"].to_numpy() - a["x"].to_numpy(),
                 g["y"].to_numpy() - a["y"].to_numpy())
    # total drift after 1200s at ~1.4 m/s is ~1.7 km; bilinear-vs-analytic
    # velocity error on a 250 m grid keeps the divergence to meters
    assert d.max() < 5.0, d.max()
    # clamped (ffill) outside the last snapshot: field at t>1200 equals t=1200
    u_end, v_end = gridded(np.array([4000.0]), np.array([0.0]), 1200.0)
    u_post, v_post = gridded(np.array([4000.0]), np.array([0.0]), 5000.0)
    assert u_end[0] == u_post[0] and v_end[0] == v_post[0]
    # out-of-grid -> NaN (bilinear contract)
    u_out, _ = gridded(np.array([50_000.0]), np.array([0.0]), 0.0)
    assert np.isnan(u_out[0])
