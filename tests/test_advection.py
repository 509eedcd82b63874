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
