"""Particle / contour advection through a velocity field — the Spark
re-expression of the reference's tracking subsystem
(ref: main/tracking/particle_contour.py: VectorField:21, RankineVortex:118,
ParticleContour.step:761-811, track_contour:997-1028).

Model: state = vertex table (contour_id, vertex_idx, x, y) in Web-Mercator
meters; each step evaluates the velocity field at vertex positions and
advances with order-k Runge-Kutta (RK1 Euler, RK2 midpoint, RK4 classic —
the reference's `order` parameter). The driver loop iterates steps; each
step is a narrow map over the vertex table (velocity fields here are
closed-form or broadcast grids), with `localCheckpoint` every few steps to
truncate lineage — the batch analog of streaming state (SURVEY §2.10 T5).

Fields are python callables (lon/lat arrays → u,v arrays) evaluated inside
an Arrow-batched pandas UDF — vectorized per batch, never per row. The
RankineVortex closed-form field doubles as the analytic property test
(solid-body rotation preserves radius/area; particle_contour.py:118-160).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import materialize as _materialize
from pyspark.sql.types import DoubleType, StructField, StructType

FieldFn = Callable[[np.ndarray, np.ndarray, float], tuple[np.ndarray, np.ndarray]]


def rankine_vortex(
    center_x: float, center_y: float, radius: float, peak_speed: float
) -> FieldFn:
    """Closed-form Rankine vortex (ref: particle_contour.py:118-160):
    solid-body rotation inside `radius`, decaying 1/r outside."""

    def field(x: np.ndarray, y: np.ndarray, t: float):
        dx, dy = x - center_x, y - center_y
        r = np.hypot(dx, dy)
        with np.errstate(divide="ignore", invalid="ignore"):
            speed = np.where(r <= radius, peak_speed * r / radius, peak_speed * radius / np.maximum(r, 1e-12))
            ux = np.where(r > 0, -dy / np.maximum(r, 1e-12) * speed, 0.0)
            uy = np.where(r > 0, dx / np.maximum(r, 1e-12) * speed, 0.0)
        return ux, uy

    return field


def grid_field(
    times: np.ndarray,
    grid_x: np.ndarray,
    grid_y: np.ndarray,
    u_stack: np.ndarray,
    v_stack: np.ndarray,
) -> FieldFn:
    """Velocity field from a GRIDDED snapshot stack — the reference's
    per-RK-stage interpolation re-expressed (ref: particle_contour.py:
    401-465: xarray .interp bilinear in space at the bfill/ffill-bracketed
    snapshots, then linear .interp in time; bfill/ffill at :421-429).

    times: (T,) ascending; u_stack/v_stack: (T, ny, nx) on the regular
    (grid_x, grid_y) lattice. Clamped to the end snapshots outside
    [times[0], times[-1]] (ffill/bfill edge semantics); out-of-grid
    positions → NaN (kernels.bilinear_interp contract).

    Scale note: an ocean-model velocity grid is dim-sized (MBs), so the
    stack ships to executors inside the mapInPandas closure (a broadcast);
    each RK stage is then a numpy batch evaluation — the J3 (bilinear) +
    J6 (as-of time) composition INSIDE the iterative loop, with no join.
    A grid too large to broadcast would instead be tiled and the particle
    table co-partitioned by tile."""
    from ..functions.kernels import bilinear_interp

    ts = np.asarray(times, np.float64)
    us = np.asarray(u_stack, np.float64)
    vs = np.asarray(v_stack, np.float64)

    def field(x: np.ndarray, y: np.ndarray, t: float):
        # bracketing snapshots, clamped (bfill/ffill at the ends)
        k1 = int(np.clip(np.searchsorted(ts, t, side="right"), 1, len(ts) - 1))
        k0 = k1 - 1
        if t <= ts[0]:
            w = 0.0
        elif t >= ts[-1]:
            w = 1.0
        else:
            w = (t - ts[k0]) / (ts[k1] - ts[k0])
        u0 = bilinear_interp(grid_x, grid_y, us[k0], x, y)
        v0 = bilinear_interp(grid_x, grid_y, vs[k0], x, y)
        if w == 0.0:
            return u0, v0
        u1 = bilinear_interp(grid_x, grid_y, us[k1], x, y)
        v1 = bilinear_interp(grid_x, grid_y, vs[k1], x, y)
        return (1 - w) * u0 + w * u1, (1 - w) * v0 + w * v1

    return field


def sample_field_to_grid(
    field: FieldFn,
    times: np.ndarray,
    grid_x: np.ndarray,
    grid_y: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Sample an analytic field onto a (T, ny, nx) snapshot stack — the
    test/demo generator for grid_field (stands in for reading a model's
    NetCDF velocity output)."""
    xx, yy = np.meshgrid(np.asarray(grid_x), np.asarray(grid_y))
    u = np.empty((len(times), len(grid_y), len(grid_x)))
    v = np.empty_like(u)
    for k, t in enumerate(times):
        uk, vk = field(xx.ravel(), yy.ravel(), float(t))
        u[k] = uk.reshape(xx.shape)
        v[k] = vk.reshape(xx.shape)
    return u, v


_RK_TABLEAU = {
    1: ([0.0], [1.0]),
    2: ([0.0, 0.5], [0.0, 1.0]),
    4: ([0.0, 0.5, 0.5, 1.0], [1 / 6, 1 / 3, 1 / 3, 1 / 6]),
}

_STEP_SCHEMA = StructType(
    [
        StructField("contour_id", DoubleType(), False),
        StructField("vertex_idx", DoubleType(), False),
        StructField("x", DoubleType(), False),
        StructField("y", DoubleType(), False),
    ]
)


def rk_step(
    vertices: DataFrame,
    field: FieldFn,
    t: float,
    dt: float,
    order: int = 4,
) -> DataFrame:
    """One RK step of every vertex (ref: ParticleContour.step:761-811 —
    k1..k4 field evaluations then weighted update). mapInPandas keeps the
    field evaluation vectorized per Arrow batch."""
    stages, weights = _RK_TABLEAU[order]

    def _advance(batches):
        for pdf in batches:
            x = pdf["x"].to_numpy(dtype=np.float64)
            y = pdf["y"].to_numpy(dtype=np.float64)
            ks = []
            for c in stages:
                if not ks:
                    px, py = x, y
                else:
                    kx, ky = ks[-1]
                    px, py = x + c * dt * kx, y + c * dt * ky
                ks.append(field(px, py, t + c * dt))
            nx = x + dt * sum(w * k[0] for w, k in zip(weights, ks))
            ny = y + dt * sum(w * k[1] for w, k in zip(weights, ks))
            yield pd.DataFrame(
                {
                    "contour_id": pdf["contour_id"],
                    "vertex_idx": pdf["vertex_idx"],
                    "x": nx,
                    "y": ny,
                }
            )

    return vertices.select("contour_id", "vertex_idx", "x", "y").mapInPandas(
        _advance, "contour_id double, vertex_idx double, x double, y double"
    )


def track_contour(
    spark: SparkSession,
    vertices: DataFrame,
    field: FieldFn,
    t0: float,
    dt: float,
    n_steps: int,
    order: int = 4,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Driver-loop advection (ref: track_contour:997-1028). Returns the
    trajectory table (step, contour_id, vertex_idx, x, y).

    checkpoint_every=1 (round 6): the returned trajectory UNIONS every
    step's frame, and Spark does not share common subplans across union
    branches — with cadence k, frame s within a window re-executes s
    chained Python stages, an O(k²) recompute per window (measured 30%
    of the query). Vertex tables are small by contract, so materializing
    each step trades negligible storage for linear total work; raise the
    cadence only for huge vertex tables where checkpoint I/O dominates."""
    cur = vertices.select("contour_id", "vertex_idx", "x", "y")
    frames = [cur.withColumn("step", F.lit(0))]
    for s in range(1, n_steps + 1):
        cur = rk_step(cur, field, t0 + (s - 1) * dt, dt, order)
        if s % checkpoint_every == 0:
            cur = _materialize(cur)
        frames.append(cur.withColumn("step", F.lit(s)))
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def track_contour_grouped(
    spark: SparkSession,
    vertices: DataFrame,
    field: FieldFn,
    t0: float,
    dt: float,
    n_steps: int,
    order: int = 4,
) -> DataFrame:
    """LONG-HORIZON advection shape: the whole step loop runs INSIDE one
    applyInPandas group per contour (state carried in numpy between steps),
    so the job is ONE shuffle total and the plan is O(1) in n_steps — vs
    track_contour's driver loop whose unioned plan grows linearly with the
    horizon (fine at reference-scale step counts, wrong at hundreds+).

    Per-step math is the identical elementwise numpy RK evaluation as
    rk_step, so the two shapes agree bit-for-bit (pytest-pinned:
    tests/test_advection.py::test_grouped_equals_driver_loop). Use this
    when n_steps ≫ 100 or contour count ≫ cores; use the driver loop when
    a horizon must be inspected/checkpointed incrementally. Contours are
    small by contract (vertex lists fit a group); fields ride the closure
    exactly as in rk_step."""
    stages, weights = _RK_TABLEAU[order]

    def _track(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vertex_idx")
        cid = pdf["contour_id"].to_numpy(dtype=np.float64)
        vid = pdf["vertex_idx"].to_numpy(dtype=np.float64)
        x = pdf["x"].to_numpy(dtype=np.float64)
        y = pdf["y"].to_numpy(dtype=np.float64)
        frames = [(0, x, y)]
        for s in range(1, n_steps + 1):
            t = t0 + (s - 1) * dt
            ks: list[tuple[np.ndarray, np.ndarray]] = []
            for c in stages:
                if not ks:
                    px, py = x, y
                else:
                    kx, ky = ks[-1]
                    px, py = x + c * dt * kx, y + c * dt * ky
                ks.append(field(px, py, t + c * dt))
            x = x + dt * sum(w * k[0] for w, k in zip(weights, ks))
            y = y + dt * sum(w * k[1] for w, k in zip(weights, ks))
            frames.append((s, x, y))
        return pd.concat(
            pd.DataFrame(
                {"step": s, "contour_id": cid, "vertex_idx": vid, "x": fx, "y": fy}
            )
            for s, fx, fy in frames
        )

    return (
        vertices.select("contour_id", "vertex_idx", "x", "y")
        .groupBy("contour_id")
        .applyInPandas(
            _track,
            "step int, contour_id double, vertex_idx double, x double, y double",
        )
    )


def circle_contour(
    spark: SparkSession,
    contour_id: float,
    center_x: float,
    center_y: float,
    radius: float,
    n_vertices: int = 64,
) -> DataFrame:
    """Seed contour (ref: CircleContour:853-889): N vertices on a circle."""
    return (
        spark.range(0, n_vertices, 1, 4)
        .select(
            F.lit(float(contour_id)).alias("contour_id"),
            F.col("id").cast("double").alias("vertex_idx"),
            (
                F.lit(center_x)
                + F.lit(radius) * F.cos(F.col("id") * (2 * np.pi / n_vertices))
            ).alias("x"),
            (
                F.lit(center_y)
                + F.lit(radius) * F.sin(F.col("id") * (2 * np.pi / n_vertices))
            ).alias("y"),
        )
    )


def contour_metrics(trajectory: DataFrame) -> DataFrame:
    """Polygon area (shoelace) + perimeter per (contour, step)
    (ref: utilities.py:357-385 area/perimeter props;
    particle_contour.py:1350-1395 output layer). Pure window/agg SQL:
    cyclic next-vertex via lead() with wrap-around first()."""
    from pyspark.sql import Window

    w = Window.partitionBy("contour_id", "step").orderBy("vertex_idx")
    t = (
        trajectory.withColumn("x2", F.coalesce(F.lead("x").over(w), F.first("x").over(w)))
        .withColumn("y2", F.coalesce(F.lead("y").over(w), F.first("y").over(w)))
    )
    return t.groupBy("contour_id", "step").agg(
        (F.abs(F.sum(F.col("x") * F.col("y2") - F.col("x2") * F.col("y"))) / 2).alias("area"),
        F.sum(F.hypot(F.col("x2") - F.col("x"), F.col("y2") - F.col("y"))).alias("perimeter"),
        F.count("*").alias("n_vertices"),
    )


def respace_contour_pandas(trajectory: DataFrame, n_out: int) -> DataFrame:
    """Re-space contour vertices equally along cumulative arc length
    (ref: interpolate_contour:1031-1062 — cumsum of distances + 1-D linear
    interp, W3/W4). Grouped-map per (contour, step): contours are small by
    contract, so per-group pandas is the right granularity."""

    def _respace(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vertex_idx")
        x = pdf["x"].to_numpy()
        y = pdf["y"].to_numpy()
        xc = np.append(x, x[0])
        yc = np.append(y, y[0])
        seg = np.hypot(np.diff(xc), np.diff(yc))
        cum = np.concatenate([[0.0], np.cumsum(seg)])
        total = cum[-1]
        new_s = np.linspace(0.0, total, n_out, endpoint=False)
        nx = np.interp(new_s, cum, xc)
        ny = np.interp(new_s, cum, yc)
        return pd.DataFrame(
            {
                "contour_id": pdf["contour_id"].iloc[0],
                "step": pdf["step"].iloc[0],
                "vertex_idx": np.arange(n_out, dtype=np.float64),
                "x": nx,
                "y": ny,
            }
        )

    return trajectory.groupBy("contour_id", "step").applyInPandas(
        _respace, "contour_id double, step int, vertex_idx double, x double, y double"
    )
