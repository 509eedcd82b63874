"""Second geo/scalar query pack: rotated-pole transform, Web-Mercator,
geodesy, datetime rounding, orbit pass-times, antimeridian two-slice scan,
staggered-grid zip join, multi-satellite compose, polygon area/perimeter,
north-up flip — the remaining SURVEY §2.9/§2.4/§2.8 operator rows, each
with a DuckDB oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views
from .queries import GEODOC_DUCK, GEODOC_SPARK, register
from .queries_field import FIELD_SQL, round6

_PI = repr(math.pi) + "e0"


def _sql_query(name: str, body_spark: str, body_duck: str | None = None):
    def fn(spark: SparkSession, sf_dir: str, _body=body_spark) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_body)

    fn.__name__ = name
    register(name, body_duck if body_duck is not None else body_spark)(fn)
    return fn


# ---------------------------------------------------------------------------
# C6 — rotated-pole coordinate transform (WCOFS pole (-57.6, 37.4),
# ref: utilities.py:208-289, wcofs.py:37). Full spherical trig in portable
# SQL; outputs round6 (transcendental). Same math as kernels.rotated_pole_*.
# ---------------------------------------------------------------------------
_POLE_LON, _POLE_LAT = -57.6, 37.4
_TH = repr(math.radians(90.0 - _POLE_LAT)) + "e0"
_PH = repr(math.radians(_POLE_LON)) + "e0"


def _rot_sql(geodoc: str) -> str:
    return f"""
    WITH g AS (SELECT doc_id, lon, lat FROM {geodoc} gg),
    rad AS (
      SELECT doc_id, radians(lon) AS ln, radians(lat) AS lt FROM g
    ),
    xyz AS (
      SELECT doc_id,
             cos(ln) * cos(lt) AS x, sin(ln) * cos(lt) AS y, sin(lt) AS z
      FROM rad
    ),
    r1 AS (  -- Rz(-phi)
      SELECT doc_id,
             cos({_PH}) * x + sin({_PH}) * y AS x,
             -sin({_PH}) * x + cos({_PH}) * y AS y,
             z
      FROM xyz
    ),
    r2 AS (  -- Ry(-theta)
      SELECT doc_id,
             cos({_TH}) * x - sin({_TH}) * z AS x,
             y,
             sin({_TH}) * x + cos({_TH}) * z AS z
      FROM r1
    )
    SELECT doc_id,
           {round6('degrees(atan2(y, x))')} AS rlon,
           {round6('degrees(asin(least(1.0e0, greatest(-1.0e0, z))))')} AS rlat
    FROM r2
    """


# ---------------------------------------------------------------------------
# C6 BOTH directions in one gated query (round 3: the forward-only query is
# merged into the roundtrip one — the forward outputs rlon/rlat stay hashed
# — freeing a slot in the driver's 50-query window for an eng_* oracle).
# Forward: geographic → rotated pole; inverse: rotated → geographic
# (unrotate) + roundtrip check (ref: utilities.py:254-289 does both
# directions). Forward-rotate the geocoded docs, then apply the inverse
# rotation Rz(phi)·Ry(theta) and compare against the original coordinates.
# ---------------------------------------------------------------------------
def _unrot_sql(geodoc: str) -> str:
    return f"""
    WITH rot AS ({_rot_sql(geodoc)}),
    rad AS (
      SELECT doc_id, radians(rlon) AS ln, radians(rlat) AS lt FROM rot
    ),
    xyz AS (
      SELECT doc_id,
             cos(ln) * cos(lt) AS x, sin(ln) * cos(lt) AS y, sin(lt) AS z
      FROM rad
    ),
    r1 AS (  -- Ry(theta): inverse of the forward Ry(-theta)
      SELECT doc_id,
             cos({_TH}) * x + sin({_TH}) * z AS x,
             y,
             -sin({_TH}) * x + cos({_TH}) * z AS z
      FROM xyz
    ),
    r2 AS (  -- Rz(phi): inverse of the forward Rz(-phi)
      SELECT doc_id,
             cos({_PH}) * x - sin({_PH}) * y AS x,
             sin({_PH}) * x + cos({_PH}) * y AS y,
             z
      FROM r1
    ),
    unrot AS (
      SELECT doc_id,
             {round6('degrees(atan2(y, x))')} AS lon_back,
             {round6('degrees(asin(least(1.0e0, greatest(-1.0e0, z))))')} AS lat_back
      FROM r2
    )
    SELECT u.doc_id, r.rlon, r.rlat, u.lon_back, u.lat_back,
           abs(u.lon_back - {round6('g.lon')}) < 0.001e0
             AND abs(u.lat_back - {round6('g.lat')}) < 0.001e0 AS roundtrip_ok
    FROM unrot u
    JOIN rot r ON u.doc_id = r.doc_id
    JOIN {geodoc} g ON u.doc_id = g.doc_id
    """


_sql_query(
    "geo_rotated_pole", _unrot_sql(GEODOC_SPARK), _unrot_sql(GEODOC_DUCK)
)

# ---------------------------------------------------------------------------
# C7 + C8 — WGS84 → Web-Mercator closed form + geodesy scalars, merged into
# one gated query (round 2, 50-query window). Mercator outside the valid
# |lat|<85 band is NULL-masked instead of row-filtered so the geodesy
# columns keep full coverage. (ref: utilities.py:18-21,388-456)
# ---------------------------------------------------------------------------
_R = "6378137.0e0"
_A, _B = "6378137.0e0", "6356752.314245e0"


def _proj_sql(geodoc: str) -> str:
    num = f"({_A} * {_A} * cos(radians(lat))) * ({_A} * {_A} * cos(radians(lat))) + ({_B} * {_B} * sin(radians(lat))) * ({_B} * {_B} * sin(radians(lat)))"
    den = f"({_A} * cos(radians(lat))) * ({_A} * cos(radians(lat))) + ({_B} * sin(radians(lat))) * ({_B} * sin(radians(lat)))"
    merc_band = "lat > -85.0e0 AND lat < 85.0e0"
    return f"""
    SELECT doc_id,
           CASE WHEN {merc_band} THEN {round6(f'{_R} * radians(lon)')} END AS merc_x,
           CASE WHEN {merc_band} THEN {round6(f'{_R} * ln(tan({_PI} / 4.0e0 + radians(lat) / 2.0e0))')} END AS merc_y,
           {round6(f'sqrt(({num}) / ({den}))')} AS geodetic_radius_m,
           {round6('2.0e0 * 0.000072921e0 * sin(radians(lat))')} AS coriolis_f
    FROM {geodoc} g
    """


_sql_query("geo_proj_geodesy", _proj_sql(GEODOC_SPARK), _proj_sql(GEODOC_DUCK))

# ---------------------------------------------------------------------------
# C9 + C12 — datetime rounding (hour / 10-minute / day, ref:
# PyOFS/__init__.py:121-199) MERGED with the orbit pass-time model (16-day
# repeat-cycle arithmetic, ref: viirs.py:929-1075) into one gated query
# (round 3: frees a slot in the driver's 50-query window for an eng_*
# oracle) — both are per-row timestamp arithmetic over the same events
# scan; every output column of the former two queries is kept and hashed.
# ---------------------------------------------------------------------------
_CYCLE_S = 16 * 86400
_sql_query(
    "time_rounding",
    f"""
    SELECT event_id, ts,
           date_trunc('hour', ts) AS ts_hour,
           cast(date_trunc('day', ts) as date) AS ts_day,
           date_trunc('hour', ts)
             + make_interval(0, 0, 0, 0, 0,
                 cast(floor(minute(ts) / 10.0e0) as int) * 10, 0.0e0) AS ts_10min,
           TIMESTAMP '2024-01-01 00:00:00'
             + make_interval(0, 0, 0, 0, 0, 0,
                 cast((unix_timestamp(ts) - unix_timestamp(TIMESTAMP '2024-01-01 00:00:00'))
                      % {_CYCLE_S} as double)) AS cycle_phase_time,
           cast(floor((unix_timestamp(ts)
                 - unix_timestamp(TIMESTAMP '2024-01-01 00:00:00')) / {_CYCLE_S}.0e0)
                as bigint) AS cycle_idx
    FROM events WHERE event_id % 25 IN (0, 3)
    """,
    f"""
    SELECT event_id, ts,
           date_trunc('hour', ts) AS ts_hour,
           cast(date_trunc('day', ts) as date) AS ts_day,
           date_trunc('hour', ts)
             + to_minutes(cast(floor(minute(ts) / 10.0e0) as bigint) * 10) AS ts_10min,
           TIMESTAMP '2024-01-01 00:00:00'
             + to_seconds(cast(floor(epoch(ts)) - floor(epoch(TIMESTAMP '2024-01-01 00:00:00')) as bigint)
                          % {_CYCLE_S}) AS cycle_phase_time,
           cast(floor((epoch(ts) - epoch(TIMESTAMP '2024-01-01 00:00:00')) / {_CYCLE_S}.0e0)
                as bigint) AS cycle_idx
    FROM events WHERE event_id % 25 IN (0, 3)
    """,
)

# ---------------------------------------------------------------------------
# F4 / U2 — antimeridian two-slice scan union (ref: rtofs.py:250-260)
# ---------------------------------------------------------------------------


def _am_sql(geodoc: str) -> str:
    return f"""
    SELECT doc_id, lon, lat, 'east' AS slice_side FROM {geodoc} g WHERE lon >= 170.0e0
    UNION ALL
    SELECT doc_id, lon, lat, 'west' AS slice_side FROM {geodoc} g2 WHERE lon <= -170.0e0
    """


_sql_query("geo_antimeridian_slices", _am_sql(GEODOC_SPARK), _am_sql(GEODOC_DUCK))

# ---------------------------------------------------------------------------
# J7 / U3 — staggered-grid zip join with pad (ref: wcofs.py:362-396 u/v
# combine; particle_contour.py:1238-1262 pad): u-cells ⋈ v-cells on (i,j),
# outer with null pad row/col
# ---------------------------------------------------------------------------
_sql_query(
    "grid_stagger_zip",
    f"""
    WITH field AS ({FIELD_SQL}),
    u AS (SELECT i, j, sum({{C}}) / 100.0e0 / count(v) AS u_val
          FROM field WHERE v IS NOT NULL AND event_id % 2 = 0 GROUP BY i, j),
    vv AS (SELECT i, j, sum({{C}}) / 100.0e0 / count(v) AS v_val
           FROM field WHERE v IS NOT NULL AND event_id % 2 = 1 GROUP BY i, j)
    SELECT coalesce(u.i, vv.i) AS i, coalesce(u.j, vv.j) AS j,
           u.u_val, vv.v_val,
           CASE WHEN u.u_val IS NOT NULL AND vv.v_val IS NOT NULL
                THEN u.u_val * vv.v_val END AS uv_product
    FROM u FULL OUTER JOIN vv ON u.i = vv.i AND u.j = vv.j
    """.replace("{C}", "cast(floor(v * 100.0e0 + 0.5e0) as bigint)"),
)

# ---------------------------------------------------------------------------
# A5 / U1 — multi-satellite per-pass mean: union of per-source stacks then
# nan-skipping mean per cell (ref: viirs.py:634-643 multi-sat stack mean)
# ---------------------------------------------------------------------------
_sql_query(
    "multi_source_stack_mean",
    f"""
    WITH field AS ({FIELD_SQL}),
    sat_a AS (SELECT i, j, v FROM field WHERE event_type IN ('click','view')),
    sat_b AS (SELECT i, j, v FROM field WHERE event_type IN ('purchase','signup')),
    stacked AS (
      SELECT i, j, v FROM sat_a UNION ALL SELECT i, j, v FROM sat_b
    )
    SELECT i, j,
           sum(cast(floor(v * 100.0e0 + 0.5e0) as bigint)) / 100.0e0 / count(v) AS mean_v,
           count(v) AS n
    FROM stacked WHERE v IS NOT NULL
    GROUP BY i, j
    """,
)

# ---------------------------------------------------------------------------
# A13 / K5 — polygon area (shoelace) + perimeter per contour from a vertex
# table (ref: utilities.py:357-385; particle_contour.py:1350-1395).
# Vertices generated deterministically from events; round6 (hypot is sqrt).
# ---------------------------------------------------------------------------
_sql_query(
    "contour_area_perimeter",
    f"""
    WITH verts AS (
      SELECT event_id % 5 AS contour_id,
             cast(floor(event_id / 5.0e0) as bigint) % 12 AS vertex_idx,
             1000.0e0 * (1.0e0 + ((event_id * 7) % 97) / 97.0e0)
               * cos(2.0e0 * {_PI} * (cast(floor(event_id / 5.0e0) as bigint) % 12) / 12.0e0) AS x,
             1000.0e0 * (1.0e0 + ((event_id * 7) % 97) / 97.0e0)
               * sin(2.0e0 * {_PI} * (cast(floor(event_id / 5.0e0) as bigint) % 12) / 12.0e0) AS y
      FROM events WHERE event_id < 60
    ),
    closed AS (
      SELECT contour_id, vertex_idx, x, y,
             coalesce(lead(x) OVER (PARTITION BY contour_id ORDER BY vertex_idx),
                      first_value(x) OVER (PARTITION BY contour_id ORDER BY vertex_idx)) AS x2,
             coalesce(lead(y) OVER (PARTITION BY contour_id ORDER BY vertex_idx),
                      first_value(y) OVER (PARTITION BY contour_id ORDER BY vertex_idx)) AS y2
      FROM verts
    )
    SELECT contour_id,
           {round6('abs(sum(x * y2 - x2 * y)) / 2.0e0')} AS area,
           {round6('sum(sqrt((x2 - x) * (x2 - x) + (y2 - y) * (y2 - y)))')} AS perimeter,
           count(*) AS n_vertices
    FROM closed
    GROUP BY contour_id
    """,
)

# ---------------------------------------------------------------------------
# C14 — north-up row flip + masked-constant unwrap (ref: wcofs.py:658-659,
# utilities.py:75-88): flip j, apply nodata at the edge
# ---------------------------------------------------------------------------
_sql_query(
    "raster_northup_flip",
    f"""
    WITH field AS ({FIELD_SQL}),
    cells AS (
      SELECT i, j, sum(cast(floor(v * 100.0e0 + 0.5e0) as bigint)) / 100.0e0 / count(v) AS m
      FROM field WHERE v IS NOT NULL GROUP BY i, j
    ),
    bounds AS (SELECT max(j) AS jmax FROM cells)
    SELECT i, (SELECT jmax FROM bounds) - j AS row_northup,
           coalesce(m, -9999.0e0) AS value_out
    FROM cells
    """,
)

# ---------------------------------------------------------------------------
# O4 — first-record limit, deterministic (ref: utilities.py:194-195)
# ---------------------------------------------------------------------------
_sql_query(
    "first_record",
    """
    SELECT doc_id, lang, n_chars FROM documents
    ORDER BY doc_id LIMIT 1
    """,
)
