"""Field-operator query pack: time/grid aggregation, windows, QC filters,
as-of alignment, bilinear regrid — the reference's gridded-field semantics
re-expressed over the driver's `events` table as a long-form field
(SURVEY §1.3 mapping: xarray Dataset → long-form cell table).

Exactness strategy: `events.value` is 2-decimal quantized, so sums are done
in integer cents (`floor(v*100+0.5)` as bigint) — order-independent, exactly
equal across engines and partitionings (SURVEY §7.4 risk 3). Transcendental
outputs (atan2/cos/sin/sqrt) are floor-rounded to 6 decimals on BOTH sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views
from .queries import register

# ---------------------------------------------------------------------------
# shared portable SQL fragments (identical text on Spark and DuckDB)
# ---------------------------------------------------------------------------

# events → long-form gridded field (i, j, day, value, QC columns)
# i/j from event_id (deterministic); dop columns model HFR QC
# (ref: hf_radar.py:19,567-587); v injects >threshold outliers as NULL
# (ref: wcofs.py:413-416 sanity filter).
FIELD_SQL = """
SELECT
  event_id,
  event_id % 40 AS i,
  cast(floor(event_id / 40.0e0) as bigint) % 30 AS j,
  ts,
  cast(date_trunc('day', ts) as date) AS day,
  user_id,
  event_type,
  value,
  CASE WHEN value > 450.0e0 THEN NULL ELSE value END AS v,
  ((event_id * 13) % 100) / 100.0e0 AS dopx,
  ((event_id * 29) % 100) / 100.0e0 AS dopy
FROM events
"""

# integer-cents of v (exact, order-independent aggregation unit)
CENTS = "cast(floor(v * 100.0e0 + 0.5e0) as bigint)"


def round6(expr: str) -> str:
    """floor-based 6-decimal rounding — same convention both engines."""
    return f"floor(({expr}) * 1000000.0e0 + 0.5e0) / 1000000.0e0"


def _sql_query(name: str, body: str):
    """Register a query whose Spark and DuckDB texts are IDENTICAL."""

    def fn(spark: SparkSession, sf_dir: str, _body=body) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_body)

    fn.__name__ = name
    register(name, body)(fn)
    return fn


# ---------------------------------------------------------------------------
# A4 + C3 — tumbling daily mean per cell + ssh datum offset
# (ref: rtofs.py:263-268 resample('D').mean + 0.25)
# ---------------------------------------------------------------------------
_sql_query(
    "fld_daily_mean",
    f"""
    WITH field AS ({FIELD_SQL})
    SELECT i, j, day,
           sum({CENTS}) / 100.0e0 / count(v) + 0.25e0 AS ssh_daily,
           count(v) AS n_obs
    FROM field
    GROUP BY i, j, day
    HAVING count(v) > 0
    """,
)

# ---------------------------------------------------------------------------
# A1 vs A2 — NaN-propagating vs NaN-skipping mean
# (ref: wcofs.py:420-453 numpy.mean vs rtofs.py:525 nanmean)
# ---------------------------------------------------------------------------
_sql_query(
    "fld_mean_semantics",
    f"""
    WITH field AS ({FIELD_SQL})
    SELECT i, j,
           CASE WHEN count(*) != count(v) THEN NULL
                ELSE sum({CENTS}) / 100.0e0 / count(v) END AS mean_propagating,
           CASE WHEN count(v) = 0 THEN NULL
                ELSE sum({CENTS}) / 100.0e0 / count(v) END AS mean_skipping,
           count(*) AS n_all, count(v) AS n_valid
    FROM field
    GROUP BY i, j
    """,
)

# ---------------------------------------------------------------------------
# J8 / W5 — compose-latest: later non-null observation wins per cell
# (ref: viirs.py:660-667 scene overlay)
# ---------------------------------------------------------------------------
_COMPOSE_LATEST_ORACLE = f"""
    WITH field AS ({FIELD_SQL})
    SELECT i, j, v AS latest_v, ts AS latest_ts FROM (
      SELECT i, j, v, ts,
             row_number() OVER (PARTITION BY i, j ORDER BY ts DESC, event_id DESC) AS rn
      FROM field WHERE v IS NOT NULL
    ) t WHERE rn = 1
    """


@register("fld_compose_latest", _COMPOSE_LATEST_ORACLE)
def fld_compose_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6 (guide §2.3 "aggregate before you shuffle"): the row_number
    window shuffles and sorts EVERY observation row to pick one winner per
    cell; `max(struct(ts, event_id, v))` computes the same winner as a hash
    aggregate with map-side partial aggregation, so the exchange carries one
    pre-reduced row per (cell, map partition) instead of the full table —
    at corpus scale the shuffle shrinks from O(rows) to O(cells).
    Identical values: (ts, event_id) is unique per row, struct comparison
    is lexicographic (ts, then event_id — v never breaks a tie), and DESC
    row_number rank 1 == max. Oracle keeps the window formulation."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH field AS ({FIELD_SQL})
        SELECT i, j, m.v AS latest_v, m.ts AS latest_ts FROM (
          SELECT i, j, max(struct(ts, event_id, v)) AS m
          FROM field WHERE v IS NOT NULL
          GROUP BY i, j
        ) t
        """
    )

# ---------------------------------------------------------------------------
# W1 / W2 — spatial finite difference along i within (j, day)
# (ref: particle_contour.py:1185-1220 sea_level.diff)
# ---------------------------------------------------------------------------
_sql_query(
    "fld_finite_diff",
    f"""
    WITH field AS ({FIELD_SQL}),
    cellmean AS (
      SELECT i, j, day, sum({CENTS}) / 100.0e0 / count(v) AS m
      FROM field WHERE v IS NOT NULL
      GROUP BY i, j, day
    )
    SELECT i, j, day,
           m - lag(m) OVER (PARTITION BY j, day ORDER BY i) AS d_eta
    FROM cellmean
    """,
)

# ---------------------------------------------------------------------------
# F5 + F8 — QC filters, MERGED into one gated query (round 4: frees a
# 50-window slot for the eng_respace_contour oracle, same consolidation
# the round-3 txt_quality merge used). Branch 'dop': DOP threshold filter
# (ref: hf_radar.py:567-587). Branch 'complete': keep only cells observed
# on every day (ref: hf_radar.py:170-172). Both branches scan the same
# field CTE; a tag column keeps each branch's rows separately checkable.
# ---------------------------------------------------------------------------
_sql_query(
    "fld_qc_filters",
    f"""
    WITH field AS ({FIELD_SQL}),
    coarse AS (SELECT i % 12 AS ci, j % 8 AS cj, day, v FROM field),
    days AS (SELECT count(DISTINCT day) AS n_days FROM coarse)
    SELECT 'dop' AS qc_kind, event_type AS key_a,
           cast(NULL as bigint) AS key_b,
           count(*) AS n,
           cast(sum({CENTS}) as bigint) AS sum_cents
    FROM field
    WHERE dopx <= 0.5e0 AND dopy <= 0.5e0 AND v IS NOT NULL
    GROUP BY event_type
    UNION ALL
    SELECT 'complete' AS qc_kind, cast(ci as string) AS key_a,
           cj AS key_b,
           count(DISTINCT day) AS n,
           cast(NULL as bigint) AS sum_cents
    FROM coarse WHERE v IS NOT NULL
    GROUP BY ci, cj
    HAVING count(DISTINCT day) = (SELECT n_days FROM days)
    """,
)

# ---------------------------------------------------------------------------
# A11 — overview pyramid: two levels of 2x block rollup
# (ref: PyOFS/__init__.py:202-209 + wcofs.py:707-711 average overviews)
# value-weighted exact rollup in cents (documented deviation: the reference
# averages child PIXELS; we aggregate source values per block, which is the
# scale-correct formulation — both tested against kernels.overview_pyramid
# for the pixel-mean variant in pytest)
# ---------------------------------------------------------------------------
_sql_query(
    "fld_overview_pyramid",
    f"""
    WITH field AS ({FIELD_SQL}),
    l0 AS (
      SELECT i, j, sum({CENTS}) AS c, count(v) AS n
      FROM field WHERE v IS NOT NULL GROUP BY i, j
    ),
    l1 AS (
      SELECT cast(floor(i / 2.0e0) as bigint) AS i, cast(floor(j / 2.0e0) as bigint) AS j,
             sum(c) AS c, sum(n) AS n
      FROM l0 GROUP BY 1, 2
    ),
    l2 AS (
      SELECT cast(floor(i / 2.0e0) as bigint) AS i, cast(floor(j / 2.0e0) as bigint) AS j,
             sum(c) AS c, sum(n) AS n
      FROM l1 GROUP BY 1, 2
    )
    SELECT 1 AS level, i, j, c / 100.0e0 / n AS mean_v, cast(n as bigint) AS n FROM l1
    UNION ALL
    SELECT 2 AS level, i, j, c / 100.0e0 / n AS mean_v, cast(n as bigint) AS n FROM l2
    """,
)

# ---------------------------------------------------------------------------
# J6 — as-of join: for each purchase, the user's latest prior click value
# (ref: rtofs.py:263-264 nearest-time sel; particle_contour bfill/ffill)
# ---------------------------------------------------------------------------
_ASOF_ORACLE = f"""
    WITH field AS ({FIELD_SQL}),
    marked AS (
      SELECT event_id, user_id, ts, event_type, v,
             CASE WHEN event_type = 'click' THEN v END AS click_v
      FROM field
    )
    SELECT event_id, user_id, ts, asof_click_v FROM (
      SELECT event_id, user_id, ts, event_type,
             last_value(click_v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS asof_click_v
      FROM marked
    ) t WHERE event_type = 'purchase'
    """


@register("fld_asof_click", _ASOF_ORACLE)
def fld_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the union-marker + last(ignoreNulls) window — the
    scalable Spark pattern (one shuffle by user, no range join explosion).
    DuckDB oracle uses its own IGNORE NULLS spelling (syntax differs)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    field = spark.sql(FIELD_SQL)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = field.withColumn(
        "click_v", F.when(F.col("event_type") == "click", F.col("v"))
    )
    return (
        marked.withColumn("asof_click_v", F.last("click_v", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "asof_click_v")
    )

# ---------------------------------------------------------------------------
# C4 + C5 — vector rotation by grid angle, direction/magnitude
# (ref: wcofs.py:371-396, 629-633) — transcendental → round6 both sides
# ---------------------------------------------------------------------------
_PI = "3.141592653589793e0"
_sql_query(
    "vec_rotate_dirmag",
    f"""
    WITH field AS ({FIELD_SQL}),
    uv AS (
      SELECT event_id,
             ((event_id * 7) % 200) / 10.0e0 - 10.0e0 AS u,
             ((event_id * 11) % 200) / 10.0e0 - 10.0e0 AS v,
             ((event_id * 13) % 628) / 100.0e0 AS angle
      FROM field WHERE event_id % 10 = 0
    )
    SELECT event_id, u, v, angle,
           {round6('u * cos(angle) - v * sin(angle)')} AS u_east,
           {round6('u * sin(angle) + v * cos(angle)')} AS v_north,
           {round6(f'(atan2(u, v) + {_PI}) * 180.0e0 / {_PI}')} AS dir_deg,
           {round6('sqrt(u * u + v * v)')} AS mag
    FROM uv
    """,
)

# ---------------------------------------------------------------------------
# C1 + C2 + F6 — satellite SST pipeline: Kelvin→C, sub-zero discard,
# SSES bias correction (ref: viirs.py:319-375)
# ---------------------------------------------------------------------------
_sql_query(
    "sst_sses_pipeline",
    f"""
    WITH field AS ({FIELD_SQL}),
    raw AS (
      SELECT event_id,
             CASE WHEN event_id % 97 = 0 THEN -1.0e0
                  ELSE 265.0e0 + (value % 40.0e0) END AS sst_k,
             ((event_id * 3) % 4096) / 1000.0e0 AS sses_raw
      FROM field
    )
    SELECT event_id,
           CASE WHEN sst_k <= 0.0e0 THEN NULL ELSE sst_k - 273.15e0 END AS sst_c,
           CASE WHEN sst_k <= 0.0e0 THEN NULL
                ELSE (sst_k - 273.15e0)
                     - (CASE WHEN sses_raw = 0.0e0 THEN 0.0e0
                             ELSE sses_raw - 2.048e0 END) END AS sst_corrected
    FROM raw
    """,
)

# ---------------------------------------------------------------------------
# A9 + A10 — RMSE / R² model-vs-obs after cell alignment
# (ref: data_assimilation_validation.py:252-277)
# ---------------------------------------------------------------------------
_sql_query(
    "val_rmse_r2",
    f"""
    WITH field AS ({FIELD_SQL}),
    obs AS (
      SELECT i, j, sum({CENTS}) / 100.0e0 / count(v) AS x
      FROM field WHERE v IS NOT NULL AND event_id % 2 = 0 GROUP BY i, j
    ),
    model AS (
      SELECT i, j, sum({CENTS}) / 100.0e0 / count(v) AS y
      FROM field WHERE v IS NOT NULL AND event_id % 2 = 1 GROUP BY i, j
    ),
    joined AS (
      SELECT obs.i, obs.j, x, y FROM obs JOIN model ON obs.i = model.i AND obs.j = model.j
    )
    SELECT
      {round6('sqrt(sum((x - y) * (x - y)) / count(*))')} AS rmse,
      {round6('1.0e0 - sum((x - y) * (x - y)) / sum((x - avg_x) * (x - avg_x))')} AS r2,
      count(*) AS n_cells
    FROM (SELECT i, j, x, y, avg(x) OVER () AS avg_x FROM joined) t
    """,
)

# ---------------------------------------------------------------------------
# J3 — bilinear interpolation of a regular grid at query points
# (ref: particle_contour.py:249-298 xarray .interp) — closed-form grid so
# both engines evaluate the identical expression tree → exact
# ---------------------------------------------------------------------------
_GRID = dict(lon0=-130.0, lat0=30.0, step=0.5, n=20)
_GV = "((gi * 31 + gj * 17) % 100) / 10.0e0"  # closed-form grid value


def _bilinear_sql() -> str:
    g = _GRID
    fx = f"((lon - {g['lon0']}e0) / {g['step']}e0)"
    fy = f"((lat - {g['lat0']}e0) / {g['step']}e0)"
    return f"""
    WITH pts AS (
      SELECT event_id,
             -130.0e0 + ((event_id * 17) % 950) / 100.0e0 AS lon,
             30.0e0 + ((event_id * 23) % 950) / 100.0e0 AS lat
      FROM events WHERE event_id % 5 = 0
    ),
    cellidx AS (
      SELECT event_id, lon, lat,
             least({g['n'] - 2}, greatest(0, cast(floor({fx}) as bigint))) AS i0,
             least({g['n'] - 2}, greatest(0, cast(floor({fy}) as bigint))) AS j0
      FROM pts
    ),
    w AS (
      SELECT event_id, lon, lat, i0, j0,
             {fx} - i0 AS tx, {fy} - j0 AS ty
      FROM cellidx
    )
    SELECT event_id, lon, lat,
           (SELECT {_GV} FROM (SELECT i0 AS gi, j0 AS gj) g1) * (1.0e0 - tx) * (1.0e0 - ty)
         + (SELECT {_GV} FROM (SELECT i0 + 1 AS gi, j0 AS gj) g2) * tx * (1.0e0 - ty)
         + (SELECT {_GV} FROM (SELECT i0 AS gi, j0 + 1 AS gj) g3) * (1.0e0 - tx) * ty
         + (SELECT {_GV} FROM (SELECT i0 + 1 AS gi, j0 + 1 AS gj) g4) * tx * ty
           AS v_interp
    FROM w
    """


_sql_query("fld_bilinear_interp", _bilinear_sql())
