"""Study-area polygons and point-in-polygon (PIP) predicates.

The reference's universal spatial predicate is `point.intersects(study_area)`
via shapely (ref: PyOFS/observation/data_buoy.py:301-323, granule-extent
variant viirs.py:988-998) with the study polygon loaded once and cached
(viirs.py:248-269). shapely is not available here, so PIP is the classic
even-odd ray cast, implemented three ways from ONE vertex source:

  * `pip_sql(...)`        — fully unrolled SQL boolean (per fixed polygon);
                            runs identically on Spark and DuckDB → oracle
                            parity by construction, zero UDF cost.
  * `pip_numpy(...)`      — vectorized numpy kernel (golden twin + the
                            engine's pandas-UDF path for arbitrary polygons).
  * bbox prefilter SQL    — cheap min/max rejection pushed ahead of the
                            exact test (the reference crops by bbox before
                            precise ops too: rtofs.py:242-248).

Ray-cast convention (frozen contract, deterministic for our fixtures):
edge (x1,y1)-(x2,y2) crosses the rightward ray from (px,py) iff
  (y1 > py) != (y2 > py)  AND  px < (x2-x1)*(py-y1)/(y2-y1) + x1
Holes: even-odd rule — a point inside an odd number of rings is inside.
"""

from __future__ import annotations

import numpy as np

from .sqlgen import flit

# ---------------------------------------------------------------------------
# Fixture polygons (FIXTURES.md §4): one concave coastal polygon, one with a
# hole, one antimeridian-split multipolygon. Rings are (lon, lat) lists,
# ring 0 = exterior, ring >0 = hole; even-odd rule makes the distinction moot.
# ---------------------------------------------------------------------------

# Stylized WCOFS-like coastal study area (concave, west coast).
COASTAL_POLY: list[list[tuple[float, float]]] = [
    [
        (-126.0, 32.0),
        (-116.0, 32.0),
        (-117.0, 34.0),
        (-120.0, 35.0),
        (-121.0, 38.0),
        (-123.0, 39.0),
        (-123.5, 43.0),
        (-123.8, 46.0),
        (-125.0, 49.0),
        (-127.5, 49.0),
        (-126.5, 40.0),
    ]
]

# Polygon with a hole (donut) in the mid-Pacific.
DONUT_POLY: list[list[tuple[float, float]]] = [
    [(-160.0, 10.0), (-140.0, 10.0), (-140.0, 30.0), (-160.0, 30.0)],
    [(-155.0, 15.0), (-145.0, 15.0), (-145.0, 25.0), (-155.0, 25.0)],
]

# Antimeridian multipolygon: two lobes (east of +170 and west of -170)
# modeling the split-scan handling at viirs.py:220-241 / rtofs.py:250-260.
ANTIMERIDIAN_POLY_EAST: list[list[tuple[float, float]]] = [
    [(170.0, -10.0), (180.0, -10.0), (180.0, 10.0), (170.0, 10.0)]
]
ANTIMERIDIAN_POLY_WEST: list[list[tuple[float, float]]] = [
    [(-180.0, -10.0), (-170.0, -10.0), (-170.0, 10.0), (-180.0, 10.0)]
]

POLYGONS: dict[str, list[list[tuple[float, float]]]] = {
    "coastal": COASTAL_POLY,
    "donut": DONUT_POLY,
    "am_east": ANTIMERIDIAN_POLY_EAST,
    "am_west": ANTIMERIDIAN_POLY_WEST,
}


def polygon_bbox(rings: list[list[tuple[float, float]]]) -> tuple[float, float, float, float]:
    xs = [x for ring in rings for x, _ in ring]
    ys = [y for ring in rings for _, y in ring]
    return min(xs), min(ys), max(xs), max(ys)


def bbox_sql(lon_col: str, lat_col: str, rings) -> str:
    x0, y0, x1, y1 = polygon_bbox(rings)
    return (
        f"({lon_col} >= {flit(x0)} AND {lon_col} <= {flit(x1)} "
        f"AND {lat_col} >= {flit(y0)} AND {lat_col} <= {flit(y1)})"
    )


def _edge_term(lon_col: str, lat_col: str, x1: float, y1: float, x2: float, y2: float) -> str:
    return (
        f"(CASE WHEN (({flit(y1)} > {lat_col}) != ({flit(y2)} > {lat_col})) "
        f"AND {lon_col} < ({flit(x2)} - {flit(x1)}) * ({lat_col} - {flit(y1)}) "
        f"/ ({flit(y2)} - {flit(y1)}) + {flit(x1)} THEN 1 ELSE 0 END)"
    )


def pip_sql(lon_col: str, lat_col: str, rings: list[list[tuple[float, float]]]) -> str:
    """Unrolled even-odd ray-cast as a boolean SQL expression.

    Identical text runs on Spark SQL and DuckDB (only CASE/arithmetic/mod).
    The bbox prefilter is folded in with AND so Catalyst short-circuits and
    the parquet scan gets a pushable range predicate.
    """
    terms = []
    for ring in rings:
        n = len(ring)
        for k in range(n):
            x1, y1 = ring[k]
            x2, y2 = ring[(k + 1) % n]
            if y1 == y2:
                continue  # horizontal edge never crosses a horizontal ray test
            terms.append(_edge_term(lon_col, lat_col, x1, y1, x2, y2))
    crossings = " + ".join(terms) if terms else "0"
    return f"({bbox_sql(lon_col, lat_col, rings)} AND (({crossings}) % 2 = 1))"


def pip_numpy(lon: np.ndarray, lat: np.ndarray, rings: list[list[tuple[float, float]]]) -> np.ndarray:
    """Vectorized even-odd ray cast — identical convention to pip_sql."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    crossings = np.zeros(lon.shape, dtype=np.int64)
    for ring in rings:
        n = len(ring)
        for k in range(n):
            x1, y1 = ring[k]
            x2, y2 = ring[(k + 1) % n]
            if y1 == y2:
                continue
            cond = ((y1 > lat) != (y2 > lat)) & (
                lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1
            )
            crossings += cond.astype(np.int64)
    x0, y0, x1b, y1b = polygon_bbox(rings)
    inbox = (lon >= x0) & (lon <= x1b) & (lat >= y0) & (lat <= y1b)
    return inbox & (crossings % 2 == 1)


def polygons_long_rows() -> list[tuple[str, int, int, float, float]]:
    """(polygon_id, ring_idx, vertex_idx, lon, lat) rows — the broadcastable
    dim-table form per FIXTURES.md §4, consumed by operators/pip.py for the
    arbitrary-polygon pandas-UDF path."""
    rows = []
    for pid, rings in POLYGONS.items():
        for ri, ring in enumerate(rings):
            for vi, (x, y) in enumerate(ring):
                rows.append((pid, ri, vi, float(x), float(y)))
    return rows
