"""Station dimension table for kNN lookup.

Models NDBC buoys / HFR sites (ref: PyOFS/observation/data_buoy.py:229-283,
hf_radar.py:198-252). Per FIXTURES.md §5: clustered stations (kNN ties),
isolated ones (empty-ring expansion), and one outside the study polygon.
"""

from __future__ import annotations

# (station_id, lon, lat) — frozen fixture; part of the tile-assignment contract.
STATIONS: list[tuple[str, float, float]] = [
    # cluster near San Francisco (tie / ring-expansion exercise)
    ("46026", -122.82, 37.75),
    ("46013", -123.30, 38.23),
    ("46012", -122.88, 37.36),
    ("46237", -122.63, 37.79),
    # Oregon / Washington coast
    ("46050", -124.53, 44.66),
    ("46029", -124.51, 46.16),
    ("46041", -124.73, 47.35),
    # southern California
    ("46086", -118.05, 32.50),
    ("46025", -119.05, 33.75),
    # isolated mid-Pacific (forces multi-ring expansion)
    ("51001", -162.00, 23.43),
    # outside the coastal study polygon (PIP filter exercise,
    # ref: data_buoy.py:301-323)
    ("41001", -72.32, 34.72),
    # antimeridian-adjacent
    ("52200", 171.39, 7.08),
]


def stations_values_sql(alias: str = "s") -> str:
    """VALUES clause usable verbatim in Spark SQL and DuckDB oracle SQL."""
    from .sqlgen import flit

    rows = ", ".join(f"('{s}', {flit(x)}, {flit(y)})" for s, x, y in STATIONS)
    return f"(VALUES {rows}) AS {alias}(station_id, s_lon, s_lat)"
