"""Property-based tests (hypothesis) for the quad-cell index and PIP —
closed-form invariants that must hold for ALL coordinates, not just
fixtures."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pyofs_spark.functions import cells
from pyofs_spark.functions import polygons as P
from pyofs_spark.functions.geocode import HOT_FRACTION_MOD, HOT_MOD_LT

lon_st = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lat_st = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
res_st = st.integers(min_value=1, max_value=12)


def _cell_xy(lon: float, lat: float, res: int) -> tuple[int, int]:
    size = cells.cell_size_deg(res)
    x = min(cells.nx(res) - 1, max(0, int(math.floor((lon + 180.0) / size))))
    y = min(cells.ny(res) - 1, max(0, int(math.floor((lat + 90.0) / size))))
    return x, y


@given(lon=lon_st, lat=lat_st, res=res_st)
@settings(max_examples=300, deadline=None)
def test_cell_center_lands_in_same_cell(lon, lat, res):
    x, y = _cell_xy(lon, lat, res)
    cid = y * cells.nx(res) + x
    size = cells.cell_size_deg(res)
    clon = ((cid % cells.nx(res)) + 0.5) * size - 180.0
    clat = (cid // cells.nx(res) + 0.5) * size - 90.0
    assert _cell_xy(clon, clat, res) == (x, y)
    assert abs(clon - lon) <= size and abs(clat - lat) <= size


@given(lon=lon_st, lat=lat_st, res=st.integers(min_value=2, max_value=12))
@settings(max_examples=300, deadline=None)
def test_parent_contains_child(lon, lat, res):
    """parent(cell(p, res)) == cell(p, res-1) — hierarchy is consistent."""
    x, y = _cell_xy(lon, lat, res)
    px, py = _cell_xy(lon, lat, res - 1)
    assert (x // 2, y // 2) == (px, py)


@given(lon=lon_st, lat=lat_st, res=res_st)
@settings(max_examples=200, deadline=None)
def test_disk_offsets_cover_neighborhood(lon, lat, res):
    """A point moved by < cell_size in any direction stays within the
    ring-1 disk of its original cell (the kNN candidate-generation
    soundness precondition)."""
    size = cells.cell_size_deg(res)
    x0, y0 = _cell_xy(lon, lat, res)
    for dlon, dlat in [(size * 0.99, 0), (-size * 0.99, 0), (0, size * 0.99), (0, -size * 0.99)]:
        lon2 = min(180.0, max(-180.0, lon + dlon))
        lat2 = min(90.0, max(-90.0, lat + dlat))
        x1, y1 = _cell_xy(lon2, lat2, res)
        assert max(abs(x1 - x0), abs(y1 - y0)) <= 1


@given(lat=lat_st)
@settings(max_examples=200, deadline=None)
def test_pip_ray_cast_horizontal_line_consistency(lat):
    """Scanning a horizontal line across the coastal polygon flips
    inside/outside an even number of times (topological sanity)."""
    lons = np.linspace(-140.0, -100.0, 400)
    inside = P.pip_numpy(lons, np.full_like(lons, lat), P.COASTAL_POLY)
    flips = int(np.sum(inside[1:] != inside[:-1]))
    assert flips % 2 == 0
    assert not inside[0] and not inside[-1]  # endpoints far outside


@given(key=st.integers(min_value=0, max_value=2**40))
@settings(max_examples=300, deadline=None)
def test_geocode_bounds_and_hot_fraction(key):
    """Python twin of the geocode SQL: output in range; hot keys near a
    coast center."""
    import pyofs_spark.functions.geocode as G

    hot = key % HOT_FRACTION_MOD < HOT_MOD_LT
    if hot:
        ci = (key * 104729) % len(G.COAST_CENTERS)
        lon = G.COAST_CENTERS[ci][0] + ((key * 9973) % 1000) / 1000.0 - 0.5
        lat = G.COAST_CENTERS[ci][1] + ((key * 7919) % 1000) / 1000.0 - 0.5
        assert abs(lon - G.COAST_CENTERS[ci][0]) <= 0.5
        assert abs(lat - G.COAST_CENTERS[ci][1]) <= 0.5
    else:
        lon = ((key * 9973) % 360000) / 1000.0 - 180.0
        lat = ((key * 7919) % 180000) / 1000.0 - 90.0
    assert -180.0 <= lon < 180.0 and -90.0 <= lat < 90.0
