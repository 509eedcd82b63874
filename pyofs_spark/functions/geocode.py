"""Deterministic geocoding of web pages → WGS84 points.

The north-star input is a Common-Crawl-style pages table with no coordinates;
pages are geocoded *deterministically* from their key so that tile
assignments are exactly reproducible (the correctness gate). Two paths:

1. `geocode_id_*_sql` — closed-form modular arithmetic over a BIGINT key.
   Pure SQL, runs identically on Spark and DuckDB (oracle parity), stays in
   whole-stage codegen. Used for synthetic/bench tables keyed by id.

2. `geocode_url_key_sql` — for STRING-keyed tables (real Common-Crawl
   urls): JVM `xxhash64(url)` reduced mod a prime to a nonnegative bigint
   working key that feeds the same closed-form path. Zero Python, stays in
   whole-stage codegen; the mod keeps later prime products inside BIGINT
   under Spark 4 ANSI overflow checking. (Engine-only: DuckDB has no
   xxhash64, so url-keyed runs are pytest/bench-gated, not oracle-gated.)

The distribution is *coast-biased*: a configurable fraction of keys snap
near a small set of "coastal" hot centers, producing the skewed hot cells
the north rule requires salting for (the reference's study area is likewise
coast-concentrated: wcofs.gpkg study_area, PyOFS/model/wcofs.py:67).
"""

from __future__ import annotations

from .sqlgen import flit

# Hot "coastal" centers (lon, lat) — a stylized west-coast shoreline matching
# the reference's WCOFS domain extent (ref: PyOFS/model/wcofs.py study area).
COAST_CENTERS: list[tuple[float, float]] = [
    (-124.5, 48.4),
    (-124.0, 44.6),
    (-123.8, 39.4),
    (-122.4, 37.8),
    (-120.6, 34.5),
    (-117.2, 32.7),
]
HOT_FRACTION_MOD = 10  # keys with key % 10 < HOT_MOD_LT are coast-biased
HOT_MOD_LT = 4  # → 40% of pages land in ~6 hot clusters (skew driver)

# Modular mixing constants (primes) — arbitrary but frozen; changing them
# changes every tile assignment, so they are part of the contract.
_P1, _P2, _P3 = 9973, 7919, 104729


def geocode_id_lon_sql(key_col: str) -> str:
    """Longitude in [-180, 180) from a bigint key — identical SQL on both engines."""
    centers_lon = ",".join(flit(c[0]) for c in COAST_CENTERS)
    n_c = len(COAST_CENTERS)
    return (
        f"CASE WHEN ({key_col}) % {HOT_FRACTION_MOD} < {HOT_MOD_LT} "
        # hot: snap near a coast center with a +-0.5 deg jitter
        f"THEN element_at(array({centers_lon}), "
        f"cast((({key_col}) * {_P3}) % {n_c} + 1 as int)) "
        f"+ ((({key_col}) * {_P1}) % 1000) / 1000.0e0 - 0.5e0 "
        # cold: uniform over the globe
        f"ELSE ((({key_col}) * {_P1}) % 360000) / 1000.0e0 - 180.0e0 END"
    )


def geocode_id_lat_sql(key_col: str) -> str:
    centers_lat = ",".join(flit(c[1]) for c in COAST_CENTERS)
    n_c = len(COAST_CENTERS)
    return (
        f"CASE WHEN ({key_col}) % {HOT_FRACTION_MOD} < {HOT_MOD_LT} "
        f"THEN element_at(array({centers_lat}), "
        f"cast((({key_col}) * {_P3}) % {n_c} + 1 as int)) "
        f"+ ((({key_col}) * {_P2}) % 1000) / 1000.0e0 - 0.5e0 "
        f"ELSE ((({key_col}) * {_P2}) % 180000) / 1000.0e0 - 90.0e0 END"
    )


def duckdb_compat(sql: str) -> str:
    """Translate the tiny Spark-SQL surface used here to DuckDB SQL.

    Only two constructs differ: array literal + element_at (1-based in both,
    DuckDB spells them list_value / list_extract) and integer div.
    """
    out = sql.replace("array(", "list_value(").replace("element_at(", "list_extract(")
    return out


URL_KEY_PRIME = 10_000_000_000_037  # prime ≈ 1e13


def geocode_url_key_sql(url_col: str) -> str:
    """Nonnegative bigint working key from a url string — JVM-side only.

    pmod keeps it in [0, URL_KEY_PRIME); the largest later product is
    URL_KEY_PRIME * 104729 ≈ 1.05e18 < 2^63 ≈ 9.22e18, inside BIGINT
    (Spark 4 ANSI mode errors on overflow rather than wrapping). The ~1e13
    modulus keeps url-key collisions negligible at 1e9+ page scale
    (expected collisions per key ~1e-4), unlike a ~1e6 modulus which would
    alias thousands of urls onto identical (lon, lat)."""
    return f"pmod(xxhash64({url_col}), {URL_KEY_PRIME})"


def geocode_url_key_portable_sql(url_col: str) -> str:
    """ORACLE-PORTABLE string working key (round 3): the first 11 hex
    chars of md5(url) read as a base-16 integer — a polynomial of
    `position(c IN '0123456789abcdef')` terms that parses and evaluates
    IDENTICALLY on Spark SQL and DuckDB, so the STRING-keyed geocode path
    can sit inside the exact-value oracle gate (geo_cell_assign url_*
    columns). 16^11 ≈ 1.76e13 < 2^63/104729, so every later geocode
    product stays in BIGINT under ANSI overflow checking.

    The performance default stays `geocode_url_key_sql` (xxhash64 — one
    JVM intrinsic vs md5 + 11 position terms); both are deterministic,
    well-mixed, zero-Python, whole-stage-codegen projections."""
    terms = " + ".join(
        f"cast(position(substr(md5({url_col}), {i + 1}, 1) IN "
        f"'0123456789abcdef') - 1 as bigint) * {16 ** (10 - i)}"
        for i in range(11)
    )
    return f"({terms})"
