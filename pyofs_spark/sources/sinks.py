"""Sinks: tile tables with the reference's raster-write semantics, vector
point layers, and the dir-index manifest.

Reference semantics preserved exactly (SURVEY §4 "physical execution
notes"):
- float32 at the sink, float64 internally (ref: wcofs.py:659, rtofs.py:390)
- NaN→nodata −9999.0 applied AT THE EDGE only (ref: wcofs.py:682-683,
  PyOFS/__init__.py:20) — internal tables keep NULL
- average-resampled overview pyramid levels written alongside level 0
  (ref: wcofs.py:707-711, overview_levels PyOFS/__init__.py:202-209)
- output partitioned by (variable, day, cell_prefix) — the layout that
  makes Iceberg/parquet partition pruning fire for the reference's
  per-(variable, date) access pattern (write_daily_average.py:289-349)
- dir-index manifest (ref: write_json.py:15-48) — from the lineage table,
  not a filesystem walk.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import NODATA


def write_tile_table(
    tiles: DataFrame,
    path: str,
    overview_levels: int = 3,
    mode: str = "overwrite",
) -> None:
    """tiles: (variable string, day date, i long, j long, value double).

    Writes level-0 + overview levels, float32 values, nodata-filled,
    partitioned by (variable, day, level)."""
    base = tiles.groupBy("variable", "day", "i", "j").agg(
        F.sum("value").alias("val_sum"), F.count("value").alias("val_cnt")
    )
    lv0 = base.select(
        "variable", "day", F.lit(0).alias("level"), "i", "j",
        (F.col("val_sum") / F.col("val_cnt")).alias("mean_val"),
        F.col("val_cnt").alias("n"),
    )
    # group-aware rollup: carry (variable, day) through the levels
    cur = base
    frames = [lv0]
    for lv in range(1, overview_levels + 1):
        cur = (
            cur.groupBy(
                "variable", "day",
                F.floor(F.col("i") / 2).alias("i"),
                F.floor(F.col("j") / 2).alias("j"),
            )
            .agg(F.sum("val_sum").alias("val_sum"), F.sum("val_cnt").alias("val_cnt"))
        )
        frames.append(
            cur.select(
                "variable", "day", F.lit(lv).alias("level"), "i", "j",
                (F.col("val_sum") / F.col("val_cnt")).alias("mean_val"),
                F.col("val_cnt").alias("n"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    # edge semantics: float32 + nodata fill (ONLY here)
    out = out.withColumn(
        "mean_val",
        F.coalesce(F.col("mean_val"), F.lit(NODATA)).cast("float"),
    )
    out.write.mode(mode).partitionBy("variable", "day", "level").parquet(path)


def write_vector_points(
    points: DataFrame, path: str, layer_col: str = "day", mode: str = "overwrite"
) -> None:
    """Vector point-layer sink (ref: per-cell GPKG point layers,
    wcofs.py:713-835): one partition per layer key, unmasked rows only."""
    points.write.mode(mode).partitionBy(layer_col).parquet(path)


def dir_index_json(path: str) -> str:
    """Manifest of the output tree (ref: write_json.py:15-48) — nested dict
    of partition directories. On Iceberg this is a metadata-table query."""
    tree: dict = {}
    for root, dirs, files in os.walk(path):
        rel = os.path.relpath(root, path)
        if rel == ".":
            continue
        node = tree
        for part in rel.split(os.sep):
            node = node.setdefault(part, {})
        n_parquet = sum(1 for f in files if f.endswith(".parquet"))
        if n_parquet:
            node["_files"] = n_parquet
    return json.dumps(tree, sort_keys=True)


def read_tiles(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# REAL file-format exports (round 3): GeoTIFF / NetCDF-3 / GeoPackage via
# the pure-stdlib writers in geotiff.py / netcdf3.py / gpkg.py. One raster
# per (variable, day) is dimension-sized (exactly the reference's per-day
# export unit, wcofs.py:645-711), so the grid assembly is a driver-side
# collect; the heavy aggregation stays distributed in write_tile_table.
# ---------------------------------------------------------------------------


def export_raster_geotiff(
    cells: DataFrame,
    path: str,
    west: float,
    south: float,
    dx: float,
    dy: float,
    i_col: str = "i",
    j_col: str = "j",
    val_col: str = "mean_val",
    nodata: float = NODATA,
    n_i: int | None = None,
    n_j: int | None = None,
) -> "np.ndarray":
    """Export one raster grid (i=col, j=row, j ascending = ascending lat)
    as a real north-up float32 GeoTIFF: missing cells → nodata, row order
    FLIPPED so row 0 is the northmost row (ref: wcofs.py:658-659,682-683).
    Pass n_i/n_j (the caller-known lattice size) so a day whose top rows
    carry no data still writes the full grid; without them the dims are
    inferred from the data present. Returns the north-up array."""
    import numpy as np

    from .geotiff import write_geotiff

    rows = cells.select(i_col, j_col, val_col).collect()
    ni = n_i if n_i is not None else max((r[0] for r in rows), default=-1) + 1
    nj = n_j if n_j is not None else max((r[1] for r in rows), default=-1) + 1
    grid = np.full((nj, ni), nodata, dtype=np.float32)
    for ci, cj, v in rows:
        # skip cells outside the declared lattice (same contract as
        # export_field_netcdf3; unguarded, a stray index would crash the
        # export or — if negative — silently wrap to the opposite edge)
        if 0 <= cj < nj and 0 <= ci < ni:
            grid[cj, ci] = nodata if v is None else v
    northup = grid[::-1]
    write_geotiff(
        path, northup, west, south + nj * dy, dx, dy, nodata=nodata
    )
    return northup


def export_field_netcdf3(
    cells: DataFrame,
    path: str,
    lons: "np.ndarray",
    lats: "np.ndarray",
    var_name: str,
    i_col: str = "i",
    j_col: str = "j",
    val_col: str = "mean_val",
    nodata: float = NODATA,
    attrs: dict | None = None,
) -> None:
    """Export one gridded field as a real classic NetCDF-3 file with
    lat/lon coordinate variables and a _FillValue'd float32 data variable
    (ref: the reference's to_netcdf outputs, rtofs.py:390)."""
    import numpy as np

    from .netcdf3 import write_netcdf3

    rows = cells.select(i_col, j_col, val_col).collect()
    grid = np.full((len(lats), len(lons)), nodata, dtype=np.float32)
    for ci, cj, v in rows:
        if 0 <= cj < len(lats) and 0 <= ci < len(lons):
            grid[cj, ci] = nodata if v is None else v
    write_netcdf3(
        path,
        dims={"lat": len(lats), "lon": len(lons)},
        variables={
            "lat": (("lat",), np.asarray(lats, np.float64),
                    {"units": "degrees_north"}),
            "lon": (("lon",), np.asarray(lons, np.float64),
                    {"units": "degrees_east"}),
            var_name: (("lat", "lon"), grid,
                       {"_FillValue": np.float32(nodata)}),
        },
        global_attrs=attrs or {"Conventions": "CF-1.6"},
    )
