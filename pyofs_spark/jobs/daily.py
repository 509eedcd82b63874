"""The daily raster ETL job — the reference's entry point #1 composed
end-to-end on this engine (round 3; ref lifecycle SURVEY §3.1,
main/leaflet/write_daily_average.py:632-709 → write_rasters wcofs.py:455-711).

Per (variable, day) partition, mirroring the reference's four stages plus
its publish/resume machinery:

  stage 1  scan + filters  — events-as-field scan, sanity filter (F6),
           time-range day filter (F3)                          [SCAN/FILTER]
  stage 2  daily mean per cell (A4/A2, nan-skipping)           [AGG]
  stage 3  1-NN regrid to the output lattice (J1)              [JOIN/RESAMPLE]
  stage 4  derive + mask + sink — polygon mask (J5), north-up
           flip + float32 + nodata at the edge (K1) to a REAL
           GeoTIFF, the grid to REAL NetCDF-3 (K4), stations
           to a REAL GeoPackage layer (K2)                     [SINK]
  publish  dir-index JSON (K6) + per-partition lineage commit
           through the versioned manifest (T1/F10): killing the
           job mid-run and re-invoking completes only missing
           (variable, day) partitions — tested.

Everything heavy is distributed (Spark agg + cell-ring regrid join); only
the dimension-sized final raster grid is collected for the file write,
exactly the reference's per-day export unit.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lineage import run_partitioned
from ..operators.pip import pip_fixed
from ..operators.regrid import lattice, regrid_nearest_join
from ..sources.sinks import export_field_netcdf3, export_raster_geotiff

# output lattice (the reference's 0.04-degree viewer lattice, scaled to
# the sandbox fixture): a small window over the study area
LAT0, LON0, STEP, N_LON, N_LAT = 32.0, -126.0, 0.5, 16, 12


def field_for_day(
    spark: SparkSession, sf_dir: str, variable: str, day: str
) -> DataFrame:
    """Stages 1-2: scan events-as-field, sanity-filter, day filter, daily
    nan-skipping mean per scattered source point (i, j indices reused as
    the scatter ids; lon/lat derived deterministically)."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    day_lit = F.to_date(F.lit(day))
    mod = {"sst": 0, "ssh": 1}[variable]
    f = (
        ev.filter(F.to_date("ts") == day_lit)
        .filter(F.col("event_id") % 2 == mod)
        .withColumn("i", F.pmod(F.col("user_id"), F.lit(40)))
        .withColumn("j", F.pmod(F.col("user_id") * 7 + 3, F.lit(30)))
        .withColumn("v", F.when(F.col("value") < 1e10, F.col("value")))  # F6
    )
    return (
        f.groupBy("i", "j")
        .agg(F.avg("v").alias("value"))  # A2 nan-skipping daily mean
        .withColumn("point_id", F.col("j") * 40 + F.col("i"))
        .withColumn("lon", F.lit(LON0) + F.col("i") * 0.25)
        .withColumn("lat", F.lit(LAT0) + F.col("j") * 0.25)
    )


def field_from_netcdf(
    spark: SparkSession, nc_path: str, variable: str
) -> DataFrame:
    """Stage-1 alternative (round 4): scattered source field ingested from
    a NetCDF-3 archive through the binaryFile scan source — the engine
    analog of the reference's whole ingest side (xarray over NetCDF
    granules, wcofs.py:179-208). Non-null cells become the scatter points;
    point_id is the (j, i) row-major cell index."""
    from ..sources.scan import read_netcdf3_grid

    g = read_netcdf3_grid(spark, nc_path, variables=[variable])
    return g.filter(F.col("value").isNotNull()).select(
        (F.col("j").cast("long") * 4096 + F.col("i")).alias("point_id"),
        "lon",
        "lat",
        "value",
    )


def build_day_raster_from_netcdf(
    spark: SparkSession, nc_path: str, variable: str, day: str, out_dir: str
) -> "np.ndarray":
    """File-to-file ETL (round 4 — closes the loop the reference runs
    daily: NetCDF granules IN, masked north-up GeoTIFF OUT,
    write_daily_average.py:632-709). Stages 3-4 of build_day_raster over a
    NetCDF-ingested source field; returns the north-up array written."""
    src = field_from_netcdf(spark, nc_path, variable)
    tgt = lattice(spark, LON0, LAT0, STEP, N_LON, N_LAT, partitions=8)
    regridded = regrid_nearest_join(src, tgt, res=6, max_ring=8).join(
        tgt.select("query_id", "gi", "gj", "lon", "lat"), "query_id"
    )
    masked = pip_fixed(regridded).withColumn(
        "value_masked",
        F.when(F.col("polygon_id").isNotNull(), F.col("value")),
    )
    cells = masked.select(
        F.col("gi").alias("i"), F.col("gj").alias("j"),
        F.col("value_masked").alias("mean_val"),
    )
    os.makedirs(out_dir, exist_ok=True)
    return export_raster_geotiff(
        cells, os.path.join(out_dir, f"{variable}_{day}_from_nc.tif"),
        west=LON0, south=LAT0, dx=STEP, dy=STEP, n_i=N_LON, n_j=N_LAT,
    )


def build_day_raster(
    spark: SparkSession, sf_dir: str, variable: str, day: str, out_dir: str
) -> DataFrame:
    """Stages 3-4 for one (variable, day): regrid to the lattice, polygon
    mask, export real GeoTIFF + NetCDF; returns the lattice rows written
    (the partition's parquet payload for the lineage table)."""
    src = field_for_day(spark, sf_dir, variable, day)
    tgt = lattice(spark, LON0, LAT0, STEP, N_LON, N_LAT, partitions=8)
    regridded = regrid_nearest_join(src, tgt, res=6, max_ring=8).join(
        tgt.select("query_id", "gi", "gj", "lon", "lat"), "query_id"
    )
    # J5: mask cells outside every study polygon → null (nodata at sink)
    masked = pip_fixed(regridded).withColumn(
        "value_masked",
        F.when(F.col("polygon_id").isNotNull(), F.col("value")),
    )
    cells = masked.select(
        F.col("gi").alias("i"), F.col("gj").alias("j"),
        F.col("value_masked").alias("mean_val"),
    )
    os.makedirs(out_dir, exist_ok=True)
    northup = export_raster_geotiff(
        cells, os.path.join(out_dir, f"{variable}_{day}.tif"),
        west=LON0, south=LAT0, dx=STEP, dy=STEP, n_i=N_LON, n_j=N_LAT,
    )
    # K3: the same raster appended as a 2D-gridded-coverage subdataset in
    # the day's GeoPackage (the reference's third raster container)
    from ..sources.gpkg import write_gpkg_raster

    write_gpkg_raster(
        os.path.join(out_dir, f"{day}.gpkg"), f"{variable}_cov", northup,
        west=LON0, north=LAT0 + N_LAT * STEP, dx=STEP, dy=STEP,
        field_name=variable,
    )
    export_field_netcdf3(
        cells, os.path.join(out_dir, f"{variable}_{day}.nc"),
        lons=np.array([LON0 + i * STEP for i in range(N_LON)]),
        lats=np.array([LAT0 + j * STEP for j in range(N_LAT)]),
        var_name=variable,
    )
    return masked.select(
        "query_id", "gi", "gj", "lon", "lat", "value", "polygon_id"
    )


def run_daily_job(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    variables: tuple[str, ...] = ("sst", "ssh"),
    days: tuple[str, ...] = ("2024-01-02", "2024-01-03"),
) -> dict:
    """The full daily driver: one lineage partition per (variable, day),
    resumable/idempotent via the manifest anti-join; writes the dir-index
    JSON at the end (ref: write_daily_average.py:662-663)."""
    from ..sources.sinks import dir_index_json

    keys = [f"{v}__{d}" for v in variables for d in days]

    def build(s: SparkSession, key: str) -> DataFrame:
        v, d = key.split("__")
        return build_day_raster(s, sf_dir, v, d, os.path.join(out_root, "rasters"))

    summary = run_partitioned(spark, out_root, keys, build)
    idx_path = os.path.join(out_root, "index.json")
    with open(idx_path, "w") as fh:
        fh.write(dir_index_json(out_root))
    summary["index_json"] = idx_path
    return summary
