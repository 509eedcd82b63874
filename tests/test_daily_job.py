"""End-to-end daily ETL job (SURVEY §3.1 lifecycle on this engine):
scan → filter → daily mean → regrid → mask → REAL GeoTIFF/NetCDF sinks →
lineage commit; resumable mid-job; dir-index manifest written."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import numpy as np

from conftest import SF_DIR


def test_daily_job_end_to_end_and_resume(spark):
    from pyofs_spark.jobs.daily import N_LAT, N_LON, run_daily_job
    from pyofs_spark.lineage import read_output
    from pyofs_spark.sources.geotiff import read_geotiff
    from pyofs_spark.sources.netcdf3 import read_netcdf3

    out = tempfile.mkdtemp()
    try:
        # partial run: one (variable, day) partition "crashes" after
        variables, days = ("sst", "ssh"), ("2024-01-02", "2024-01-03")
        s1 = run_daily_job(spark, SF_DIR, out, variables, days[:1])
        assert sorted(s1["ran"]) == ["ssh__2024-01-02", "sst__2024-01-02"]

        # resume with the full key set: only the missing day runs
        s2 = run_daily_job(spark, SF_DIR, out, variables, days)
        assert sorted(s2["ran"]) == ["ssh__2024-01-03", "sst__2024-01-03"]
        assert sorted(s2["skipped"]) == ["ssh__2024-01-02", "sst__2024-01-02"]

        # committed output readable through the manifest snapshot
        table = read_output(spark, out)
        assert table.count() == 4 * N_LON * N_LAT  # 4 partitions x lattice

        # real-format artifacts exist and parse
        tif = read_geotiff(os.path.join(out, "rasters", "sst_2024-01-02.tif"))
        assert tif["data"].shape == (N_LAT, N_LON)
        assert tif["data"].dtype == np.float32
        assert tif["geokeys"][2048] == 4326
        # masked cells are nodata; some in-polygon cells carry data
        assert (tif["data"] == -9999.0).any()
        assert (tif["data"] != -9999.0).any()

        nc = read_netcdf3(os.path.join(out, "rasters", "ssh_2024-01-03.nc"))
        assert nc["variables"]["ssh"]["data"].shape == (N_LAT, N_LON)
        assert nc["dims"] == {"lat": N_LAT, "lon": N_LON}

        # K3 (round 4): both variables' rasters live as gridded-coverage
        # subdatasets in the day's GeoPackage, equal to the GeoTIFF
        from pyofs_spark.sources.gpkg import read_gpkg_raster

        cov = read_gpkg_raster(
            os.path.join(out, "rasters", "2024-01-02.gpkg"), "sst_cov"
        )
        np.testing.assert_array_equal(cov["data"], tif["data"])
        read_gpkg_raster(
            os.path.join(out, "rasters", "2024-01-02.gpkg"), "ssh_cov"
        )

        # GeoTIFF north-up row 0 == manifest table's max-gj row (flip check)
        sst = {  # (gi, gj) -> masked value for the written day
            (r.gi, r.gj): r.value if r.polygon_id is not None else None
            for r in table.where(
                "part_key = 'sst__2024-01-02'"
            ).collect()
        }
        for gi in range(N_LON):
            v = sst[(gi, N_LAT - 1)]
            top = tif["data"][0, gi]
            if v is None:
                assert top == -9999.0
            else:
                assert abs(top - v) < 1e-4  # float32 cast at the edge

        # dir-index manifest reflects the raster tree
        idx = json.load(open(s2["index_json"]))
        assert "rasters" in idx or any("part_key" in k for k in idx)
    finally:
        shutil.rmtree(out)
