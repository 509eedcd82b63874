"""Sink semantics tests: float32 + nodata at the edge, overview levels,
partition layout, manifest."""

from __future__ import annotations

import json
import shutil
import tempfile

import numpy as np
from pyspark.sql import functions as F

from pyofs_spark import NODATA
from pyofs_spark.functions import kernels as K
from pyofs_spark.sources.sinks import dir_index_json, read_tiles, write_tile_table


def test_tile_sink_semantics(spark):
    rng = np.random.default_rng(9)
    vals = np.round(rng.uniform(0, 20, 64), 3)
    rows = [
        ("sst", "2026-01-01", int(i % 8), int(i // 8), float(vals[i]))
        for i in range(64)
    ]
    tiles = spark.createDataFrame(
        rows, "variable string, day string, i long, j long, value double"
    ).withColumn("day", F.to_date("day"))
    d = tempfile.mkdtemp()
    try:
        write_tile_table(tiles, d, overview_levels=2)
        out = read_tiles(spark, d)
        # dtype: float32 at the sink
        assert dict(out.dtypes)["mean_val"] == "float"
        lv = {r.level for r in out.select("level").distinct().collect()}
        assert lv == {0, 1, 2}
        # level-0 equals input; pyramid means match the golden kernel
        g = np.full((8, 8), np.nan)
        for _, _, i, j, v in rows:
            g[j, i] = v
        golden = K.overview_pyramid(g, 2)
        got1 = {
            (r.i, r.j): r.mean_val
            for r in out.filter("level = 1").collect()
        }
        for j in range(4):
            for i in range(4):
                assert abs(got1[(i, j)] - golden[0][j, i]) < 1e-5  # float32
        # partition layout on disk
        idx = json.loads(dir_index_json(d))
        assert "variable=sst" in idx
        # nodata fill: write a tile table with an all-null cell
        rows2 = rows + [("sst", "2026-01-01", 99, 99, None)]
        tiles2 = spark.createDataFrame(
            rows2, "variable string, day string, i long, j long, value double"
        ).withColumn("day", F.to_date("day"))
        d2 = tempfile.mkdtemp()
        try:
            write_tile_table(tiles2, d2, overview_levels=0)
            v99 = (
                read_tiles(spark, d2)
                .filter("i = 99 AND j = 99 AND level = 0")
                .collect()[0]
                .mean_val
            )
            assert v99 == np.float32(NODATA)
        finally:
            shutil.rmtree(d2)
    finally:
        shutil.rmtree(d)
