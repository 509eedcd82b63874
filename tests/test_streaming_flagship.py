"""Streaming flagship == batch flagship on the same files (round 3):
the map-only tile assignment runs unchanged under Structured Streaming
(stateless append, no watermark), and per-row results are identical."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F


def test_streaming_tile_assignment_equals_batch(spark):
    from pyofs_spark.plans.pipeline import tile_assignment
    from pyofs_spark.streaming.flagship import tile_assignment_stream
    from pyofs_spark.synth import synth_pages

    src = tempfile.mkdtemp()
    chk = tempfile.mkdtemp()
    try:
        pages = synth_pages(spark, 800, 4)
        pages.filter("page_id < 500").write.mode("overwrite").parquet(src)

        batch_files = spark.read.parquet(src)
        expect = {
            r.page_id: (r.cell_id, r.polygon_id, tuple(r.knn_stations))
            for r in tile_assignment(spark, batch_files, k=3).collect()
        }

        stream = spark.readStream.schema(pages.schema).parquet(src)
        out = tile_assignment_stream(stream, k=3)
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("flagship_stream")
            .option("checkpointLocation", chk)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        got = {
            r.page_id: (r.cell_id, r.polygon_id, tuple(r.knn_stations))
            for r in spark.sql("SELECT * FROM flagship_stream").collect()
        }
        assert got == expect and len(got) == 500

        # live tail: new files arrive, only they are appended (incremental)
        pages.filter("page_id >= 500").write.mode("append").parquet(src)
        q.processAllAvailable()
        q.stop()
        rows = spark.sql("SELECT * FROM flagship_stream").collect()
        assert len(rows) == 800
        full_expect = {
            r.page_id: (r.cell_id, r.polygon_id, tuple(r.knn_stations))
            for r in tile_assignment(spark, spark.read.parquet(src), k=3).collect()
        }
        assert {
            r.page_id: (r.cell_id, r.polygon_id, tuple(r.knn_stations))
            for r in rows
        } == full_expect
    finally:
        shutil.rmtree(src)
        shutil.rmtree(chk)
