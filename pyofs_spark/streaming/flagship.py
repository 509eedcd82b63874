"""Streaming twin of the FLAGSHIP tile-assignment pipeline (round 3).

The batch flagship (plans/pipeline.py) is a single stateless map-only
projection — geocode → cell index → PIP → inline kNN — which is exactly
the shape Structured Streaming runs unchanged: the same DataFrame
transformations applied to a readStream source yield a per-micro-batch
append with zero state, zero shuffle, and identical per-row results
(pytest: streaming over a file source == batch over the same files,
tests/test_streaming_flagship.py).

Why this matters at 10^12 scale: the corpus never stops arriving (new
WARC drops); the SAME engine code serves both the backfill (batch over
the Iceberg table) and the live tail (readStream over the landing zone),
with per-partition lineage handling the handoff (lineage.py). The
reference's analog is its daily re-run loop (write_daily_average.py);
this is the continuous version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..plans.pipeline import tile_assignment


def tile_assignment_stream(
    pages_stream: DataFrame,
    key_col: str = "page_id",
    k: int = 3,
) -> DataFrame:
    """Apply the flagship assignment to a streaming pages DataFrame.

    Stateless narrow plan → works in append mode with no watermark; each
    micro-batch is a pure projection of its input files. The `spark`
    session argument of the batch builder is unused by the map-only path,
    so the same function body serves both modes."""
    return tile_assignment(
        pages_stream.sparkSession, pages_stream, key_col=key_col, k=k
    )
