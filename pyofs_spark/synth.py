"""Deterministic synthetic pages table (Common-Crawl-style, input_hint shape).

Columns: (url:string, warc_ts:timestamp, html:binary, text:string,
lang:string) — BASELINE.json input_hint. Generated entirely with Spark SQL
`range()` + closed-form expressions: seeded, reproducible at any scale, and
distributed (no driver-side materialization), so the same generator serves
sf=1e3 unit tests and 1e8-row bench runs. Coast-biased geocode skew comes
from functions/geocode.py applied to the page key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["en", "es", "fr", "de", "pt", "zh", "ja", "ru"]

# word pool for deterministic text payloads
_WORDS = (
    "ocean model tide current sea surface temperature salinity forecast "
    "coastal buoy station satellite radar grid cell interpolation raster "
    "vector tile polygon particle contour advection velocity field"
).split()


def synth_pages(spark: SparkSession, n_rows: int, partitions: int = 32) -> DataFrame:
    """n_rows pages keyed by page_id ∈ [0, n_rows).

    text is a deterministic function of page_id (so byte-identity per url is
    checkable end-to-end); html wraps text; lang cycles a fixed list.
    """
    df = spark.range(0, n_rows, 1, partitions).withColumnRenamed("id", "page_id")
    words = F.array(*[F.lit(w) for w in _WORDS])
    nw = len(_WORDS)
    # deterministic 12-word sentence per page
    text_parts = [
        F.element_at(words, (F.pmod(F.col("page_id") * (k * 2 + 1) + k, F.lit(nw)) + 1).cast("int"))
        for k in range(12)
    ]
    text = F.concat_ws(" ", *text_parts)
    lang = F.element_at(
        F.array(*[F.lit(lg) for lg in LANGS]),
        (F.pmod(F.col("page_id") * 31 + 7, F.lit(len(LANGS))) + 1).cast("int"),
    )
    return df.select(
        F.concat(F.lit("https://example.org/page/"), F.col("page_id")).alias("url"),
        # crawl timestamps spread over 30 days of 2026-01, second granularity
        # (integer epoch arithmetic — make_interval routes through DECIMAL
        # math, ~10x slower per row; timestamp_seconds is a long cast)
        F.timestamp_seconds(
            F.lit(1767225600)  # 2026-01-01 00:00:00 UTC
            + F.pmod(F.col("page_id") * 7919, F.lit(30 * 86400))
        ).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), "utf-8").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        F.col("page_id"),
    )
