"""Table loaders.

Testdata parquet loading (driver-provided TPC-H-ish star schema plus
documents/embeddings, TESTDATA.md) and view registration. At production
scale these reads become Iceberg catalog reads (`spark.read.table`); the
parquet path keeps identical semantics (columnar scan, predicate pushdown,
partition pruning on directory layout).

Round 6 (guide §5 "the driver should do almost no data work"): both
`load_table` and `register_views` are memoized per live SparkSession.
Every `spark.read.parquet` is a driver-side py4j round-trip plus a footer
schema read (~90 ms measured warm); the query registry calls these on
EVERY query invocation, so the un-memoized cost was ~0.9 s per invocation
x 26 invocations in the headline bench — pure driver overhead, zero bytes
of useful work. DataFrames are immutable plans, so handing back the same
object is semantics-preserving; the cache is keyed on the session OBJECT
(WeakKeyDictionary — dies with the session) plus the directory, so a new
session or a different sf_dir always re-reads, and the testdata itself is
immutable by contract (read-only mount, `_DONE` marker).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# session -> {parquet path -> DataFrame plan}
_DF_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)
# session -> sf_dir whose tables the session's temp views currently point at
_VIEWS_FOR: "weakref.WeakKeyDictionary[SparkSession, str]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    per_session = _DF_CACHE.setdefault(spark, {})
    df = per_session.get(path)
    if df is None:
        df = spark.read.parquet(path)
        per_session[path] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view named after itself.

    Idempotent per (session, sf_dir): re-registering identical views on
    every query invocation cost ~0.9 s of driver time each; switching
    sf_dir (oracle runs walk sf0.001 -> sf0.01) still re-registers."""
    if _VIEWS_FOR.get(spark) == sf_dir:
        return
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _VIEWS_FOR[spark] = sf_dir
