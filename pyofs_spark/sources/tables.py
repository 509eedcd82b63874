"""Table loaders.

Testdata parquet loading (driver-provided TPC-H-ish star schema plus
documents/embeddings, TESTDATA.md) and view registration. At production
scale these reads become Iceberg catalog reads (`spark.read.table`); the
parquet path keeps identical semantics (columnar scan, predicate pushdown,
partition pruning on directory layout).
"""

from __future__ import annotations

import os

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view named after itself."""
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)
