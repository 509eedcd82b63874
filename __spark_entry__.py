"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship tile-assignment query on sf0.001 documents.
queries()     — every implemented operator (see pyofs_spark/plans/queries*.py).
oracle_sql()  — matching DuckDB SQL for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyofs_spark.plans.queries import geo_tile_assign

    return geo_tile_assign(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pyofs_spark.plans.queries import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    from pyofs_spark.plans.queries import get_oracles

    return get_oracles()
