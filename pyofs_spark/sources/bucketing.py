"""Bucketed tables → co-located, exchange-free joins (north-rule
"bucketing for co-located joins"; round 3).

At 10^12 rows the recurring joins are keyed by cell_id (tile↔tile,
tile↔rollup) and by url/page key (incremental upserts). Writing both
sides bucketed on the join key with the SAME bucket count lets Spark's
bucketed-scan planner skip BOTH shuffle exchanges: each task reads bucket
i of each side and joins locally. For the daily pipeline that converts
the biggest recurring shuffle (re-partitioning yesterday's 10^12-row
assignment table for the join against today's delta) into a map-side
merge — the single largest communication saving available to the job.

Plan contract (pytest-asserted, tests/test_bucketing.py): joining two
tables written by `write_bucketed(key, n)` on `key` produces a
SortMergeJoin with ZERO Exchange operators; the same join on unbucketed
copies shows two Exchanges.

Sorted buckets (`sort_col`) additionally remove the per-task Sort for
merge joins on the sort prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (optionally sorted) managed parquet table.
    Both sides of a recurring join must use the same (col, n_buckets)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left: str, right: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planner emits
    no Exchange (verify with n_exchanges)."""
    return spark.table(left).join(spark.table(right), on, how)


def n_exchanges(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the executed plan. NOTE:
    `sparkPlan()` is the plan BEFORE EnsureRequirements — it never shows
    exchanges; they appear in `executedPlan()` (under AQE, in the
    AdaptiveSparkPlan's initial plan printout)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
