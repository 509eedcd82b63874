"""Skew statistics + explicit salting of hot cells.

north_rule requires partitioning/shuffle/skew handled EXPLICITLY (beyond
AQE): coast-biased geocoding concentrates ~40% of pages in a handful of
cells (functions/geocode.py), so any groupBy(cell)/join-on-cell gets hot
keys. The reference has no analog (its "skew handling" is thread-level
work stealing); this module provides the standard two-phase remedy:

1. `cell_histogram` — stats pass: per-cell counts (itself safe: counts are
   map-side combined, so hot cells don't skew the stats job).
2. `salt_hot_cells` — appends `salt = pmod(hash(row_key), n_salts)` ONLY for
   cells above a count threshold; cold cells keep salt=0 (avoids exploding
   the small side for keys that don't need it).
3. `salted_groupby_count` / two-phase aggregation — aggregate on
   (cell, salt), then re-aggregate on cell: the hot key's work spreads over
   n_salts reducers.
4. For joins: the dim side is exploded to all salt values for hot cells
   only (`explode_salts_for_join`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cell_histogram(df: DataFrame, cell_col: str = "cell_id") -> DataFrame:
    return df.groupBy(cell_col).agg(F.count("*").alias("cell_count"))


def hot_cells(df: DataFrame, cell_col: str = "cell_id",
              threshold: int | None = None) -> DataFrame:
    """Cells whose count exceeds `threshold` (default: mean + 10x stddev of
    the histogram, floor 2x mean)."""
    hist = cell_histogram(df, cell_col)
    if threshold is None:
        stats = hist.agg(
            F.avg("cell_count").alias("mu"), F.stddev_pop("cell_count").alias("sd")
        ).collect()[0]
        threshold = max(stats["mu"] * 2, stats["mu"] + 10 * (stats["sd"] or 0))
    return hist.filter(F.col("cell_count") > threshold).select(cell_col, "cell_count")


def salt_hot_cells(
    df: DataFrame,
    hot: DataFrame,
    row_key: str,
    cell_col: str = "cell_id",
    n_salts: int = 16,
) -> DataFrame:
    """Append a `salt` column: pmod(hash(row_key), n_salts) for hot cells,
    0 for cold ones. `hot` is dimension-sized → broadcast."""
    flags = F.broadcast(hot.select(cell_col).withColumn("_is_hot", F.lit(True)))
    return (
        df.join(flags, cell_col, "left")
        .withColumn(
            "salt",
            F.when(
                F.col("_is_hot").isNotNull(),
                F.pmod(F.hash(F.col(row_key)), F.lit(n_salts)),
            ).otherwise(F.lit(0)),
        )
        .drop("_is_hot")
    )


def salted_cell_counts(
    df: DataFrame, row_key: str, cell_col: str = "cell_id", n_salts: int = 16
) -> DataFrame:
    """Two-phase count per cell via salting (exactly equals the direct
    groupBy count; the win is reducer balance at scale)."""
    hot = hot_cells(df, cell_col)
    salted = salt_hot_cells(df, hot, row_key, cell_col, n_salts)
    partial = salted.groupBy(cell_col, "salt").agg(F.count("*").alias("c"))
    return partial.groupBy(cell_col).agg(F.sum("c").alias("cell_count"))


def explode_salts_for_join(
    dim: DataFrame, hot: DataFrame, cell_col: str = "cell_id", n_salts: int = 16
) -> DataFrame:
    """Replicate dim rows of hot cells across all salt values so a salted
    fact side can equi-join on (cell, salt)."""
    flags = F.broadcast(hot.select(cell_col).withColumn("_is_hot", F.lit(True)))
    salts = F.when(
        F.col("_is_hot").isNotNull(),
        F.array(*[F.lit(i) for i in range(n_salts)]),
    ).otherwise(F.array(F.lit(0)))
    return (
        dim.join(flags, cell_col, "left")
        .withColumn("salt", F.explode(salts))
        .drop("_is_hot")
    )
