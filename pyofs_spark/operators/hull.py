"""Convex-hull boundary extraction (SURVEY C13).

The reference walks the grid boundary and takes a convex hull to build the
model-domain polygon (ref: PyOFS/model/wcofs.py:1843-1891 via
shapely convex_hull). Distributed formulation (hull is associative):

1. per-partition Andrew monotone-chain hull via mapInPandas
   (each partition reduces its points to ≤ O(hull) points),
2. driver-side merge hull over the concatenated partial hulls (tiny).

This is the standard two-level convex-hull reduction: correctness follows
from hull(A ∪ B) = hull(hull(A) ∪ hull(B)).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def monotone_chain(xy: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns hull vertices in CCW order
    (closed implicitly, first != last). O(n log n), pure numpy/python."""
    pts = np.unique(xy, axis=0)  # sorts lexicographically (x, then y)
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(tuple(p))
    upper: list = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(tuple(p))
    return np.array(lower[:-1] + upper[:-1])


def convex_hull(points: DataFrame, lon: str = "lon", lat: str = "lat") -> np.ndarray:
    """Distributed convex hull of a point DataFrame → CCW vertex array."""

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            h = monotone_chain(pdf[[lon, lat]].to_numpy(dtype=np.float64))
            yield pd.DataFrame({lon: h[:, 0], lat: h[:, 1]})

    partials = points.select(lon, lat).mapInPandas(
        _partial, f"{lon} double, {lat} double"
    )
    # extreme partition counts (10^5+ at 100 TB): a middle tree-reduce
    # level keeps the driver gather at O(sqrt(P) * |hull|) instead of
    # O(P * |hull|) — regroup partials into ~sqrt(P) groups and hull each
    # before the final driver merge. hull(A ∪ B) = hull(hull(A) ∪ hull(B))
    # makes every level exact. repartition (a shuffle), NOT coalesce: a
    # coalesce here is a narrow dependency that would collapse the heavy
    # stage-1 hull over the raw points down to sqrt(P) tasks; the shuffle
    # is cheap because partial hulls are tiny.
    n_parts = partials.rdd.getNumPartitions()
    if n_parts > 64:
        partials = partials.repartition(
            max(8, int(np.sqrt(n_parts)))
        ).mapInPandas(_partial, f"{lon} double, {lat} double")
    merged = partials.toPandas()[[lon, lat]].to_numpy(dtype=np.float64)
    if len(merged) == 0:
        return merged
    return monotone_chain(merged)
