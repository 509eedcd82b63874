from __future__ import annotations

import numpy as np
import pandas as pd

from pyofs_spark.operators.hull import convex_hull, monotone_chain


def _brute_hull_contains_all(hull: np.ndarray, pts: np.ndarray) -> bool:
    """Every point is inside/on the CCW hull (all cross products >= 0)."""
    n = len(hull)
    for k in range(n):
        o, a = hull[k], hull[(k + 1) % n]
        d = (a[0] - o[0]) * (pts[:, 1] - o[1]) - (a[1] - o[1]) * (pts[:, 0] - o[0])
        if (d < -1e-9).any():
            return False
    return True


def test_monotone_chain_square():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5], [0.2, 0.8]])
    h = monotone_chain(pts)
    assert len(h) == 4
    assert {tuple(p) for p in h} == {(0, 0), (1, 0), (1, 1), (0, 1)}


def test_distributed_hull_matches_single_pass(spark):
    rng = np.random.default_rng(13)
    xy = rng.normal(0, 10, (5000, 2))
    df = spark.createDataFrame(pd.DataFrame({"lon": xy[:, 0], "lat": xy[:, 1]})).repartition(16)
    h_dist = convex_hull(df)
    h_single = monotone_chain(xy)
    assert {tuple(p) for p in h_dist} == {tuple(p) for p in h_single}
    assert _brute_hull_contains_all(h_dist, xy)


def test_hull_tree_reduce_level(spark):
    """>64 partitions triggers the middle tree-reduce level; hull is
    unchanged (hull of hulls is exact at every level)."""
    import numpy as np
    import pandas as pd

    from pyofs_spark.operators.hull import convex_hull, monotone_chain

    rng = np.random.default_rng(9)
    pts = rng.uniform(-50, 50, size=(5000, 2))
    df = spark.createDataFrame(
        pd.DataFrame({"lon": pts[:, 0], "lat": pts[:, 1]})
    ).repartition(100)
    got = convex_hull(df)
    expect = monotone_chain(pts)
    np.testing.assert_array_equal(got, expect)
