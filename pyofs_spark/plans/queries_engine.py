"""Engine-native operator queries WITHOUT SQL oracles (non-SQL-expressible:
iterative advection, LSH ANN, distributed hull, streaming). The driver
records rows-only checks for these; their exactness is pytest-gated instead
(tests/test_advection.py, test_regrid_similarity.py, test_hull.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .queries import register


@register("eng_cosine_lsh")
def eng_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN via random-hyperplane LSH + exact re-rank
    (recall vs brute force gated in pytest)."""
    from ..operators.similarity import cosine_topk_lsh

    vecs = load_table(spark, sf_dir, "embeddings")
    queries = vecs.filter(F.col("vec_id") % 50 == 0)
    return cosine_topk_lsh(vecs, queries, k=5, dim=64, n_tables=8)


@register("eng_advect_contour")
def eng_advect_contour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RK4 contour advection through a Rankine vortex; per-step
    area/perimeter (iterative stateful operator, SURVEY T5)."""
    from ..operators.advection import (
        circle_contour,
        contour_metrics,
        rankine_vortex,
        track_contour,
    )

    field = rankine_vortex(0.0, 0.0, 10_000.0, 1.0)
    seed = circle_contour(spark, 1.0, 4_000.0, 0.0, 2_000.0, n_vertices=32)
    traj = track_contour(spark, seed, field, 0.0, 120.0, 10, order=4)
    return contour_metrics(traj).orderBy("step")


@register("eng_convex_hull")
def eng_convex_hull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed convex hull of the geocoded documents (SURVEY C13)."""
    from ..operators.hull import convex_hull
    from .queries import geodocs

    pts = geodocs(spark, sf_dir).select("lon", "lat")
    h = convex_hull(pts)
    rows = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(h)]
    return spark.createDataFrame(rows, "vertex_idx int, lon double, lat double")


@register("eng_media_features")
def eng_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: mapInPandas feature extraction over binary
    payloads (decode stubbed deterministically)."""
    from ..operators.multimodal import extract_features, synth_media

    media = synth_media(spark, 500, 8)
    return extract_features(media).select(
        "media_id", "kind", "payload_sha256", "payload_bytes"
    )


@register("eng_skew_salted_counts")
def eng_skew_salted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted per-cell counts over the coast-biased geocode —
    equals the direct groupBy exactly (pytest-gated); demonstrates the
    explicit-salting requirement of the north rule."""
    from ..functions import cells
    from ..operators.skew import salted_cell_counts
    from .queries import geodocs

    g = geodocs(spark, sf_dir).withColumn(
        "cell_id", F.expr(cells.cell_id_sql("lon", "lat", 6))
    )
    return salted_cell_counts(g, "doc_id")


@register("eng_linear_regrid")
def eng_linear_regrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scattered-data linear regrid (Delaunay barycentric, SURVEY J2):
    geocoded docs as sources, a coastal lattice as targets."""
    from ..operators.regrid import lattice, regrid_linear_join
    from .queries import geodocs

    src = (
        geodocs(spark, sf_dir)
        .withColumn("value", (F.col("doc_id") % 100) / 10.0)
        .select(F.col("doc_id").alias("point_id"), "lon", "lat", "value")
    )
    tgt = lattice(spark, -126.0, 32.0, 0.5, 20, 20, partitions=8)
    return regrid_linear_join(spark, src, tgt, tile_res=4).orderBy("query_id")


@register("eng_pip_broadcast_udf")
def eng_pip_broadcast_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIP Path B: broadcast polygon dim table + Arrow pandas-UDF ray cast
    with cell-cover prefilter — ALL containments per point (vs the
    priority-coalesced Path A). Pytest-gated equal to Path A restricted
    to priority (tests/test_operators.py)."""
    from ..functions import polygons as P
    from ..operators.pip import pip_join_broadcast
    from .queries import geodocs

    polys = spark.createDataFrame(
        P.polygons_long_rows(),
        "polygon_id string, ring_idx int, vertex_idx int, lon double, lat double",
    )
    pts = geodocs(spark, sf_dir).select("doc_id", "lon", "lat")
    return pip_join_broadcast(spark, pts, polys, res=4).select("doc_id", "polygon_id")
