"""Operator-level Spark tests: kNN ring path vs brute force, PIP SQL vs
numpy kernel, NN regrid vs golden kernel, byte identity through the full
pipeline (SURVEY §5 items 1, 2, 4)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pyofs_spark.functions import kernels as K
from pyofs_spark.functions import polygons as P
from pyofs_spark.operators.knn import knn_join, nn_value_join
from pyofs_spark.operators.pip import pip_fixed, pip_join_broadcast
from pyofs_spark.plans.pipeline import geocode_pages, station_df, tile_assignment
from pyofs_spark.synth import synth_pages


def _knn_brute_py(qs, ps, k):
    out = {}
    for qid, qx, qy in qs:
        d = sorted(
            ((qx - px) * (qx - px) + (qy - py) * (qy - py), pid) for pid, px, py in ps
        )
        out[qid] = [(pid, d2) for d2, pid in d[:k]]
    return out


def test_knn_rings_exact_vs_brute(spark):
    """Force the ring strategy and check exactness against pure-python brute
    force, with a clustered + sparse points side (ring expansion + tail)."""
    rng = np.random.default_rng(7)
    n_q, n_p = 400, 300
    qs = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        zip(rng.uniform(-130, -110, n_q), rng.uniform(25, 50, n_q)))]
    # clustered points + a few isolated
    px = np.concatenate([rng.normal(-122, 0.5, n_p - 5), rng.uniform(60, 170, 5)])
    py = np.concatenate([rng.normal(37, 0.5, n_p - 5), rng.uniform(-60, 60, 5)])
    ps = [(f"p{i:03d}", float(x), float(y)) for i, (x, y) in enumerate(zip(px, py))]

    qdf = spark.createDataFrame(qs, "query_id long, lon double, lat double")
    pdf = spark.createDataFrame(ps, "point_id string, lon double, lat double")
    got = knn_join(qdf, pdf, k=3, res=6, max_ring=3, strategy="rings").collect()
    exp = _knn_brute_py(qs, ps, 3)
    got_by_q = {}
    for r in got:
        got_by_q.setdefault(r.query_id, []).append((r.knn_rank, r.point_id, r.dist2))
    assert len(got_by_q) == n_q
    for qid, rows in got_by_q.items():
        rows.sort()
        assert [(pid, d2) for _, pid, d2 in rows] == exp[qid], f"query {qid}"


def test_nn_regrid_matches_golden_kernel(spark):
    """nn_value_join == kernels.regrid_nearest (the reference-exact
    interpolate_grid 'nearest' twin, wcofs.py:1791-1827)."""
    rng = np.random.default_rng(3)
    n_src = 200
    slon = rng.uniform(-125, -115, n_src)
    slat = rng.uniform(30, 40, n_src)
    sval = np.round(rng.uniform(0, 30, n_src), 3)
    sval[::17] = np.nan  # NaN sources must be dropped
    # regular output lattice
    qlon, qlat = np.meshgrid(np.linspace(-124, -116, 20), np.linspace(31, 39, 15))
    qlon, qlat = qlon.ravel(), qlat.ravel()

    golden = K.regrid_nearest(slon, slat, sval, qlon, qlat)

    src = spark.createDataFrame(
        pd.DataFrame({"point_id": np.arange(n_src), "lon": slon, "lat": slat, "val": sval})
    )
    q = spark.createDataFrame(
        pd.DataFrame({"query_id": np.arange(len(qlon)), "lon": qlon, "lat": qlat})
    )
    got = nn_value_join(q, src, "val", res=8, max_ring=3).collect()
    got_map = {r.query_id: r.val for r in got}
    assert len(got_map) == len(qlon)
    for i in range(len(qlon)):
        assert got_map[i] == golden[i], f"query {i}: {got_map[i]} != {golden[i]}"


def test_pip_sql_matches_numpy(spark):
    """The unrolled SQL ray cast and the numpy kernel agree on random and
    boundary points for every fixture polygon."""
    rng = np.random.default_rng(11)
    lon = np.concatenate([rng.uniform(-180, 180, 2000), [-126.0, -116.0, 170.0, -180.0]])
    lat = np.concatenate([rng.uniform(-90, 90, 2000), [32.0, 32.0, -10.0, 10.0]])
    df = spark.createDataFrame(pd.DataFrame({"i": np.arange(len(lon)), "lon": lon, "lat": lat}))
    for pid, rings in P.POLYGONS.items():
        got = (
            df.withColumn("inside", F.expr(P.pip_sql("lon", "lat", rings)))
            .orderBy("i")
            .select("inside")
            .toPandas()["inside"]
            .to_numpy()
        )
        expect = P.pip_numpy(lon, lat, rings)
        assert (got == expect).all(), pid


def test_pip_broadcast_udf_path(spark):
    """Path B (broadcast polygons + pandas UDF) agrees with Path A
    (codegen) on which points fall in which polygon."""
    pages = geocode_pages(synth_pages(spark, 500, 4))
    a = pip_fixed(pages).filter(F.col("polygon_id").isNotNull())
    a_rows = {(r.page_id, r.polygon_id) for r in a.select("page_id", "polygon_id").collect()}

    polys = spark.createDataFrame(
        P.polygons_long_rows(),
        "polygon_id string, ring_idx int, vertex_idx int, lon double, lat double",
    )
    b = pip_join_broadcast(spark, pages.select("page_id", "lon", "lat"), polys, res=4)
    b_rows = {(r.page_id, r.polygon_id) for r in b.collect()}
    # path A assigns ONE polygon (priority); path B returns all containments.
    # every A assignment must appear in B, and B restricted to priority = A.
    assert a_rows <= b_rows
    prio = {pid: i for i, pid in enumerate(P.POLYGONS)}
    b_first = {}
    for page, pid in sorted(b_rows, key=lambda t: (t[0], prio[t[1]])):
        b_first.setdefault(page, pid)
    assert {(k, v) for k, v in b_first.items()} == a_rows


def test_pipeline_byte_identity(spark):
    """north_star invariant: text passes through the full pipeline
    byte-identical per url (checked via md5 + direct equality)."""
    pages = synth_pages(spark, 300, 4)
    out = tile_assignment(spark, pages, k=2, with_knn=False)
    joined = (
        out.select("page_id")
        .join(pages.select("page_id", F.md5("text").alias("h1"), "text"), "page_id")
        .join(
            synth_pages(spark, 300, 8).select(
                "page_id", F.md5("text").alias("h2"), F.col("text").alias("text2")
            ),
            "page_id",
        )
    )
    assert joined.count() == 300
    assert joined.filter("h1 != h2 OR text != text2").count() == 0


def test_tile_assignment_deterministic_across_parallelism(spark):
    """Same tile assignments regardless of partitioning (scaling-correctness
    precondition for the two-cluster-size rule)."""
    a = tile_assignment(spark, synth_pages(spark, 400, 2), k=1).collect()
    b = tile_assignment(spark, synth_pages(spark, 400, 16), k=1).collect()
    ka = {r.page_id: (r.cell_id, r.polygon_id, r.knn_stations, r.knn_dist2) for r in a}
    kb = {r.page_id: (r.cell_id, r.polygon_id, r.knn_stations, r.knn_dist2) for r in b}
    assert ka == kb


def test_station_fixture_pip():
    """One fixture station lies outside the coastal polygon (FIXTURES §5)."""
    from pyofs_spark.functions.stations import STATIONS

    lon = np.array([s[1] for s in STATIONS])
    lat = np.array([s[2] for s in STATIONS])
    inside = P.pip_numpy(lon, lat, P.COASTAL_POLY)
    names_out = {s[0] for s, i in zip(STATIONS, inside) if not i}
    assert "41001" in names_out and "51001" in names_out


def test_url_keyed_flagship_zero_python_plan(spark):
    """Flagship on a STRING (url) key: xxhash64-based geocode keeps the
    whole pipeline JVM-side — no Python eval node, no shuffle (single
    map-only stage), deterministic per url."""
    pages = synth_pages(spark, 2000, 8)
    out = tile_assignment(spark, pages, key_col="url", k=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no row-wise or Arrow Python eval
    assert "Exchange" not in plan  # zero-shuffle map-only plan
    rows = out.collect()
    assert len(rows) == 2000
    # deterministic: same url -> same assignment on a re-run
    again = {r.url: (r.cell_id, r.polygon_id) for r in
             tile_assignment(spark, pages, key_col="url", k=1).collect()}
    for r in rows:
        assert again[r.url] == (r.cell_id, r.polygon_id)
    # coast bias survives the hash route: a plurality of pages in hot cells
    n_hot = sum(1 for r in rows if r.polygon_id is not None)
    assert 0.2 * len(rows) < n_hot < 0.8 * len(rows)


def test_portable_url_key_stays_in_codegen(spark):
    """The md5-polynomial portable url key (oracle-gated path) must keep
    the geocode projection inside whole-stage codegen — no EvalPython, no
    CodegenFallback drop-out."""
    from pyspark.sql import functions as F

    from pyofs_spark.functions import cells, geocode

    url = "concat('https://example.org/', cast(id as string))"
    key = geocode.geocode_url_key_portable_sql(url)
    df = (
        spark.range(0, 1000)
        .withColumn("url_key", F.expr(key))
        .withColumn("lon", F.expr(geocode.geocode_id_lon_sql("url_key")))
        .withColumn("lat", F.expr(geocode.geocode_id_lat_sql("url_key")))
        .withColumn("cell_id", F.expr(cells.cell_id_sql("lon", "lat", 8)))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # executedPlan marks codegen stages with '*(n)' prefixes
    assert any(line.lstrip().startswith("*(") for line in plan.splitlines())
    assert df.where("cell_id IS NULL OR url_key < 0").count() == 0
