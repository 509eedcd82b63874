"""Regrid operators vs golden kernels; similarity LSH recall vs brute
force; multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pyofs_spark.functions import kernels as K
from pyofs_spark.operators.regrid import (
    asof_time_align,
    lattice,
    overview_rollup,
    regrid_bilinear_regular,
)
from pyofs_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_int8,
    cosine_topk_lsh,
    quantize_embeddings,
)


def test_lattice_shape(spark):
    lat = lattice(spark, -130.0, 30.0, 0.5, 10, 6)
    rows = lat.collect()
    assert len(rows) == 60
    r0 = {r.query_id: (r.lon, r.lat) for r in rows}
    assert r0[0] == (-130.0, 30.0)
    assert r0[9] == (-130.0 + 9 * 0.5, 30.0)
    assert r0[10] == (-130.0, 30.5)


def test_bilinear_join_matches_kernel(spark):
    rng = np.random.default_rng(5)
    n_lon, n_lat, step = 20, 15, 0.5
    lon0, lat0 = -130.0, 30.0
    gv = np.round(rng.uniform(0, 10, (n_lat, n_lon)), 3)
    grid_rows = [
        (int(i), int(j), float(gv[j, i])) for j in range(n_lat) for i in range(n_lon)
    ]
    grid = spark.createDataFrame(grid_rows, "gi long, gj long, value double")
    qx = rng.uniform(-131, -119, 300)  # includes out-of-domain
    qy = rng.uniform(29, 38, 300)
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": np.arange(300), "lon": qx, "lat": qy})
    )
    got = regrid_bilinear_regular(pts, grid, lon0, lat0, step, n_lon, n_lat)
    got_map = {r.pid: r.v_interp for r in got.collect()}
    glon = lon0 + np.arange(n_lon) * step
    glat = lat0 + np.arange(n_lat) * step
    expect = K.bilinear_interp(glon, glat, gv, qx, qy)
    for i in range(300):
        g = got_map[i]
        if np.isnan(expect[i]):
            assert g is None, i
        else:
            assert g is not None and abs(g - expect[i]) < 1e-12, i


def test_asof_align(spark):
    field = spark.createDataFrame(
        [("a", 1.0, 10.0), ("a", 3.0, 30.0), ("b", 2.0, 20.0)],
        "key string, ts double, value double",
    )
    q = spark.createDataFrame(
        [("a", 0.5), ("a", 1.0), ("a", 2.9), ("a", 3.5), ("b", 1.9), ("b", 2.0)],
        "key string, q_ts double",
    )
    got = {
        (r.key, r.q_ts): r.asof_value
        for r in asof_time_align(q, field, ["key"], f_time="ts").collect()
    }
    assert got == {
        ("a", 0.5): None,
        ("a", 1.0): 10.0,  # inclusive
        ("a", 2.9): 10.0,
        ("a", 3.5): 30.0,
        ("b", 1.9): None,
        ("b", 2.0): 20.0,
    }


def test_overview_rollup_matches_kernel(spark):
    g = np.arange(16, dtype=float).reshape(4, 4)
    rows = [
        (int(i), int(j), float(g[j, i]), 1) for j in range(4) for i in range(4)
    ]
    tiles = spark.createDataFrame(rows, "i long, j long, val_sum double, val_cnt long")
    out = overview_rollup(tiles, 2)
    got = {(r.level, r.i, r.j): r.mean_val for r in out.collect()}
    golden = K.overview_pyramid(g, 2)
    for lv, arr in enumerate(golden, start=1):
        for j in range(arr.shape[0]):
            for i in range(arr.shape[1]):
                assert abs(got[(lv, i, j)] - arr[j, i]) < 1e-12


def _pdvecs(spark, sf="/root/testdata/sf0.001"):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def test_lsh_recall_vs_brute(spark):
    vecs = _pdvecs(spark)
    queries = vecs.filter(F.col("vec_id") % 20 == 0)
    brute = cosine_topk_bruteforce(vecs, queries, k=5)
    # corpus-adaptive default (round 5): 32 tables, auto planes — lands
    # on the quality curve's 32x8 config at 20k vectors, 32x3 here
    approx = cosine_topk_lsh(vecs, queries, k=5, dim=64)
    b = {(r.qid, r.cid) for r in brute.collect()}
    a = {(r.qid, r.cid) for r in approx.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.9, recall


def test_multimodal_features(spark):
    from pyofs_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_media,
        extract_features,
        frame_sample_plan,
        synth_media,
    )

    media = synth_media(spark, 200, 4)
    feats = extract_features(media).collect()
    assert len(feats) == 200
    for r in feats[:10]:
        assert len(r.feature) == FEATURE_DIM
        assert r.payload_bytes > 0
    # determinism: same id → same feature
    one = [r for r in feats if r.media_id == 7][0]
    m7 = media.filter("media_id = 7").collect()[0]
    np.testing.assert_allclose(
        np.array(one.feature), decode_media(bytes(m7.payload), m7.kind), rtol=0
    )
    frames = frame_sample_plan(media, every_ms=10_000)
    n_videos = media.filter("kind = 'video'").count()
    assert frames.count() >= n_videos  # ≥1 frame per video
    assert frames.select("media_id").distinct().count() == n_videos


def test_ivf_recall_vs_brute(spark):
    """IVF (k-means inverted lists + nprobe probing) recall vs brute force
    on the clustered embedding fixture."""
    from pyofs_spark.operators.similarity import cosine_topk_ivf

    vecs = _pdvecs(spark)
    queries = vecs.filter(F.col("vec_id") % 20 == 0)
    brute = cosine_topk_bruteforce(vecs, queries, k=5)
    # corpus-adaptive default (round 5): auto centroids ~sqrt(n)/2 —
    # lands near the quality curve's dominating 64c config at 20k
    approx = cosine_topk_ivf(vecs, queries, k=5, dim=64)
    b = {(r.qid, r.cid) for r in brute.collect()}
    a = {(r.qid, r.cid) for r in approx.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.9, recall
    # determinism: the quantizer is seeded by the data, not an RNG
    again = {(r.qid, r.cid) for r in cosine_topk_ivf(
        vecs, queries, k=5, dim=64
    ).collect()}
    assert a == again


def test_int8_quantization_codes_and_error_bound(spark):
    """quantize_embeddings: codes are dim bytes/row (the 4x-vs-float32
    compression claim), the reconstruction error respects the symmetric
    scalar-quantization bound, and quantized cosine sits within
    ~sqrt(d)/127 of the exact cosine for every candidate pair."""
    vecs = _pdvecs(spark).limit(200)
    dim = 64
    rows = {r["vid"]: r for r in quantize_embeddings(vecs, dim).collect()}
    orig = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in vecs.collect()}
    assert rows.keys() == orig.keys()
    worst = 0.0
    for vid, r in rows.items():
        assert len(r["codes"]) == dim  # 64 B vs 256 B float32 payload
        codes = np.frombuffer(r["codes"], dtype=np.int8).astype(np.float64)
        x = orig[vid]
        # per-coordinate reconstruction error <= scale/2 (+ ulp slack)
        assert np.all(np.abs(codes * r["scale"] - x) <= r["scale"] / 2 + 1e-12)
        assert abs(r["code_norm"] - np.linalg.norm(codes)) < 1e-9
        nx = np.linalg.norm(x)
        if nx > 0 and r["code_norm"] > 0:
            worst = max(worst, abs(
                float(codes @ x) / (r["code_norm"] * nx) - 1.0
            ))
    # cos(x̂, x) within the sqrt(d)/127 ≈ 0.063 analytic envelope — in
    # practice far inside it on real-valued embeddings
    assert worst < 0.02, worst


def test_int8_topk_recall_and_value_error(spark):
    """cosine_topk_int8 vs exact: recall@5 >= 0.95 on the fixture and
    every returned quantized cosine within 0.02 of the exact cosine for
    the same (qid, cid) pair; deterministic across runs."""
    vecs = _pdvecs(spark)
    queries = vecs.filter(F.col("vec_id") % 20 == 0)
    brute = cosine_topk_bruteforce(vecs, queries, k=5)
    q8 = cosine_topk_int8(vecs, queries, k=5, dim=64)
    exact = {(r.qid, r.cid): r.cosine for r in brute.collect()}
    got = {(r.qid, r.cid): r.cosine for r in q8.collect()}
    recall = len(got.keys() & exact.keys()) / len(exact)
    assert recall >= 0.95, recall
    for pair in got.keys() & exact.keys():
        assert abs(got[pair] - exact[pair]) < 0.02, (pair, got[pair], exact[pair])
    again = {(r.qid, r.cid): r.cosine for r in cosine_topk_int8(
        vecs, queries, k=5, dim=64
    ).collect()}
    assert got == again


def test_cosine_threshold_pairs_exact_and_plan(spark):
    """Blocked-matmul all-pairs near-dup (round 4): exact vs a numpy
    reference at several block counts, and the gated dedup_embedding_cosine
    plan carries NO pos-key join (the round-3 scale-killer shape)."""
    from pyofs_spark.operators.similarity import cosine_threshold_pairs

    vecs = _pdvecs(spark).filter(F.col("vec_id") % 5 == 0)
    rows = vecs.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.array([list(r[1]) for r in rows], dtype=np.float64)
    nrm = np.sqrt((m * m).sum(axis=1))
    c = m @ m.T / (nrm[:, None] * nrm[None, :])
    c6 = np.floor(c * 1e6 + 0.5) / 1e6
    iu, ju = np.nonzero((c6 >= 0.35) & (ids[:, None] < ids[None, :]))
    want = {
        (int(ids[i]), int(ids[j]), float(c6[i, j])) for i, j in zip(iu, ju)
    }
    assert len(want) > 0  # the fixture must actually exercise the operator
    for nb in (1, 3, 8):
        got = {
            (r.id_a, r.id_b, r.cosine)
            for r in cosine_threshold_pairs(
                vecs, threshold=0.35, dim=64, n_blocks=nb
            ).collect()
        }
        assert got == want, f"n_blocks={nb}"

    # plan assertion for the gated query: no posexplode / pos-key join
    from pyofs_spark.plans.queries import get_queries

    df = get_queries()["dedup_embedding_cosine"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "posexplode" not in plan.lower()
    # no full-dataset broadcast: the combo fan-out must be the equi-key
    # shuffle join, not a nested-loop broadcast of the packed corpus
    assert "BroadcastNestedLoopJoin" not in plan
    assert "IdentityBroadcastMode" not in plan


def test_threshold_pairs_packed_row_budget_guard(spark):
    """Round-4 verdict #3: an input whose packed blocks would blow the
    ~2 GiB Arrow row ceiling must fail LOUDLY at submit time with the
    LSH-prefilter contract named, not deep inside Arrow."""
    import pytest

    from pyofs_spark.operators.similarity import cosine_threshold_pairs

    vecs = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=7) for _ in range(8)]).alias("embedding"),
    )
    # 64 vectors / 2 blocks = 32/block; 32*(8*8+24) = 2816 B > 2048 budget
    with pytest.raises(ValueError, match="PRE-FILTERED candidate subset"):
        cosine_threshold_pairs(
            vecs, threshold=0.9, dim=8, n_blocks=2,
            packed_row_budget_bytes=2048,
        )
    # same input under the default budget still works end-to-end
    assert (
        cosine_threshold_pairs(vecs, threshold=-1.0, dim=8, n_blocks=2)
        .count() == 64 * 63 // 2
    )
