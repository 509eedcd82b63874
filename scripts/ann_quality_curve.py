"""ANN quality curve: recall@k vs candidate cost, LSH vs IVF (round 3,
VERDICT stretch item) — the evidence a user needs to pick n_tables /
nprobe at scale.

Sweeps on the clustered embeddings fixture (labels = 10 gaussian
clusters): ground truth is the exact brute-force top-k; each approximate
config reports recall@k and the mean number of exactly-re-ranked
candidates per query (the dominant cost term of both paths — the bucket
join itself is a cheap equi-join).

Usage: python scripts/ann_quality_curve.py [sf_dir] [out_name] → writes
BENCH/<out_name>.json (default ann_quality_curve_r3) and prints one JSON
line. Round 4: config grids scale with the fixture — above 10k vectors
(the sf1 20k-vector run, VERDICT r03 task 7) the LSH sweep adds deeper
plane counts and IVF moves to 64 centroids, so the published curve
reflects candidate costs at a scale where they differentiate.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

K = 5
DIM = 64


def cand_count_lsh(vecs, queries, n_tables, n_planes):
    from pyofs_spark.operators.similarity import lsh_bucket_ids

    vb = lsh_bucket_ids(vecs, DIM, n_tables, n_planes)
    qb = lsh_bucket_ids(queries, DIM, n_tables, n_planes)
    return (
        qb.alias("q")
        .join(vb.alias("v"), ["table_idx", "bucket"])
        .filter(F.col("q.vid") != F.col("v.vid"))
        .select(F.col("q.vid").alias("qid"), F.col("v.vid").alias("cid"))
        .dropDuplicates(["qid", "cid"])
        .count()
    )


def cand_count_ivf(vecs, queries, cents, nprobe, n_post):
    from pyofs_spark.operators.similarity import _centroid_topn_udf

    post = vecs.select(
        F.col("vec_id").alias("cid"),
        F.explode(_centroid_topn_udf(cents, n_post, DIM)("embedding")).alias("c"),
    )
    probe = queries.select(
        F.col("vec_id").alias("qid"),
        F.explode(_centroid_topn_udf(cents, nprobe, DIM)("embedding")).alias("c"),
    )
    return (
        probe.join(post, "c")
        .filter(F.col("qid") != F.col("cid"))
        .dropDuplicates(["qid", "cid"])
        .count()
    )


def main(sf_dir: str, out_name: str = "ann_quality_curve_r3") -> None:
    from pyofs_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
        cosine_topk_lsh,
        ivf_centroids,
    )
    from pyofs_spark.session import get_session

    spark = get_session(master="local[16]", app_name="ann-curve")
    vecs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = vecs.filter(F.col("vec_id") % 20 == 0)
    nq = queries.count()
    truth = {
        (r.qid, r.cid)
        for r in cosine_topk_bruteforce(vecs, queries, k=K, dim=DIM).collect()
    }
    out = {"k": K, "n_queries": nq, "n_vectors": vecs.count(), "sf_dir": sf_dir,
           "lsh": [], "ivf": []}

    big = out["n_vectors"] > 10_000
    lsh_grid = (
        [(8, 6), (16, 6), (8, 8), (16, 8), (32, 8)]
        if big
        else [(2, 4), (4, 4), (8, 4), (16, 4), (32, 4)]
    )
    for n_tables, n_planes in lsh_grid:
        approx = {
            (r.qid, r.cid)
            for r in cosine_topk_lsh(
                vecs, queries, k=K, dim=DIM, n_tables=n_tables,
                n_planes=n_planes
            ).collect()
        }
        cands = cand_count_lsh(vecs, queries, n_tables, n_planes)
        out["lsh"].append(
            {
                "n_tables": n_tables,
                "n_planes": n_planes,
                "recall": round(len(approx & truth) / len(truth), 4),
                "cand_per_query": round(cands / nq, 1),
            }
        )
        print("lsh", out["lsh"][-1], file=sys.stderr)

    n_cent = 64 if big else 16
    cents = ivf_centroids(vecs, DIM, n_centroids=n_cent)
    for nprobe in (1, 2, 4, 8, 16) if big else (1, 2, 4, 8):
        approx = {
            (r.qid, r.cid)
            for r in cosine_topk_ivf(
                vecs, queries, k=K, dim=DIM, n_centroids=n_cent,
                nprobe=nprobe, n_post=3
            ).collect()
        }
        cands = cand_count_ivf(vecs, queries, cents, nprobe, 3)
        out["ivf"].append(
            {
                "n_centroids": n_cent,
                "nprobe": nprobe,
                "n_post": 3,
                "recall": round(len(approx & truth) / len(truth), 4),
                "cand_per_query": round(cands / nq, 1),
            }
        )
        print("ivf", out["ivf"][-1], file=sys.stderr)

    dst = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH", f"{out_name}.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
        sys.argv[2] if len(sys.argv) > 2 else "ann_quality_curve_r3",
    )
