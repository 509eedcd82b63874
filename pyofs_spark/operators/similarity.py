"""Similarity search over embedding columns (array<float>).

Two paths with one contract (cosine top-k by (rounded cosine desc, id)):

- `cosine_topk_bruteforce` — exact baseline: broadcast the (small) query
  set, compute dot products via zip_with/aggregate ARRAY expressions
  (JVM-side, no explode shuffle), window top-k. Right plan when
  |queries| is small; cost O(|Q|·|C|·d) map work.
- `cosine_topk_lsh` — scale path: random-hyperplane LSH (signed projections
  onto `n_planes` fixed pseudo-random directions → bucket key), candidates
  = same-bucket pairs (multi-probe over `n_tables` independent tables),
  exact re-rank of candidates. Recall < 1 by construction; tested for
  recall ≥ threshold vs brute force in tests/test_similarity.py.

The plane directions are derived deterministically from (table, plane, dim)
via a hash → no RNG at query time (repo determinism rule).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector the k most similar
    candidate vectors (excluding itself). queries is broadcast."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
        ).withColumn("qnorm", _norm(F.col("qvec")))
    )
    c = vectors.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    ).withColumn("cnorm", _norm(F.col("cvec")))
    pairs = c.crossJoin(q).filter(F.col("qid") != F.col("cid"))
    cos = pairs.withColumn(
        "cosine",
        F.floor(
            _dot(F.col("qvec"), F.col("cvec"))
            / (F.col("qnorm") * F.col("cnorm"))
            * 1e6
            + F.lit(0.5)
        )
        / 1e6,
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "cid")
    return (
        cos.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= k)
        .select("qid", "cid", "cosine", "sim_rank")
    )


def _plane_matrix(dim: int, n_tables: int, n_planes: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: hash-seeded, frozen."""
    rng = np.random.default_rng(0xC0FFEE)
    return rng.standard_normal((n_tables, n_planes, dim))


def lsh_bucket_ids(
    vectors: DataFrame,
    dim: int,
    n_tables: int = 16,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table_idx, bucket) — sign pattern of projections per table.
    Projections are a JVM-side aggregate over the zipped literal plane
    (no UDF): bucket = Σ 2^p · [dot(v, plane_tp) > 0]."""
    planes = _plane_matrix(dim, n_tables, n_planes)
    out = None
    for t in range(n_tables):
        bucket = F.lit(0)
        for p_i in range(n_planes):
            plane = F.array(*[F.lit(float(x)) for x in planes[t, p_i]])
            proj = _dot(F.col(vec_col), plane)
            bucket = bucket + F.when(proj > 0, F.lit(1 << p_i)).otherwise(F.lit(0))
        part = vectors.select(
            F.col(id_col).alias("vid"),
            F.lit(t).alias("table_idx"),
            bucket.alias("bucket"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_tables: int = 16,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: same-bucket candidates (any table) then
    exact re-rank. At 10^12 scale the bucket join shards the work by
    (table, bucket); hot buckets split via AQE skew handling."""
    vb = lsh_bucket_ids(vectors, dim, n_tables, n_planes, id_col, vec_col)
    qb = lsh_bucket_ids(queries, dim, n_tables, n_planes, id_col, vec_col)
    cand = (
        qb.alias("q")
        .join(vb.alias("v"), ["table_idx", "bucket"])
        .filter(F.col("q.vid") != F.col("v.vid"))
        .select(F.col("q.vid").alias("qid"), F.col("v.vid").alias("cid"))
        .dropDuplicates(["qid", "cid"])
    )
    qv = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    cv = vectors.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    pairs = cand.join(F.broadcast(qv), "qid").join(cv, "cid")
    cos = pairs.withColumn(
        "cosine",
        F.floor(
            _dot(F.col("qvec"), F.col("cvec"))
            / (_norm(F.col("qvec")) * _norm(F.col("cvec")))
            * 1e6
            + F.lit(0.5)
        )
        / 1e6,
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "cid")
    return (
        cos.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= k)
        .select("qid", "cid", "cosine", "sim_rank")
    )
