"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline, built-in expressions only
  (zip_with/aggregate fold — JVM-side), broadcast query vector;
- LSH-bucketed ANN: random-hyperplane signatures via a vectorized pandas
  UDF (one numpy matmul per Arrow batch), bucket join, in-bucket exact
  rerank — the 100 TB path (touches only matching buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k vs one stored vector. Broadcast of the single
    query row; the scan stays a single pass with no shuffle before the
    global top-k (TakeOrderedAndProject)."""
    q = emb.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qv")
    )
    j = emb.crossJoin(F.broadcast(q))
    cos = _dot(F.col(vec_col), F.col("qv")) / (
        _norm(F.col(vec_col)) * _norm(F.col("qv"))
    )
    return (
        j.select(F.col(id_col).alias("vec_id"), F.round(cos, 4).alias("cos_sim"))
        .where(F.col("vec_id") != query_vec_id)
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def _planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes))


def lsh_bucket_udf(dim: int, n_planes: int = 12, seed: int = 42):
    planes = _planes(dim, n_planes, seed)
    powers = (2 ** np.arange(n_planes)).astype(np.int64)

    @pandas_udf("long")
    def bucket(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())  # (batch, dim) — one matmul per batch
        bits = (mat @ planes) > 0
        return pd.Series(bits @ powers)

    return bucket


def ann_lsh_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket filter, exact rerank inside
    the query's bucket. Recall < 1 by design (same-bucket candidates only);
    at scale, multi-probe or band-OR across several plane sets raises
    recall. Bucket assignment is one vectorized matmul per Arrow batch."""
    from ..session import ship_package

    ship_package(emb.sparkSession)
    dim = len(emb.select(vec_col).first()[0])
    bucket = lsh_bucket_udf(dim, n_planes)
    with_b = emb.withColumn("bucket", bucket(F.col(vec_col)))
    qb = with_b.where(F.col(id_col) == query_vec_id).select(
        F.col("bucket").alias("qbucket"), F.col(vec_col).alias("qv")
    )
    cand = with_b.join(
        F.broadcast(qb), F.col("bucket") == F.col("qbucket")
    )
    cos = _dot(F.col(vec_col), F.col("qv")) / (
        _norm(F.col(vec_col)) * _norm(F.col("qv"))
    )
    return (
        cand.select(F.col(id_col).alias("vec_id"), F.round(cos, 4).alias("cos_sim"))
        .where(F.col("vec_id") != query_vec_id)
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def _kmeans_centroids(sample: np.ndarray, k: int, iters: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (the IVF coarse
    quantizer is a small model — at 100 TB you train it on a ~1M-vector
    sample, which still fits one machine; assignment stays distributed)."""
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(0)
    return cent


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    sample_size: int = 2000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: coarse k-means quantizer → per-vector list
    assignment (one matmul per Arrow batch) → exact rerank inside the
    `n_probe` lists nearest to the query. The scan prunes to
    ~n_probe/n_lists of the corpus; at scale the list id becomes a
    partition column so pruning happens at the file level."""
    from ..session import ship_package

    ship_package(emb.sparkSession)
    sample = np.stack(
        [np.asarray(r[0], dtype=np.float64) for r in emb.select(vec_col).limit(sample_size).collect()]
    )
    cent = _kmeans_centroids(sample, n_lists)
    cent_sq = (cent**2).sum(1)

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        # argmin ||x-c||² = argmin c·c - 2 x·c
        d = cent_sq[None, :] - 2.0 * (mat @ cent.T)
        return pd.Series(d.argmin(1).astype(np.int32))

    with_list = emb.withColumn("ivf_list", assign(F.col(vec_col)))
    qrow = emb.where(F.col(id_col) == query_vec_id).select(vec_col).collect()
    if not qrow:
        return emb.sparkSession.createDataFrame([], "vec_id long, cos_sim double")
    qv = np.asarray(qrow[0][0], dtype=np.float64)
    probe = np.argsort(cent_sq - 2.0 * (cent @ qv))[:n_probe].tolist()
    cand = with_list.where(F.col("ivf_list").isin(probe))
    q = emb.where(F.col(id_col) == query_vec_id).select(F.col(vec_col).alias("qv"))
    j = cand.crossJoin(F.broadcast(q))
    cos = _dot(F.col(vec_col), F.col("qv")) / (_norm(F.col(vec_col)) * _norm(F.col("qv")))
    return (
        j.select(F.col(id_col).alias("vec_id"), F.round(cos, 4).alias("cos_sim"))
        .where(F.col("vec_id") != query_vec_id)
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def pairwise_above(
    emb: DataFrame,
    threshold: float,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucketed candidate generation +
    exact cosine filter (doc_a < doc_b). The bucket equality join replaces
    the O(n²) cross join."""
    from ..session import ship_package

    ship_package(emb.sparkSession)
    dim = len(emb.select(vec_col).first()[0])
    bucket = lsh_bucket_udf(dim, n_planes)
    wb = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    l, r = wb.alias("l"), wb.alias("r")
    cand = l.join(
        r,
        (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.vid") < F.col("r.vid")),
    )
    cos = _dot(F.col("l.v"), F.col("r.v")) / (_norm(F.col("l.v")) * _norm(F.col("r.v")))
    return (
        cand.select(
            F.col("l.vid").alias("vec_a"),
            F.col("r.vid").alias("vec_b"),
            F.round(cos, 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
