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
