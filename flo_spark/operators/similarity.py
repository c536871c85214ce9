"""Embedding similarity search.

Two paths (SURVEY.md Part B-LLM):

- brute-force cosine top-k (queries.py::embedding_topk_bruteforce):
  broadcast the query set, score JVM-side (zip_with/aggregate), per-query
  top-k via window.  Exact; cost O(|Q| * |C|) — the baseline, and the
  right answer whenever |Q| is small.

- random-hyperplane LSH ANN (this module): P fixed hyperplanes give a
  P-bit bucket signature; candidates = same bucket (optionally 1-bit
  multiprobe); exact re-rank within buckets.  Cost O(sum bucket * |Q|)
  — the 100 TB path: the corpus is bucketed ONCE (write-side), queries
  probe only their bucket.

Hyperplanes come from a seeded numpy generator materialized as literal
arrays in the plan — deterministic across executors, no Python UDF in
the scoring path.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(num_planes, dim)


def lsh_bucket(vec: Column, dim: int, num_planes: int = 12, seed: int = 42) -> Column:
    """P-bit random-hyperplane signature as an integer bucket id."""
    planes = _hyperplanes(dim, num_planes, seed)
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[F.lit(float(v)) for v in planes[p]])
        bit = (dot(vec, plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, p)
    return bucket


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket-equi-join then exact cosine re-rank.

    Returns (q_id, c_id, cos_sim, rn<=k).  Recall < 1.0 by design;
    raise num_planes for smaller buckets, lower it for higher recall.
    """
    cb = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_emb"),
        lsh_bucket(F.col(vec_col), dim, num_planes, seed).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_emb"),
        lsh_bucket(F.col(vec_col), dim, num_planes, seed).alias("bucket"),
    )
    scored = cb.join(F.broadcast(qb), "bucket").withColumn(
        "cos_raw", cosine(F.col("q_emb"), F.col("c_emb"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("c_id"))
    return (
        scored.filter(F.col("q_id") != F.col("c_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", F.round("cos_raw", 4).alias("cos_sim"), "rn")
    )


def pairwise_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    num_planes: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH blocking + exact verify."""
    b = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        lsh_bucket(F.col(vec_col), dim, num_planes, seed).alias("bucket"),
    )
    return (
        b.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .withColumn("cos_raw", cosine(F.col("a.__v"), F.col("b.__v")))
        .filter(F.col("cos_raw") >= threshold)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.round("cos_raw", 4).alias("cos_sim"),
        )
    )
