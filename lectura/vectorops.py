"""Similarity search over embedding columns (`array<float>`): brute-force
cosine top-k as the exactness baseline, random-hyperplane LSH bucketing as
the scale path.

Scale notes: dot products run as JVM higher-order functions (zip_with +
aggregate — whole-stage codegen, no Python). Brute force is a broadcast of
the query vector over one scan (O(N·d), embarrassingly parallel); LSH cuts
the scanned set to matching buckets (equi-join on bucket id), with
multiprobe = flipping each plane bit once (d+1 buckets probed)."""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_to(df: DataFrame, query_vec: list[float],
              vec_col: str = "embedding") -> DataFrame:
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    return df.withColumn(
        "cosine",
        _dot(F.col(vec_col), qlit) / (_norm(F.col(vec_col)) * F.lit(qnorm)),
    )


def brute_force_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: orderBy+limit ⇒ TakeOrderedAndProject
    (distributed partial top-k, no global sort)."""
    return (
        cosine_to(df, query_vec, vec_col)
        .select(id_col, F.round("cosine", 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def random_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(df: DataFrame, planes: list[list[float]],
               vec_col: str = "embedding") -> DataFrame:
    """Sign-bit bucket id per row: bit i = 1 iff v·plane_i ≥ 0."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plit = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(_dot(F.col(vec_col), plit) >= 0,
                                 F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket)


def lsh_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             n_planes: int = 8, seed: int = 42, multiprobe: bool = True,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: probe the query's bucket (+ all 1-bit-flip neighbors when
    multiprobe) and rank candidates by exact cosine."""
    dim = len(query_vec)
    planes = random_planes(n_planes, dim, seed)
    bucketed = lsh_bucket(df, planes, vec_col)
    qbits = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) >= 0:
            qbits |= 1 << i
    probes = [qbits] + (
        [qbits ^ (1 << i) for i in range(n_planes)] if multiprobe else []
    )
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


def cosine_pairs(df: DataFrame, min_cosine: float, max_id: int | None = None,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs (bounded all-pairs; the LSH path
    above is the scale alternative)."""
    if max_id is not None:
        df = df.filter(F.col(id_col) < max_id)
    a = df.select(F.col(id_col).alias("v1"), F.col(vec_col).alias("e1"))
    b = df.select(F.col(id_col).alias("v2"), F.col(vec_col).alias("e2"))
    return (
        a.join(b, F.col("v1") < F.col("v2"))
        .withColumn(
            "cosine",
            F.round(
                _dot("e1", "e2") / (_norm("e1") * _norm("e2")), 4
            ),
        )
        .filter(F.col("cosine") >= min_cosine)
        .select("v1", "v2", "cosine")
    )
