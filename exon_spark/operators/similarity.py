"""Embedding similarity-search operators.

* ``cosine_topk`` — brute-force cosine top-k: broadcast the (small) query
  set against the full corpus; the dot product runs as a JVM higher-order
  expression (zip_with + aggregate), no Python. At 100 TB the corpus side
  stays partitioned and only the query set is broadcast — a single scan, no
  shuffle until the (tiny) per-query top-k aggregation.
* ``lsh_ann_topk`` — scale path: random-hyperplane LSH bucketing. Candidates
  are restricted to the query's bucket (+ optional multi-probe neighbors),
  so the scan prunes to ~corpus/2^planes per query. Hyperplanes derive
  deterministically from md5 so results reproduce across engines/runs.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column | str, b: Column | str, digits: int = 6) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), digits)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (q_id, vec_id, score, rnk). Deterministic tie-break on vec_id.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cosine("vec", "q_vec").alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def hyperplanes(dim: int, n_planes: int = 8) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1): component (p, d)
    derives from md5(f"{p}-{d}")."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}-{d}".encode()).hexdigest()[:8], 16)
            row.append((h / 2**31) - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Bucket id = sign-bit pattern of the vector against each hyperplane."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(v, lit_plane) > 0, F.lit(1 << i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        bucket = bucket + bit
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    Output: (q_id, vec_id, score, rnk, bucket). Recall < 1 by design — the
    scale path that avoids scanning the full corpus per query.
    """
    planes = hyperplanes(dim, n_planes)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(vec_col, planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(vec_col, planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "bucket", cosine("vec", "q_vec").alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
