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
* ``ivf_ann_topk`` — IVF (inverted-file) ANN: the corpus is partitioned
  into cells by nearest centroid; queries probe only their ``nprobe``
  closest cells. Cell assignment is a zero-shuffle literal-array argmax
  (centroids are broadcast as expression literals), so the only shuffle is
  the final tiny per-query top-k.
* ``embedding_cosine_dups`` — embedding near-dup detection: banded
  hyperplane LSH as the blocking key (64-bit signature, 4 x 16-bit bands,
  hamming-1 multi-probe), exact cosine verify on the deduped candidate
  set. Same band geometry as ``simhash_pairs`` — n_bands * 2^band_bits
  buckets, no single-small-bucket self-join degeneracy at corpus scale.
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


def _cell_scores(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """array<struct<s:double, negcell:int>> of cosine scores against each
    centroid; struct ordering gives argmax = (score desc, cell asc)."""
    return F.array(
        *[
            F.struct(
                cosine(vec, F.array(*[F.lit(float(x)) for x in cvec])).alias("s"),
                F.lit(-cid).alias("negcell"),
            )
            for cid, cvec in centroids
        ]
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN top-k: corpus vectors are assigned to their nearest
    centroid cell; each query probes its ``nprobe`` nearest cells and ranks
    only those candidates.

    Centroids here are the corpus vectors with the ``n_cells`` smallest ids —
    a deterministic, training-free choice that keeps the DuckDB oracle
    byte-identical. At cluster scale the centroids would come from a sampled
    k-means fit (same plan shape: centroids are always tiny and broadcast);
    cell assignment is a literal-array argmax, zero shuffle over the corpus.

    Output: (q_id, vec_id, cell, score, rnk).
    """
    cents = [
        (int(r[0]), list(r[1]))
        for r in corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_cells)
        .collect()
    ]
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        (-F.array_max(_cell_scores(F.col(vec_col), cents))["negcell"]).alias("cell"),
    )
    probes = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(
            F.transform(
                F.slice(
                    F.sort_array(_cell_scores(F.col(vec_col), cents), asc=False),
                    1,
                    nprobe,
                ),
                lambda s: -s["negcell"],
            )
        ).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "cell", cosine("vec", "q_vec").alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def band_keys(
    vec_col: Column | str,
    planes: list[list[float]],
    band_bits: int = 16,
) -> list[Column]:
    """Split an ``len(planes)``-bit hyperplane signature into
    ``len(planes)//band_bits`` band keys. Key ``b`` packs the band index in
    the high bits (``b << band_bits``) so one join column addresses every
    (band, pattern) bucket — ``n_bands * 2**band_bits`` distinct buckets."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    n_bands = len(planes) // band_bits
    keys = []
    for b in range(n_bands):
        key = F.lit(b << band_bits).cast("bigint")
        for i in range(band_bits):
            plane = planes[b * band_bits + i]
            lit_plane = F.array(*[F.lit(x) for x in plane])
            key = key + F.when(
                _dot(v, lit_plane) > 0, F.lit(1 << i).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint"))
        keys.append(key)
    return keys


def embedding_cosine_dups(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 64,
    band_bits: int = 16,
    probe_hamming: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine >=
    threshold), candidates blocked by **banded** hyperplane LSH — a pair is
    a candidate iff some band of its ``n_planes``-bit signatures agrees
    within ``probe_hamming`` bits (multi-probe: one side also emits its
    hamming<=1 key variants, so near-miss bands still collide).

    Bucket geometry mirrors ``simhash_pairs``: 4 bands x 16 bits =
    ``n_bands * 2**band_bits`` = 2**18 distinct (band, pattern) buckets, so
    within-bucket comparison is O(n²/2^18)-ish per band rather than the
    O(n²/64) the old single-6-plane-bucket blocking degenerated to at
    corpus scale. Identical vectors agree on every band — planted-dup
    recall is exactly 1. The exploded probe side carries only (id, key)
    pairs — 8-byte rows, never the vectors; vectors re-join by id after
    the candidate set is deduped, so shuffle volume stays bounded.

    Output: (id_a, id_b, score).
    """
    if n_planes % band_bits:
        raise ValueError("n_planes must be a multiple of band_bits")
    planes = hyperplanes(dim, n_planes)
    keys = band_keys(vec_col, planes, band_bits)
    base = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        F.array(*keys).alias("bands"),
    )
    # probe side: each band's exact key plus its single-bit flips (XOR on
    # the low band_bits leaves the packed band index untouched); exact
    # side: the 4 exact keys. hamming(a,b) <= 1 in some band ==> one of
    # a's probes equals b's exact key, so one-sided probing covers pairs.
    probes = F.flatten(
        F.transform(
            "bands",
            lambda k: F.array(
                k, *[k.bitwiseXOR(F.lit(1 << j)) for j in range(band_bits)]
            )
            if probe_hamming >= 1
            else F.array(k),
        )
    )
    a = base.select("vec_id", F.explode(probes).alias("bkey")).select(
        F.col("vec_id").alias("id_a"), "bkey"
    )
    b = base.select("vec_id", F.explode("bands").alias("bkey")).select(
        F.col("vec_id").alias("id_b"), "bkey"
    )
    cands = (
        a.join(b, "bkey")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = base.select(F.col("vec_id").alias("id_a"), F.col("vec").alias("vec_a"))
    vb = base.select(F.col("vec_id").alias("id_b"), F.col("vec").alias("vec_b"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine(F.col("vec_a"), F.col("vec_b")).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
