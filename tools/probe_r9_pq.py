"""r9: product quantization at ~2.2M vectors (1000x-replicated sf0.1
embeddings, each replica rotated by a deterministic cyclic shift + sign
flip so cross-replica structure decorrelates — the make_sf_replica
trick). Records pq_encode wall, ADC pq_topk wall, reranked pq_topk
wall, and exact cosine_topk wall at the same scale, plus bytes ratios."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .appName("probe_r9_pq")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
dim = len(emb.select("embedding").first()[0])
reps = 1000
big = (
    emb.crossJoin(spark.range(reps).select(F.col("id").alias("_r")))
    .select(
        F.abs(F.xxhash64("vec_id", "_r")).alias("vec_id"),
        # cyclic shift by (_r % dim) + sign flip on odd replicas:
        # orthogonal transform, preserves within-replica geometry
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.element_at(
                "embedding", ((i + F.col("_r")) % dim + 1).cast("int")
            )
            * F.when(F.col("_r") % 2 == 1, -1.0).otherwise(1.0),
        ).alias("embedding"),
    )
    .repartition(64)
    .persist()
)
n = big.count()
print(f"corpus: {n} vectors x {dim} dims")

from exon_spark.operators import (
    cosine_topk,
    pq_encode,
    pq_fit,
    pq_topk,
)

t0 = time.time()
cb = pq_fit(big, n_sub=16, k=256, sample_n=100_000, iters=10)
print(f"pq_fit(16x256) sample=100k: {time.time() - t0:.1f} s")
print(f"bytes/vec: {dim * 4} float32 -> {cb.n_sub} pq ({dim * 4 / cb.n_sub:.0f}x)")

t0 = time.time()
codes = pq_encode(big, cb).persist()
codes.count()
print(f"pq_encode @{n}: {time.time() - t0:.1f} s")

queries = emb.orderBy("vec_id").limit(8)

for i in range(2):
    t0 = time.time()
    rows = pq_topk(codes, cb, queries, k=10).count()
    print(f"pq_topk ADC run{i}: {time.time() - t0:.1f} s ({rows} rows)")

for i in range(2):
    t0 = time.time()
    rows = pq_topk(
        codes, cb, queries, k=10, rerank_corpus=big, rerank_mult=4
    ).count()
    print(f"pq_topk +rerank run{i}: {time.time() - t0:.1f} s ({rows} rows)")

for i in range(2):
    t0 = time.time()
    rows = cosine_topk(big, queries, k=10).count()
    print(f"cosine_topk exact run{i}: {time.time() - t0:.1f} s ({rows} rows)")

from exon_spark.operators import ivfpq_encode, ivfpq_fit, ivfpq_topk

t0 = time.time()
cents, rcb = ivfpq_fit(big, n_cells=64, n_sub=16, k=256, sample_n=100_000)
print(f"ivfpq_fit(64 cells, 16x256): {time.time() - t0:.1f} s")
t0 = time.time()
enc = ivfpq_encode(big, cents, rcb).persist()
enc.count()
print(f"ivfpq_encode @{n}: {time.time() - t0:.1f} s")
for nprobe in (8, 64):
    for i in range(2):
        t0 = time.time()
        rows = ivfpq_topk(enc, cents, rcb, queries, k=10, nprobe=nprobe).count()
        print(f"ivfpq_topk nprobe={nprobe} run{i}: {time.time() - t0:.1f} s ({rows} rows)")
