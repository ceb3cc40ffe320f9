"""r9: bloom_build / bloom_dedup_against at 5M index docs + 5M probe
docs (1000x-replicated sf0.1 docs with unique suffixes so texts are
distinct). Records build wall, bitmap size, probe wall, fp rate."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .appName("probe_r9_bloom")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")


def replicate(tag):
    return (
        docs.crossJoin(spark.range(1000).select(F.col("id").alias("_rep")))
        .select(
            F.abs(F.xxhash64("doc_id", "_rep")).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(f" {tag}"),
                F.lower(F.hex(F.xxhash64("doc_id", "_rep", F.lit(tag)))),
            ).alias("text"),
        )
        .repartition(64)
        .persist()
    )


index = replicate("idx")
fresh = replicate("new")
n = index.count()
fresh.count()
print(f"index: {n} docs")

from exon_spark.operators import bloom_build, bloom_dedup_against

t0 = time.time()
bf = bloom_build(index, fpp=0.01, num_items=n)
print(
    f"bloom_build @5M docs: {time.time() - t0:.1f} s"
    f"  m={bf.m} bits ({bf.m // 8 / 1e6:.1f} MB)  k={bf.k}"
    f"  fill={bf.fill_ratio:.3f}"
)

for i in range(2):
    t0 = time.time()
    hits = bloom_dedup_against(index, bf).where("maybe_dup").count()
    dt = time.time() - t0
    print(f"probe self (all dup) run{i}: {dt:.1f} s  flagged={hits}/{n}")
assert hits == n, "false negative!"

for i in range(2):
    t0 = time.time()
    fp = bloom_dedup_against(fresh, bf).where("maybe_dup").count()
    dt = time.time() - t0
    print(
        f"probe fresh run{i}: {dt:.1f} s  fp={fp}/{n} ({fp / n:.4f} vs fpp=0.01)"
    )
