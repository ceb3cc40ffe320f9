"""r9: minhash_index standing-pipeline asymmetry at 500k index docs —
the cost a batch pays against a raw index (re-shingle + re-hash the
corpus every batch) vs against a stored minhash_index parquet frame."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .appName("probe_r9_mhindex")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
index = (
    docs.crossJoin(spark.range(100).select(F.col("id").alias("_r")))
    .select(
        F.abs(F.xxhash64("doc_id", "_r")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" idx"),
                 F.lower(F.hex(F.xxhash64("doc_id", "_r")))).alias("text"),
    )
    .repartition(64)
    .persist()
)
n = index.count()
batch = docs.select(F.col("doc_id") + 10_000_000, "text").toDF("doc_id", "text").persist()
nb = batch.count()
print(f"index: {n} docs, batch: {nb} docs")

from exon_spark.operators import dedup_against, minhash_index

t0 = time.time()
state = minhash_index(index)
state.write.mode("overwrite").parquet("/tmp/mh_state_probe")
print(f"minhash_index build+write (once): {time.time() - t0:.1f} s")
stored = spark.read.parquet("/tmp/mh_state_probe")

for i in range(2):
    t0 = time.time()
    r = dedup_against(batch, index_state=stored, threshold=0.5).count()
    print(f"batch vs STORED state run{i}: {time.time() - t0:.1f} s ({r} rows)")

for i in range(2):
    t0 = time.time()
    r = dedup_against(batch, index, threshold=0.5).count()
    print(f"batch vs RAW index run{i}: {time.time() - t0:.1f} s ({r} rows)")
