"""r9: unigram_train / unigram_segment at 5M docs — the same harness as
probe_r9_bpe (1000x-replicated sf0.1 docs, 2 unique hex suffix words
per doc -> 10M hapax types exercising the UNK/miss path honestly)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .appName("probe_r9_unigram")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
big = (
    docs.crossJoin(spark.range(1000).select(F.col("id").alias("_rep")))
    .select(
        F.abs(F.xxhash64("doc_id", "_rep")).alias("doc_id"),
        F.concat(
            F.col("text"),
            F.lit(" u"),
            F.lower(F.hex(F.xxhash64("doc_id", "_rep", F.lit(1)))),
            F.lit(" u"),
            F.lower(F.hex(F.xxhash64("doc_id", "_rep", F.lit(2)))),
        ).alias("text"),
    )
    .repartition(128)
    .persist()
)
n = big.count()
print(f"corpus: {n} docs")

from exon_spark.operators import unigram_segment, unigram_train

t0 = time.time()
vocab = unigram_train(big, vocab_size=2000, min_word_count=2)
print(f"unigram_train(vocab 2000, floor 2) @5M docs: {time.time() - t0:.1f} s"
      f"  ({len(vocab)} pieces)")

for i in range(3):
    t0 = time.time()
    agg = unigram_segment(big, vocab).select(
        F.count("*").alias("d"), F.sum("n_pieces").alias("p")
    ).collect()[0]
    dt = time.time() - t0
    print(
        f"unigram_segment run{i}: {dt:.2f} s  docs={agg['d']}"
        f"  pieces={agg['p']}  ({agg['p'] / dt / 1e6:.1f} M pieces/s)"
    )
