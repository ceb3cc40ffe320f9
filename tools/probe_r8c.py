"""500k-doc scale probes for the late-r8 operators (nb_classifier fit +
score, media_phash) — same harness as probe_r8b: 100x-replicated sf0.1
documents (~500k docs), noop sink via an aggregate, best-of-2 wall-clock
after one warmup pass."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.adaptive.enabled", "true")
    .appName("probe_r8c")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
big = (
    docs.crossJoin(spark.range(100).select(F.col("id").alias("_rep")))
    .select(
        F.abs(F.xxhash64("doc_id", "_rep")).alias("doc_id"),
        "text",
        "lang",
    )
    .repartition(32)
    .persist()
)
n = big.count()
print(f"corpus: {n} docs")

from exon_spark.operators import (
    media_phash,
    nb_classifier_fit,
    nb_classifier_score,
    with_media_payload,
)

# warmup
big.select(F.sum(F.length("text"))).collect()

labeled = big.withColumn("label", (F.col("doc_id") % 2) == 0)

for tag, kw in [("default (2^18 buckets)", {}), ("buckets=2^20", {"buckets": 1 << 20})]:
    best_fit = best_score = None
    for _ in range(2):
        t0 = time.time()
        model, meta = nb_classifier_fit(labeled, label_col="label", **kw)
        dt = time.time() - t0
        best_fit = dt if best_fit is None else min(best_fit, dt)
        mrows = model.count()
        t0 = time.time()
        out = nb_classifier_score(big, model, meta)
        r = out.select(
            F.count("*"), F.sum("n_toks"), F.sum(F.col("nb_pass").cast("long"))
        ).collect()[0]
        dt = time.time() - t0
        best_score = dt if best_score is None else min(best_score, dt)
    print(
        f"nb_classifier {tag}: fit best-of-2 {best_fit:.2f}s "
        f"(model {mrows} rows), score best-of-2 {best_score:.2f}s "
        f"rows={r[0]} toks={r[1]} pass={r[2]}"
    )

# --- media_phash: map-only fingerprint over 500k payloads
mp = with_media_payload(big).persist()
mp.count()
best = None
for _ in range(2):
    t0 = time.time()
    out = media_phash(mp)
    r = out.select(F.count("*"), F.count_distinct("phash")).collect()[0]
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(f"media_phash: best-of-2 {best:.2f}s  rows={r[0]} distinct={r[1]}")

spark.stop()
