"""500k-doc scale probes for the two newest r8 operators (dsir_weights,
normalize_text) — same harness as the earlier probes: 100x-replicated
sf0.1 documents (~500k docs), noop sink via an aggregate, wall-clock per
variant after one warmup pass of an unrelated query."""
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
    .appName("probe_r8b")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
big = (
    docs.crossJoin(spark.range(100).select(F.col("id").alias("_rep")))
    .select(
        F.concat_ws("#", "doc_id", "_rep").alias("doc_id"),
        "text",
        "lang",
    )
    .repartition(32)
    .persist()
)
n = big.count()
print(f"corpus: {n} docs")

from exon_spark.operators import bigram_logppl, dsir_weights, normalize_text

# warmup: unrelated small job to pay codegen/session startup
big.select(F.sum(F.length("text"))).collect()

# --- dsir_weights: target = the 'en' slice of the base table (5k docs scale)
target = docs.filter(F.col("lang") == "en").select("doc_id", "text")
print("target docs:", target.count())

for tag, kw in [
    ("default (10k buckets)", {}),
    ("buckets=100k", {"buckets": 100_000}),
    ("gumbel_salt (adds key col)", {"gumbel_salt": "e0"}),
]:
    best = None
    for _ in range(2):
        t0 = time.time()
        out = dsir_weights(big, target, **kw)
        r = out.select(
            F.count("*"), F.sum("dsir_w"), F.sum("n_feats")
        ).collect()[0]
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"dsir_weights {tag}: best-of-2 {best:.2f}s  rows={r[0]} sum_w={r[1]:.1f}")

# --- normalize_text: map-only; JVM-only vs NFC (Arrow UDF hop)
for tag, kw in [
    ("JVM-only (form=None)", {}),
    ("form='NFC' (Arrow UDF)", {"form": "NFC"}),
]:
    best = None
    for _ in range(2):
        t0 = time.time()
        out = normalize_text(big, **kw)
        r = out.select(
            F.sum(F.length("text")), F.sum(F.col("changed").cast("long"))
        ).collect()[0]
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"normalize_text {tag}: best-of-2 {best:.2f}s  chars={r[0]} changed={r[1]}")

# --- bigram_logppl: model fit + score join at 500k docs
best = None
for _ in range(2):
    t0 = time.time()
    out = bigram_logppl(big)
    r = out.select(
        F.count("*"), F.sum("n_bigrams"), F.sum("logppl2")
    ).collect()[0]
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(f"bigram_logppl: best-of-2 {best:.2f}s  rows={r[0]} positions={r[1]}")

spark.stop()
