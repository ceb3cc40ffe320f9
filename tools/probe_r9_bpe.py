"""r9 order #7: bpe_segment worker-cache telemetry at 5M docs (10x the
r8 500k probe). Three measurements on a 100x-replicated sf0.1 corpus:

  1. official `bpe_segment` wall-clock (best-of-2 after warmup) + token
     throughput — the shipped path;
  2. an instrumented copy of the same UDF with hit/miss accumulators —
     the per-worker word->segmentation cache hit rate (cache-bound
     claim: hits >> misses, misses ~ types x workers);
  3. the same UDF with the cache DISABLED — the merge loop runs per
     TOKEN instead of per type, showing the cache is the lever, not a
     micro-optimization.

The sf0.1 synthetic corpus has only ~31 word types (trivially
cache-friendly), so each replica doc gets TWO unique suffix words
(~10M distinct types corpus-wide) — every unique word is a compulsory
cache miss, making the hit rate and the miss-path cost honest rather
than an artifact of the tiny synthetic vocabulary.
"""
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
    .appName("probe_r9_bpe")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

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

from exon_spark.operators import bpe_segment, bpe_train
from exon_spark.operators.bpe import EOW

# min_word_count=2 drops the 10M injected hapax-hex types before the
# top-100k cut (the web-scale contract; without it the hapax soup is
# the merge loop's worst case — measured 433 s total / 266 s in the
# loop for 500 merges; see bpe_train docstring)
t0 = time.time()
merges = bpe_train(big, num_merges=500, min_word_count=2)
print(f"bpe_train(500 merges, min_word_count=2) @5M docs: {time.time() - t0:.1f} s")

# 1. official path, best-of-2 after one warmup
for i in range(3):
    t0 = time.time()
    agg = bpe_segment(big, merges).select(
        F.count("*").alias("docs"), F.sum("n_bpe_tokens").alias("toks")
    ).collect()[0]
    dt = time.time() - t0
    print(
        f"bpe_segment run{i}: {dt:.2f} s  docs={agg['docs']}"
        f"  subword_toks={agg['toks']}  ({agg['toks'] / dt / 1e6:.1f} M tok/s)"
    )

# distinct types for the miss-bound context
types = (
    big.select(F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"))
    .where(F.col("w") != "")
    .select(F.countDistinct("w"))
    .collect()[0][0]
)
print(f"distinct word types: {types}")

# 2+3. instrumented UDF: accumulators + cache on/off
_ranks = {pair: i for i, pair in enumerate(merges)}


def run_instrumented(use_cache: bool) -> None:
    hits = sc.accumulator(0)
    misses = sc.accumulator(0)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def seg_count(texts):
        import re

        import pandas as pd

        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        cache: dict[str, int] = {}
        h = m = 0

        def segment_len(word):
            syms = list(word) + [EOW]
            while len(syms) > 1:
                best_i, best_r = -1, None
                for i in range(len(syms) - 1):
                    r = _ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_r is None or r < best_r):
                        best_i, best_r = i, r
                if best_r is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            return len(syms)

        def one(t):
            nonlocal h, m
            if t is None:
                return 0
            tot = 0
            for w in ws.split(t.lower().strip(" ")):
                if not w:
                    continue
                if use_cache:
                    hit = cache.get(w)
                    if hit is None:
                        m += 1
                        hit = segment_len(w)
                        if len(cache) < 500_000:
                            cache[w] = hit
                    else:
                        h += 1
                    tot += hit
                else:
                    m += 1
                    tot += segment_len(w)
            return tot

        out = pd.Series([one(t) for t in texts])
        hits.add(h)
        misses.add(m)
        return out

    t0 = time.time()
    tot = big.select(F.sum(seg_count(F.col("text")))).collect()[0][0]
    dt = time.time() - t0
    hr = hits.value / max(1, hits.value + misses.value)
    print(
        f"instrumented cache={'on ' if use_cache else 'off'}: {dt:.2f} s"
        f"  toks={tot}  hits={hits.value}  misses={misses.value}"
        f"  hit_rate={hr:.4f}"
    )


run_instrumented(True)
run_instrumented(True)
run_instrumented(False)
run_instrumented(False)
