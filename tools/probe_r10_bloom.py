"""r10 probe: bloom_build driver-side fold at 50M items — vectorized
Arrow scatter (shipped, bloom.py:_fold_words) vs the r8/r9 Row-loop
spelling (reconstructed inline as the "before" regime).

The Spark side is identical in both regimes (explode + map-side-combined
bit_or groupBy on m/64 keys); the difference is purely how the bounded
(word, bits) result crosses into the driver bitmap: ``toArrow()`` + one
numpy indexed-OR scatter vs ``collect()`` + a per-Row Python loop. At
50M items / fpp=0.01 the summary is ~7.5M words, the regime the
r9 verdict flagged (bloom.py:139).

Also verifies the two regimes produce the IDENTICAL bitmap and that
measured fpp tracks the design bound at 50M.

Usage: python tools/probe_r10_bloom.py [n_items]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")

from exon_spark.operators.bloom import _params, _positions, bloom_build  # noqa: E402
from exon_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    spark = get_spark()
    df = spark.range(n).select(F.concat(F.lit("doc-"), F.col("id")).alias("text"))
    df = df.repartition(32).cache()
    df.count()  # materialize off the timed path

    m, k = _params(n, 0.01)
    print(f"n={n:,} m={m:,} bits ({m // 64:,} words) k={k}")

    agg = (
        df.select(F.explode(_positions(F.col("text"), m, k)).alias("p"))
        .select(
            (F.col("p") / 64).cast("long").alias("word"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    ).cache()
    agg.count()  # materialize: both regimes below fetch from cache,
    # so the timings isolate the driver-side crossing

    # --- shipped regime: toArrow + vectorized scatter -------------------
    t0 = time.perf_counter()
    tbl = agg.toArrow()
    t_fetch_arrow = time.perf_counter() - t0
    bits_vec = np.zeros(m // 64, dtype=np.uint64)
    t0 = time.perf_counter()
    words = tbl.column("word").to_numpy(zero_copy_only=False)
    vals = tbl.column("bits").to_numpy(zero_copy_only=False).view(np.uint64)
    bits_vec[words] |= vals
    t_scatter = time.perf_counter() - t0
    print(
        f"arrow regime: fetch {t_fetch_arrow:.2f}s + scatter {t_scatter:.2f}s"
        f" ({tbl.num_rows:,} words)"
    )

    # --- r8/r9 regime: collect + per-Row loop ----------------------------
    t0 = time.perf_counter()
    rows = agg.collect()
    t_fetch_rows = time.perf_counter() - t0
    bits_loop = np.zeros(m // 64, dtype=np.uint64)
    t0 = time.perf_counter()
    for r in rows:
        bits_loop[r["word"]] |= np.uint64(r["bits"] & 0xFFFFFFFFFFFFFFFF)
    t_loop = time.perf_counter() - t0
    print(f"row regime:   fetch {t_fetch_rows:.2f}s + loop {t_loop:.2f}s")
    assert np.array_equal(bits_vec, bits_loop), "regimes diverged"
    speedup = (t_fetch_rows + t_loop) / max(1e-9, t_fetch_arrow + t_scatter)
    print(f"driver-side speedup: {speedup:.1f}x")

    # --- end-to-end build + fpp at scale ---------------------------------
    t0 = time.perf_counter()
    bf = bloom_build(df, num_items=n)
    t_build = time.perf_counter() - t0
    print(f"bloom_build end-to-end: {t_build:.1f}s, fill={bf.fill_ratio:.3f}")

    probe = spark.range(n, n + 1_000_000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("text")
    )
    pos = _positions(F.col("text"), bf.m, bf.k)
    words_c = F.transform(pos, lambda p: (p / 64).cast("long"))
    # expression-side membership (avoids broadcasting 900 MB through the
    # probe UDF for a one-off measurement): all k bits set?
    hits = 0
    import pandas as pd  # noqa: F401

    sample = probe.select(pos.alias("pos")).toArrow().column("pos").to_pylist()
    arr = np.array(sample, dtype=np.int64)
    w = bf.bits[arr >> 6]
    mk = np.uint64(1) << (arr & 63).astype(np.uint64)
    hits = int(((w & mk) != 0).all(axis=1).sum())
    print(f"measured fpp on 1M fresh docs: {hits / 1_000_000:.4f} (design 0.01)")


if __name__ == "__main__":
    main()
