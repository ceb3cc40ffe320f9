"""r10 probe: phrase_tag regime crossover — JVM expr (one codegen'd
replace length-diff per phrase, text scanned once PER phrase) vs
Aho-Corasick (one Python automaton scan per text, any list size).

Measures both regimes over the sf0.1 documents corpus at growing
phrase-list sizes and prints the crossover, which sets
text.AC_PHRASE_THRESHOLD for regime="auto". Phrases are drawn half
from corpus vocabulary (real hits exercise the match path) and half
synthetic misses.

Usage: python tools/probe_r10_phrase.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")

from exon_spark.operators import phrase_tag  # noqa: E402
from exon_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    n = docs.count()
    mean_len = docs.agg(F.avg(F.length("text"))).collect()[0][0]
    print(f"docs={n:,} mean_chars={mean_len:,.0f}")

    # real bigrams from the corpus + synthetic misses
    toks = [
        r[0]
        for r in (
            docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("t"))
            .groupBy("t")
            .count()
            .orderBy(F.desc("count"))
            .limit(600)
            .collect()
        )
        if r[0]
    ]
    hits = [f"{a} {b}" for a, b in zip(toks, toks[1:] + toks[:1])]
    misses = [f"zq{i}x nohit{i}" for i in range(600)]

    for np_ in (16, 32, 64, 128, 256, 512, 1024):
        plist = hits[: np_ // 2] + misses[: np_ - np_ // 2]
        tags = {"t0": plist[: np_ // 2], "t1": plist[np_ // 2 :]}
        out = {}
        for regime in ("expr", "ac"):
            q = phrase_tag(docs, tags, regime=regime)
            q.agg(F.sum("t0_hits"), F.sum("t1_hits")).collect()  # warm
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                vals = tuple(
                    q.agg(F.sum("t0_hits"), F.sum("t1_hits")).collect()[0]
                )
                ts.append(time.perf_counter() - t0)
            out[regime] = (min(ts), vals)
        (te, ve), (ta, va) = out["expr"], out["ac"]
        assert ve == va, f"regimes diverged at {np_}: {ve} vs {va}"
        win = "ac" if ta < te else "expr"
        print(
            f"|phrases|={np_:>5}: expr {te:6.2f}s  ac {ta:6.2f}s  -> {win}"
            f"  (hits {sum(ve):,})"
        )


if __name__ == "__main__":
    main()
