"""r10 probe: logreg_classifier_score at 500k docs (the sf10 documents
corpus) — fit on a small synthetic seed set, score the full corpus in
both regimes (broadcast-join and map-only udf), check they agree on
pass counts, and report wall-clock.

Usage: python tools/probe_r10_logreg.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")

from exon_spark.operators import (  # noqa: E402
    logreg_classifier_fit,
    logreg_classifier_score,
)
from exon_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.testdata/sf10"
    spark = get_spark()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    n = docs.count()

    # seed set: label by a lexical marker so the fit has real signal
    seeds = (
        docs.limit(4000)
        .select(
            "doc_id",
            "text",
            (F.length("text") % 2 == 0).alias("label"),
        )
        .cache()
    )
    seeds.count()
    t0 = time.perf_counter()
    model, meta = logreg_classifier_fit(seeds, max_iter=30)
    t_fit = time.perf_counter() - t0
    nw = model.count()
    print(f"corpus={n:,} fit on 4k seeds: {t_fit:.1f}s, {nw:,} nonzero weights")

    for mode in ("join", "udf"):
        q = logreg_classifier_score(docs, model, meta, mode=mode)
        q.agg(F.sum(F.col("lr_pass").cast("int"))).collect()  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            npass = q.agg(F.sum(F.col("lr_pass").cast("int"))).collect()[0][0]
            ts.append(time.perf_counter() - t0)
        print(
            f"score mode={mode}: min {min(ts):.2f}s over {n:,} docs "
            f"({n / min(ts) / 1e3:.0f}k docs/s), pass={npass:,}"
        )


if __name__ == "__main__":
    main()
