"""r10 probe: ivfpq_topk ADC scoring — per-cell LUT slice (shipped,
pq.py:ivfpq_topk) vs the r9 full-LUT regime (every row scored against
ALL Q queries, unprobed (qi, cell) pairs discarded by the join;
reconstructed inline as the "before" regime).

Result equality is asserted row-for-row (same (q_id, vec_id, score)
set); the timing gap is the r9-verdict compute-waste term
Q x (1 - avg probe share), invisible at the gate's Q=8 and linear in Q
— probed here at Q=256 over the sf0.1 embeddings corpus.

Usage: python tools/probe_r10_ivfpq.py [sf_dir] [Q]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")

from exon_spark.operators.pq import (  # noqa: E402
    _topk_or_rerank,
    ivfpq_encode,
    ivfpq_fit,
    ivfpq_topk,
)
from exon_spark.session import get_spark  # noqa: E402


def full_lut_topk(encoded, centroids, cb, queries, k, nprobe):
    """The r9 spelling: ADC scores all Q per row, join discards."""
    cents = cb.centroids
    n_sub, kc, d_sub = cents.shape
    order = sorted(centroids)
    cell_ids = [c for c, _ in order]
    C = np.stack([np.asarray(v, np.float64) for _, v in order])
    qrows = (
        queries.select(F.col("vec_id").alias("q"), F.col("embedding").alias("v"))
        .orderBy("q")
        .collect()
    )
    q_ids = [r.q for r in qrows]
    Q = np.stack([np.asarray(r.v, np.float64) for r in qrows])
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    nprobe = min(nprobe, len(order))
    bias = Q @ C.T
    probe_rows = []
    for qi in range(len(q_ids)):
        ranked = sorted(
            range(len(order)), key=lambda c: (-bias[qi, c], cell_ids[c])
        )[:nprobe]
        probe_rows.extend(
            (qi, int(cell_ids[c]), float(bias[qi, c])) for c in ranked
        )
    lut = np.stack(
        [
            np.stack(
                [Q[:, s * d_sub : (s + 1) * d_sub] @ cents[s, c] for c in range(kc)]
            )
            for s in range(n_sub)
        ]
    )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def adc(code_arrs):
        import numpy as np
        import pandas as pd

        if len(code_arrs) == 0:
            return pd.Series([], dtype=object)
        Cd = np.stack([np.asarray(c, np.int64) for c in code_arrs])
        tot = lut[0, Cd[:, 0], :]
        for s in range(1, n_sub):
            tot = tot + lut[s, Cd[:, s], :]
        return pd.Series(list(tot))

    spark = encoded.sparkSession
    probes = spark.createDataFrame(probe_rows, "qi int, cell int, bias double")
    all_cells = sorted({c for _, c, _ in probe_rows})
    qid_arr = F.array(*[F.lit(q) for q in q_ids])
    scored = (
        encoded.filter(F.col("cell").isin(all_cells))
        .select(
            "vec_id",
            "cell",
            F.posexplode(adc(F.col("pq_code"))).alias("qi", "_r"),
        )
        .join(F.broadcast(probes), ["qi", "cell"])
        .select(
            qid_arr[F.col("qi")].alias("q_id"),
            "vec_id",
            F.round(F.col("_r") + F.col("bias"), 6).alias("score"),
        )
        .filter(F.col("vec_id") != F.col("q_id"))
    )
    return _topk_or_rerank(scored, queries, k, None, 4, "vec_id", "embedding")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spark = get_spark()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n = emb.count()
    cents, cb = ivfpq_fit(emb, n_cells=64, n_sub=16, k=64, pq_iters=6)
    enc = ivfpq_encode(emb, cents, cb).cache()
    enc.count()
    queries = emb.orderBy("vec_id").limit(nq).cache()
    queries.count()
    print(f"corpus={n:,} Q={nq} cells=64 nprobe=8")

    def run(fn, label):
        fn(enc, cents, cb, queries, k=10, nprobe=8).count()  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(enc, cents, cb, queries, k=10, nprobe=8).count()
            ts.append(time.perf_counter() - t0)
        print(f"{label}: min {min(ts):.2f}s reps {[f'{t:.2f}' for t in ts]}")
        return min(ts)

    def ivf(enc, cents, cb, queries, k, nprobe):
        return ivfpq_topk(enc, cents, cb, queries, k=k, nprobe=nprobe)

    t_new = run(ivf, "sliced (shipped)")
    t_old = run(full_lut_topk, "full-LUT (r9)   ")
    print(f"speedup at Q={nq}: {t_old / t_new:.2f}x")

    a = sorted(
        map(tuple, ivf(enc, cents, cb, queries, 10, 8).collect())
    )
    b = sorted(map(tuple, full_lut_topk(enc, cents, cb, queries, 10, 8).collect()))
    assert a == b, f"regimes diverged: {len(a)} vs {len(b)} rows"
    print(f"result equality: OK ({len(a):,} rows identical)")


if __name__ == "__main__":
    main()
