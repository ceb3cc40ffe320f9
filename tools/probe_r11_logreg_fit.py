"""r11 probe (VERDICT r10 order 4): quantify replacing the row-at-a-time
pickled SparseVector assembly UDF in logreg_classifier_fit with the
Arrow-batched constructor over JVM-flattened arrays.

Times ONLY the changed stage — materializing the (label, features)
training table from a seed corpus — under both assembly paths, plus one
end-to-end fit with the shipped path. Run:

    python tools/probe_r11_logreg_fit.py [n_docs]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pyspark.sql.functions as F  # noqa: E402

from exon_spark import get_spark  # noqa: E402
from exon_spark.operators.classify import NB_BUCKETS, _gram_rows, h32  # noqa: E402


def build_pooled(df, buckets):
    labeled = (
        df.select(F.col("label").cast("double").alias("_y"), "text")
        .where(F.col("_y").isNotNull())
        .withColumn("_rid", F.monotonically_increasing_id())
    )
    grams = (
        _gram_rows(labeled, ["_rid", "_y"], "text", outer=False)
        .select(
            "_rid",
            "_y",
            F.pmod(h32(F.col("gram")), F.lit(buckets)).alias("bucket"),
        )
        .groupBy("_rid", "_y", "bucket")
        .count()
    )
    return grams.groupBy("_rid", "_y").agg(
        F.sort_array(F.collect_list(F.struct("bucket", "count"))).alias("bc"),
        F.sum("count").alias("n"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    buckets = NB_BUCKETS
    spark = get_spark(app_name="probe-r11-logreg-fit")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.ml.linalg import SparseVector, VectorUDT

    docs = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .limit(n_docs)
        .select(
            (F.length("text") % 2 == 0).alias("label"),
            "text",
        )
    )
    pooled = build_pooled(docs, buckets).persist()
    n = pooled.count()
    print(f"seed docs with features: {n}")

    def _row_assemble(bc, nn):  # the pre-r11 path, verbatim shape
        return SparseVector(
            buckets,
            [int(r["bucket"]) for r in bc],
            [float(r["count"]) / float(nn) for r in bc],
        )

    row_udf = F.udf(_row_assemble, VectorUDT())

    flat = pooled.select(
        F.col("_y").alias("label"),
        F.transform("bc", lambda x: x["bucket"].cast("int")).alias("_idx"),
        F.transform(
            "bc", lambda x: x["count"].cast("double") / F.col("n")
        ).alias("_vals"),
    )

    def _arrow_assemble(idx, vals):
        return SparseVector(buckets, idx, vals)

    arrow_udf = F.udf(_arrow_assemble, VectorUDT(), useArrow=True)

    def timed(name, df):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best:.2f}s (best of 2)")
        return best

    t_row = timed(
        "row-UDF assembly (pre-r11)",
        pooled.select(
            F.col("_y").alias("label"), row_udf("bc", "n").alias("features")
        ),
    )
    t_arrow = timed(
        "Arrow assembly (r11)",
        flat.select("label", arrow_udf("_idx", "_vals").alias("features")),
    )
    print(f"speedup: {t_row / t_arrow:.2f}x on the assembly stage")

    from exon_spark.operators.classify import logreg_classifier_fit

    t0 = time.perf_counter()
    model, meta = logreg_classifier_fit(docs, max_iter=20)
    nz = model.count()
    print(
        f"end-to-end fit (shipped path, maxIter=20): "
        f"{time.perf_counter() - t0:.2f}s, {nz} nonzero coefficients"
    )
    pooled.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
