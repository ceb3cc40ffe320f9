"""Local replica of the driver's correctness gate: run every query's Spark
implementation AND its DuckDB oracle at a given scale factor, compare row
count, column names and (order-insensitive) values.

Usage: python tools/check_correctness.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # Tag floats so 38.0 (a DuckDB HUGEINT sum widened to float64 in
            # pandas) does NOT compare equal to Spark's bigint 38 — the
            # driver's value-hasher is dtype-sensitive and flags exactly this
            # drift (q32 was red at the driver for two rounds while == -based
            # local comparison stayed green). Local red must predict driver
            # red.
            return ("f", round(v, 6))
        if isinstance(v, (list, tuple)):
            return tuple(norm_val(x) for x in v)
        if hasattr(v, "tolist"):  # numpy arrays from duckdb/spark
            return tuple(norm_val(x) for x in v.tolist())
        if isinstance(v, dict):
            return tuple(sorted((k, norm_val(x)) for k, x in v.items()))
        return v

    rows = [tuple(norm_val(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from exon_spark import get_spark
    from exon_spark.queries import ALL_QUERIES, TABLES

    spark = get_spark(app_name="check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create or replace view {t} as select * from '{args.sf}/{t}.parquet'"
        )

    names = args.names or list(ALL_QUERIES)
    failures = 0
    for name in names:
        spec = ALL_QUERIES[name]
        try:
            sdf = spec.spark_fn(spark, args.sf).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle — rows-only)")
            continue
        try:
            odf = con.execute(spec.oracle).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: row count {len(sdf)} vs oracle {len(odf)}")
            failures += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(
                f"FAIL  {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
            )
            failures += 1
            continue
        a, b = normalize(sdf), normalize(odf)
        if a != b:
            bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
            print(f"FAIL  {name}: value mismatch at sorted-row {bad}:")
            print(f"      spark : {a[bad]}")
            print(f"      oracle: {b[bad]}")
            failures += 1
            continue
        print(f"OK    {name}: {len(sdf)} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
