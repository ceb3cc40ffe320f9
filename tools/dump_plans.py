"""Dump .explain("formatted") for a set of declared queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX [names...]

Writes OUTDIR/<name>_<SUFFIX>.txt for each query name (default: the r12
optimization-touched set). Run from a checkout whose exon_spark is on
sys.path — pointing PYTHONPATH at an older worktree dumps that revision's
plans, which is how the plans/r12/*_before.txt files were produced.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT = [
    "q16_mass_spec",
    "q18_dedup_ngram_jaccard",
    "q19_dedup_minhash_lsh",
    "q23_text_profile",
    "q31_dedup_clusters",
    "q36_quality_signals",
    "q37_dup_ngram_coverage",
    "q40_dedup_incremental",
    "q42_unigram_logppl",
    "q52_ppl_buckets",
]


def main() -> None:
    outdir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    outdir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from exon_spark import get_spark
    from exon_spark.queries import ALL_QUERIES

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    import contextlib
    import io

    for name in names:
        spec = ALL_QUERIES[name]
        df = spec.spark_fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        (outdir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
