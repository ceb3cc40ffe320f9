"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1-style pricing summary) at
sf0.001. ``queries()`` / ``oracle_sql()`` — the full operator surface from
SURVEY.md §2 plus the beyond-parity pipeline layer, one DuckDB oracle per
SQL-expressible query (see exon_spark/queries/).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _prepare(spark: SparkSession) -> None:
    """Install session config + function registry on the driver's session."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass
    from exon_spark import register_all

    register_all(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _prepare(spark)
    from exon_spark.queries import ALL_QUERIES

    return ALL_QUERIES["q01_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ pipeline)."""
    from exon_spark.queries import ALL_QUERIES

    def wrap(spec):
        def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return spec.spark_fn(spark, sf_dir)

        return fn

    return {name: wrap(spec) for name, spec in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle per SQL-expressible query; rows-only ops
    (approximate ANN, mapInPandas decode) are omitted by design."""
    from exon_spark.queries import ALL_QUERIES

    return {
        name: spec.oracle
        for name, spec in ALL_QUERIES.items()
        if spec.oracle is not None
    }
