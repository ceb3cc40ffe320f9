"""Query-registry plumbing shared by the driver contract
(``__spark_entry__.py``), ``bench.py`` and the local correctness checker.

Each query is a ``QuerySpec``:

* ``spark_fn(spark, sf_dir) -> DataFrame`` — the Spark implementation
  (DataFrame API or spark.sql; always the Spark-first plan we want at scale);
* ``oracle`` — equivalent DuckDB SQL over the pre-registered views
  (``region nation customer supplier part orders lineitem events documents
  embeddings``), or ``None`` for non-SQL-expressible operators (the driver
  then records a rows-only check).

Engine-stability rules used throughout (so value-hashes match DuckDB):

* money/double sums go through ``SUM_D`` — round each term to 6 dp, sum
  exactly as integral micro-units (bigint in Spark, hugeint-promoted in
  DuckDB), cast back to double, round to 4 dp. Exact arithmetic ⇒ no
  partial-aggregation order sensitivity. See SUM_D for the overflow bound
  and the decimal spelling kept for beyond-sf1 scales.
* double→int conversions always ``cast(floor(x) as bigint)`` — Spark
  truncates, DuckDB *rounds*, floor() agrees everywhere.
* every computed column is aliased identically in Spark and oracle SQL
  (driver sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


# testdata timestamp columns have drifted across driver regenerations:
# TIMESTAMP(NANOS) (surfacing as bigint nanos under
# spark.sql.legacy.parquet.nanosAsLong=true), timestamp[us] (surfacing as
# TIMESTAMP_NTZ), or plain TIMESTAMP. table() normalizes all three to
# session-tz TIMESTAMP (session tz is UTC, so the NTZ cast is
# value-preserving and oracles agree — DuckDB reads the same micros).
_NANO_TS_COLS = {
    "lineitem": ("l_shipdate",),
    "orders": ("o_orderdate",),
    "events": ("ts",),
}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    import pyspark.sql.functions as F

    # NOTE: no blanket repartition here even though the testdata parquets
    # are single-row-group (one scan partition): measured at sf0.1 it
    # costs +0.3-1.0s on every light query while only the fan-out-heavy
    # operators win — those call operators.dedup.fanout_repartition on
    # their own input instead.
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANO_TS_COLS.get(name, ()):
        if c not in df.columns:
            continue
        dtype = dict(df.dtypes)[c]
        if dtype == "bigint":  # nanos-as-long
            df = df.withColumn(
                c, F.timestamp_micros((F.col(c) / 1000).cast("long"))
            )
        elif dtype == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


_REGISTERED: dict[int, tuple[str, tuple]] = {}


def register_views(
    spark: SparkSession, sf_dir: str, names=TABLES, force: bool = False
) -> None:
    """Register the testdata tables as temp views. Memoized on the
    session's *current* (sf_dir, names): each registration re-reads every
    parquet footer driver-side (~0.5 s for 10 tables), which would
    otherwise be paid by every sql_query call in a bench run. Switching
    sf_dir re-registers (views always reflect the last requested dir)."""
    key = (sf_dir, tuple(names))
    if not force and _REGISTERED.get(id(spark)) == key:
        return
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)
    _REGISTERED[id(spark)] = key


def sql_query(name: str, sql: str, oracle: str | None = None, doc: str = "", tables=TABLES) -> QuerySpec:
    """A query whose Spark side is ``spark.sql`` over temp views (Catalyst
    optimizes from there). ``oracle`` defaults to the same text — most
    relational queries are written in the common Spark/DuckDB SQL subset."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, tables)
        return spark.sql(sql)

    return QuerySpec(name, fn, sql if oracle is None else oracle, doc)


# --- engine-stable aggregate fragments (valid in BOTH Spark SQL and DuckDB) --

def _MICRO_SUM(expr: str) -> str:
    """Exact sum of round(expr, 6) as integral micro-units.

    Why not decimal: Spark's SUM over decimal(38,*) runs on the BigDecimal
    slow path — measured 0.42 s/aggregate over 6M rows vs 0.19 s for a
    bigint sum (q01 1.5 s -> 0.66 s, the r5->r6 fix for the q01 bench
    regression; numbers in SCALE.md). The micro-unit spelling is exact in
    both engines: each term round(x,6)*1e6 is an integer below 2^53 (so
    the double product is exact), the outer round() pins the same integer
    under Spark's HALF_UP and DuckDB's half-away (the value is within
    1e-7 of an integer, so they agree), and the sum is integral — bigint
    in Spark, hugeint-promoted in DuckDB.

    Overflow bound (Spark side): |group sum| < 2^63 micro-units =
    9.2e12 currency units — 30x headroom at bench scale (sf0.1 group sums
    ~3e11) and safe through TPC-H sf1. The bound is ENFORCED, not just
    documented: sessions run Spark 4's default ANSI mode, where a bigint
    SUM past 2^63 raises ARITHMETIC_OVERFLOW instead of wrapping — a
    beyond-headroom run fails loudly (pinned by
    test_micro_sum_overflow_raises). DuckDB's side promotes to hugeint
    and cannot overflow. A session that disables ANSI gives up that
    guard — use SUM_D_DEC there for beyond-sf1 workloads (the exact
    decimal spelling this replaced), or sum partition-partial bigints
    and merge the partials as decimal.
    """
    return f"sum(cast(round(round({expr}, 6) * 1000000) as bigint))"


def SUM_D(expr: str, alias: str) -> str:
    """Exact micro-unit sum of a double expression, surfaced as rounded
    double (see _MICRO_SUM for exactness + overflow analysis)."""
    return (
        f"round(cast({_MICRO_SUM(expr)} as double) / 1000000, 4) as {alias}"
    )


def AVG_D(expr: str, alias: str) -> str:
    """Exact-sum-based average (micro-unit sum / count), rounded double."""
    return (
        f"round(cast({_MICRO_SUM(expr)} as double) / 1000000"
        f" / count(*), 4) as {alias}"
    )


def SUM_D_DEC(expr: str, alias: str) -> str:
    """Exact decimal(38,10) sum — the unbounded-scale spelling (slower:
    BigDecimal aggregation path; see _MICRO_SUM)."""
    return (
        f"round(cast(sum(cast(round({expr}, 6) as decimal(38,10))) as double), 4)"
        f" as {alias}"
    )
