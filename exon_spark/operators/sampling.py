"""Deterministic sampling & corpus mixing for training-data pipelines.

``df.sample()`` is the wrong tool for dataset curation: its output depends
on the RNG seed *per partition*, so it changes whenever partitioning
changes (repartition, AQE, a different cluster size) and cannot be
reproduced across engines. Content-hash sampling decides keep/drop from
the row's own key — the same row set survives on any engine, any layout,
any day, and the filter is a pure Column expression evaluated map-side
(no shuffle, pushes through scans like any filter).

The hash is ``h32`` (first 8 md5 hex chars as bigint) so the DuckDB
oracles reproduce the exact row set — see operators/dedup.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from exon_spark.operators.dedup import h32

_BUCKETS = 1_000_000


def sample_bucket(key: Column | str, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6) derived from the row key (+ optional salt
    so independent samples of the same corpus don't correlate)."""
    c = F.col(key) if isinstance(key, str) else key
    return h32(F.concat(c.cast("string"), F.lit(salt))) % _BUCKETS


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by key hash. Map-side
    filter: no shuffle, reproducible on any partitioning or engine."""
    return df.filter(sample_bucket(key_col, salt) < int(fraction * _BUCKETS))


def stratified_mix(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    default_rate: float = 0.0,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Corpus mixing: per-stratum deterministic sampling rates (e.g.
    up/down-weighting sources or languages when assembling a training mix).
    One map-side filter — the rate is a CASE over the stratum column, the
    keep decision a hash compare; no shuffle, no RNG, fully reproducible."""
    rate: Column = F.lit(int(default_rate * _BUCKETS))
    for value, r in rates.items():
        rate = F.when(F.col(stratum_col) == value, int(r * _BUCKETS)).otherwise(rate)
    return df.filter(sample_bucket(key_col, salt) < rate)


def token_budget_cap(
    df: DataFrame,
    budget_tokens: int,
    by: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Cap each group at a token budget: within every ``by`` group, order
    documents by their content hash (the same reproducible order
    ``hash_sample`` uses) and keep the prefix whose cumulative token count
    stays within ``budget_tokens`` — "give me ~N tokens per source/language,
    chosen deterministically" is the final assembly step of every training
    mix, and unlike rate-based sampling it hits an absolute token target.

    Output: (doc_id, <by>, n_tokens, cum_tokens) for the kept docs —
    re-join on doc_id to recover full rows. Deterministic on any
    partitioning or engine: the order key is (h32(id+salt), id), a total
    order.

    Scale: one shuffle by the group key + an in-group sort for the running
    sum (Spark's window). Groups are source/lang strata — thousands at
    most, so per-group data at 100 TB is large but the running sum is a
    single streaming pass after the sort; skewed strata spill-sort rather
    than OOM. If only an approximate cap is needed, a two-pass variant
    (sample the hash-to-cumulative-tokens curve, pick a hash cutoff, then
    map-side filter) avoids the sort entirely; this exact version is the
    reference semantics.
    """
    from pyspark.sql import Window

    ntok = (
        F.size(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
        if token_col is None
        else F.col(token_col)
    )
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(by),
        ntok.alias("n_tokens"),
        h32(F.concat(F.col(id_col).cast("string"), F.lit(salt))).alias("_h"),
    )
    w = (
        Window.partitionBy(by)
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
        .drop("_h")
    )
