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
