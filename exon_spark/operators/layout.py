"""Data-layout operators: multi-dimensional (Z-order / Morton) clustering
keys for write-time co-location — the ``OPTIMIZE ZORDER BY`` analogue for
a parquet corpus.

Why at 100 TB: a table range-partitioned and sorted by ONE column only
data-skips on that column; interleaving the bits of several normalized
dimensions into one key and range-partitioning + sorting by it gives
parquet row-group min/max stats that are simultaneously selective on ALL
the interleaved dimensions — multi-predicate scans prune without a
secondary index. Pure Column arithmetic (codegen'd), engine-exact for
integer dimensions, so the key is oracle-mirrorable in DuckDB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _cell(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Integer cell id in [0, 2^bits): floor(((x-min) << bits) / span) via
    remainder subtraction — (num - num % span) is exactly divisible, so
    the double division is exact and Spark/DuckDB agree bit-for-bit (a
    plain double `/` could misround across a cell boundary for large
    spans)."""
    span = cmax.cast("bigint") - cmin.cast("bigint") + 1
    num = (col.cast("bigint") - cmin.cast("bigint")) * (1 << bits)
    return ((num - F.pmod(num, span)) / span).cast("bigint")


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> DataFrame:
    """Append ``zkey`` — the Morton interleave of each dimension's
    min-max-normalized ``bits``-bit cell id. Integer columns only (exact
    cross-engine arithmetic); ``len(cols) * bits`` must fit a signed
    bigint. Column mins/maxes come from one 1-row aggregate broadcast —
    no collect, no window.
    """
    if not cols or len(cols) * bits > 62:
        raise ValueError("need 1+ cols with len(cols)*bits <= 62")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    stats = df.agg(*aggs)
    d = df.crossJoin(F.broadcast(stats))
    cells = [
        _cell(F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), bits)
        for c in cols
    ]
    ndim = len(cols)
    terms = []
    for b in range(bits):
        for j, cell in enumerate(cells):
            terms.append(
                F.shiftleft(
                    F.shiftright(cell, b).bitwiseAND(F.lit(1)),
                    b * ndim + j,
                )
            )
    zkey = terms[0]
    for t in terms[1:]:
        zkey = zkey + t
    return d.select(*df.columns, zkey.cast("bigint").alias("zkey"))


def zorder_repartition(
    df: DataFrame, cols: list[str], n_partitions: int, bits: int = 8
) -> DataFrame:
    """Range-partition + sort by the Z-order key: the write-side layout
    pass. Each output partition holds a contiguous z-range, so parquet
    files/row groups carry tight min/max stats on every interleaved
    dimension. One range shuffle (sampled boundaries), sort within
    partitions only."""
    keyed = zorder_key(df, cols, bits)
    return keyed.repartitionByRange(n_partitions, "zkey").sortWithinPartitions(
        "zkey"
    )
