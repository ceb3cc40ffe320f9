"""Mass-spectrometry scalar functions.

Parity targets (reference: wheretrue/exon):

* ``contains_peak`` — udfs/massspec/contains_peak.rs:33-110
* ``bin_vectors``   — udfs/massspec/bin_vectors.rs:37-200

Goldens (mzml-functions.slt): ``bin_vectors([1.0,2.0,3.0],[1.0,2.0,3.0],
1.0,3,1.0) = [1.0,2.0,3.0]``; ``contains_peak(mz, 200.0, 1.0)``.

Both are pure Column expressions using higher-order array functions —
JVM-side, no Python.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

__all__ = ["contains_peak", "bin_vectors"]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _lit(v):
    return v if isinstance(v, Column) else F.lit(v)


def contains_peak(mz: Column | str, peak: float | Column, tol: float | Column) -> Column:
    """True iff any m/z value is within ``tol`` of ``peak``
    (``|x - peak| <= tol``, contains_peak.rs:60)."""
    peak, tol = _lit(peak), _lit(tol)
    return F.exists(_col(mz), lambda x: F.abs(x - peak) <= tol)


def bin_vectors(
    mz: Column | str,
    intensity: Column | str,
    min_mz: float | Column,
    num_bins: int | Column,
    bin_width: float | Column,
) -> Column:
    """Histogram-sum intensities into ``num_bins`` bins of ``bin_width``
    starting at ``min_mz`` (bin_vectors.rs:150-195 semantics):

    * values with ``mz < min_mz`` or ``mz > min_mz + num_bins*bin_width``
      are skipped (note the top edge is *inclusive* in the range test but a
      value exactly at the top edge lands in bin ``num_bins`` and is then
      dropped by the ``bin < num_bins`` guard);
    * bin index = ``floor((mz - min_mz)/bin_width)``;
    * null mz/intensity elements are skipped.

    Returns ARRAY<DOUBLE> of length ``num_bins``.
    """
    mz, intensity = _col(mz), _col(intensity)
    lo, nb, w = _lit(min_mz), _lit(num_bins), _lit(bin_width)
    hi = lo + nb.cast("double") * w
    pairs = F.zip_with(mz, intensity, lambda m, i: F.struct(m.alias("m"), i.alias("i")))

    def bin_sum(b: Column) -> Column:
        return F.aggregate(
            pairs,
            F.lit(0.0),
            lambda acc, x: acc
            + F.when(
                x["m"].isNotNull()
                & x["i"].isNotNull()
                & (x["m"] >= lo)
                & (x["m"] <= hi)
                & (F.floor((x["m"] - lo) / w).cast("int") == b),
                x["i"],
            ).otherwise(F.lit(0.0)),
        )

    return F.transform(F.sequence(F.lit(0), nb.cast("int") - 1), bin_sum)
