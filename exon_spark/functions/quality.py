"""Phred quality-score functions.

Parity targets (reference: wheretrue/exon):

* ``quality_scores_to_list``   — udfs/sequence/quality_score_string_to_list.rs:37+
* ``quality_scores_to_string`` — udfs/sequence/quality_score_list_to_string.rs:35+

Goldens (quality-score-udfs.slt): ``'###' -> [2,2,2]``;
``'!'..'I' -> 0..40``; ``[2,2,2] -> '###'``.

Both are pure Column expressions — no Python in the execution path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

__all__ = ["quality_scores_to_list", "quality_scores_to_string"]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def quality_scores_to_list(quality: Column | str) -> Column:
    """Decode a Phred+33 quality string into ARRAY<INT> of scores."""
    q = _col(quality)
    decoded = F.transform(
        F.sequence(F.lit(1), F.length(q)),
        lambda i: F.ascii(F.substring(q, i, 1)) - 33,
    )
    # guard: sequence(1, 0) counts down in Spark — empty input must yield []
    return F.when(F.length(q) >= 1, decoded).otherwise(F.array().cast("array<int>"))


def quality_scores_to_string(scores: Column | str) -> Column:
    """Encode ARRAY<INT> Phred scores into a Phred+33 string."""
    return F.array_join(
        F.transform(_col(scores), lambda s: F.char(s + 33)), ""
    )
