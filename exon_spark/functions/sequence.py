"""Sequence scalar functions.

Parity targets (reference: wheretrue/exon, all paths under
``exon/exon-core/src/udfs/sequence/``):

* ``gc_content``            — gc_content.rs:52-102
* ``reverse_complement``    — reverse_complement.rs:33-114
* ``trim_polya``            — trim_polya.rs:33-117
* ``alignment_score``       — alignment_score.rs:38-130 (Smith-Waterman local)
* ``locate_regex``          — locate_regex.rs:39-150
* ``integer_encoding``      — integer_encoding.rs:39-120

Golden vectors pinned from the reference's
``tests/sqllogictests/slt/sequence-udfs.slt``.

Everything except ``alignment_score`` and ``locate_regex`` compiles to pure
Column expressions (JVM-side, whole-stage codegen — the Spark-first fast
path). The two exceptions are Arrow-vectorized pandas UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "gc_content",
    "reverse_complement",
    "trim_polya",
    "alignment_score",
    "locate_regex",
    "integer_encoding",
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def gc_content(seq: Column | str) -> Column:
    """Fraction of characters that are ``G`` or ``C`` (uppercase only —
    case-sensitive, matching gc_content.rs:63 which filters ``'G' | 'C'``).

    Returns FloatType (reference returns Float32). Empty string → NaN
    (Rust ``0.0/0.0``).
    """
    seq = _col(seq)
    n = F.length(seq)
    gc = n - F.length(F.translate(seq, "GC", ""))
    return (
        F.when(n == 0, F.lit(float("nan")))
        .otherwise(gc.cast("float") / n.cast("float"))
        .cast("float")
    )


def reverse_complement(seq: Column | str) -> Column:
    """Case-preserving DNA reverse complement (A<->T, C<->G;
    reverse_complement.rs:33-114). Characters outside ``ACGTacgt`` pass
    through unchanged. Golden: ``'ATCG' -> 'CGAT'``, ``'atcg' -> 'cgat'``.
    """
    return F.translate(F.reverse(_col(seq)), "ACGTacgt", "TGCAtgca")


def trim_polya(seq: Column | str) -> Column:
    """Strip the trailing poly-A run, case-insensitive (trim_polya.rs:33-117).
    Golden: ``'ATCGAAAA' -> 'ATCG'``, ``length(trim_polya('AAAA')) = 0``.
    """
    return F.regexp_replace(_col(seq), "[Aa]+$", "")


def integer_encoding(seq: Column | str, alphabet: Column | str) -> Column:
    """Encode each character as its 0-based index in ``alphabet``
    (integer_encoding.rs:48-120). Characters absent from the alphabet encode
    as NULL elements (reference appends null, integer_encoding.rs:100-104).
    Element type SHORT (reference uses Int16).

    Golden: ``integer_encoding('ATCG','ATCG') = [0,1,2,3]``.
    """
    seq = _col(seq)
    alphabet = F.lit(alphabet) if isinstance(alphabet, str) else alphabet
    ch = F.transform(
        F.sequence(F.lit(1), F.length(seq)), lambda i: F.substring(seq, i, 1)
    )
    idx = F.transform(ch, lambda c: F.instr(alphabet, c) - 1)
    encoded = F.transform(
        idx, lambda i: F.when(i >= 0, i.cast("smallint")).otherwise(F.lit(None))
    )
    # guard: sequence(1, 0) counts down in Spark — empty input must yield []
    return F.when(F.length(seq) >= 1, encoded).otherwise(
        F.array().cast("array<smallint>")
    )


_LOCATE_SCHEMA = ArrayType(
    StructType(
        [
            StructField("start", IntegerType()),
            StructField("end", IntegerType()),
            StructField("match", StringType()),
        ]
    )
)

_udf_cache: dict[str, object] = {}


def _locate_regex_udf():
    """Lazily-built pandas UDF (UDF creation needs an active session)."""
    if "locate_regex" in _udf_cache:
        return _udf_cache["locate_regex"]

    def impl(seq, pat):  # type: ignore[no-untyped-def]
        import re

        import pandas as pd

        out = []
        cache: dict[str, object] = {}
        for s, p in zip(seq, pat):
            if s is None or p is None:
                out.append(None)
                continue
            rx = cache.get(p)
            if rx is None:
                rx = cache[p] = re.compile(p)
            out.append(
                [
                    {"start": m.start() + 1, "end": m.end() + 1, "match": m.group(0)}
                    for m in rx.finditer(s)
                ]
            )
        return pd.Series(out)

    _udf_cache["locate_regex"] = F.pandas_udf(impl, _LOCATE_SCHEMA)
    return _udf_cache["locate_regex"]


def locate_regex(seq: Column | str, pattern: Column | str) -> Column:
    """All regex matches with 1-based positions (locate_regex.rs:39-150).
    ``start`` = 1-based match start, ``end`` = 1-based position one past the
    match end. Golden: ``locate_regex('agctggagctacc','agc') =
    [{1,4,'agc'},{7,10,'agc'}]``.
    """
    pattern = F.lit(pattern) if isinstance(pattern, str) else pattern
    return _locate_regex_udf()(_col(seq), pattern)


def _alignment_score_udf():
    """Lazily-built pandas UDF. The impl is defined inside this factory so
    cloudpickle serializes it by VALUE (full code object), not by module
    reference — executors then need no exon_spark install (matters for
    spark-submit without --py-files)."""
    if "alignment_score" in _udf_cache:
        return _udf_cache["alignment_score"]

    def alignment_score_impl(a, b):  # type: ignore[no-untyped-def]
        import numpy as np
        import pandas as pd

        def sw(x: str, y: str) -> int:
            # Smith-Waterman local alignment, match=+1 mismatch=-1 gap
            # open=extend=-1 — pinned to rust-bio Aligner::local as vendored
            # at udfs/sequence/alignment_score.rs:97-130. With open==extend
            # the affine recurrence collapses to linear gaps.
            n, m = len(x), len(y)
            if n == 0 or m == 0:
                return 0
            prev = np.zeros(m + 1, dtype=np.int32)
            cur = np.zeros(m + 1, dtype=np.int32)
            # ord-based (not latin-1 bytes): this row kernel is also the
            # fallback for sequences the batched kernel can't byte-encode
            yb = np.array([ord(c) for c in y], dtype=np.int64)
            best = 0
            for i in range(1, n + 1):
                xi = ord(x[i - 1])
                sub = np.where(yb == xi, 1, -1).astype(np.int32)
                cur[0] = 0
                # up+diag vectorized per row; sequential pass for the
                # left-gap dependency
                cand = np.maximum(prev[:-1] + sub, prev[1:] - 1)
                np.maximum(cand, 0, out=cand)
                for j in range(1, m + 1):
                    cur[j] = max(cand[j - 1], cur[j - 1] - 1, 0)
                best = max(best, int(cur.max()))
                prev, cur = cur, prev
            return best

        def sw_group(xs: list, ys: list) -> list:
            # Same recurrence, vectorized across a group of pairs with
            # identical (len_x, len_y): the n*m DP loop runs ONCE per
            # group over (B,)-shaped numpy arrays instead of once per
            # row (50k fixed-length rows: 12.8M Python iterations -> a
            # few hundred; q12 measured 6.7s -> sub-second). Sequences
            # must be latin-1-encodable for the byte matrix — caller
            # falls back to the row kernel otherwise.
            n, m = len(xs[0]), len(ys[0])
            B = len(xs)
            X = np.frombuffer("".join(xs).encode("latin-1"), np.uint8).reshape(B, n)
            Y = np.frombuffer("".join(ys).encode("latin-1"), np.uint8).reshape(B, m)
            prev = np.zeros((B, m + 1), np.int32)
            cur = np.zeros((B, m + 1), np.int32)
            best = np.zeros(B, np.int32)
            for i in range(1, n + 1):
                sub = np.where(Y == X[:, i - 1 : i], 1, -1).astype(np.int32)
                cand = np.maximum(prev[:, :-1] + sub, prev[:, 1:] - 1)
                np.maximum(cand, 0, out=cand)
                for j in range(1, m + 1):
                    # cand >= 0, so the max is >= 0 without a third term
                    np.maximum(cand[:, j - 1], cur[:, j - 1] - 1, out=cur[:, j])
                np.maximum(best, cur[:, 1:].max(axis=1), out=best)
                prev, cur = cur, prev
            return [int(v) for v in best]

        out: list = [None] * len(a)
        groups: dict = {}
        for idx, (x, y) in enumerate(zip(a, b)):
            if x is None or y is None:
                continue
            if len(x) == 0 or len(y) == 0:
                out[idx] = 0
                continue
            groups.setdefault((len(x), len(y)), []).append(idx)
        for _key, idxs in groups.items():
            xs = [a.iloc[i] for i in idxs]
            ys = [b.iloc[i] for i in idxs]
            try:
                scores = sw_group(xs, ys)
            except UnicodeEncodeError:
                scores = [sw(x, y) for x, y in zip(xs, ys)]
            for i, s in zip(idxs, scores):
                out[i] = s
        return pd.Series(out, dtype="Int64").astype("Int32")

    _udf_cache["alignment_score"] = F.pandas_udf(alignment_score_impl, IntegerType())
    return _udf_cache["alignment_score"]


def alignment_score(a: Column | str, b: Column | str) -> Column:
    """Smith-Waterman **local** alignment score, match=+1, mismatch=-1,
    gap=-1 (alignment_score.rs:38-130). Goldens: ('ATCG','ATCG')=4,
    ('ATCG','AG')=1, ('ATCG','ATCGG')=4.

    Both args are columns (str = column name); pass ``F.lit(...)`` for a
    constant sequence.
    """
    return _alignment_score_udf()(_col(a), _col(b))
