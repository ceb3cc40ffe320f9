"""Golden-vector tests for the §2.4 function surface.

Expected values pinned from the reference's slt corpus
(tests/sqllogictests/slt/{sequence-udfs,quality-score-udfs,mzml-functions}.slt)
— see FIXTURES.md "Golden UDF vectors".
Every function is exercised BOTH through the DataFrame API (Column
expressions) and through spark.sql (registered SQL functions).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

import exon_spark.functions as xf


def one(df):
    return df.collect()[0][0]


# ---------- sequence ----------


def test_reverse_complement(spark):
    df = spark.createDataFrame([("ATCG",), ("atcg",), ("AAA",)], ["s"])
    got = [r[0] for r in df.select(xf.reverse_complement("s")).collect()]
    assert got == ["CGAT", "cgat", "TTT"]
    assert one(spark.sql("SELECT reverse_complement('ATCG')")) == "CGAT"


def test_trim_polya(spark):
    df = spark.createDataFrame([("ATCGAAAA",), ("atcgaaaa",), ("AAAA",)], ["s"])
    got = [r[0] for r in df.select(xf.trim_polya("s")).collect()]
    assert got == ["ATCG", "atcg", ""]
    assert one(spark.sql("SELECT length(trim_polya('AAAA'))")) == 0


def test_gc_content(spark):
    df = spark.createDataFrame([("ATCG",), ("GGCC",), ("AT",), ("gc",)], ["s"])
    got = [r[0] for r in df.select(xf.gc_content("s")).collect()]
    # case-sensitive: lowercase 'gc' counts zero (gc_content.rs:63)
    assert got == [0.5, 1.0, 0.0, 0.0]
    assert one(spark.sql("SELECT gc_content('ATCG')")) == pytest.approx(0.5)
    assert math.isnan(one(spark.sql("SELECT gc_content('')")))


def test_integer_encoding(spark):
    df = spark.createDataFrame([("ATCG",), ("AAAA",), ("ATXG",)], ["s"])
    got = [r[0] for r in df.select(xf.integer_encoding("s", "ATCG")).collect()]
    assert got == [[0, 1, 2, 3], [0, 0, 0, 0], [0, 1, None, 3]]
    assert one(spark.sql("SELECT integer_encoding('ATCG', 'ATCG')")) == [0, 1, 2, 3]


def test_alignment_score(spark):
    df = spark.createDataFrame(
        [("ATCG", "ATCG"), ("ATCG", "AG"), ("ATCG", "ATCGG"), ("AAA", "ATCG")],
        ["a", "b"],
    )
    got = [r[0] for r in df.select(xf.alignment_score("a", "b")).collect()]
    assert got == [4, 1, 4, 1]
    assert one(spark.sql("SELECT alignment_score('ATCG', 'ATCG')")) == 4


def test_locate_regex(spark):
    df = spark.createDataFrame([("agctggagctacc",)], ["s"])
    got = one(df.select(xf.locate_regex("s", "agc")))
    assert [tuple(r) for r in got] == [(1, 4, "agc"), (7, 10, "agc")]
    got = one(df.select(xf.locate_regex("s", "a[atcg]c")))
    assert [tuple(r) for r in got] == [(1, 4, "agc"), (7, 10, "agc"), (11, 14, "acc")]
    got = one(spark.sql("SELECT locate_regex('ATCG', 'A[TCG]C')"))
    assert [tuple(r) for r in got] == [(1, 4, "ATC")]


# ---------- quality ----------


def test_quality_scores_to_list(spark):
    df = spark.createDataFrame([("###",)], ["q"])
    assert one(df.select(xf.quality_scores_to_list("q"))) == [2, 2, 2]
    full = "!\"#$%&'()*+,-./0123456789:;<=>?@ABCDEFGHI"
    got = one(spark.createDataFrame([(full,)], ["q"]).select(xf.quality_scores_to_list("q")))
    assert got == list(range(41))


def test_quality_scores_to_string(spark):
    df = spark.createDataFrame([([2, 2, 2],), ([3, 2, 3],)], ["l"])
    got = [r[0] for r in df.select(xf.quality_scores_to_string("l")).collect()]
    assert got == ["###", "$#$"]
    assert one(spark.sql("SELECT quality_scores_to_string(array(2,2,2))")) == "###"


# ---------- SAM flags ----------


def test_sam_flags(spark):
    df = spark.createDataFrame([(4,), (1024,), (1027,), (0,)], ["flag"])
    assert [r[0] for r in df.select(xf.is_unmapped("flag")).collect()] == [
        True,
        False,
        False,
        False,
    ]
    assert [r[0] for r in df.select(xf.is_duplicate("flag")).collect()] == [
        False,
        True,
        True,
        False,
    ]
    assert [r[0] for r in df.select(xf.is_segmented("flag")).collect()] == [
        False,
        False,
        True,
        False,
    ]
    # reference aliases both names to bit 0x2 (samflags.rs:114-119)
    assert one(spark.sql("SELECT is_properly_aligned(2)")) is True
    assert one(spark.sql("SELECT is_properly_segmented(2)")) is True
    assert one(spark.sql("SELECT is_supplementary(2048)")) is True


# ---------- mass spec ----------


def test_contains_peak(spark):
    df = spark.createDataFrame([([199.5, 350.0],), ([100.0],)], ["mz"])
    got = [r[0] for r in df.select(xf.contains_peak("mz", 200.0, 1.0)).collect()]
    assert got == [True, False]
    assert one(
        spark.sql("SELECT contains_peak(array(199.5d, 350.0d), 200.0d, 1.0d)")
    ) is True


def test_bin_vectors(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [1.0, 2.0, 3.0])], ["mz", "i"])
    got = one(df.select(xf.bin_vectors("mz", "i", 1.0, 3, 1.0)))
    assert got == [1.0, 2.0, 3.0]
    # out-of-range values skipped; top edge excluded via bin < n
    df2 = spark.createDataFrame([([0.5, 4.0, 2.5], [10.0, 10.0, 7.0])], ["mz", "i"])
    assert one(df2.select(xf.bin_vectors("mz", "i", 1.0, 3, 1.0))) == [0.0, 7.0, 0.0]
    got = one(
        spark.sql(
            "SELECT bin_vectors(array(1.0d,2.0d,3.0d), array(1.0d,2.0d,3.0d), 1.0d, 3, 1.0d)"
        )
    )
    assert got == [1.0, 2.0, 3.0]


def test_bin_spectra_matches_scalar_functions(spark):
    """The wide-agg scale path must agree with the per-row HOF functions
    on every edge the HOF handles: nulls in either array, out-of-range
    values, the exact top edge, empty arrays, all-null spectra."""
    import random

    rng = random.Random(7)
    rows = []
    for vid in range(40):
        n = rng.randrange(0, 12)
        mz = [
            None if rng.random() < 0.1 else round(rng.uniform(0.0, 5.0), 3)
            for _ in range(n)
        ]
        iv = [
            None if rng.random() < 0.1 else float(rng.randrange(0, 10))
            for _ in range(n)
        ]
        rows.append((vid, mz, iv))
    rows.append((100, [], []))  # empty spectrum
    rows.append((101, [None, None], [1.0, 2.0]))  # all-null mz
    rows.append((102, [4.0], [5.0]))  # exact top edge: bin 3 of 3, dropped
    df = spark.createDataFrame(
        rows, "vec_id int, mz array<double>, iv array<double>"
    )
    want = {
        r["vec_id"]: (r["p"], r["b"])
        for r in df.select(
            "vec_id",
            xf.contains_peak("mz", 2.0, 0.5).alias("p"),
            xf.bin_vectors("mz", "iv", 1.0, 3, 1.0).alias("b"),
        ).collect()
    }
    got = {
        r["vec_id"]: (r["has_peak"], r["bins"])
        for r in xf.bin_spectra(
            df, "mz", 1.0, 3, 1.0, intensity="iv", peak=2.0, tol=0.5
        ).collect()
    }
    assert set(got) == set(want)
    for vid in want:
        # HOF exists() returns null (not false) for empty/all-null inputs;
        # the fused aggregate coalesces to false — normalize for compare
        assert bool(want[vid][0]) == bool(got[vid][0]), vid
        assert want[vid][1] == got[vid][1], vid
    # callable mz/intensity path (the q16 spelling): one row per input row
    out = xf.bin_spectra(
        df,
        "mz",
        1.0,
        3,
        1.0,
        mz=lambda x: x * 1.0,
        intensity=lambda m: m * 0.0 + 1.0,
    )
    assert out.count() == df.count()
    assert out.columns == ["vec_id", "bins"]


# ---------- region ----------


def test_region_match(spark):
    df = spark.createDataFrame(
        [("1", 150), ("1", 250), ("2", 150)], ["chrom", "pos"]
    )
    got = [r[0] for r in df.select(xf.region_match("chrom", "pos", "1:100-200")).collect()]
    assert got == [True, False, False]
    # inclusive bounds
    got = [r[0] for r in df.select(xf.region_match("chrom", "pos", "1:150-150")).collect()]
    assert got == [True, False, False]
    # bare-name and open-ended regions
    assert [r[0] for r in df.select(xf.region_match("chrom", "pos", "1")).collect()] == [
        True,
        True,
        False,
    ]
    assert [r[0] for r in df.select(xf.region_match("chrom", "pos", "1:200")).collect()] == [
        False,
        True,
        False,
    ]
    assert one(spark.sql("SELECT region_match('1', 150L, '1:100-200')")) is True
    assert one(spark.sql("SELECT region_match('1', 150L, '1')")) is True
    assert one(spark.sql("SELECT chrom_match('17', '17:1-100')")) is True
    assert one(spark.sql("SELECT interval_match(50L, '17:1-100')")) is True


def test_overlap_region_filters(spark):
    df = spark.createDataFrame(
        [("chr1", 90, 110), ("chr1", 300, 400), ("chr2", 90, 110)],
        ["ref", "start", "end"],
    )
    got = [
        r[0]
        for r in df.select(
            xf.bam_region_filter("chr1:100-200", "ref", "start", "end")
        ).collect()
    ]
    assert got == [True, False, False]
    assert one(
        spark.sql("SELECT bam_region_filter('chr1:100-200', 'chr1', 90L, 110L)")
    ) is True
    assert one(
        spark.sql("SELECT gff_region_filter('chr1:100-200', 'chr1', 199L, 300L)")
    ) is True
    assert one(spark.sql("SELECT fasta_region_filter('seq1:1-10', 'seq1')")) is True


def test_whole_stage_codegen_for_expressions(spark):
    """The expression-backed functions must stay JVM-side: the physical plan
    for a filter over them must contain no BatchEvalPython/ArrowEvalPython."""
    df = spark.createDataFrame([("ATCG", 4)], ["s", "flag"])
    plan = (
        df.select(
            xf.gc_content("s"),
            xf.reverse_complement("s"),
            xf.quality_scores_to_list("s"),
            xf.is_unmapped("flag"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_alignment_score_batched_groups_match_row_kernel(spark):
    """The length-grouped batched DP must agree with the row kernel across
    mixed lengths, nulls, empties and non-latin1 text (fallback path)."""
    rows = [
        ("ATCG", "ATCG"),      # group (4,4)
        ("GGGG", "ATCG"),      # same group, different answer
        ("ATCGATCG", "TCGA"),  # group (8,4)
        ("", "ATCG"),          # empty -> 0
        (None, "ATCG"),        # null -> null
        ("ACGT", None),
        ("ATéG", "éG"),  # latin-1-encodable accents
        ("AT世G", "世G"),  # non-latin1 -> ord fallback
    ]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = [r[0] for r in df.select(xf.alignment_score("a", "b")).collect()]

    def sw_ref(x, y):
        n, m = len(x), len(y)
        H = [[0] * (m + 1) for _ in range(n + 1)]
        best = 0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                s = 1 if x[i - 1] == y[j - 1] else -1
                H[i][j] = max(0, H[i - 1][j - 1] + s, H[i - 1][j] - 1, H[i][j - 1] - 1)
                best = max(best, H[i][j])
        return best

    exp = [
        None if (x is None or y is None) else sw_ref(x, y) for x, y in rows
    ]
    assert got == exp
