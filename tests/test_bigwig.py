"""BigWig source tests — golden rows from the reference's own fixture and
slt file (bigwig-tests.slt; exon_context_ext.rs zoom=2 / value=6)."""

from __future__ import annotations

import os

import pytest

REF_BW = "/root/reference/exon/exon-core/test-data/datasources/bigwig/test.bw"
REF_BW_PART = "/root/reference/exon/exon-core/test-data/datasources/bigwig-partition"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_BW), reason="reference fixture absent"
)


@pytest.fixture(scope="module")
def registered(spark):
    from exon_spark import register_all

    register_all(spark)
    return spark


def test_bigwig_value_golden_rows(registered):
    df = registered.read.format("bigwig_value").load(REF_BW)
    rows = [(r.name, r.start, r.end, round(r.value, 4)) for r in df.collect()]
    assert rows == [
        ("1", 0, 1, 0.1),
        ("1", 1, 2, 0.2),
        ("1", 2, 3, 0.3),
        ("1", 100, 150, 1.4),
        ("1", 150, 151, 1.5),
        ("10", 200, 300, 2.0),
    ]


def test_bigwig_zoom_golden_rows(registered):
    df = (
        registered.read.format("bigwig_zoom")
        .option("reduction_level", "400")
        .load(REF_BW)
    )
    rows = [
        (
            r.name, r.start, r.end, r.total_items, r.bases_covered,
            round(r.max_value, 4), round(r.min_value, 4),
            round(r.sum_squares, 2), round(r.sum, 2),
        )
        for r in df.orderBy("name").collect()
    ]
    assert rows == [
        ("1", 0, 400, 0, 54, 1.5, 0.1, 100.39, 72.1),
        ("10", 200, 600, 0, 100, 2.0, 2.0, 400.0, 200.0),
    ]


def test_bigwig_zoom_requires_reduction_level(registered):
    with pytest.raises(Exception, match="reduction_level"):
        registered.read.format("bigwig_zoom").load(REF_BW).collect()


def test_bigwig_value_region_pruned(registered):
    df = (
        registered.read.format("bigwig_value")
        .option("regions", "10")
        .load(REF_BW)
    )
    rows = [(r.name, r.start, r.end) for r in df.collect()]
    assert rows == [("10", 200, 300)]
    df2 = (
        registered.read.format("bigwig_value")
        .option("regions", "1:101-120")
        .load(REF_BW)
    )
    assert [(r.start, r.end) for r in df2.collect()] == [(100, 150)]


def test_bigwig_partitioned_dir(registered):
    df = registered.read.format("bigwig_value").load(REF_BW_PART)
    counts = {r.sample: r.n for r in df.groupBy("sample").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"1": 6, "2": 6}
