"""BGZF + tabix indexed region-scan tests — the flagship pruning path
(reference: indexed VCF scans, SURVEY.md §4.1)."""

from __future__ import annotations

import random

import pytest


@pytest.fixture(scope="module")
def big_vcf(tmp_path_factory):
    root = tmp_path_factory.mktemp("indexed")
    plain = root / "big.vcf"
    rng = random.Random(42)
    lines = [
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
    ]
    expected: dict[str, list[int]] = {}
    for chrom in ("1", "2", "17"):
        positions = sorted(rng.sample(range(1, 5_000_000), 2000))
        expected[chrom] = positions
        for pos in positions:
            ref = rng.choice(["A", "C", "GT", "AAC"])
            lines.append(f"{chrom}\t{pos}\t.\t{ref}\tT\t50\tPASS\tDP=5")
    plain.write_text("\n".join(lines) + "\n")

    from exon_spark.sources.bgzf import bgzip_file
    from exon_spark.sources.indexes import build_tabix_vcf

    gz = root / "big.vcf.gz"
    bgzip_file(str(plain), str(gz))
    build_tabix_vcf(str(gz))
    return gz, expected


def test_bgzf_roundtrip(big_vcf, tmp_path):
    import gzip

    gz, _ = big_vcf
    # BGZF output is valid gzip
    with gzip.open(gz, "rt") as fh:
        first = fh.readline()
    assert first.startswith("##fileformat")


def test_tabix_chunks_sane(big_vcf):
    from exon_spark.sources.indexes import read_tabix, tabix_chunks

    gz, expected = big_vcf
    idx = read_tabix(str(gz) + ".tbi")
    assert set(idx.names) == {"1", "2", "17"}
    chunks = tabix_chunks(idx, "17:1-5000000")
    assert chunks, "chr17 should have chunks"
    assert tabix_chunks(idx, "99:1-100") is None


def test_indexed_region_scan_matches_filter(spark, big_vcf):
    gz, expected = big_vcf
    region = "17:1000000-3000000"
    pruned = (
        spark.read.format("vcf").option("regions", region).load(str(gz))
    )
    want = [p for p in expected["17"] if 1_000_000 <= p <= 3_000_000]
    got = sorted(r["pos"] for r in pruned.collect())
    assert got == want
    # pruning plans exactly one partition (one region) instead of a full scan
    assert pruned.rdd.getNumPartitions() == 1


def test_indexed_multi_region(spark, big_vcf):
    gz, expected = big_vcf
    df = (
        spark.read.format("vcf")
        .option("regions", "1:1-200000,2:4000000-5000000")
        .load(str(gz))
    )
    rows = df.collect()
    want1 = [p for p in expected["1"] if p <= 200_000]
    want2 = [p for p in expected["2"] if 4_000_000 <= p <= 5_000_000]
    assert sorted(r["pos"] for r in rows if r["chrom"] == "1") == want1
    assert sorted(r["pos"] for r in rows if r["chrom"] == "2") == want2
    assert len(rows) == len(want1) + len(want2)


def test_indexed_empty_region(spark, big_vcf):
    gz, _ = big_vcf
    df = (
        spark.read.format("vcf")
        .option("regions", "XYZ:1-100")
        .load(str(gz))
    )
    assert df.count() == 0


def test_csi_fallback_matches_tabix(big_vcf, tmp_path, spark):
    """With only a .csi present (htslib `tabix --csi` layout), VCF region
    scans prune through the CSI index and return the same rows."""
    import shutil

    from exon_spark.sources.indexes import build_csi_vcf, read_csi

    gz, expected = big_vcf
    gz2 = tmp_path / "csi.vcf.gz"
    shutil.copy(gz, gz2)
    build_csi_vcf(str(gz2))
    idx = read_csi(str(gz2) + ".csi")
    assert idx.names == ("1", "2", "17")

    want = [p for p in expected["17"] if 1_000_000 <= p <= 2_000_000]
    df = (
        spark.read.format("vcf")
        .option("regions", "17:1000000-2000000")
        .load(str(gz2))
    )
    got = sorted(r.pos for r in df.select("pos").collect())
    assert got == want


def test_filter_pushdown_region_derivation(spark, tmp_path):
    """Opt-in DataFrame-API index pruning: with derive_regions=true and
    Spark's python filter pushdown enabled, chrom/pos filters prune like
    the regions option and return exactly the filtered rows; the residual
    predicate is never consumed, so values match the unpruned scan."""
    import os

    import pyspark.sql.functions as F

    from exon_spark.sources.bgzf import BGZFWriter
    from exon_spark.sources.indexes import build_tabix_vcf

    gz = str(tmp_path / "pd.vcf.gz")
    with BGZFWriter(gz) as w:
        w.write(b"##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for chrom in ("1", "2"):
            for i in range(1, 2001):
                w.write(f"{chrom}\t{i * 30}\t.\tA\tG\t50\tPASS\tDP={i}\n".encode())
    build_tabix_vcf(gz)
    old = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = (
            spark.read.format("vcf")
            .option("derive_regions", "true")
            .load(gz)
            .filter((F.col("chrom") == "2") & (F.col("pos") <= 30_000))
        )
        rows = df.collect()
        assert len(rows) == 1000
        assert all(r.chrom == "2" and r.pos <= 30_000 for r in rows)
        # without the option, filters are left alone (stateless pushFilters)
        df2 = spark.read.format("vcf").load(gz)
        assert df2.count() == 4000
        assert df2.filter(F.col("chrom") == "1").count() == 2000
        assert df2.count() == 4000  # sibling-query contamination guard
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", old)
