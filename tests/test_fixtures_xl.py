"""Baseline-scale fixture generator: the inline (arithmetic) tabix/.bai
construction must agree with the re-reading builders, and indexed region
scans over the generated streams must return exactly the rows a full scan +
filter returns. Targets here are tiny; the shapes (multi-worker shards,
block-straddling records, worker-boundary chunks) are the same as at
2.6 GB."""

import json
import os

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def xl_dir(tmp_path_factory):
    from exon_spark.queries.fixtures_xl import gen_bam_xl, gen_vcf_xl

    root = str(tmp_path_factory.mktemp("xl"))
    gen_vcf_xl(root, 4_000_000, workers=4)
    gen_bam_xl(root, 2_000_000, workers=4)
    return root


def test_vcf_xl_tbi_matches_rebuilt_index(xl_dir):
    import shutil

    from exon_spark.sources.bgzf import BGZFReader
    from exon_spark.sources.indexes import (
        build_tabix_vcf,
        read_tabix,
        tabix_chunks,
    )

    gz = os.path.join(xl_dir, "variants.vcf.bgz")
    gz2 = os.path.join(xl_dir, "rebuilt.vcf.gz")
    shutil.copy(gz, gz2)
    build_tabix_vcf(gz2)
    ours = read_tabix(gz + ".tbi")
    rebuilt = read_tabix(gz2 + ".tbi")
    assert ours.names == rebuilt.names

    def rows(chunks):
        with BGZFReader(gz) as bg:
            return list(bg.lines_in_chunks(chunks))

    for region in ("chr1:1-100000", "chr17:1-2000000", "chr20", "chrX:59000000-60000000"):
        got = rows(tabix_chunks(ours, region))
        want = rows(tabix_chunks(rebuilt, region))
        assert got == want, region


def test_vcf_xl_indexed_scan_counts(spark, xl_dir):
    from exon_spark.sources import read_format

    stats = json.load(open(os.path.join(xl_dir, "vcf_stats.json")))
    gz = os.path.join(xl_dir, "variants.vcf.bgz")
    assert read_format(spark, "vcf", gz).count() == stats["rows"]
    assert (
        read_format(spark, "vcf", gz, regions="chr1").count()
        == stats["per_chrom"]["chr1"]
    )
    full = read_format(spark, "vcf", gz)
    want = full.filter(
        (F.col("chrom") == "chr17") & (F.col("pos") <= 2_000_000)
    ).count()
    got = read_format(spark, "vcf", gz, regions="chr17:1-2000000").count()
    assert got == want


def test_bam_xl_scan_counts_and_decode(spark, xl_dir):
    from exon_spark.sources import read_format

    stats = json.load(open(os.path.join(xl_dir, "bam_stats.json")))
    bam = os.path.join(xl_dir, "aln.bam")
    full = read_format(spark, "bam", bam)
    assert full.count() == stats["rows"]
    assert (
        read_format(spark, "bam", bam, regions="chr20").count()
        == stats["per_chrom"]["chr20"]
    )
    r = full.orderBy("name").first()
    assert r.name == "r00000000"
    assert r.cigar == "100M"
    assert len(r.sequence) == 100
    assert r.end == r.start + 99
