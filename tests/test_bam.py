"""BAM decoder + .bai indexed-scan tests (pure-Python BAM path)."""

from __future__ import annotations

import random

import pytest


@pytest.fixture(scope="module")
def bam_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("bam")
    sam = root / "small.sam"
    sam.write_text(
        "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:100000\n@SQ\tSN:chr17\tLN:100000\n"
        "r1\t0\tchr1\t100\t60\t4M\t=\t200\t100\tACGT\tIIII\tNM:i:0\tMD:Z:4\n"
        "r2\t4\t*\t0\t255\t*\t*\t0\t0\tGGTT\t####\n"
        "r3\t16\tchr17\t200\t30\t2M1D2M\t*\t0\t0\tACGT\tII#I\n"
    )
    from exon_spark.sources.bam import sam_to_bam

    bam = root / "small.bam"
    sam_to_bam(str(sam), str(bam))

    # larger file for index tests
    rng = random.Random(7)
    lines = ["@HD\tVN:1.6", "@SQ\tSN:chr1\tLN:5000000", "@SQ\tSN:chr17\tLN:5000000"]
    expected = {}
    for chrom in ("chr1", "chr17"):
        positions = sorted(rng.sample(range(1, 4_999_000), 3000))
        expected[chrom] = positions
        for i, pos in enumerate(positions):
            lines.append(
                f"{chrom}_{i}\t0\t{chrom}\t{pos}\t60\t10M\t*\t0\t0\t"
                "ACGTACGTAC\tIIIIIIIIII"
            )
    big_sam = root / "big.sam"
    big_sam.write_text("\n".join(lines) + "\n")
    big_bam = root / "big.bam"
    sam_to_bam(str(big_sam), str(big_bam))
    from exon_spark.sources.indexes import build_bai

    build_bai(str(big_bam))
    return root, expected


def test_bam_matches_sam(spark, bam_files):
    root, _ = bam_files
    sam_df = spark.read.format("sam").load(str(root / "small.sam"))
    bam_df = spark.read.format("bam").load(str(root / "small.bam"))
    sam_rows = sorted(sam_df.collect(), key=lambda r: r["name"] or "")
    bam_rows = sorted(bam_df.collect(), key=lambda r: r["name"] or "")
    assert len(sam_rows) == len(bam_rows) == 3
    for s, b in zip(sam_rows, bam_rows):
        for col in (
            "name",
            "flag",
            "reference",
            "start",
            "end",
            "mapping_quality",
            "cigar",
            "sequence",
            "quality_score",
        ):
            assert s[col] == b[col], f"{s['name']}.{col}: {s[col]} != {b[col]}"
    r1 = {r["name"]: r for r in bam_rows}["r1"]
    assert {t["tag"]: t["value"] for t in r1["tags"]} == {"NM": "0", "MD": "4"}


def test_bam_indexed_region(spark, bam_files):
    root, expected = bam_files
    region = "chr17:1000000-2000000"
    df = (
        spark.read.format("bam")
        .option("regions", region)
        .load(str(root / "big.bam"))
    )
    got = sorted(r["start"] for r in df.collect())
    want = [
        p for p in expected["chr17"] if p <= 2_000_000 and p + 9 >= 1_000_000
    ]
    assert got == want
    assert df.rdd.getNumPartitions() == 1


def test_bam_full_scan_count(spark, bam_files):
    root, expected = bam_files
    df = spark.read.format("bam").load(str(root / "big.bam"))
    assert df.count() == len(expected["chr1"]) + len(expected["chr17"])


def test_bam_region_without_index_falls_back(spark, bam_files, tmp_path):
    root, expected = bam_files
    import shutil

    noidx = tmp_path / "noindex.bam"
    shutil.copy(root / "big.bam", noidx)
    df = (
        spark.read.format("bam")
        .option("regions", "chr1:1-100000")
        .load(str(noidx))
    )
    want = [p for p in expected["chr1"] if p <= 100_000]
    assert sorted(r["start"] for r in df.collect()) == want


def test_bam_csi_fallback(spark, bam_files, tmp_path):
    """samtools `index -c` layout: only a .csi beside the BAM. Convert the
    .bai to an equivalent CSI (same bins at min_shift=14/depth=5) and check
    the region scan prunes through it identically."""
    import shutil
    import struct

    from exon_spark.sources.bgzf import BGZFWriter
    from exon_spark.sources.indexes import read_bai

    root, expected = bam_files
    csi_bam = tmp_path / "csionly.bam"
    shutil.copy(root / "big.bam", csi_bam)
    bai = read_bai(str(root / "big.bam") + ".bai")
    payload = bytearray(b"CSI\x01")
    payload += struct.pack("<iii", 14, 5, 0)
    payload += struct.pack("<i", len(bai.bins))
    for rid in range(len(bai.bins)):
        payload += struct.pack("<i", len(bai.bins[rid]))
        for bin_id in sorted(bai.bins[rid]):
            chunks = bai.bins[rid][bin_id]
            payload += struct.pack("<IQi", bin_id, 0, len(chunks))
            for cb, ce in chunks:
                payload += struct.pack("<QQ", cb, ce)
    with BGZFWriter(str(csi_bam) + ".csi") as out:
        out.write(bytes(payload))

    df = (
        spark.read.format("bam")
        .option("regions", "chr17:1000000-2000000")
        .load(str(csi_bam))
    )
    got = sorted(r["start"] for r in df.collect())
    want = [
        p for p in expected["chr17"] if p <= 2_000_000 and p + 9 >= 1_000_000
    ]
    assert got == want
    # full scan through the csi-only layout (r5: .csi loffsets also drive
    # the full-scan range split; this index's zero loffsets degrade to one
    # partition, which must still count correctly)
    n_all = sum(len(v) for v in expected.values())
    assert spark.read.format("bam").load(str(csi_bam)).count() == n_all
