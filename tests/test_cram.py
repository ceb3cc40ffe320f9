"""CRAM source tests — golden counts/rows from the reference's own fixtures
(exon_context_ext.rs:971-1012: test_input_1_a=15 rows, twolib=4, region
"1"=0; first rows pinned by cram-select-tests.slt)."""

from __future__ import annotations

import os

import pytest

BASE = "/root/reference/exon/exon-core/test-data/datasources"
CRAM1 = f"{BASE}/cram/test_input_1_a.cram"
CRAM_MAPPED = f"{BASE}/cram/0500_mapped.cram"
CE_FA = f"{BASE}/cram/ce.fa"
TWOLIB = f"{BASE}/two-cram/twolib.sorted.cram"
RAND1K = f"{BASE}/two-cram/rand1k.fa"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CRAM1), reason="reference fixtures absent"
)


@pytest.fixture(scope="module")
def registered(spark):
    from exon_spark import register_all

    register_all(spark)
    return spark


def test_cram_full_scan_golden_count(registered):
    df = registered.read.format("cram").load(CRAM1)
    assert df.count() == 15
    first = df.limit(1).collect()[0]
    assert (
        first.name, first.flag, first.reference, first.start, first.end,
        first.mapping_quality, first.cigar, first.mate_reference,
    ) == ("r000", 99, "insert", 50, 59, "30", "10M", "insert")
    assert [t.asDict() for t in first.tags] == [{"tag": "PG", "value": "bull"}]


def test_cram_with_fasta_reference(registered):
    df = (
        registered.read.format("cram")
        .option("fasta_reference", CE_FA)
        .load(CRAM_MAPPED)
    )
    rows = df.collect()
    assert (rows[0].name, rows[0].flag, rows[0].reference, rows[0].start,
            rows[0].end) == ("match", 99, "CHROMOSOME_I", 1000, 1099)


def test_cram_twolib_golden(registered):
    df = (
        registered.read.format("cram")
        .option("fasta_reference", RAND1K)
        .load(TWOLIB)
    )
    rows = df.orderBy("start").collect()
    assert len(rows) == 4
    r = rows[0]
    assert (r.name, r.flag, r.reference, r.start, r.end, r.mapping_quality,
            r.cigar, r.mate_reference) == (
        "read1-1", 0, "rand1k", 1, 60, "60", "60M", None)
    assert r.sequence == (
        "TCCTAATTCTGGGTAACCGCCGCCTGAAGCCAAAAAATAAGCCGGAGCCAAGGGGGAGTC"
    )
    assert r.quality_score == []
    assert [t.asDict() for t in r.tags] == [
        {"tag": "AS", "value": "60"},
        {"tag": "XS", "value": "0"},
    ]


def test_cram_region_absent_contig(registered):
    df = (
        registered.read.format("cram")
        .option("fasta_reference", RAND1K)
        .option("regions", "1")
        .load(TWOLIB)
    )
    assert df.count() == 0


def test_cram_region_crai_pruned(registered):
    df = (
        registered.read.format("cram")
        .option("fasta_reference", RAND1K)
        .option("regions", "rand1k:1-80")
        .load(TWOLIB)
    )
    names = sorted(r.name for r in df.collect())
    assert names == ["read1-1", "read1-2"]


def test_cram_missing_reference_errors(registered):
    df = (
        registered.read.format("cram")
        .option("fasta_reference", "/does/not/exist")
        .load(CRAM_MAPPED)
    )
    with pytest.raises(Exception, match="fasta_reference|not found"):
        df.collect()


def test_cram_parse_tags_struct(registered):
    df = (
        registered.read.format("cram")
        .option("parse_tags", "true")
        .load(CRAM1)
    )
    row = df.limit(1).collect()[0]
    assert row.tags.PG == "bull"


def test_cram_31_version_gate(tmp_path):
    """A CRAM 3.1 file must fail with the specific unsupported-version
    message (rANS-Nx16 / name-tokenizer codecs), not a cryptic codec
    error mid-decode."""
    from exon_spark.sources.cram import CramReader

    p = tmp_path / "v31.cram"
    p.write_bytes(b"CRAM\x03\x01" + bytes(20) + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match=r"CRAM 3\.1.*rANS-Nx16"):
        CramReader(str(p))
    # 3.0 passes the gate (and then fails later only on real parse issues)
    p30 = tmp_path / "v30.cram"
    p30.write_bytes(b"CRAM\x03\x00" + bytes(20) + b"\x00" * 64)
    try:
        CramReader(str(p30))
    except NotImplementedError:
        pytest.fail("3.0 must not hit the version gate")
    except Exception:
        pass  # truncated fixture: container parse may fail, gate must not
