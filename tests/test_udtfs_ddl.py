"""SQL surface tests: scan UDTFs + CREATE TABLE ... USING <format> DDL
(parity with the reference's table-valued functions and external tables)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    root = tmp_path_factory.mktemp("sqlsurface")
    (root / "t.fasta").write_text(">a one\nACGT\n>b\nGGCC\nTT\n")
    (root / "t.fastq").write_text("@r1\nACGT\n+\nIIII\n")
    (root / "t.gff").write_text(
        "chr1\tsrc\tgene\t10\t50\t.\t+\t.\tID=g1\n"
        "chr1\tsrc\texon\t60\t90\t.\t+\t.\tID=e1\n"
        "chr2\tsrc\tgene\t10\t50\t.\t-\t.\tID=g2\n"
    )
    (root / "t.vcf").write_text(
        "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "1\t100\t.\tA\tT\t50\tPASS\tDP=3\n"
        "2\t200\t.\tC\tG\t60\tPASS\tDP=4\n"
    )
    return root


def test_fasta_scan_udtf(spark, files):
    rows = spark.sql(
        f"SELECT id, sequence FROM fasta_scan('{files}/t.fasta') ORDER BY id"
    ).collect()
    assert [(r["id"], r["sequence"]) for r in rows] == [("a", "ACGT"), ("b", "GGCCTT")]


def test_fasta_scan_in_join(spark, files):
    n = spark.sql(
        f"""SELECT count(*) c FROM fasta_scan('{files}/t.fasta') f
            JOIN fastq_scan('{files}/t.fastq') q ON f.sequence = q.sequence"""
    ).collect()[0]["c"]
    assert n == 1


def test_gff_scan_and_indexed(spark, files):
    rows = spark.sql(f"SELECT * FROM gff_scan('{files}/t.gff')").collect()
    assert len(rows) == 3
    assert rows[0]["attributes"]["ID"] == ["g1"]
    pruned = spark.sql(
        f"SELECT type FROM gff_indexed_scan('{files}/t.gff', 'chr1:1-55')"
    ).collect()
    assert [r["type"] for r in pruned] == ["gene"]


def test_vcf_scan_and_indexed(spark, files):
    assert spark.sql(f"SELECT * FROM vcf_scan('{files}/t.vcf')").count() == 2
    rows = spark.sql(
        f"SELECT pos FROM vcf_indexed_scan('{files}/t.vcf', '1:1-150')"
    ).collect()
    assert [r["pos"] for r in rows] == [100]


def test_create_external_table_ddl(spark, files):
    """Reference syntax: CREATE EXTERNAL TABLE x STORED AS FASTA LOCATION p
    (exon_context_ext.rs:683-697). Intercepted by ExonSession.sql because
    Spark's catalog read path drops Python-DataSource options."""
    from exon_spark import ExonSession

    x = ExonSession(spark)
    x.sql(
        f"CREATE EXTERNAL TABLE fasta_tbl STORED AS FASTA LOCATION '{files}/t.fasta'"
    )
    got = spark.sql(
        "SELECT id, length(sequence) AS n FROM fasta_tbl ORDER BY id"
    ).collect()
    assert [(r["id"], r["n"]) for r in got] == [("a", 4), ("b", 6)]
    # domain functions compose over the table
    rc = spark.sql(
        "SELECT reverse_complement(sequence) rc FROM fasta_tbl WHERE id='a'"
    ).collect()[0]["rc"]
    assert rc == "ACGT"[::-1].translate(str.maketrans("ACGT", "TGCA"))


def test_create_table_using_with_options(spark, files):
    from exon_spark import ExonSession

    x = ExonSession(spark)
    x.sql(f"CREATE TABLE gff_tbl USING gff OPTIONS (path '{files}/t.gff')")
    assert spark.sql("SELECT count(*) c FROM gff_tbl").collect()[0]["c"] == 3


def test_register_exon_table_helper(spark, files):
    from exon_spark import ExonSession

    x = ExonSession(spark)
    x.register_exon_table("my_gff", str(files / "t.gff"), "gff")
    assert spark.sql("SELECT count(*) c FROM my_gff").collect()[0]["c"] == 3
