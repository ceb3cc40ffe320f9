"""Source-format tests over generated fixture files (mirrors the reference's
slt corpus + golden-count integration tests, SURVEY.md §5)."""

from __future__ import annotations

import gzip

import pytest


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    root = tmp_path_factory.mktemp("fixtures")

    fasta = root / "test.fasta"
    fasta.write_text(
        ">seq1 first sequence\nATCGATCG\nGGCC\n>seq2\nTTTTAAAA\n>seq3 third\nATGATGATG\n"
    )
    (root / "test.fasta.fai").write_text(
        # name, length, offset(first base), linebases, linewidth
        "seq1\t12\t21\t8\t9\nseq2\t8\t41\t8\t9\nseq3\t18\t62\t9\t10\n"
    )
    with gzip.open(root / "test_gz.fasta.gz", "wt") as fh:
        fh.write(">g1 gz\nACGT\n>g2\nGGTT\n")

    part = root / "fasta_part"
    for sample in ("1", "2"):
        d = part / f"sample={sample}"
        d.mkdir(parents=True)
        (d / "part.fasta").write_text(f">p{sample}\nACGTAC\n")

    fastq = root / "test.fastq"
    fastq.write_text(
        "@r1 desc here\nACGT\n+\n#$%I\n@r2\nGGTTAA\n+\nIIIIII\n"
    )

    gff = root / "test.gff"
    gff.write_text(
        "##gff-version 3\n"
        "chr1\ttest\tgene\t100\t200\t.\t+\t.\tID=gene1;Name=g1,g1b\n"
        "chr1\ttest\texon\t120\t180\t0.5\t+\t0\tID=exon1;Parent=gene1\n"
        "chr2\t.\tCRISPR\t50\t150\t.\t-\t.\tID=cr1\n"
    )

    gtf = root / "test.gtf"
    gtf.write_text(
        'chr1\thavana\tgene\t100\t200\t.\t+\t.\tgene_id "g1"; gene_name "X";\n'
        'chr1\thavana\texon\t120\t180\t1.0\t+\t0\tgene_id "g1"; transcript_id "t1";\n'
    )

    bed = root / "test.bed"
    bed.write_text("chr1\t10\t100\tfeat1\t960\t+\nchr2\t20\t200\tfeat2\t500\t-\n")

    hmm = root / "test.hmmdomtab"
    hmm.write_text(
        "# comment\n"
        "t1 ACC1 100 q1 QACC1 250 1e-10 55.3 0.1 1 2 1e-9 1e-8 54.0 0.1 "
        "1 90 5 95 4 96 0.9 some description here\n"
    )

    vcf = root / "test.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">\n'
        '##INFO=<ID=AF,Number=A,Type=Float,Description="Freq">\n'
        '##INFO=<ID=DB,Number=0,Type=Flag,Description="dbSNP">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        "1\t100\trs1\tA\tT\t50.0\tPASS\tDP=10;AF=0.5;DB\tGT\t0/1\n"
        "1\t200\t.\tC\tG,T\t.\tq10;s50\tDP=7\tGT\t1/1\n"
        "2\t300\trs2;rs3\tG\t.\t99.9\tPASS\tAF=0.1,0.2\tGT\t0/0\n"
    )

    sam = root / "test.sam"
    sam.write_text(
        "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:1000\n"
        "r1\t0\tchr1\t100\t60\t4M\t=\t0\t0\tACGT\tIIII\tNM:i:0\tMD:Z:4\n"
        "r2\t4\t*\t0\t255\t*\t*\t0\t0\tGGTT\t####\n"
        "r3\t16\tchr1\t200\t30\t2M1D2M\t*\t0\t0\tACGT\tII#I\n"
    )
    return root


def test_fasta_basic(spark, fixtures):
    df = spark.read.format("fasta").load(str(fixtures / "test.fasta"))
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {"seq1", "seq2", "seq3"}
    assert rows["seq1"]["sequence"] == "ATCGATCGGGCC"
    assert rows["seq1"]["description"] == "first sequence"
    assert rows["seq2"]["description"] is None


def test_fasta_gzip(spark, fixtures):
    df = spark.read.format("fasta").load(str(fixtures / "test_gz.fasta.gz"))
    assert df.count() == 2


def test_fasta_partition_columns(spark, fixtures):
    df = spark.read.format("fasta").load(str(fixtures / "fasta_part"))
    assert "sample" in df.columns
    got = {(r["id"], r["sample"]) for r in df.collect()}
    assert got == {("p1", "1"), ("p2", "2")}


def test_fasta_fai_region(spark, fixtures):
    df = (
        spark.read.format("fasta")
        .option("regions", "seq1:3-6")
        .load(str(fixtures / "test.fasta"))
    )
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["sequence"] == "CGAT"  # bases 3-6 of ATCGATCGGGCC
    whole = (
        spark.read.format("fasta")
        .option("regions", "seq2")
        .load(str(fixtures / "test.fasta"))
    ).collect()
    assert whole[0]["sequence"] == "TTTTAAAA"


def test_fastq(spark, fixtures):
    df = spark.read.format("fastq").load(str(fixtures / "test.fastq"))
    rows = {r["name"]: r for r in df.collect()}
    assert rows["r1"]["quality_scores"] == "#$%I"
    assert rows["r1"]["description"] == "desc here"
    assert rows["r2"]["sequence"] == "GGTTAA"


def test_fastq_vectorized_matches_row_path(spark, tmp_path):
    """The Arrow fast path must be value-identical to the readline parser
    across CRLF, blank lines, quality lines starting '@', and gzip."""
    import gzip as _gzip

    body = []
    for i in range(3000):
        desc = f" read {i}" if i % 3 == 0 else ""
        qual = "@" + "I" * 9 if i % 7 == 0 else "#" * 10  # '@'-led quality
        body.append(f"@r{i}{desc}\r\nACGTACGTAA\r\n+\r\n{qual}\r\n")
        if i % 500 == 0:
            body.append("\r\n")  # stray blank line
    text = "".join(body)
    plain = tmp_path / "a.fastq"
    plain.write_text(text)
    gz = tmp_path / "b.fastq.gz"
    with _gzip.open(gz, "wt") as fh:
        fh.write(text)

    from exon_spark.sources.base import FilePartition, read_partition_batches
    from exon_spark.sources.fastq import FastqSource

    df = spark.read.format("fastq").load(str(plain))
    rows = df.collect()
    assert len(rows) == 3000
    byname = {r["name"]: r for r in rows}
    assert byname["r0"]["description"] == "read 0"
    assert byname["r7"]["quality_scores"].startswith("@")
    assert byname["r1"]["description"] is None
    # row path (parse_partition) must agree value-for-value
    import pyarrow as pa

    part = FilePartition(str(plain), "none", ())
    slow = list(
        FastqSource.parse_partition(part, {})
    )
    assert len(slow) == 3000
    assert slow[0]["name"] == "r0" and slow[0]["description"] == "read 0"
    fast_rows = [r.asDict() for r in rows]
    assert sorted(fast_rows, key=lambda r: r["name"]) == sorted(
        slow, key=lambda r: r["name"]
    )
    gz_rows = spark.read.format("fastq").load(str(gz)).collect()
    assert sorted(r["name"] for r in gz_rows) == sorted(r["name"] for r in rows)


def test_gff(spark, fixtures):
    from exon_spark.sources import read_format

    df = read_format(spark, "gff", str(fixtures / "test.gff"))
    rows = {r["type"]: r for r in df.collect()}
    assert rows["gene"]["start"] == 100 and rows["gene"]["end"] == 200
    assert rows["gene"]["attributes"]["Name"] == ["g1", "g1b"]
    assert rows["exon"]["score"] == pytest.approx(0.5)
    assert rows["exon"]["phase"] == "0"
    assert rows["CRISPR"]["source"] is None
    assert rows["CRISPR"]["strand"] == "-"


def test_gtf(spark, fixtures):
    from exon_spark.sources import read_format

    df = read_format(spark, "gtf", str(fixtures / "test.gtf"))
    rows = df.collect()
    assert rows[0]["attributes"]["gene_id"] == "g1"
    assert rows[1]["attributes"]["transcript_id"] == "t1"
    assert rows[1]["frame"] == "0"


def test_bed(spark, fixtures):
    from exon_spark.sources import read_format

    df = read_format(spark, "bed", str(fixtures / "test.bed"), n_fields=6)
    rows = df.collect()
    assert rows[0]["reference_sequence_name"] == "chr1"
    assert rows[0]["score"] == 960
    assert "thick_start" not in df.columns  # schema width = n_fields


def test_hmmdomtab(spark, fixtures):
    from exon_spark.sources import read_format

    df = read_format(spark, "hmm_dom_tab", str(fixtures / "test.hmmdomtab"))
    r = df.collect()[0]
    assert r["target_name"] == "t1"
    assert r["evalue"] == pytest.approx(1e-10)
    assert r["description"] == "some description here"


def test_vcf_flat(spark, fixtures):
    df = spark.read.format("vcf").load(str(fixtures / "test.vcf"))
    rows = {r["pos"]: r for r in df.collect()}
    assert rows[100]["id"] == ["rs1"]
    assert rows[100]["qual"] == pytest.approx(50.0)
    assert rows[200]["alt"] == ["G", "T"]
    assert rows[200]["qual"] is None
    assert rows[200]["filter"] == ["q10", "s50"]
    assert rows[300]["id"] == ["rs2", "rs3"]
    assert rows[100]["info"] == "DP=10;AF=0.5;DB"


def test_vcf_parse_info(spark, fixtures):
    df = (
        spark.read.format("vcf")
        .option("parse_info", "true")
        .load(str(fixtures / "test.vcf"))
    )
    rows = {r["pos"]: r for r in df.collect()}
    assert rows[100]["info"]["DP"] == 10
    assert rows[100]["info"]["AF"] == [pytest.approx(0.5)]
    assert rows[100]["info"]["DB"] is True
    assert rows[200]["info"]["DP"] == 7
    assert rows[200]["info"]["AF"] is None
    assert rows[300]["info"]["AF"] == [pytest.approx(0.1), pytest.approx(0.2)]


def test_vcf_region_fallback_filter(spark, fixtures):
    df = (
        spark.read.format("vcf")
        .option("regions", "1:150-250")
        .load(str(fixtures / "test.vcf"))
    )
    rows = df.collect()
    assert [r["pos"] for r in rows] == [200]


def test_sam(spark, fixtures):
    df = spark.read.format("sam").load(str(fixtures / "test.sam"))
    rows = {r["name"]: r for r in df.collect()}
    assert rows["r1"]["flag"] == 0
    assert rows["r1"]["start"] == 100 and rows["r1"]["end"] == 103
    assert rows["r1"]["quality_score"] == [40, 40, 40, 40]
    assert {t["tag"]: t["value"] for t in rows["r1"]["tags"]} == {
        "NM": "0",
        "MD": "4",
    }
    assert rows["r2"]["reference"] is None and rows["r2"]["start"] is None
    assert rows["r3"]["end"] == 204  # 2M1D2M consumes 5 reference bases


def test_write_fasta_roundtrip(spark, fixtures, tmp_path):
    from exon_spark.sinks import write_fasta

    df = spark.read.format("fasta").load(str(fixtures / "test.fasta"))
    out = tmp_path / "out_fasta"
    write_fasta(df, str(out), single_file=True)
    back = spark.read.format("fasta").option("file_extension", "txt").load(str(out))
    assert sorted(r["id"] for r in back.collect()) == ["seq1", "seq2", "seq3"]
    orig = {r["id"]: r["sequence"] for r in df.collect()}
    got = {r["id"]: r["sequence"] for r in back.collect()}
    assert orig == got


def test_copy_sql(spark, fixtures, tmp_path):
    from exon_spark.sinks import maybe_handle_copy

    spark.read.format("fastq").load(str(fixtures / "test.fastq")).createOrReplaceTempView(
        "fq"
    )
    out = tmp_path / "copy_out"
    res = maybe_handle_copy(
        spark, f"COPY (SELECT * FROM fq) TO '{out}' STORED AS FASTQ"
    )
    assert res.collect()[0]["count"] == 2
    back = spark.read.format("fastq").option("file_extension", "txt").load(str(out))
    assert back.count() == 2
    assert maybe_handle_copy(spark, "SELECT 1") is None


def test_copy_jsonl_round_trip(spark, tmp_path):
    import gzip
    import json
    import os

    from exon_spark.sinks import maybe_handle_copy

    spark.createDataFrame(
        [(1, "alpha", 0.5), (2, "beta", None)], "doc_id bigint, text string, w double"
    ).createOrReplaceTempView("jd")
    out = tmp_path / "docs_jsonl"
    res = maybe_handle_copy(
        spark, f"COPY (SELECT * FROM jd) TO '{out}' STORED AS JSONL"
    )
    assert res.collect()[0]["count"] == 2
    back = spark.read.json(str(out))
    assert back.count() == 2
    assert {r["text"] for r in back.collect()} == {"alpha", "beta"}
    # raw payload is one JSON object per line (jsonl, not a JSON array)
    lines = [
        ln
        for f in os.listdir(out)
        if f.startswith("part-") and f.endswith(".json")
        for ln in open(os.path.join(out, f)).read().splitlines()
        if ln
    ]
    assert len(lines) == 2
    assert all(json.loads(ln)["doc_id"] in (1, 2) for ln in lines)
    # extension inference + gzip option
    out2 = tmp_path / "docs.jsonl"
    maybe_handle_copy(
        spark, f"COPY jd TO '{out2}' OPTIONS(compression 'gzip')"
    )
    # 2 rows spread over N partitions: most part files are empty, and
    # listdir order is arbitrary — read every gz part, keep real lines
    gz_lines = [
        ln
        for f in sorted(os.listdir(out2))
        if f.endswith(".json.gz")
        for ln in gzip.open(os.path.join(out2, f), "rt").read().splitlines()
        if ln
    ]
    assert len(gz_lines) == 2
    assert all(json.loads(ln)["text"] in ("alpha", "beta") for ln in gz_lines)


def test_vcf_parse_formats(spark, fixtures, tmp_path):
    vcf = tmp_path / "fmt.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="Likelihoods">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\n"
        "1\t100\t.\tA\tT\t10\tPASS\t.\tGT:PL\t0/1:0,3,26\t1/1:.\n"
    )
    df = (
        spark.read.format("vcf").option("parse_formats", "true").load(str(vcf))
    )
    row = df.collect()[0]
    assert len(row.formats) == 2
    assert row.formats[0].GT == "0/1"
    assert row.formats[0].PL == [0, 3, 26]
    assert row.formats[1].GT == "1/1"
    assert row.formats[1].PL is None


def test_columns_projection_option(spark, fixtures):
    df = (
        spark.read.format("fasta")
        .option("columns", "id,sequence")
        .load(str(fixtures / "test.fasta"))
    )
    assert df.columns == ["id", "sequence"]
    assert df.count() == 3
    # nested types survive the DDL split
    vdf = (
        spark.read.format("vcf")
        .option("columns", "chrom,alt")
        .load(str(fixtures / "test.vcf"))
    )
    assert vdf.columns == ["chrom", "alt"]
    assert vdf.schema["alt"].dataType.simpleString() == "array<string>"


def test_write_fasta_zstd_roundtrip(spark, fixtures, tmp_path):
    """zstd sink (reference: COPY ... OPTIONS(compression 'zstd')) writes
    through pyarrow's codec — the JVM has no zstd text codec here."""
    from exon_spark.sinks import maybe_handle_copy, write_fasta

    df = spark.read.format("fasta").load(str(fixtures / "test.fasta"))
    out = tmp_path / "out_fasta_zst"
    write_fasta(df, str(out), compression="zstd")
    back = spark.read.format("fasta").load(str(out))
    assert {r["id"]: r["sequence"] for r in back.collect()} == {
        r["id"]: r["sequence"] for r in df.collect()
    }

    df.createOrReplaceTempView("fa_z")
    single = tmp_path / "single.fasta.zst"
    res = maybe_handle_copy(
        spark,
        f"COPY (SELECT * FROM fa_z) TO '{single}' STORED AS FASTA "
        "OPTIONS(compression 'zstd')",
    )
    assert res.collect()[0]["count"] == df.count()
    back1 = spark.read.format("fasta").load(str(single))
    assert back1.count() == df.count()


def test_fasta_vectorized_byte_ranges(spark, tmp_path):
    """The Arrow fast path (fasta.py read_arrow_partition) must produce
    exactly the row-path records under adversarial byte-range splits:
    boundaries landing mid-record, mid-header, and exactly on '>'."""
    import random

    rng = random.Random(9)
    path = tmp_path / "big.fasta"
    want = {}
    with open(path, "w") as fh:
        for i in range(10000):
            seq = "".join(rng.choice("ACDEFGHIKLMNPQRSTVWY") for _ in range(rng.randint(30, 900)))
            desc = f"desc {i}" if i % 3 else None
            fh.write(f">s{i}{' ' + desc if desc else ''}\n")
            for j in range(0, len(seq), 60):
                fh.write(seq[j : j + 60] + "\n")
            want[f"s{i}"] = (desc, seq)
    # target_parallelism high enough that the 1 MB floor forces several
    # splits over this ~1.5 MB file
    df = (
        spark.read.format("fasta")
        .option("target_parallelism", "64")
        .load(str(path))
    )
    assert df.rdd.getNumPartitions() > 1, "file must actually split"
    rows = df.collect()
    assert len(rows) == 10000
    for r in rows:
        desc, seq = want[r["id"]]
        assert r["description"] == desc
        assert r["sequence"] == seq


def test_fasta_vectorized_matches_row_path(spark, tmp_path):
    """Same file through the vectorized Arrow path and the generic row
    path (integer encode disables vectorization) must agree on count and
    ids."""
    path = tmp_path / "mix.fasta"
    with open(path, "w") as fh:
        for i in range(50):
            fh.write(f">q{i} d{i}\nACGT\nACGT\n")
    vec = spark.read.format("fasta").load(str(path))
    row = (
        spark.read.format("fasta")
        .option("sequence_data_type", "integer_encode_dna")
        .load(str(path))
    )
    assert vec.count() == row.count() == 50
    assert {r.id for r in vec.collect()} == {r.id for r in row.collect()}


def test_fasta_vectorized_gzip_framing(spark, tmp_path):
    """Arrow fast path must also serve gzip whole-file partitions
    (decompress + same framing), matching the JVM reader."""
    import gzip as _gzip

    p = tmp_path / "z.fasta.gz"
    with _gzip.open(p, "wt") as fh:
        for i in range(200):
            fh.write(f">z{i} d{i}\nAC\nGT\n")
    df = spark.read.format("fasta").load(str(p))
    rows = df.collect()
    assert len(rows) == 200
    assert all(r.sequence == "ACGT" for r in rows)


def test_fasta_zstd_scan(spark, tmp_path):
    """zstd FASTA via pyarrow's bundled codec (no zstandard package):
    vectorized framing must match the plain read."""
    import pyarrow as pa

    plain = ">a one\nACGT\nTT\n>b\nGG\n" * 100
    p = tmp_path / "z.fasta.zst"
    with pa.CompressedOutputStream(str(p), "zstd") as out:
        out.write(plain.encode())
    df = spark.read.format("fasta").load(str(p))
    rows = df.collect()
    assert len(rows) == 200
    assert {r.sequence for r in rows} == {"ACGTTT", "GG"}
