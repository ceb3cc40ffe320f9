"""Object-store layer tests (exon_spark.sources.fs).

The reference reads every format from local FS or S3/GCS through the
object_store crate (SURVEY.md §2.1). Here:

* S3Handler is unit-tested against a stubbed boto3 client (no network) —
  ranged GETs, prefix listing, head/exists;
* the full remote plumbing (scheme routing, listing, sidecar index
  existence, BGZF virtual-offset chunk reads in executors) runs end-to-end
  through the ``mock://`` scheme, which resolves against a local root via
  $EXON_SPARK_MOCK_FS_ROOT — an env var local-mode executors inherit.
"""

from __future__ import annotations

import gzip
import os

import pytest

from exon_spark.sources.fs import (
    MockFsHandler,
    S3Handler,
    fs_exists,
    fs_getsize,
    fs_open,
    scheme_of,
)


class _FakeBody:
    def __init__(self, data: bytes):
        self._data = data

    def read(self) -> bytes:
        return self._data


class _FakeS3Client:
    """Implements the 3 boto3 calls S3Handler makes."""

    def __init__(self, objects: dict[str, bytes]):
        self.objects = objects  # "bucket/key" -> bytes
        self.get_calls: list[str] = []

    def head_object(self, Bucket, Key):
        data = self.objects.get(f"{Bucket}/{Key}")
        if data is None:
            raise KeyError(Key)
        return {"ContentLength": len(data)}

    def get_object(self, Bucket, Key, Range):
        # Range: "bytes=start-endInclusive"
        start, end = Range[len("bytes=") :].split("-")
        self.get_calls.append(Range)
        data = self.objects[f"{Bucket}/{Key}"]
        return {"Body": _FakeBody(data[int(start) : int(end) + 1])}

    def get_paginator(self, name):
        assert name == "list_objects_v2"
        objects = self.objects

        class _P:
            def paginate(self, Bucket, Prefix):
                contents = [
                    {"Key": k.split("/", 1)[1], "Size": len(v)}
                    for k, v in sorted(objects.items())
                    if k.startswith(f"{Bucket}/") and k.split("/", 1)[1].startswith(Prefix)
                ]
                return [{"Contents": contents}]

        return _P()


@pytest.fixture()
def s3():
    payload = bytes(range(256)) * 100
    client = _FakeS3Client(
        {
            "bkt/data/a.fasta": b">s1\nACGT\n",
            "bkt/data/lang=en/b.fasta": b">s2\nGGCC\n",
            "bkt/big.bin": payload,
        }
    )
    return S3Handler(client=client), client


def test_scheme_of():
    assert scheme_of("/tmp/x.fa") is None
    assert scheme_of("file:///tmp/x.fa") is None
    assert scheme_of("s3://bkt/k.fa") == "s3"
    assert scheme_of("mock://dir/k.fa") == "mock"


def test_s3_exists_getsize(s3):
    h, _ = s3
    assert h.exists("s3://bkt/data/a.fasta")
    assert not h.exists("s3://bkt/data/missing")
    assert h.getsize("s3://bkt/big.bin") == 25600


def test_s3_ranged_open(s3):
    h, client = s3
    with h.open("s3://bkt/big.bin") as fh:
        fh.seek(1000)
        assert fh.read(4) == bytes([232, 233, 234, 235])
        fh.seek(-4, os.SEEK_END)
        assert fh.read() == bytes([252, 253, 254, 255])
    # buffered: the two reads issued ranged GETs, not whole-object GETs
    assert all(r.startswith("bytes=") for r in client.get_calls)


def test_s3_list_prefix_and_exact(s3):
    h, _ = s3
    exact = h.list("s3://bkt/data/a.fasta")
    assert [(f.path, f.size) for f in exact] == [("s3://bkt/data/a.fasta", 9)]
    under = h.list("s3://bkt/data")
    assert sorted(f.path for f in under) == [
        "s3://bkt/data/a.fasta",
        "s3://bkt/data/lang=en/b.fasta",
    ]


def test_list_files_remote_hive_partitions(s3, monkeypatch):
    from exon_spark.sources import fs as fsmod
    from exon_spark.sources.util import list_files

    h, _ = s3
    monkeypatch.setitem(fsmod._HANDLERS, "s3", h)
    found = list_files("s3://bkt/data", ("fasta",))
    by_path = {f.path: f for f in found}
    assert by_path["s3://bkt/data/lang=en/b.fasta"].partition_values == {"lang": "en"}
    assert by_path["s3://bkt/data/a.fasta"].partition_values == {}
    pruned = list_files("s3://bkt/data", ("fasta",), {"lang": "en"})
    assert [f.path for f in pruned] == ["s3://bkt/data/lang=en/b.fasta"]


def test_mock_handler_matches_local(tmp_path, monkeypatch):
    p = tmp_path / "x.txt.gz"
    with gzip.open(p, "wb") as fh:
        fh.write(b"hello\nworld\n")
    monkeypatch.setenv("EXON_SPARK_MOCK_FS_ROOT", str(tmp_path))
    assert fs_exists("mock://x.txt.gz")
    assert not fs_exists("mock://missing")
    assert fs_getsize("mock://x.txt.gz") == os.path.getsize(p)
    with gzip.GzipFile(fileobj=fs_open("mock://x.txt.gz")) as fh:
        assert fh.read() == b"hello\nworld\n"
    lst = MockFsHandler().list("mock://")
    assert [f.path for f in lst] == ["mock://x.txt.gz"]


# ---------------------------------------------------------------- end-to-end
# conftest sets EXON_SPARK_MOCK_FS_ROOT=/ before the session launches
# (workers inherit the JVM env captured at gateway start), so
# mock://<abs-path-minus-leading-slash> addresses any local fixture.


def _mock(path: str) -> str:
    return "mock://" + str(path).lstrip("/")


def test_remote_vcf_region_scan(spark):
    """Index-pruned region scan over mock:// — .tbi read driver-side through
    the handler, BGZF chunk ranges fetched executor-side via ranged reads —
    must equal the same scan over the local path."""
    from exon_spark.queries.formats import ensure_format_fixtures
    from exon_spark.sources import read_format

    fx = ensure_format_fixtures("/root/testdata/sf0.01")
    vcf = os.path.join(fx, "variants.vcf.bgz")
    local = read_format(spark, "vcf", vcf, regions="chr17:1-2000000")
    remote = read_format(spark, "vcf", _mock(vcf), regions="chr17:1-2000000")
    assert remote.count() == local.count() > 0


def test_remote_fasta_and_bam(spark):
    from exon_spark.queries.formats import ensure_format_fixtures
    from exon_spark.sources import read_format

    fx = ensure_format_fixtures("/root/testdata/sf0.01")
    fasta = os.path.join(fx, "prot.fasta")
    local_n = read_format(spark, "fasta", fasta).count()
    assert read_format(spark, "fasta", _mock(fasta)).count() == local_n
    bam = os.path.join(fx, "aln.bam")
    local_bam = read_format(spark, "bam", bam, regions="chr20").count()
    remote_bam = read_format(spark, "bam", _mock(bam), regions="chr20").count()
    assert remote_bam == local_bam > 0


def test_remote_tabular_gff(spark, tmp_path):
    from exon_spark.sources import read_format

    gff = tmp_path / "feat.gff"
    gff.write_text(
        "chr1\tsrc\tgene\t100\t200\t.\t+\t.\tID=g1;Name=G1\n"
        "chr1\tsrc\texon\t120\t180\t0.5\t-\t0\tID=e1\n"
    )
    local = read_format(spark, "gff", str(gff))
    remote = read_format(spark, "gff", _mock(gff))
    assert remote.count() == local.count() == 2
    assert [r.type for r in remote.orderBy("start").collect()] == ["gene", "exon"]
