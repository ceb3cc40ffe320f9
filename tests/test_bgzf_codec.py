"""JVM splittable BGZF codec (exon_spark/jvm) + exoncat region views.

The codec's split contract (pos lags one block; first partial line of a
non-zero split is skipped) must yield every text line exactly once for ANY
split size — exercised adversarially: tiny blocks (lines spanning many
blocks), blank lines, long lines, split sizes from 1 KB to 128 MB.
"""

import os
import random

import pyspark.sql.functions as F
import pytest

from exon_spark.sources.bgzf import BGZF_EOF, bgzf_block


@pytest.fixture(scope="module")
def adversarial_bgz(tmp_path_factory):
    random.seed(7)
    lines = []
    for i in range(20000):
        n = random.choice([0, 1, 5, 30, 200, 1500])
        lines.append(f"{i}|" + "x" * n)
    text = ("\n".join(lines) + "\n").encode()
    path = str(tmp_path_factory.mktemp("bgz") / "t.bgz")
    with open(path, "wb") as fh:
        off = 0
        while off < len(text):
            n = random.choice([37, 100, 511, 4096, 65000])
            fh.write(bgzf_block(text[off : off + n]))
            off += n
        fh.write(BGZF_EOF)
    return path, lines


@pytest.mark.parametrize("mpb", ["1000", "77777", "134217728"])
def test_codec_split_exactness(spark, adversarial_bgz, mpb):
    path, lines = adversarial_bgz
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        got = [r.value for r in spark.read.text(path).collect()]
        assert got == lines
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_codec_is_splittable(spark, adversarial_bgz):
    path, _ = adversarial_bgz
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
        nparts = spark.read.text(path).rdd.getNumPartitions()
        assert nparts > 4, "BGZF file did not byte-range split"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_vcf_region_jvm_matches_python_source(spark):
    from exon_spark.queries.formats import ensure_format_fixtures
    from exon_spark.sources.jvm_fast import read_vcf_region_jvm

    fx = ensure_format_fixtures("/root/testdata/sf0.01")
    vcf = os.path.join(fx, "variants.vcf.bgz")
    for region in ("chr1", "chr17:1-2000000", "chr1:5000000-90000000"):
        py = spark.read.format("vcf").option("regions", region).load(vcf)
        jvm = read_vcf_region_jvm(spark, vcf, region)
        assert jvm.columns == py.columns
        assert jvm.schema == py.schema
        assert jvm.exceptAll(py).count() == 0
        assert py.exceptAll(jvm).count() == 0
        assert jvm.count() == py.count()


def test_vcf_region_routing(spark):
    from exon_spark.queries.formats import ensure_format_fixtures
    from exon_spark.sources.jvm_fast import _vcf_region_jvm_route

    fx = ensure_format_fixtures("/root/testdata/sf0.01")
    vcf = os.path.join(fx, "variants.vcf.bgz")
    # whole-chromosome: large index span -> JVM codec path
    assert _vcf_region_jvm_route(vcf, {"regions": "chr1"}) is not None
    # small region: chunk pruning dominates -> Python tabix path
    assert _vcf_region_jvm_route(vcf, {"regions": "chr17:1-2000000"}) is None
    # Python-only parse options never route to the JVM path
    assert (
        _vcf_region_jvm_route(vcf, {"regions": "chr1", "parse_info": "true"})
        is None
    )


def test_region_view_projection_plan(spark):
    """The 3-column projection must stay inside whole-stage codegen with no
    Python eval nodes and no Generate (lean substring_index path)."""
    from exon_spark.queries.formats import ensure_format_fixtures
    from exon_spark.sources.jvm_fast import read_vcf_region_jvm

    fx = ensure_format_fixtures("/root/testdata/sf0.01")
    vcf = os.path.join(fx, "variants.vcf.bgz")
    df = read_vcf_region_jvm(spark, vcf, "chr1", columns="chrom,pos,id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Generate" not in plan
    assert "*(1)" in plan  # the '*' prefix marks WholeStageCodegen spans
    # index pruning: the scan reads an exoncat:// view, not the raw file
    assert "exoncat" in plan
