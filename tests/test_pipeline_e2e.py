"""End-to-end composition of the curation layer — the pipeline a real
training-data run chains: quality filter → language gate → near-dup
removal → benchmark decontamination → epoch mixing → sequence packing.

The per-operator oracles (q17-q46) prove each stage in isolation; this
test proves the stages COMPOSE: schemas line up stage to stage, filters
only ever shrink the doc set, the final packing covers exactly the
surviving docs, and the whole chain is deterministic under
repartitioning (no stage leaks partitioning- or RNG-dependence into the
next)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text", "lang", "source")
    )


def _run_pipeline(d):
    from exon_spark.operators import (
        decontaminate,
        dup_clusters,
        epoch_mix,
        lang_id,
        minhash_dedup,
        pack_sequences,
        quality_signals,
    )

    # 1. quality gate (Gopher-style repetition filters)
    q = quality_signals(d).filter("quality_pass").select("doc_id")
    d1 = d.join(q, "doc_id")

    # 2. language gate: keep docs the n-gram classifier calls English
    lang = lang_id(d1).filter(F.col("lang_guess") == "en").select("doc_id")
    d2 = d1.join(lang, "doc_id")

    # 3. near-dup removal: cluster minhash pairs, keep each cluster's min id
    pairs = minhash_dedup(d2, threshold=0.5)
    clusters = dup_clusters(pairs)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    d3 = d2.join(drop, "doc_id", "left_anti")

    # 4. decontamination against a fake eval set (a sample of the corpus
    #    itself guarantees hits exist)
    bench = d.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    d4 = d3.join(
        decontaminate(d3, bench).filter("not contaminated").select("doc_id"),
        "doc_id",
    )

    # 5. epoch mixing to target source weights
    mixed = epoch_mix(
        d4, {"src0": 0.5, "src1": 0.3, "src2": 0.2}, total_tokens=20_000
    )

    # 6. pack the kept docs (one copy each) into 512-token windows
    packed = pack_sequences(d4, seq_len=512, bucket_rows=32)
    return d1, d2, d3, d4, mixed, packed


def test_pipeline_stages_compose(spark, docs):
    d = docs
    d1, d2, d3, d4, mixed, packed = _run_pipeline(d)
    n0, n1, n2, n3, n4 = (x.count() for x in (d, d1, d2, d3, d4))
    # monotone shrink, and every stage keeps something at sf0.01
    assert n0 >= n1 >= n2 >= n3 >= n4 > 0
    # dedup actually dropped near-dups (the synthetic corpus plants them)
    assert n3 < n2
    # packing covers exactly the surviving docs, offsets within windows
    p = packed.toPandas()
    assert set(p.doc_id) == {r.doc_id for r in d4.select("doc_id").collect()}
    assert ((p.pack_offset >= 0) & (p.pack_offset < 512)).all()
    # every emitted mix row is a surviving doc
    assert mixed.join(d4, "doc_id", "left_anti").count() == 0


def test_pipeline_deterministic_under_repartition(spark, docs):
    _, _, _, d4a, mixa, packa = _run_pipeline(docs)
    _, _, _, d4b, mixb, packb = _run_pipeline(docs.repartition(7, "doc_id"))
    assert sorted(r.doc_id for r in d4a.select("doc_id").collect()) == sorted(
        r.doc_id for r in d4b.select("doc_id").collect()
    )
    assert sorted(map(tuple, mixa.collect())) == sorted(map(tuple, mixb.collect()))
    assert sorted(map(tuple, packa.collect())) == sorted(map(tuple, packb.collect()))
