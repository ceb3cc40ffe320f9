"""Bloom-filter incremental dedup: no-false-negative contract, measured
fpp against the theoretical bound, serialization round-trip, incremental
add_batch, and the zero-shuffle plan pin for the probe side."""

import numpy as np
import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bloom_no_false_negatives(spark):
    from exon_spark.operators import bloom_build, bloom_dedup_against

    index = _docs(spark, [(i, f"indexed document number {i}") for i in range(2000)])
    bf = bloom_build(index, fpp=0.01)
    # every indexed text must flag — zero misses is the hard guarantee
    out = bloom_dedup_against(index, bf).where("NOT maybe_dup")
    assert out.count() == 0


def test_bloom_fpp_within_bound(spark):
    from exon_spark.operators import bloom_build, bloom_dedup_against

    index = _docs(spark, [(i, f"indexed document number {i}") for i in range(5000)])
    fresh = _docs(spark, [(i, f"totally new text {i}") for i in range(5000)])
    bf = bloom_build(index, fpp=0.01)
    fp = bloom_dedup_against(fresh, bf).where("maybe_dup").count()
    # measured false-positive rate stays near the design point
    assert fp / 5000 < 0.03
    # the filter is sized to capacity, not saturated
    assert 0.2 < bf.fill_ratio < 0.6


def test_bloom_mixed_batch_and_nulls(spark):
    from exon_spark.operators import bloom_build, bloom_dedup_against

    index = _docs(spark, [(i, f"seen {i}") for i in range(100)])
    bf = bloom_build(index, fpp=0.001)
    batch = _docs(
        spark,
        [(0, "seen 42"), (1, "never seen before xyzzy"), (2, None)],
    )
    rows = {
        r["doc_id"]: r["maybe_dup"]
        for r in bloom_dedup_against(batch, bf).collect()
    }
    assert rows[0] is True
    assert rows[2] is False  # null text is never a duplicate
    # doc 1 is almost surely False at fpp=0.001; tolerate the fp


def test_bloom_serialization_round_trip(spark):
    from exon_spark.operators import BloomFilter, bloom_build

    index = _docs(spark, [(i, f"doc {i}") for i in range(500)])
    bf = bloom_build(index, fpp=0.01)
    bf2 = BloomFilter.from_bytes(bf.to_bytes())
    assert bf2.m == bf.m and bf2.k == bf.k and bf2.n_items == bf.n_items
    assert np.array_equal(bf2.bits, bf.bits)
    with pytest.raises(ValueError, match="magic"):
        BloomFilter.from_bytes(b"junkjunkjunk" * 10)


def test_bloom_save_load(spark, tmp_path, monkeypatch):
    """Persist-state convention (r9-verdict order): save/load round-trip
    through the Hadoop FS route and the no-session local fallback, and
    a loaded filter still proves membership (no false negatives)."""
    from pyspark.sql import SparkSession

    from exon_spark.operators import BloomFilter, bloom_build, bloom_dedup_against

    index = _docs(spark, [(i, f"doc {i}") for i in range(500)])
    bf = bloom_build(index, fpp=0.01)
    p = str(tmp_path / "corpus.bloom")
    bf.save(p)
    bf2 = BloomFilter.load(p)
    assert np.array_equal(bf2.bits, bf.bits) and bf2.m == bf.m and bf2.k == bf.k
    flags = bloom_dedup_against(index, bf2).select("maybe_dup").collect()
    assert all(r[0] for r in flags)  # every indexed doc still flagged

    monkeypatch.setattr(SparkSession, "getActiveSession", classmethod(lambda c: None))
    p2 = str(tmp_path / "corpus_local.bloom")
    bf.save(p2)
    assert open(p, "rb").read() == open(p2, "rb").read()
    assert np.array_equal(BloomFilter.load(p2).bits, bf.bits)


def test_bloom_add_batch_incremental(spark):
    from exon_spark.operators import (
        bloom_add_batch,
        bloom_build,
        bloom_dedup_against,
    )

    first = _docs(spark, [(i, f"wave one {i}") for i in range(300)])
    second = _docs(spark, [(i, f"wave two {i}") for i in range(300)])
    bf = bloom_build(first, fpp=0.01, num_items=600)  # pre-sized for both
    assert bloom_dedup_against(second, bf).where("maybe_dup").count() < 20
    bf2 = bloom_add_batch(bf, second)
    assert bloom_dedup_against(second, bf2).where("NOT maybe_dup").count() == 0
    # original filter unchanged (add_batch is functional)
    assert bloom_dedup_against(second, bf).where("maybe_dup").count() < 20


def test_bloom_probe_plan_is_map_only(spark):
    from exon_spark.operators import bloom_build, bloom_dedup_against

    index = _docs(spark, [(i, f"doc {i}") for i in range(50)])
    bf = bloom_build(index, fpp=0.01)
    plan = bloom_dedup_against(_docs(spark, [(1, "x")]), bf)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffle on the probe side


def test_bloom_matches_exact_antijoin_on_true_dups(spark):
    from exon_spark.operators import bloom_build, bloom_dedup_against

    index = _docs(spark, [(i, f"corpus text {i}") for i in range(1000)])
    batch = _docs(
        spark,
        [(i, f"corpus text {i * 3}" if i % 2 == 0 else f"fresh {i}") for i in range(200)],
    )
    bf = bloom_build(index, fpp=0.01)
    flagged = set(
        r["doc_id"]
        for r in bloom_dedup_against(batch, bf).where("maybe_dup").collect()
    )
    truth = set(
        r["doc_id"]
        for r in batch.join(index.select("text"), "text", "left_semi").collect()
    )
    # flagged is a superset of the exact-join truth (no false negatives)
    assert truth <= flagged


def test_bloom_incremental_streaming_ingestion(spark, tmp_path):
    """The standing-pipeline pattern: a stream of accepted batches keeps
    the front-door filter current via foreachBatch + bloom_add_batch;
    after the stream drains, every streamed text must flag as seen."""
    from exon_spark.operators import (
        bloom_build,
        bloom_dedup_against,
        bloom_add_batch,
    )

    d = tmp_path / "accepted"
    b0 = _docs(spark, [(i, f"wave zero {i}") for i in range(50)])
    b1 = _docs(spark, [(i, f"wave one {i}") for i in range(50)])
    b0.coalesce(1).write.parquet(str(d / "b0"))
    b1.coalesce(1).write.parquet(str(d / "b1"))

    seed = _docs(spark, [(0, "seed doc")])
    state = {"bf": bloom_build(seed, fpp=0.01, num_items=200)}

    def absorb(batch_df, _batch_id):
        state["bf"] = bloom_add_batch(state["bf"], batch_df)

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(
        str(d / "*")
    )
    q = (
        stream.writeStream.foreachBatch(absorb)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    bf = state["bf"]
    everything = b0.unionByName(b1).unionByName(seed)
    missed = bloom_dedup_against(everything, bf).where("NOT maybe_dup").count()
    assert missed == 0
