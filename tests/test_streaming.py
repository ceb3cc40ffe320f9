"""Structured Streaming operators: streaming results must agree with the
equivalent batch aggregation over the same files (the exactly-once story)."""

import os

import pyspark.sql.functions as F

from exon_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
    tumbling_event_counts,
)

SF = "/root/testdata/sf0.001"


def _events_dir(spark, tmp_path):
    """Copy the events table into a directory the stream can list (two
    files, so more than one input split arrives). ``table`` converts the
    nano-epoch ts column to a real timestamp on the way through."""
    from exon_spark.queries.base import table

    out = str(tmp_path / "events_stream")
    table(spark, SF, "events").repartition(2).write.parquet(out)
    return out


def test_tumbling_stream_matches_batch(spark, tmp_path):
    path = _events_dir(spark, tmp_path)
    stream = tumbling_event_counts(read_events_stream(spark, path))
    got = run_stream_to_memory(stream, "t_tumbling").orderBy(
        "window_start", "event_type"
    )
    batch = (
        spark.read.parquet(path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )
    assert got.collect() == batch.collect()


def test_session_stream_counts(spark, tmp_path):
    path = _events_dir(spark, tmp_path)
    stream = sessionize_stream(read_events_stream(spark, path))
    got = run_stream_to_memory(stream, "t_sessions")
    total = got.agg(F.sum("n_events")).collect()[0][0]
    n_input = spark.read.parquet(path).count()
    # every input event lands in exactly one session
    assert total == n_input
    # sessions respect the inactivity gap: no zero/negative-length overlap
    # per user (starts strictly increase past the previous end + gap)
    rows = got.orderBy("user_id", "session_start").collect()
    prev = {}
    for r in rows:
        if r.user_id in prev:
            assert r.session_start >= prev[r.user_id]
        prev[r.user_id] = r.session_end


def test_format_source_stream_incremental(spark, tmp_path):
    """spark.readStream.format('fastq'): files appearing under the
    directory become micro-batches; a checkpointed second run processes
    ONLY the new file (file-granular exactly-once)."""
    from exon_spark.sources import register_sources

    register_sources(spark)
    d = tmp_path / "stream_fastq"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_fq(name, ids):
        with open(d / name, "w") as fh:
            for i in ids:
                fh.write(f"@r{i} d\nACGT\n+\nIIII\n")

    write_fq("a.fastq", range(5))
    write_fq("b.fastq", range(5, 12))

    out = str(tmp_path / "out_parquet")

    def run_once():
        stream = spark.readStream.format("fastq").load(str(d))
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return spark.read.parquet(out)

    got1 = run_once()
    assert {r.name for r in got1.collect()} == {f"r{i}" for i in range(12)}

    # new file arrives; the checkpointed stream appends ONLY the delta —
    # names stay unique, proving files are not reprocessed
    write_fq("c.fastq", range(12, 15))
    got2 = run_once()
    names = [r.name for r in got2.collect()]
    assert len(names) == 15
    assert set(names) == {f"r{i}" for i in range(15)}


def test_streaming_dedup_first_seen_across_batches(spark, tmp_path):
    """applyInPandasWithState dedup: duplicate keys across micro-batches
    (maxFilesPerTrigger=1) are dropped; exactly one row per key surfaces,
    and it is the first-arriving file's row."""
    from exon_spark.streaming import run_stream_to_memory, streaming_dedup

    d = tmp_path / "docs_stream"
    d.mkdir()
    # file order is lexicographic for FileStreamSource at same mtime;
    # duplicates of keys a/b appear in the later file with different vals
    spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "k string, v int"
    ).coalesce(1).write.parquet(str(d / "f0"))
    spark.createDataFrame(
        [("a", 99), ("d", 4), ("b", 98)], "k string, v int"
    ).coalesce(1).write.parquet(str(d / "f1"))

    stream = (
        spark.readStream.schema("k string, v int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    out = run_stream_to_memory(
        streaming_dedup(stream, key_cols=("k",)), "sdedup_t", output_mode="append"
    )
    rows = {r.k: r.v for r in out.collect()}
    assert set(rows) == {"a", "b", "c", "d"}
    assert rows["c"] == 3 and rows["d"] == 4


def test_streaming_dedup_engines_agree(spark, tmp_path):
    """r11: the native engine (JVM dropDuplicates state store — the
    board path) and the pandas state engine must emit the same
    first-seen-across-batches key set with the same unique-key values;
    TTL demands the state engine (loud raise on native)."""
    import pytest

    from exon_spark.streaming import run_stream_to_memory, streaming_dedup

    d = tmp_path / "eng_stream"
    d.mkdir()
    spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "k string, v int"
    ).coalesce(1).write.parquet(str(d / "f0"))
    spark.createDataFrame(
        [("a", 99), ("d", 4), ("b", 98)], "k string, v int"
    ).coalesce(1).write.parquet(str(d / "f1"))

    outs = {}
    for engine in ("native", "state"):
        stream = (
            spark.readStream.schema("k string, v int")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d / "*"))
        )
        out = run_stream_to_memory(
            streaming_dedup(stream, key_cols=("k",), engine=engine),
            f"sdedup_eng_{engine}",
            output_mode="append",
        )
        outs[engine] = {r.k: r.v for r in out.collect()}
    assert set(outs["native"]) == set(outs["state"]) == {"a", "b", "c", "d"}
    # unique keys carry identical rows; duplicated keys keep the
    # first-arriving BATCH's value in both engines (state exists by the
    # time the second file's duplicates arrive)
    assert outs["native"] == outs["state"]
    assert outs["native"]["a"] == 1 and outs["native"]["b"] == 2

    with pytest.raises(ValueError, match="TTL"):
        streaming_dedup(
            spark.readStream.schema("k string, v int").parquet(str(d / "*")),
            key_cols=("k",),
            ttl_minutes=5,
            engine="native",
        )
    with pytest.raises(ValueError, match="engine"):
        streaming_dedup(
            spark.readStream.schema("k string, v int").parquet(str(d / "*")),
            key_cols=("k",),
            engine="bogus",
        )


def test_streaming_dedup_ttl_state_bound(spark, tmp_path):
    """ttl_minutes wires ProcessingTimeTimeout (state eviction) — the
    plumbing must run end-to-end; within one run keys still dedup.

    Also pins that the helper RETURNS PROMPTLY: a timer-carrying
    availableNow query never self-terminates (Spark schedules
    "no new data but cleaning up state" batches indefinitely to fire
    evictions), so an awaitTermination/processAllAvailable-based wait
    stalls until its deadline — the r10 session-2 regression that
    turned this one test into an hour-long hang."""
    import time

    from exon_spark.streaming import run_stream_to_memory, streaming_dedup

    d = tmp_path / "ttl_stream"
    d.mkdir()
    spark.createDataFrame(
        [("x", 1), ("x", 2), ("y", 3)], "k string, v int"
    ).coalesce(1).write.parquet(str(d / "f0"))
    stream = spark.readStream.schema("k string, v int").parquet(str(d / "*"))
    t0 = time.monotonic()
    out = run_stream_to_memory(
        streaming_dedup(stream, key_cols=("k",), ttl_minutes=5),
        "sdedup_ttl",
        output_mode="append",
    )
    elapsed = time.monotonic() - t0
    assert {r.k for r in out.collect()} == {"x", "y"}
    assert elapsed < 120, f"TTL stream wait took {elapsed:.0f}s — stalled"


def test_failing_stream_raises_not_partial(spark, tmp_path):
    """A stream that dies mid-run must surface its error, never return
    whatever the sink had — the same no-partial-results contract the
    sf10 probe enforced for slow streams (streaming/__init__.py)."""
    import pyspark.sql.functions as F
    import pytest

    from exon_spark.streaming import run_stream_to_memory

    d = tmp_path / "bad_stream"
    d.mkdir()
    spark.createDataFrame(
        [("a", 1), ("b", 2)], "k string, v int"
    ).coalesce(1).write.parquet(str(d / "f0"))
    bad = (
        spark.readStream.schema("k string, v int")
        .parquet(str(d / "*"))
        .withColumn(
            "boom",
            F.when(
                F.col("k") == "a", F.raise_error("planted failure")
            ).otherwise(F.lit("x")),
        )
    )
    with pytest.raises(Exception, match="planted failure|Query .* terminated"):
        run_stream_to_memory(bad, "sbad_t", output_mode="append")


def test_stateless_curation_operators_run_on_streams(spark, tmp_path):
    """The per-row curation operators (quality_signals, pii_stats,
    text_stats, lang_id, tfidf-free stages) are pure Column projections,
    so the SAME operator functions must work unchanged on a readStream
    DataFrame and produce batch-identical rows — the property that lets
    one curation codebase serve both backfill and ingest."""
    import pyspark.sql.functions as F

    from exon_spark.operators import lang_id, pii_stats, quality_signals, text_stats

    rows = [
        (1, "the cat and the dog and the cat sat", "en"),
        (2, "contact me at a@b.co or 555-123-4567 the end", "en"),
        (3, "el la de que y el la de que y", "es"),
    ]
    batch_df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    d = tmp_path / "stream_in"
    batch_df.coalesce(1).write.parquet(str(d / "b0"))

    stream = spark.readStream.schema("doc_id bigint, text string, lang string").parquet(
        str(d / "*")
    )
    for name, op in [
        ("quality", quality_signals),
        ("pii", pii_stats),
        ("stats", text_stats),
        ("lang", lang_id),
    ]:
        out = op(stream)
        q = (
            out.writeStream.format("memory")
            .queryName(f"cur_{name}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), f"{name}: stream did not finish"
        got = sorted(map(tuple, spark.sql(f"select * from cur_{name}").collect()))
        exp = sorted(map(tuple, op(batch_df).collect()))
        assert got == exp, name


def test_stateless_r9_operators_run_on_streams(spark, tmp_path):
    """r9 map-only operators on readStream inputs, as their docstrings
    claim: bloom_dedup_against (broadcast bitmap probe), pq_encode
    (codebook-closure UDF), and bpe/unigram segmentation (vocab-closure
    UDFs). The build/fit halves are batch-side by design."""
    from exon_spark.operators import (
        bloom_build,
        bloom_dedup_against,
        bpe_segment,
        bpe_train,
        pq_encode,
        pq_fit,
        unigram_segment,
        unigram_train,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "gamma delta beta")],
        "doc_id bigint, text string",
    )
    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0, -1.0, 0.5]) for i in range(8)],
        "vec_id bigint, embedding array<double>",
    )
    bf = bloom_build(docs, fpp=0.01)
    merges = bpe_train(docs, num_merges=10)
    uv = unigram_train(docs, vocab_size=20)
    cb = pq_fit(vecs, n_sub=2, k=4, iters=2)

    d = tmp_path / "r9_stream"
    docs.coalesce(1).write.parquet(str(d / "docs"))
    vecs.coalesce(1).write.parquet(str(d / "vecs"))
    doc_stream = spark.readStream.schema("doc_id bigint, text string").parquet(
        str(d / "docs")
    )
    vec_stream = spark.readStream.schema(
        "vec_id bigint, embedding array<double>"
    ).parquet(str(d / "vecs"))

    cases = [
        ("bloom", doc_stream, docs, lambda df: bloom_dedup_against(df, bf)),
        ("bpe", doc_stream, docs, lambda df: bpe_segment(df, merges)),
        ("uni", doc_stream, docs, lambda df: unigram_segment(df, uv)),
        ("pq", vec_stream, vecs, lambda df: pq_encode(df, cb)),
    ]
    for name, stream, batch, op in cases:
        q = (
            op(stream)
            .writeStream.format("memory")
            .queryName(f"r9_{name}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), f"{name}: stream did not finish"
        got = sorted(map(tuple, spark.sql(f"select * from r9_{name}").collect()))
        exp = sorted(map(tuple, op(batch).collect()))
        assert got == exp, name


def test_stateless_r8_operators_run_on_streams(spark, tmp_path):
    """Same pin for the late-r8 stateless ops: media_phash (HOF columns),
    quantize_embeddings (HOF columns), and filter_funnel's kept path
    (pure filters) run unchanged on readStream inputs. The stateful
    halves (nb fit/score aggs, the funnel report) are batch-side by
    design."""
    import pyspark.sql.functions as F

    from exon_spark.operators import (
        filter_funnel,
        media_phash,
        quantize_embeddings,
        with_media_payload,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "gamma delta epsilon", "de")],
        "doc_id bigint, text string, lang string",
    )
    d = tmp_path / "r8_stream"
    docs.coalesce(1).write.parquet(str(d / "b0"))
    stream = spark.readStream.schema(
        "doc_id bigint, text string, lang string"
    ).parquet(str(d / "*"))

    cases = [
        ("phash", lambda df: media_phash(with_media_payload(df))),
        (
            "funnel_kept",
            lambda df: filter_funnel(
                df, [("en_only", F.col("lang") == "en")]
            )[0],
        ),
        (
            "quant",
            lambda df: quantize_embeddings(
                df.select(
                    "doc_id",
                    F.array(
                        F.length("text").cast("float"), F.lit(1.0)
                    ).alias("embedding"),
                )
            ),
        ),
    ]
    for name, op in cases:
        q = (
            op(stream)
            .writeStream.format("memory")
            .queryName(f"r8_{name}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), f"{name}: stream did not finish"
        got = sorted(map(tuple, spark.sql(f"select * from r8_{name}").collect()))
        exp = sorted(map(tuple, op(docs).collect()))
        assert got == exp, name


def test_quiescence_predicate():
    """Pin the availableNow wait-loop break invariant (r11, ADVICE r10):
    only a committed zero-input, zero-OUTPUT batch with no data pending
    is quiescent. A no-data batch that still emits rows (timer-driven
    emission from a stateful operator) must NOT break the wait — that
    is exactly the partial-output class run_stream_to_memory guards."""
    from exon_spark.streaming import _quiescent

    # no progress yet → keep waiting
    assert not _quiescent(None, False)
    # data batch → keep waiting
    assert not _quiescent({"numInputRows": 10, "sink": {"numOutputRows": 10}}, False)
    # zero-input batch that EMITS (timer expiry) → keep waiting
    assert not _quiescent({"numInputRows": 0, "sink": {"numOutputRows": 3}}, False)
    # zero-input, zero-output, but source says more data → keep waiting
    assert not _quiescent({"numInputRows": 0, "sink": {"numOutputRows": 0}}, True)
    # the one true break: committed no-input no-output batch, nothing pending
    assert _quiescent({"numInputRows": 0, "sink": {"numOutputRows": 0}}, False)
    # sinks that report unknown (-1) or omit the count: quiescent-LOOKING,
    # but _sink_count_known distinguishes proof from absence of evidence —
    # the wait loop demands a second consecutive quiescent batch for these
    # (r12, ADVICE r11: unknown-as-zero re-opened the truncation class)
    from exon_spark.streaming import _sink_count_known

    assert _quiescent({"numInputRows": 0, "sink": {"numOutputRows": -1}}, False)
    assert _quiescent({"numInputRows": 0}, False)
    assert _sink_count_known({"numInputRows": 0, "sink": {"numOutputRows": 0}})
    assert _sink_count_known({"sink": {"numOutputRows": 17}})
    assert not _sink_count_known({"numInputRows": 0, "sink": {"numOutputRows": -1}})
    assert not _sink_count_known({"numInputRows": 0, "sink": {}})
    assert not _sink_count_known({"numInputRows": 0})
