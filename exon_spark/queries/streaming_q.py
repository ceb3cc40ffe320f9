"""Oracle-gated queries for the streaming + multimodal layers.

q29 runs a REAL Structured Streaming job (file source -> watermark ->
tumbling window -> memory sink, availableNow trigger) and the driver's
DuckDB oracle verifies the streamed aggregation value-for-value against a
batch SQL equivalent — the exactly-once/agg-parity property, gated.

q30 exercises the 1:N mapInPandas frame-sampling shape with a fully
SQL-expressible oracle (the stub sampler's arithmetic is deterministic).
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from exon_spark.queries.base import SUM_D, QuerySpec, table


# Per-process memo of the streamed-source parquet fixtures: the fixture is
# a pure function of (sf_dir, table, layout), so re-writing it on every
# call only added a parquet write to each timed bench run. The uuid tag
# still isolates concurrent processes.
_FIXTURE_MEMO: dict = {}


def _stream_fixture(spark: SparkSession, sf_dir: str, tname: str, shards: int) -> str:
    key = (sf_dir, tname, shards)
    d = _FIXTURE_MEMO.get(key)
    if d is not None and os.path.exists(os.path.join(d, "_SUCCESS")):
        return d
    tag = uuid.uuid4().hex[:8]
    d = os.path.join(tempfile.gettempdir(), f"exon_stream_{tname}_{tag}")
    table(spark, sf_dir, tname).repartition(shards).write.mode("overwrite").parquet(d)
    _FIXTURE_MEMO[key] = d
    return d


def _q29_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exon_spark.streaming import read_events_stream, run_stream_to_memory

    # unique memory-sink name per run: re-running the query in one
    # session must not collide with the previous run's sink table
    tag = uuid.uuid4().hex[:8]
    d = _stream_fixture(spark, sf_dir, "events", 4)
    stream = read_events_stream(spark, d)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # decimal-exact sum (see queries/base.py) — streaming partial
            # aggregation must not introduce FP order sensitivity vs the
            # oracle
            F.round(
                F.sum(F.round("value", 6).cast("decimal(38,10)")).cast("double"),
                4,
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return _sized_state_run(spark, agg, f"q29_{tag}")


def _sized_state_run(spark, df, name, output_mode="complete", partitions=8):
    """Run a bounded (availableNow) stream with the state shuffle sized to
    the workload: stateful operators create one state store per shuffle
    partition per micro-batch, so the session default of 32 means 32 store
    instances for a handful of keys — task overhead, not parallelism. At
    scale this knob is sized to key cardinality; restored after the run."""
    from exon_spark.streaming import run_stream_to_memory

    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(partitions))
    try:
        return run_stream_to_memory(df, name, output_mode=output_mode)
    finally:
        spark.conf.set(key, old)


Q29_ORACLE = f"""
select date_trunc('hour', ts) as window_start, event_type,
       count(*) as n_events,
       {SUM_D("value", "sum_value")}
from events
group by date_trunc('hour', ts), event_type
"""


def _q30_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exon_spark.operators import with_media_payload
    from exon_spark.operators.multimodal import sample_frames

    d = with_media_payload(table(spark, sf_dir, "documents"))
    return sample_frames(d, every_n=10).select(
        "media_id", "frame_idx", F.hex("frame").alias("frame_hex")
    )


# videos are doc_id % 3 == 2; payload = utf-8 text bytes;
# n_frames = n_bytes % 240 + 1, sampled every 10; frame f is the 16-byte
# slice starting at (f*16) % n_bytes (operators/multimodal.py sample_frames).
# DuckDB can't slice BLOBs, so both sides compare the hex encoding (2 hex
# chars per byte).
Q30_ORACLE = """
with v as (
  select doc_id as media_id, hex(encode(text)) as payload_hex,
         octet_length(encode(text)) as n_bytes
  from documents where doc_id % 3 = 2
),
f as (
  select media_id, payload_hex, n_bytes,
         unnest(range(0, n_bytes % 240 + 1, 10)) as frame_idx
  from v
)
select media_id, cast(frame_idx as int) as frame_idx,
       substring(payload_hex, ((frame_idx * 16) % greatest(n_bytes, 1)) * 2 + 1, 32) as frame_hex
from f
"""


def _q33_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup by content digest: documents stream in (4
    parquet shards, maxFilesPerTrigger=1 ⇒ four micro-batches under
    availableNow) and only first-seen content hashes pass — state carries
    seen keys ACROSS micro-batches (r11: the JVM dropDuplicates state
    store via streaming_dedup's auto engine; the pandas state engine is
    parity-pinned and serves the TTL variant). Output = the distinct
    digest set,
    deterministic regardless of arrival order, so it gates against a plain
    DISTINCT oracle; which physical row surfaced first is arrival-order
    dependent and deliberately not part of the gated output."""
    from exon_spark.streaming import run_stream_to_memory, streaming_dedup

    # unique memory-sink name per run: re-running the query in one
    # session must not collide with the previous run's sink table
    tag = uuid.uuid4().hex[:8]
    docs = table(spark, sf_dir, "documents")
    d = _stream_fixture(spark, sf_dir, "documents", 4)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .select(F.md5("text").alias("h"))
    )
    deduped = streaming_dedup(stream, key_cols=("h",))
    return _sized_state_run(spark, deduped, f"q33_{tag}", output_mode="append")


Q33_ORACLE = """
select distinct md5(text) as h from documents
"""


def _q39_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (funnel attribution): view events joined
    to purchase events by the same user within 30 minutes — two unbounded
    sources, watermark-bounded join state. Inner-join matches are emitted
    as they arrive, so the availableNow run is batch-complete and gates
    against the plain SQL interval self-join oracle."""
    from exon_spark.streaming import read_events_stream, streaming_interval_join

    # unique memory-sink name per run: re-running the query in one
    # session must not collide with the previous run's sink table
    tag = uuid.uuid4().hex[:8]
    d = _stream_fixture(spark, sf_dir, "events", 4)
    views = read_events_stream(spark, d).filter(F.col("event_type") == "view")
    buys = read_events_stream(spark, d).filter(
        F.col("event_type") == "purchase"
    )
    joined = streaming_interval_join(
        views, buys, key_col="user_id", within="30 minutes"
    ).select(
        F.col("user_id"),
        F.col("l_event_id").alias("view_id"),
        F.col("r_event_id").alias("purchase_id"),
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("lag_us"),
    )
    return _sized_state_run(spark, joined, f"q39_{tag}", output_mode="append")


Q39_ORACLE = """
select a.user_id, a.event_id as view_id, b.event_id as purchase_id,
       epoch_us(b.ts) - epoch_us(a.ts) as lag_us
from events a join events b
  on a.user_id = b.user_id
 and b.ts >= a.ts and b.ts <= a.ts + interval 30 minute
where a.event_type = 'view' and b.event_type = 'purchase'
"""


STREAMING_QUERIES: list[QuerySpec] = [
    QuerySpec(
        "q29_streaming_tumbling",
        _q29_spark,
        Q29_ORACLE,
        "Structured Streaming tumbling-window agg vs batch oracle",
    ),
    QuerySpec(
        "q30_multimodal_frames",
        _q30_spark,
        Q30_ORACLE,
        "mapInPandas 1:N frame sampling",
    ),
    QuerySpec(
        "q33_streaming_dedup",
        _q33_spark,
        Q33_ORACLE,
        "state-store first-seen dedup across micro-batches (JVM dropDuplicates engine)",
    ),
    QuerySpec(
        "q39_streaming_interval_join",
        _q39_spark,
        Q39_ORACLE,
        "stream-stream interval join (watermark-bounded state)",
    ),
]
