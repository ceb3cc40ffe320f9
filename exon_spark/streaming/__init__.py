"""Structured Streaming layer (beyond-parity: the reference is batch-only —
SURVEY.md §2.3 'streaming ops ABSENT'; this module is part of the repo's
training-data-pipeline north star, not reference parity).

The streaming operators mirror the batch event-analytics queries (q10/q11):
the same tumbling-window and session-window aggregations, expressed over an
unbounded ``readStream`` source with watermark-bounded state. At scale the
state store is the concern — watermarks bound it; session windows use
Spark's native ``session_window`` (state merges are handled by the engine,
not custom code).

All helpers return *unstarted* streaming DataFrames so callers choose the
sink/trigger; ``run_stream_to_memory`` is the test/debug sink.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import IntegerType, StructField, StructType

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """Unbounded parquet-directory source over the events table layout.
    New files appearing under ``path`` become micro-batches. Streaming
    sources cannot infer schemas, so when none is given we peek at the
    existing files with a batch read (driver-side, footer-only — the
    streaming analogue of the reference's first-file-wins header inference).
    ``ts`` may be stored NTZ; watermarks require TIMESTAMP — cast on read."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    df = spark.readStream.schema(schema).parquet(path)
    if dict(df.dtypes).get("ts") == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming face of q10: tumbling-window counts/sums per event_type.
    The watermark lets Spark finalize + evict window state once event time
    passes window_end + watermark — state is O(active windows), not O(input).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
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
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming face of q11: per-user sessions with an inactivity gap,
    via the native ``session_window`` (dynamic-gap state merging is the
    engine's job; late events beyond the watermark are dropped)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def _quiescent(last_progress, data_available: bool) -> bool:
    """True iff the last committed micro-batch is CONSISTENT with the
    availableNow stream being done emitting: zero input rows, no known
    output rows, and no data pending. A no-data batch WITH output
    (timer-driven emission) is not quiescent — more emitting batches may
    follow. A missing / unknown sink count (some sinks report -1) passes
    this check but is not PROOF of no output — the caller must pair it
    with :func:`_sink_count_known` and demand a second consecutive
    quiescent batch before breaking (r11 advice: treating unknown as
    zero re-opened the exact truncation class the output check was
    added to prevent)."""
    return (
        last_progress is not None
        and last_progress["numInputRows"] == 0
        and last_progress.get("sink", {}).get("numOutputRows", 0) <= 0
        and not data_available
    )


def _sink_count_known(last_progress) -> bool:
    """Whether the sink actually reported an output-row count (memory and
    most DSv2 sinks do; sinks that cannot report return -1 or omit the
    field)."""
    return last_progress.get("sink", {}).get("numOutputRows", -1) >= 0


def run_stream_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "complete",
    timeout_s: float = 3600.0,
):
    """Start the stream into an in-memory table, process everything
    currently available (``availableNow`` trigger), and return the result
    as a batch DataFrame. Test/debug helper — a production job would use a
    file/Kafka sink with a real trigger.

    Completion = ALL input available at start is committed, proven by
    either natural termination or a committed ZERO-input micro-batch
    with no data pending (micro-batches are sequential, so a 0-row
    batch means the source snapshot was exhausted when it planned).
    Two prior spellings were both wrong:

    * ``awaitTermination(120); stop()`` silently returned PARTIAL
      results when processing outran the clock (the r10 sf10 probe
      caught q33 passing 1 of 4 micro-batches through a correctness
      gate);
    * ``awaitTermination(3600)`` + raise-on-timeout assumed every
      availableNow stream self-terminates — false for timer-carrying
      state (``streaming_dedup(ttl_minutes=...)`` wires
      ProcessingTimeTimeout, and Spark keeps the query alive
      indefinitely running "no new data but cleaning up state"
      batches to fire evictions; ``processAllAvailable()`` blocks on
      those too). That turned one TTL test into a 1-hour stall.

    The zero-input break additionally requires the batch to have
    emitted ZERO output rows: a stateful operator that emits on timer
    expiry (or chained stateful operators propagating watermark-driven
    emission across several no-data batches) produces no-data batches
    WITH output, and breaking on the first of those would truncate the
    result — the same partial-output class this helper exists to
    prevent. Only a committed no-input, no-output batch with no data
    pending proves quiescence; pure state-eviction batches (e.g.
    ``streaming_dedup`` TTL removals) emit nothing and still break.

    A query that dies mid-run is surfaced via ``exception()``, never
    returned as a partial table; a stream still showing available
    data after ``timeout_s`` raises rather than returning partial
    output."""
    import time as _time

    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        deadline = _time.monotonic() + timeout_s
        # for sinks that cannot report output counts (numOutputRows -1 /
        # missing) one quiescent-looking batch is not proof — a timer
        # emission could have gone uncounted; require a SECOND consecutive
        # quiescent batch (a distinct batchId) before trusting it. The
        # memory sink used here always reports, so this path is for
        # callers that clone the loop onto other sinks.
        unknown_qbatch = None
        while q.isActive:
            lp = q.lastProgress
            if _quiescent(lp, q.status["isDataAvailable"]):
                if _sink_count_known(lp):
                    break  # no-input, ZERO-output batch committed
                bid = lp.get("batchId", -1)
                if unknown_qbatch is not None and bid > unknown_qbatch:
                    break  # two consecutive quiescent batches, no data
                if unknown_qbatch is None or bid > unknown_qbatch:
                    unknown_qbatch = bid
            else:
                unknown_qbatch = None
            if _time.monotonic() > deadline:
                raise TimeoutError(
                    f"availableNow stream {name!r} still has unprocessed "
                    f"input after {timeout_s}s — refusing to return "
                    "partial results"
                )
            _time.sleep(0.2)
        exc = q.exception()
        if exc is not None:
            raise exc
    finally:
        if q.isActive:
            q.stop()
    return stream_df.sparkSession.table(name)


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str] | tuple[str, ...] = ("key",),
    ttl_minutes: int | None = None,
    engine: str = "auto",
) -> DataFrame:
    """Streaming exact-dedup: emit only the FIRST row ever seen per key
    across the life of the stream; all later rows with the same key are
    dropped. The canonical training-data ingestion op — documents arrive
    continuously and only unseen content may pass.

    Custom stateful operator via ``applyInPandasWithState``: state per key
    is a single marker row (a handful of bytes), so total state is
    O(distinct keys), not O(input). With ``ttl_minutes`` set, keys idle
    longer than the TTL are evicted (ProcessingTimeTimeout) — dedup
    becomes "within a TTL horizon" and state is bounded for unbounded key
    spaces; leave it None for exact global dedup over a bounded key space
    (e.g. content digests of a finite corpus).

    Output rows surface at the micro-batch where the key first appears
    (append mode); within a batch one (arbitrary-but-deterministic
    per run) row per key wins. State shuffles by key exactly like a
    groupBy — skew-safe under AQE, scales with executors.

    ``engine`` picks the implementation. ``"native"`` is Spark's own
    state-store-backed ``dropDuplicates`` — identical first-seen-
    across-batches semantics, entirely JVM-side: no Python worker, no
    Arrow transfer, no per-key generator call. The pandas path pays
    ~one Python invocation PER KEY GROUP per batch — at 500k distinct
    digests that is 500k generator calls and the measured dominant cost
    of the sf10 board's q33 row — so ``"auto"`` (default) uses native
    whenever it can. Only ``ttl_minutes`` needs the ``"state"`` engine
    (``applyInPandasWithState`` with ProcessingTimeTimeout — built-in
    dropDuplicates has no processing-time TTL; its watermark variant
    bounds by EVENT time, a different contract).
    """
    if engine not in ("auto", "native", "state"):
        raise ValueError(
            f"engine must be 'auto', 'native' or 'state', got {engine!r}"
        )
    if engine == "auto":
        engine = "state" if ttl_minutes is not None else "native"
    if engine == "native":
        if ttl_minutes is not None:
            raise ValueError(
                "engine='native' has no processing-time TTL; use "
                "engine='state' for ttl_minutes"
            )
        return events.dropDuplicates(list(key_cols))
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = events.schema
    state_schema = StructType([StructField("seen", IntegerType())])
    ttl_ms = None if ttl_minutes is None else int(ttl_minutes * 60_000)
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def first_only(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            for _ in pdfs:  # drain; duplicates dropped
                pass
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)  # refresh TTL on activity
            return
        first = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.iloc[[0]]
        if first is not None:
            state.update((1,))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield first

    return events.groupBy(*[F.col(c) for c in key_cols]).applyInPandasWithState(
        first_only, out_schema, state_schema, "append", timeout
    )


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    within: str = "30 minutes",
    watermark: str = "2 hours",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream INNER join within an event-time interval: each left
    row matches right rows with the same key whose timestamp falls in
    [left.ts, left.ts + within] — funnel/attribution analytics (view →
    purchase, impression → click) over two unbounded streams.

    Both sides carry watermarks and the join condition bounds event time in
    both directions, so Spark derives state-eviction watermarks for BOTH
    buffers (state is O(events inside the watermark horizon), not O(stream)
    — without the time bound the engine would buffer a side forever).
    Matches emit as they arrive (inner join); the watermark only governs
    state cleanup, so an availableNow run produces the complete batch-equal
    result. Join state shuffles by key like a groupBy — skew-safe, scales
    with executors.

    Columns are prefixed (``l_``/``r_``) since both sides usually share a
    schema; the key column keeps one unprefixed copy.
    """
    lcols = [F.col(c).alias(f"{left_prefix}{c}") for c in left.columns]
    rcols = [F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    lk, rk = f"{left_prefix}{key_col}", f"{right_prefix}{key_col}"
    lts, rts = f"{left_prefix}{ts_col}", f"{right_prefix}{ts_col}"
    l = left.select(*lcols).withWatermark(lts, watermark)
    r = right.select(*rcols).withWatermark(rts, watermark)
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(rts) >= F.col(lts))
        & (F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {within}"))
    )
    return (
        l.join(r, cond, "inner")
        .withColumnRenamed(lk, key_col)
        .drop(rk)
    )
