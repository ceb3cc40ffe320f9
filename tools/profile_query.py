"""Profile one declared query: run it to the noop sink, then dump the
per-stage time/shuffle breakdown from the local Spark UI REST API.

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_query.py q40_dedup_incremental [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from exon_spark import get_spark
    from exon_spark.queries import ALL_QUERIES

    spark = get_spark(app_name=f"profile-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    spec = ALL_QUERIES[name]

    first_stage_of_last_run = 0
    for i in range(runs):
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)
        if i == runs - 1:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages"
            ) as r:
                seen = json.load(r)
            first_stage_of_last_run = (
                max((s["stageId"] for s in seen), default=-1) + 1
            )
        t0 = time.perf_counter()
        spec.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"run {i}: {time.perf_counter() - t0:.3f}s")

    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    done = [
        s
        for s in stages
        if s["status"] == "COMPLETE" and s["stageId"] >= first_stage_of_last_run
    ]
    done.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    total_rt = sum(s.get("executorRunTime") or 0 for s in done)
    total_cpu = sum(s.get("executorCpuTime") or 0 for s in done)
    print(f"total executorCpuTime {total_cpu/1e9:.1f} core-s (steal-robust)")
    wall = sum(
        (s.get("completionTime") is not None) and 1 or 0 for s in done
    )
    total_spill = sum(s.get("diskBytesSpilled") or 0 for s in done)
    print(f"total diskBytesSpilled {total_spill/1e6:.0f} MB")
    print(f"\n{len(done)} stages, total executorRunTime {total_rt/1000:.1f}s (core-seconds)")
    print(f"{'rt(s)':>7} {'cpu(s)':>7} {'shR(MB)':>8} {'shW(MB)':>8} {'in(MB)':>8} {'spl(MB)':>8} {'tasks':>5}  stage / site")
    for s in done[:24]:
        rt = (s.get("executorRunTime") or 0) / 1000
        cpu = (s.get("executorCpuTime") or 0) / 1e9
        shr = (s.get("shuffleReadBytes") or 0) / 1e6
        shw = (s.get("shuffleWriteBytes") or 0) / 1e6
        inb = (s.get("inputBytes") or 0) / 1e6
        spl = (s.get("diskBytesSpilled") or 0) / 1e6
        nt = s.get("numCompleteTasks") or 0
        desc = (s.get("description") or s.get("name") or "")[:90]
        site = ""
        for line in (s.get("details") or "").splitlines():
            if "exon_spark" in line or "pipeline.py" in line:
                site = line.strip()[:70]
                break
        print(f"{rt:7.2f} {cpu:7.2f} {shr:8.1f} {shw:8.1f} {inb:8.1f} {spl:8.1f} {nt:5d}  {desc[:60]} | {site}")

    # task-level detail for the slowest stages: where does rt-cpu go?
    for s in done[:4]:
        sid = s["stageId"]
        url = (
            f"{ui}/api/v1/applications/{app_id}/stages/{sid}"
            f"?withSummaries=true&quantiles=0.5,1.0"
        )
        try:
            with urllib.request.urlopen(url) as r:
                det = json.load(r)
        except Exception as e:
            print(f"stage {sid}: detail fetch failed: {e}")
            continue
        det = det[0] if isinstance(det, list) else det
        q = det.get("taskMetricsDistributions") or {}
        if not q:
            print(f"stage {sid}: no task metric distributions")
            continue

        def pair(key):
            v = q.get(key) or [0, 0]
            return f"{v[0]/1000:.2f}/{v[-1]/1000:.2f}"

        print(
            f"stage {sid} ({s.get('numCompleteTasks')} tasks) med/max s: "
            f"duration {pair('duration')} cpu(ns) {[round(x/1e9,2) for x in (q.get('executorCpuTime') or [0,0])]} "
            f"deser {pair('executorDeserializeTime')} "
            f"sched {pair('schedulerDelay')} gc {pair('jvmGcTime')} "
            f"fetch {pair('shuffleReadMetrics' in q and 'fetchWaitTime' or 'fetchWaitTime')}"
        )
        srm = q.get("shuffleReadMetrics") or {}
        if srm:
            fw = srm.get("fetchWaitTime") or [0, 0]
            print(f"   fetchWait med/max s: {fw[0]/1000:.2f}/{fw[-1]/1000:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
