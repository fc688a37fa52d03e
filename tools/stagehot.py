"""Stage-level hotspot detector: find low-parallelism hot stages.

For each query, runs once to warm (codegen + caches), then measures a
second execution and reports its top stages by executor run time with
task counts and max task duration.  Flags the r9 pattern: a stage
whose inputs are byte-tiny (so AQE coalesces to 1-2 partitions) but
whose work is row-explosive or CPU-dense — seconds of runtime on one
task while 31 cores idle.  Wall-noise-resistant: stage attribution and
task counts are deterministic; durations rank, they don't gate.

Usage:
    python tools/stagehot.py [--sf DIR] [--top N] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from axolotls_spark import cacheutil
from axolotls_spark.queries import REGISTRY
from axolotls_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--top", type=int, default=3)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("axolotls-spark-stagehot", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    ui = sc.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    aid = apps[0]["id"]

    REGISTRY["q1_pricing_summary"].fn(spark, args.sf).write.format(
        "noop").mode("overwrite").save()
    cacheutil.release_caches()
    spark.catalog.clearCache()

    out: dict[str, list] = {}
    for name in args.queries:
        # Warm run: codegen compile + footer caches, not measured.
        REGISTRY[name].fn(spark, args.sf).write.format("noop").mode(
            "overwrite").save()
        cacheutil.release_caches()
        spark.catalog.clearCache()
        before = set(tracker.getJobIdsForGroup(None))
        sc.setJobDescription(f"stagehot: {name}")
        REGISTRY[name].fn(spark, args.sf).write.format("noop").mode(
            "overwrite").save()
        sc.setJobDescription(None)
        new_jobs = [j for j in tracker.getJobIdsForGroup(None)
                    if j not in before]
        sids: set[int] = set()
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            if info:
                sids.update(info.stageIds)
        stages = json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{aid}/stages?status=complete"))
        rows = []
        for s in stages:
            if s["stageId"] not in sids:
                continue
            rows.append({
                "stage": s["stageId"],
                "run_ms": s.get("executorRunTime", 0),
                "cpu_ms": round(s.get("executorCpuTime", 0) / 1e6),
                "tasks": s.get("numCompleteTasks", s.get("numTasks", 0)),
                "name": s.get("name", "")[:50],
            })
        rows.sort(key=lambda r: -r["run_ms"])
        total = sum(r["run_ms"] for r in rows)
        out[name] = {"total_run_ms": total, "hot": rows[: args.top]}
        print(json.dumps({name: out[name]}), flush=True)
        cacheutil.release_caches()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
