"""Deterministic per-query cost probe: Spark job/stage/task counts.

Wall-clock on this box is throttle-noisy (identical code measures
2x apart minutes later); job, stage and task counts for one action
are deterministic, so A/B comparisons of plan-shape optimizations
use THIS harness when the box is in an unknown thermal state
(OPTIMIZATION_r08.md "measurement hazard").

Usage:
    python tools/jobcount.py [--sf SF_DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from axolotls_spark import cacheutil
from axolotls_spark.queries import REGISTRY
from axolotls_spark.session import get_spark


def _stage_metrics(spark) -> dict[int, dict]:
    """stageId -> {cpu_ms, run_ms, shuffle_mb} from the UI REST API.

    executorCpuTime is on-CPU nanoseconds — far less sensitive to the
    box's burst-credit throttle than wall-clock, so it is the tiebreak
    metric when job/task counts alone cannot rank two plan shapes.
    """
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return {}
    try:
        apps = _json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10)
        )
        app_id = apps[0]["id"]
        stages = _json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
                timeout=30,
            )
        )
    except Exception:
        return {}
    out = {}
    for s in stages:
        out[s["stageId"]] = {
            "cpu_ms": s.get("executorCpuTime", 0) / 1e6,
            "run_ms": s.get("executorRunTime", 0),
            "shuffle_mb": (
                s.get("shuffleReadBytes", 0) + s.get("shuffleWriteBytes", 0)
            )
            / 1e6,
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("axolotls-spark-jobcount", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    out: dict[str, dict[str, int]] = {}
    for name in args.queries:
        before_jobs = set(tracker.getJobIdsForGroup(None))
        spark.sparkContext.setJobDescription(f"jobcount: {name}")
        REGISTRY[name].fn(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.sparkContext.setJobDescription(None)
        new_jobs = [
            j for j in tracker.getJobIdsForGroup(None) if j not in before_jobs
        ]
        metrics = _stage_metrics(spark)
        n_stages = 0
        n_tasks = 0
        cpu_ms = 0.0
        run_ms = 0.0
        shuffle_mb = 0.0
        seen: set[int] = set()
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for sid in info.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
                if sid in metrics and sid not in seen:
                    seen.add(sid)
                    cpu_ms += metrics[sid]["cpu_ms"]
                    run_ms += metrics[sid]["run_ms"]
                    shuffle_mb += metrics[sid]["shuffle_mb"]
        out[name] = {
            "jobs": len(new_jobs),
            "stages": n_stages,
            "tasks": n_tasks,
            "cpu_s": round(cpu_ms / 1e3, 2),
            "run_s": round(run_ms / 1e3, 2),
            "shuffle_mb": round(shuffle_mb, 1),
        }
        cacheutil.release_caches()
        spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
