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

sys.path.insert(0, "/root/repo")

from axolotls_spark import cacheutil
from axolotls_spark.queries import REGISTRY
from axolotls_spark.session import get_spark


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
        n_stages = 0
        n_tasks = 0
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for sid in info.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        out[name] = {
            "jobs": len(new_jobs), "stages": n_stages, "tasks": n_tasks
        }
        cacheutil.release_caches()
        spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
