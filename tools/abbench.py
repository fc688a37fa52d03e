"""Interleaved A/B/N bench for session-conf experiments.

The box throttles under sustained load (identical code measures 2x+
apart minutes later), so back-to-back full-bench A/Bs confound conf
effects with thermal state (r8 "measurement hazard"; the r9 first
attempt showed ref_feature_chain — untouched by the conf — "regress"
5x).  This harness interleaves the arms per repeat inside ONE session:
every arm sees the same thermal trajectory, so the per-query min-of-N
difference is attributable to the conf alone.

Arms are comma-separated k=v conf lists; AQE and most SQL confs are
read at execution time, so setting them between actions is effective.

Usage:
    python tools/abbench.py --arms "" \
        --arms "spark.sql.adaptive.coalescePartitions.parallelismFirst=false" \
        [--repeats 2] [--sf DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from axolotls_spark import cacheutil
from axolotls_spark.queries import REGISTRY
from axolotls_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--arms", action="append", required=True,
                    help="comma-separated k=v conf overrides; repeatable")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    arms: list[dict[str, str]] = []
    for spec in args.arms:
        arms.append(dict(kv.split("=", 1) for kv in spec.split(",") if kv))

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("axolotls-spark-abbench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    defaults = {k: spark.conf.get(k, None)
                for arm in arms for k in arm}

    REGISTRY["q1_pricing_summary"].fn(spark, args.sf).write.format(
        "noop").mode("overwrite").save()
    cacheutil.release_caches()
    spark.catalog.clearCache()

    out: dict[str, list[float]] = {}
    for name in args.queries:
        best = [float("inf")] * len(arms)
        for _ in range(args.repeats):
            for ai, arm in enumerate(arms):
                for k, v in arm.items():
                    spark.conf.set(k, v)
                try:
                    t0 = time.perf_counter()
                    REGISTRY[name].fn(spark, args.sf).write.format(
                        "noop").mode("overwrite").save()
                    best[ai] = min(best[ai], time.perf_counter() - t0)
                finally:
                    for k in arm:
                        if defaults[k] is None:
                            spark.conf.unset(k)
                        else:
                            spark.conf.set(k, defaults[k])
                cacheutil.release_caches()
                spark.catalog.clearCache()
        out[name] = [round(t, 4) for t in best]
        print(json.dumps({name: out[name]}), flush=True)
    totals = [round(sum(v[i] for v in out.values()), 2)
              for i in range(len(arms))]
    print(json.dumps({"arm_totals": totals,
                      "arms": args.arms}), flush=True)


if __name__ == "__main__":
    main()
