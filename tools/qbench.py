"""Single-query isolation harness for optimization work.

Times named queries with the bench's exact methodology (noop sink,
min-of-N with caches released between queries) and optionally dumps
the formatted physical plan — the per-query inner loop of guide §1
(measure first, isolate with the noop sink, capture the plan).

Usage:
    python tools/qbench.py [--sf SF_DIR] [--repeats N] [--plan DIR]
                           [--suffix TAG] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from axolotls_spark import cacheutil
from axolotls_spark.plans.audit import explain_formatted
from axolotls_spark.queries import REGISTRY
from axolotls_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plan", default=None,
                    help="directory to write <query>_<suffix>.txt plans")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("axolotls-spark-qbench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM + parquet footers (same as bench.py).
    REGISTRY["q1_pricing_summary"].fn(spark, args.sf).write.format(
        "noop").mode("overwrite").save()
    cacheutil.release_caches()
    spark.catalog.clearCache()

    out: dict[str, float] = {}
    for name in args.queries:
        spark.sparkContext.setJobDescription(f"qbench:{name}")
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            df = REGISTRY[name].fn(spark, args.sf)
            with open(
                os.path.join(args.plan, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(explain_formatted(df))
        cacheutil.release_caches()
        spark.catalog.clearCache()
        out[name] = round(best, 4)
        print(f"{best:8.3f}  {name}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
