"""Daily-ingestion demo — the round-2 incremental operators composed
as the pipeline a production corpus runs every day:

  incremental batch-vs-corpus dedup (exact hash tier + MinHash/LSH
  tier) → quality-classifier scoring (relational IRLS logistic
  regression) with calibration readout → deterministic train/val/test
  split of the survivors → output-shard balance QA

plus the warehouse side of the same day: CDC latest-state apply over
the event changelog and the SCD2 dimension history build.

Each stage is the production operator from axolotls_spark (not a
demo re-implementation); stages print survivor counts / summaries.

Run:  python demos/daily_ingestion.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from axolotls_spark.queries import REGISTRY
from axolotls_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("demo-daily-ingestion", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. Screen the arriving batch against the corpus.
    screened = REGISTRY["dedup_incremental_batch"].fn(spark, sf_dir)
    by_status = {
        r.status: r.n
        for r in screened.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    print(f"[1] incremental dedup: {by_status}")

    # 2. Quality classifier over the corpus; calibration readout.
    model = REGISTRY["logreg_quality_classifier"].fn(spark, sf_dir).collect()[0]
    print(
        f"[2] quality classifier: acc={model.train_acc:.3f} "
        f"beta=({model.b0:.2f}, {model.b1:.2f}, {model.b2:.2f})"
    )
    cal = REGISTRY["logreg_calibration_bins"].fn(spark, sf_dir)
    worst = (
        cal.select(
            "bin", (F.abs(F.col("avg_pred") - F.col("frac_positive"))).alias("gap")
        )
        .orderBy(F.desc("gap"))
        .first()
    )
    print(f"[2] calibration: worst bin {worst.bin} gap {worst.gap:.3f}")

    # 3. Deterministic split of the surviving documents.
    split = REGISTRY["dataset_split_stratified"].fn(spark, sf_dir)
    totals = {
        r.split: r.n
        for r in split.groupBy("split").agg(F.sum("n_docs").alias("n")).collect()
    }
    print(f"[3] split: {totals}")

    # 4. Shard balance QA before writing.
    shards = REGISTRY["shard_balance_report"].fn(spark, sf_dir)
    bal = shards.agg(
        F.count("*").alias("n_shards"),
        (F.max("token_share") / F.avg("token_share")).alias("max_over_mean"),
    ).collect()[0]
    print(
        f"[4] shards: {bal.n_shards} shards, "
        f"max/mean token load {bal.max_over_mean:.2f}"
    )

    # 5. Warehouse side: CDC latest state + SCD2 history.
    cdc = REGISTRY["cdc_apply_latest"].fn(spark, sf_dir)
    print(f"[5] CDC live user states: {cdc.count()}")
    scd2 = REGISTRY["scd2_priority_history"].fn(spark, sf_dir)
    open_rows = scd2.filter("is_current").count()
    print(f"[5] SCD2 versions: {scd2.count()} total, {open_rows} open")

    spark.stop()


if __name__ == "__main__":
    main()
