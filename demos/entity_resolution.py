"""End-to-end entity-resolution demo on the engine's own operators —
the master-data-management workload, composed as one pipeline over
the synthetic dirty customer feed:

  dirty-feed synthesis → multi-key blocking (ONE shuffle for all key
  families) → weighted agreement scoring → blocking-recall preflight
  → best-match linkage → alternating-star entity clustering →
  survivorship (golden records)

Each stage is the production operator from axolotls_spark (not a
demo re-implementation); the demo prints the preflight metrics, the
linkage precision against the synthesized ground truth, and the
golden-record consolidation ratio — the three numbers an MDM team
reports.

Run:  python demos/entity_resolution.py [sf_dir]
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
    spark = get_spark("er-demo", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    pre = REGISTRY["er_blocking_recall"].fn(spark, sf_dir).first()
    print(
        f"blocking preflight: {pre.n_records} records, "
        f"{pre.n_candidates} candidates "
        f"({pre.cands_per_record:.2f}/record), "
        f"recall {pre.recall:.3f}"
    )

    best = REGISTRY["er_best_match"].fn(spark, sf_dir)
    agg = best.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_true_match").cast("int")).alias("hits"),
    ).first()
    print(
        f"best-match linkage: {agg.hits}/{agg.n} correct "
        f"({agg.hits / agg.n:.3f} precision vs ground truth)"
    )

    golden = REGISTRY["er_golden_records"].fn(spark, sf_dir)
    stats = golden.agg(
        F.count(F.lit(1)).alias("n_entities"),
        F.sum(F.col("n_sources")).alias("n_rows_in"),
        F.sum((F.col("n_sources") > 1).cast("int")).alias("n_merged"),
    ).first()
    print(
        f"survivorship: {stats.n_rows_in} source rows -> "
        f"{stats.n_entities} golden records "
        f"({stats.n_merged} entities merged >1 source)"
    )
    # No spark.stop(): standalone runs exit the JVM anyway, and the
    # pytest hook runs this main() on the suite's shared session.
    golden.orderBy("cluster_rep").show(5, truncate=False)


if __name__ == "__main__":
    main()
