"""End-to-end LLM training-data curation demo on the engine's own
operators — the workload the §2B extensions exist for, composed as
ONE lazy pipeline over the synthetic corpus:

  quality gate → exact dedup → near-dup (MinHash) candidate drop →
  benchmark decontamination → temperature source mixing →
  chunk → pack into training sequences

Each stage is the production operator from axolotls_spark (not a
demo re-implementation); the pipeline prints per-stage survivor
counts — the curation funnel every data team reports.

Run:  python demos/llm_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from axolotls_spark.io.sources import load_table
from axolotls_spark.queries import REGISTRY
from axolotls_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("demo-llm-curation", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. Quality gate: length + repetition filters (Gopher-style).
    gated = REGISTRY["gopher_repetition_filters"].fn(spark, sf_dir).filter(
        F.col("keep")
    )
    keep1 = gated.select("doc_id")
    n1 = keep1.count()

    # 2. Exact dedup (min doc_id representative per identical text).
    exact = REGISTRY["dedup_exact"].fn(spark, sf_dir).select("doc_id")
    n2 = keep1.join(exact, "doc_id").count()

    # 3. Near-dup drop: MinHash-LSH candidate pairs -> drop the
    #    higher doc_id of each verified pair.
    pairs = REGISTRY["minhash_near_dup_pairs"].fn(spark, sf_dir)
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    survivors = keep1.join(exact, "doc_id").join(drop, "doc_id", "left_anti")
    n3 = survivors.count()

    # 4. Decontamination: drop docs overlapping the eval set.
    contaminated = (
        REGISTRY["decontaminate_ngram_overlap"].fn(spark, sf_dir)
        .filter(F.col("contaminated"))
        .select("doc_id")
    )
    survivors = survivors.join(contaminated, "doc_id", "left_anti")
    n4 = survivors.count()

    # 5. Temperature source mixing (alpha=0.5 hash sampling).
    mixed = REGISTRY["temperature_mix_sources"].fn(spark, sf_dir).select(
        "doc_id"
    )
    survivors = survivors.join(mixed, "doc_id")
    n5 = survivors.count()

    # 6. Leakage-free split: bucket by dup-cluster representative so
    # no paraphrase of a training doc can land in eval.
    split = REGISTRY["split_leakage_free"].fn(spark, sf_dir).select(
        "doc_id", "split"
    )
    train = survivors.join(
        split.filter(F.col("split") == "train"), "doc_id"
    )
    n6 = train.count()

    # 7. Chunk surviving train docs and pack into training sequences.
    chunks = (
        REGISTRY["chunk_documents"].fn(spark, sf_dir)
        .join(train, "doc_id")
    )
    n_chunks = chunks.count()
    packed = REGISTRY["pack_sequences_contiguous"].fn(spark, sf_dir)
    n_seqs = packed.select("shard", "pack_id").distinct().count()

    print(f"documents            {n0:>8}")
    print(f"after quality gate   {n1:>8}")
    print(f"after exact dedup    {n2:>8}")
    print(f"after near-dup drop  {n3:>8}")
    print(f"after decontam       {n4:>8}")
    print(f"after temp mixing    {n5:>8}")
    print(f"train split (no-leak){n6:>8}")
    print(f"training chunks      {n_chunks:>8}")
    print(f"packed sequences     {n_seqs:>8}  (corpus-wide)")


if __name__ == "__main__":
    main()
