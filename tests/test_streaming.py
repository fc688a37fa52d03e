"""Streaming operators: finite-snapshot runs must equal batch SQL.

Batch/stream equivalence is the correctness contract for every
incremental operator (SURVEY §2B time windows + custom state).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from axolotls_spark import streaming as S
from axolotls_spark.io.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_hourly_equals_batch(spark):
    stream = S.read_events_stream(spark, SF_DIR)
    assert stream.isStreaming
    got = S.run_to_memory(
        S.hourly_event_counts(stream), "t_hourly", output_mode="complete"
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    g = {(r.window_start, r.event_type): (r.n_events, round(r.total_value, 6))
         for r in got.collect()}
    b = {(r.window_start, r.event_type): (r.n_events, round(r.total_value, 6))
         for r in batch.collect()}
    assert g == b and len(g) > 0


def test_streaming_user_state_equals_batch(spark):
    stream = S.read_events_stream(spark, SF_DIR)
    out = S.run_to_memory(
        S.user_state_counts(stream), "t_state", output_mode="update"
    )
    final = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    g = {r.user_id: r.n_events for r in final.collect()}
    b = {r.user_id: r.n_events for r in batch.collect()}
    assert g == b and len(g) > 0


def test_foreach_batch_upsert_idempotent(spark, tmp_path):
    """Stream → partitioned parquet via foreachBatch dynamic
    overwrite: output equals the batch snapshot, and replaying the
    whole source (fresh checkpoint) leaves the table unchanged —
    the idempotency contract recovery relies on."""
    target = str(tmp_path / "events_table")

    def run(ckpt: str) -> None:
        stream = S.read_events_stream(spark, SF_DIR).withColumn(
            "event_date", F.to_date("ts")
        )
        S.run_foreach_batch_upsert(
            stream, target, "event_date", str(tmp_path / ckpt)
        )

    run("ck1")
    batch_n = load_table(spark, SF_DIR, "events").count()
    first = spark.read.parquet(target)
    assert first.count() == batch_n
    n_dates = first.select("event_date").distinct().count()
    assert n_dates >= 1
    run("ck2")  # full replay — must overwrite in place, not append
    again = spark.read.parquet(target)
    assert again.count() == batch_n
    assert again.select("event_date").distinct().count() == n_dates


def test_python_datasource_stream(spark, tmp_path):
    """Streaming Python DataSource V2: micro-batch offsets advance to
    max_batches, partitions read executor-side, AvailableNow drains
    the finite source; totals are deterministic."""
    from axolotls_spark.io.python_datasource import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    sdf = (
        spark.readStream.format("synthetic_docs")
        .option("shards", 2)
        .option("rows_per_shard", 10)
        .option("max_batches", 3)
        .load()
    )
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("t_pyds")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_pyds")
    assert got.count() == 3 * 2 * 10
    assert got.select("doc_id").distinct().count() == 60


def test_state_v2_gated_on_protobuf():
    """transformWithStateInPandas (arbitrary-state v2) registration
    must track protobuf availability: the operator code always
    ships; the query only joins the correctness gate where the
    state-server dependency exists."""
    from axolotls_spark.queries import REGISTRY
    from axolotls_spark.queries_streaming import (
        _has_protobuf,
        streaming_user_state_v2,
    )

    assert callable(streaming_user_state_v2)
    assert ("streaming_user_state_v2" in REGISTRY) == _has_protobuf()
