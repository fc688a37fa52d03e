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
