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


def test_state_v2_is_a_seam_not_a_registration():
    """Arbitrary-state v2 is a documented environmental seam (demo +
    operator code), never a registry entry: the v2 state server needs
    protobuf, absent here, and a registered query that has never
    executed anywhere is worse than an honest seam (VERDICT r5 #6)."""
    from axolotls_spark.queries import REGISTRY

    assert "streaming_user_state_v2" not in REGISTRY
    # The demo must exist and be import-safe without protobuf.
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "streaming_state_v2_demo", "/root/repo/demos/streaming_state_v2.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.main)


def test_state_v2_processor_update_logic():
    """Exercise the v2 StatefulProcessor's per-key update logic
    directly against a fake ValueState handle — the only part of the
    seam the missing state server would otherwise leave unexecuted.
    Two micro-batches for one user must accumulate (count, sum,
    last-seen max) exactly like the batch group-by."""
    import pandas as pd

    from axolotls_spark.streaming.jobs import _UserAggProcessor

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeValueState()

        def getValueState(self, name, schema):
            assert name == "agg"
            return self.state

    proc = _UserAggProcessor()
    handle = FakeHandle()
    proc.init(handle)

    b1 = pd.DataFrame(
        {
            "value": [1.5, 2.5],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00:00", "2024-01-02 09:00:00"]
            ),
        }
    )
    out1 = list(proc.handleInputRows((7,), iter([b1]), None))
    assert len(out1) == 1
    r1 = out1[0].iloc[0]
    assert r1.user_id == 7 and r1.n_events == 2
    assert r1.total_value == 4.0

    b2 = pd.DataFrame(
        {
            "value": [10.0],
            "ts": pd.to_datetime(["2024-01-01 23:00:00"]),  # earlier max
        }
    )
    out2 = list(proc.handleInputRows((7,), iter([b2]), None))
    r2 = out2[0].iloc[0]
    assert r2.n_events == 3 and r2.total_value == 14.0
    # last_seen keeps the Jan-2 maximum across batches.
    assert r2.last_seen_us == int(
        pd.Timestamp("2024-01-02 09:00:00").value // 1000
    )
    assert handle.state.get() == (3, 14.0, r2.last_seen_us)
