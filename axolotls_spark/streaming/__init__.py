from axolotls_spark.streaming.jobs import (  # noqa: F401
    attribution_join,
    dedup_within_watermark,
    hourly_event_counts,
    read_events_stream,
    run_foreach_batch_upsert,
    run_to_memory,
    session_windows,
    user_state_counts,
    user_state_counts_v2,
)
