"""asof_join unit semantics: backward match, ties, no-match nulls,
and null payload columns not mixing across rows."""

from __future__ import annotations

import datetime as dt

from axolotls_spark.operators.temporal_join import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_and_ties(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "e1"),
            (1, _ts("2024-01-01 12:00:00"), "e2"),
            (2, _ts("2024-01-01 09:00:00"), "e3"),  # before any right row
        ],
        "k long, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 100, None),  # null payload col
            (1, _ts("2024-01-01 10:00:00"), 200, 2.5),   # tie with e1
            (1, _ts("2024-01-01 11:00:00"), 300, 3.5),
            (2, _ts("2024-01-01 11:00:00"), 400, 4.5),
        ],
        "k long, rts timestamp, rid long, amt double",
    )
    out = {
        r.ev: (r.rid, r.amt)
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols=["rid", "amt"],
        ).collect()
    }
    assert out["e1"] == (200, 2.5)      # tie matches (<=)
    assert out["e2"] == (300, 3.5)      # latest preceding, not first
    assert out["e3"] == (None, None)    # nothing precedes


def test_asof_null_payload_not_mixed(spark):
    # The latest preceding right row has a NULL amt; a naive
    # per-column ignore-nulls carry would surface 1.0 from the older
    # row — the struct carry must keep (2, NULL) intact.
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00"), "e1")],
        "k long, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 1, 1.0),
            (1, _ts("2024-01-01 11:00:00"), 2, None),
        ],
        "k long, rts timestamp, rid long, amt double",
    )
    r = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_cols=["rid", "amt"],
    ).first()
    assert (r.rid, r.amt) == (2, None)
