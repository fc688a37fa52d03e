"""Machine-checked form of the streaming state law (VERDICT r7 item
#7, measured at scale in STREAMSTATE.json / SCALE.md): replaying the
events table through ``dropDuplicatesWithinWatermark`` in event-time
order, state must be bounded by rate x watermark horizon — monotone
in the horizon, small vs the corpus for short horizons, and (the
falsification arm) corpus-sized only when the horizon covers the
whole span.  This keeps the law a regression gate, not a one-off
tool run: an operator change that silently stopped evicting state
fails here at sf0.001 in seconds."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "streamscale",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "streamscale.py"),
)
streamscale = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(streamscale)

SF_DIR = "/root/testdata/sf0.001"
N_CHUNKS = 15  # 30-day span -> 48 h per micro-batch


def test_state_bounded_by_rate_times_horizon(spark, tmp_path):
    work = str(tmp_path)
    n = streamscale.prepare_chunks(spark, SF_DIR, work, n_chunks=N_CHUNKS)
    assert n > 0
    # The three replays are independent streaming queries with
    # distinct checkpoint dirs — run them concurrently (guide §2.6);
    # serially this was the suite's #3 cost at ~143 s.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        short, mid, full = pool.map(
            lambda d: streamscale.measure(spark, work, d, n_chunks=N_CHUNKS),
            ("12 hours", "120 hours", "800 hours"),
        )

    # Dedup correctness through the replay: every event emitted once.
    for r in (short, mid, full):
        assert r["input_rows"] == n
        assert r["output_rows"] == n  # event_ids are unique

    # The law: state monotone in horizon ...
    assert (
        short["peak_state_rows"]
        <= mid["peak_state_rows"]
        <= full["peak_state_rows"]
    )
    # ... bounded well below the corpus for short horizons (12 h of a
    # 720 h span; the 48 h chunk granularity dominates the bound here
    # — 2 store rows per key x rate x (delay + chunk span), with 2x
    # headroom for batch-boundary raggedness) ...
    rate_per_hour = n / 720.0
    bound = 2 * 2 * rate_per_hour * (12 + 48)
    assert short["peak_state_rows"] <= bound, (
        short["peak_state_rows"], bound,
        "short-horizon state is not rate x horizon bounded",
    )
    # ... and corpus-sized ONLY when the horizon covers the span
    # (the falsification arm: the harness can tell bounded from
    # unbounded, so a green short-horizon reading means something).
    assert full["peak_state_rows"] >= n
    assert full["peak_state_rows"] >= 4 * short["peak_state_rows"]
