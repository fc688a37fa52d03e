"""Trip-tests for the perf gate's pure decision logic (ADVICE r7):
the ambient-normalization, ambient-ceiling, env-assert, and breach
paths must each provably fire — a gate that can't be shown to fail
certifies nothing.  No JVM: evaluate() is measurement-free."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "perfgate",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "perfgate.py"),
)
perfgate = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and perfgate)

BUDGET = {
    "core_total_sec": 10.0,
    "queries": {f"q{i}": 1.0 for i in range(10)},
}


def _scaled(f):
    return {f"q{i}": f for i in range(10)}


def test_idle_box_green():
    ok, r = perfgate.evaluate(BUDGET, _scaled(1.0))
    assert ok and r["ambient"] == 1.0 and not r["bad"]


def test_uniform_throttle_below_ceiling_normalizes_green():
    """1.4x on every query = burst-credit throttle, not a plan
    change; the median-normalized checks must stay green (the
    observed r7/r8 pattern)."""
    ok, r = perfgate.evaluate(BUDGET, _scaled(1.4))
    assert ok
    assert abs(r["ambient"] - 1.4) < 1e-9
    assert abs(r["norm_total"] - 10.0) < 1e-6


def test_uniform_slowdown_above_ceiling_fails():
    """Above AMBIENT_CEILING the normalization is unfalsifiable — a
    uniform real regression and deep throttle look identical, so the
    gate must FAIL (ADVICE r7), not warn."""
    ok, r = perfgate.evaluate(BUDGET, _scaled(1.6))
    assert not ok and r["ceiling_breach"]
    # ... unless the operator explicitly acknowledges a hot box.
    ok2, r2 = perfgate.evaluate(BUDGET, _scaled(1.6), allow_hot_box=True)
    assert ok2 and not r2["ceiling_breach"]


def test_single_query_regression_trips_through_throttle():
    """A genuine plan regression is non-uniform: one query at 3x
    while peers sit at 1.3x must breach the normalized per-query
    bound even though the box is throttled."""
    t = _scaled(1.3)
    t["q7"] = 3.0
    ok, r = perfgate.evaluate(BUDGET, t)
    assert not ok
    assert [b[0] for b in r["bad"]] == ["q7"]
    assert not r["ceiling_breach"]  # ambient estimate is the median


def test_total_creep_trips_total_cap():
    """A minority of queries drifting just under the per-query bound
    must still trip the (tighter) total cap: 4 of 10 at 1.9x with
    the median at 1.0x is a real aggregate regression — the median
    ambient estimate stays 1.0 (it deliberately forgives only
    majority-uniform moves), each query clears the 2x bound, and the
    1.25x total is what catches the creep."""
    t = {f"q{i}": (1.9 if i < 4 else 1.0) for i in range(10)}
    ok, r = perfgate.evaluate(BUDGET, t)
    assert r["ambient"] == 1.0
    assert not ok and r["total_breach"] and not r["bad"]


def test_faster_box_never_relaxes_gate():
    """ambient is clamped at 1.0: on a 2x-faster box a query at 2.5x
    its recorded budget must still trip — an unclamped median (0.5)
    would normalize its ratio to 5x of peers but also let a merely
    budget-level query hide behind the speedup."""
    t = _scaled(0.5)
    t["q3"] = 2.5
    ok, r = perfgate.evaluate(BUDGET, t)
    assert r["ambient"] == 1.0
    assert not ok and [b[0] for b in r["bad"]] == ["q3"]


def test_budget_env_recorded_and_checked():
    """BENCH_BUDGET.json must carry the environment it was measured
    under, and it must match the gate's current defaults (ADVICE r7:
    a gate run at a different SF/cores silently compares
    incomparable timings — main() refuses on mismatch)."""
    import json

    with open(perfgate.BUDGET_FILE) as f:
        budget = json.load(f)
    assert budget.get("env"), "budget file missing recorded env"
    assert set(budget["env"]) == {"sf_dir", "cpus", "repeats"}
