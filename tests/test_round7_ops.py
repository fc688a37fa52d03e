"""Round-7 operators: observe/Observation instrumentation pins.

The observe surface's value proposition is METRICS FOR FREE — the
``CollectMetrics`` nodes must ride the pipeline's existing pass
without adding exchanges or extra scans, and the observed counters
must equal a from-scratch recomputation (the DuckDB oracle covers
that; here we cross-check against Spark's own re-aggregation too).
"""

from __future__ import annotations

from axolotls_spark.plans.audit import audit
from axolotls_spark.queries import REGISTRY
from axolotls_spark.queries_observability import observed_screen

SF_DIR = "/root/testdata/sf0.001"


def test_observe_adds_zero_exchanges(spark):
    """The instrumented screen's physical plan must have EXACTLY the
    same exchange count (and no Cartesian/Python-row nodes) as the
    uninstrumented screen — observe is free at 100 TB or it isn't
    worth certifying."""
    plain, _ = observed_screen(spark, SF_DIR, instrument=False)
    instr, obs = observed_screen(spark, SF_DIR, instrument=True)
    assert len(obs) == 4
    fp = audit(plain)
    fi = audit(instr)
    assert fi.n_exchanges == fp.n_exchanges
    assert "CartesianProduct" not in fi.text
    assert "BatchEvalPython" not in fi.text
    # The instrumentation IS in the plan: 4 CollectMetrics nodes,
    # each mentioned twice by explain-formatted (tree + detail
    # section).
    assert fi.text.count("CollectMetrics") == 8
    assert fp.text.count("CollectMetrics") == 0


def test_observed_funnel_matches_recount(spark):
    """Observed counters == a second, independent counting pass over
    the same stage relations (monotone non-increasing funnel)."""
    rows = {
        r["stage"]: r
        for r in REGISTRY["observed_ingestion_metrics"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert list(rows) == ["batch", "after_exact", "after_near", "admitted"]
    admitted, _ = observed_screen(spark, SF_DIR, instrument=False)
    assert rows["admitted"]["n_docs"] == admitted.count()
    n = [rows[s]["n_docs"] for s in rows]
    assert n[0] >= n[1] >= n[2] >= n[3] > 0
    c = [rows[s]["n_chars"] for s in rows]
    assert c[0] >= c[1] >= c[2] >= c[3] > 0
