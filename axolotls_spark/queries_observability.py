"""Pipeline instrumentation via ``df.observe()`` / ``Observation``.

Production pipelines read their row-drop counters from OBSERVED
metrics — accumulator-style aggregates collected as a side effect of
the one pass the pipeline already makes — never from a second scan.
This module certifies that surface (VERDICT r6 item #1): the
`daily_ingestion` dedup screen instrumented with one ``Observation``
per funnel stage, returning the observed counters as the result
relation, with a DuckDB oracle that recomputes the same aggregates
from scratch.

Why observe and not a re-aggregation: at 100 TB the screen's input
pass is the dominant cost; ``CollectMetrics`` nodes ride that pass
for free (they add ZERO exchanges — pinned by
``tests/test_round7_ops.py::test_observe_adds_zero_exchanges``),
while a second funnel-counting scan would double the I/O.

This is the one registered query whose function is EAGER by design:
observed metrics only exist after an action, so the screen is driven
once via a ``noop``-format write (execute-only sink, no driver
collect, nothing leaves the executors) and the returned relation is
the 4-row funnel built from the observation results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from axolotls_spark.io.sources import load_table, spread_for_cpu
from axolotls_spark.operators import text_analysis as T
from axolotls_spark.registry import register
from axolotls_spark.queries_text import _SQL_CAND_CTES, _SQL_TOKENS
from axolotls_spark.queries_text import incremental_dedup_screen

#: The funnel stages, in pipeline order.  Each gets its own
#: ``Observation``; all four are populated by the single action.
_STAGES = ("batch", "after_exact", "after_near", "admitted")


def observed_screen(
    spark: SparkSession, sf_dir: str, instrument: bool = True
):
    """Build `daily_ingestion`'s screen; optionally attach one
    ``Observation`` per funnel stage.  Returns ``(df, observations)``
    where ``observations`` is ``{stage: Observation}`` (empty when
    ``instrument=False`` — that variant exists so the plan pin can
    diff the two physical plans).
    """
    docs = spread_for_cpu(load_table(spark, sf_dir, "documents"), "doc_id")
    is_new = (F.col("doc_id") % 10) == 0
    exact_hits, near_hits = incremental_dedup_screen(docs, is_new)

    obs: dict[str, Observation] = {}

    def tap(df: DataFrame, stage: str) -> DataFrame:
        if not instrument:
            return df
        ob = Observation()
        obs[stage] = ob
        return df.observe(
            ob,
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )

    batch = tap(docs.filter(is_new), "batch")
    after_exact = tap(batch.join(exact_hits, "doc_id", "left_anti"),
                      "after_exact")
    after_near = tap(after_exact.join(near_hits, "doc_id", "left_anti"),
                     "after_near")
    # Gate stats via staged projections (tokenize once per row, not
    # per expression reference — see T.staged_repetition_gate); the
    # helper columns are dropped after the filter so the tapped
    # relation keeps the original screen schema.
    st = T.staged_repetition_gate(after_near)
    admitted = tap(
        st.filter(
            (F.col("_rep_dup") <= 0.65) & (F.col("_rep_top") <= 0.06)
        ).select(*after_near.columns),
        "admitted",
    )
    return admitted, obs


@register(
    "observed_ingestion_metrics",
    oracle=f"""
    WITH {_SQL_CAND_CTES},
    near_hits AS (
        SELECT DISTINCT a.doc_id
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.bucket_key = b.bucket_key
         AND a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
    ),
    exact_hits AS (
        SELECT DISTINCT n.doc_id
        FROM documents n JOIN documents c
          ON md5(n.text) = md5(c.text)
         AND n.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
    ),
    batch AS (
        SELECT doc_id, text, n_chars FROM documents WHERE doc_id % 10 = 0
    ),
    after_exact AS (
        SELECT b.* FROM batch b
        LEFT JOIN exact_hits e ON b.doc_id = e.doc_id
        WHERE e.doc_id IS NULL
    ),
    after_near AS (
        SELECT a.* FROM after_exact a
        LEFT JOIN near_hits h ON a.doc_id = h.doc_id
        WHERE h.doc_id IS NULL
    ),
    toks AS (SELECT doc_id, n_chars, {_SQL_TOKENS} AS t FROM after_near),
    m AS (
        SELECT doc_id, n_chars,
               1.0 - len(list_distinct(t))::DOUBLE / len(t) AS dup_frac
        FROM toks
    ),
    bg AS (
        SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
        FROM toks, unnest(range(1, greatest(len(t), 1))) AS u(i)
    ),
    bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
    tb AS (
        SELECT doc_id, MAX(c)::DOUBLE / SUM(c) AS top_bg
        FROM bgc GROUP BY doc_id
    ),
    admitted AS (
        SELECT m.doc_id, m.n_chars
        FROM m JOIN tb USING (doc_id)
        WHERE m.dup_frac <= 0.65 AND tb.top_bg <= 0.06
    )
    SELECT 0 AS stage_idx, 'batch' AS stage,
           COUNT(*)::BIGINT AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM batch
    UNION ALL
    SELECT 1, 'after_exact', COUNT(*)::BIGINT,
           CAST(SUM(n_chars) AS BIGINT) FROM after_exact
    UNION ALL
    SELECT 2, 'after_near', COUNT(*)::BIGINT,
           CAST(SUM(n_chars) AS BIGINT) FROM after_near
    UNION ALL
    SELECT 3, 'admitted', COUNT(*)::BIGINT,
           CAST(SUM(n_chars) AS BIGINT) FROM admitted
    """,
    tags=("observe", "instrumentation", "pipeline", "funnel", "composite"),
)
def observed_ingestion_metrics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-stage admission funnel of `daily_ingestion`'s screen read
    from OBSERVED metrics — batch size, post-exact-dedup, post-near-
    dedup, post-quality-gate, each as (docs, chars) — collected in
    the screen's single pass via four ``CollectMetrics`` nodes
    instead of four counting re-scans.

    Scale shape: the pipeline is `daily_ingestion`'s screen verbatim
    (shared helper); ``observe`` adds zero exchanges and zero extra
    passes (plan-pinned); the action is a ``noop``-format write, so
    no row ever reaches the driver — only the 8 observed scalars do.
    The returned relation is those scalars restated as the 4-row
    funnel a pipeline dashboard ingests.

    Oracle: DuckDB recomputes every stage aggregate from scratch —
    observed counters must equal the ground-truth funnel exactly.
    """
    admitted, obs = observed_screen(spark, sf_dir)
    # Execute ONCE, executor-side only; observations populate here.
    admitted.write.format("noop").mode("overwrite").save()
    rows = []
    for idx, stage in enumerate(_STAGES):
        m = obs[stage].get
        rows.append((idx, stage, m["n_docs"], m["n_chars"]))
    return spark.createDataFrame(
        rows, "stage_idx INT, stage STRING, n_docs BIGINT, n_chars BIGINT"
    )


# ---------------------------------------------------------------------------
# Observed join health: match-rate counters riding an enrichment join
# ---------------------------------------------------------------------------

#: "Catalog-active" dimension predicate for the enrichment join.
_ACTIVE_SIZE = 25


@register(
    "observed_join_match_rate",
    oracle=f"""
    WITH fact AS (
        SELECT l_partkey,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem
    ),
    dim AS (
        SELECT p_partkey FROM part WHERE p_size >= {_ACTIVE_SIZE}
    ),
    joined AS (
        SELECT f.cents, d.p_partkey
        FROM fact f LEFT JOIN dim d ON f.l_partkey = d.p_partkey
    )
    SELECT COUNT(*)::BIGINT AS n_fact,
           SUM(CASE WHEN p_partkey IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_matched,
           CAST(SUM(CASE WHEN p_partkey IS NOT NULL THEN cents
                         ELSE 0 END) AS BIGINT) AS matched_cents,
           CAST(SUM(CASE WHEN p_partkey IS NOT NULL THEN 1.0
                         ELSE 0.0 END) / COUNT(*) AS REAL)
               AS match_rate
    FROM joined
    """,
    tags=("observe", "instrumentation", "join", "match-rate"),
)
def observed_join_match_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrichment-join health read from OBSERVED metrics: lineitem
    left-joins the catalog-active part dimension (p_size >=
    _ACTIVE_SIZE) and a single ``Observation`` on the joined relation
    collects fact count, matched count, matched revenue (exact
    cents), and the match rate — the "how much of today's volume hit
    the active catalog" counter a production enrichment stage
    publishes, WITHOUT a second scan or a separate re-aggregation.

    Complements `observed_ingestion_metrics` (observe over filter
    funnel stages): here the CollectMetrics node rides a BROADCAST
    join's output, certifying the surface composes with join shapes.
    The action is a noop write; only 4 scalars reach the driver.

    Scale shape: dim side broadcasts (bounded catalog); the fact side
    is scanned once, projected to 2 columns; the observed aggregates
    are map-side folds inside the same pass — zero exchanges beyond
    the join itself (integer cents keep the revenue counter exact in
    both engines).
    """
    fact = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("cents"),
    )
    dim = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") >= _ACTIVE_SIZE)
        .select("p_partkey")
    )
    ob = Observation()
    joined = fact.join(
        F.broadcast(dim),
        fact["l_partkey"] == dim["p_partkey"],
        "left",
    ).observe(
        ob,
        F.count(F.lit(1)).alias("n_fact"),
        F.sum(
            F.when(F.col("p_partkey").isNotNull(), 1).otherwise(0)
        ).alias("n_matched"),
        F.sum(
            F.when(F.col("p_partkey").isNotNull(), F.col("cents"))
            .otherwise(0)
        ).alias("matched_cents"),
    )
    joined.write.format("noop").mode("overwrite").save()
    m = ob.get
    # Unrounded ratio: IEEE double division of two exact integers is
    # bit-identical in Python and DuckDB, and the FLOAT/REAL cast then
    # matches exactly — no Python-round (banker's) vs DuckDB-ROUND
    # (half-away) midpoint hazard (ADVICE/VERDICT r7).
    return spark.createDataFrame(
        [(m["n_fact"], m["n_matched"], m["matched_cents"],
          m["n_matched"] / m["n_fact"])],
        "n_fact BIGINT, n_matched BIGINT, matched_cents BIGINT, "
        "match_rate FLOAT",
    )
