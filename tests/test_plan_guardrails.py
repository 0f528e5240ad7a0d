"""Catalog-wide plan guardrail: no query may silently degenerate into an
unbounded cross product. Every catalog query's physical plan is checked for
CartesianProduct / BroadcastNestedLoopJoin nodes unless the query is on the
explicit allow-list (deliberate bounded cross joins: brute-force baselines
over a broadcast query set / small dims).

This is a regression net for future rounds: a refactor that breaks an
equi-join condition (e.g. the self-join attribute-dedup trap) fails here
at sf0.001 instead of timing out at sf0.1+.
"""

from __future__ import annotations

import pytest

from data_management_service_run_etl_imputations_spark import catalog

# Queries whose plans intentionally contain a bounded non-equi join:
# - brute-force ANN / embedding near-dup: corpus × broadcast query set or
#   id_a < id_b self pair — exact baselines by design (SCALE.md trade-offs)
# - fuzzy containment: broadcast theta-join against a ≤10⁴-row dim
# - correlated scalar subquery: decorrelates with a final broadcast NLJ of
#   two aggregates (bounded by group count)
ALLOWED_CROSS = {
    "ann_bruteforce_topk",
    "ann_ivf_topk",  # query × n_centroids ranking — bounded by design
    "ann_ivf_pq_topk",  # query × centroid/codebook LUT — bounded by design
    "j6_fuzzy_containment_lookup",
    "pipeline_imputaciones",
    "pipeline_fichajes",
    "scalar_correlated_subquery",
    "tpch_q22_dormant_customers",  # single-row scalar-average broadcast NLJ
    "tpch_q11_important_stock",  # single-row global-total broadcast cross
    "sketch_hll_distinct_rollup",  # 1-row sketch-union × 1-row exact count
    "text_tfidf_top_terms",  # single-row n_docs broadcast NLJ
    # single-row max(doc_id)+1 offset broadcast NLJ (data-derived planted
    # ids — collision-proof at any SF)
    "dedup_simhash_exact_invariant",
    # same single-row max(vec_id)+1 offset construction for the planted
    # exact duplicates in the t=0.9 pruning-regime query
    "dedup_embedding_cosine_strict",

    # 1-row global-mean fallback broadcast NLJ (deliberate: keeps the
    # segment window hash-partitioned instead of single-partition)
    "impute_regression_trend",
}

# Streaming queries execute eagerly (AvailableNow) inside the builder —
# their batch plan is not inspectable the same way; covered by their own
# oracle checks instead.
SKIP = {name for name in catalog.queries() if name.startswith("streaming_")}


# r13 driver-window tier: this file is in the SLOW families (measured
# from the full-suite durations log); deselect with -m "not slow".
pytestmark = pytest.mark.slow


@pytest.mark.parametrize(
    "name", sorted(set(catalog.queries()) - SKIP)
)
def test_no_accidental_cross_join(spark, sf_dir, name):
    df = catalog.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Row-at-a-time Python UDFs (BatchEvalPython) are banned everywhere:
    # Python in the hot path must be Arrow-batched (ArrowEvalPython /
    # MapInPandas / FlatMapGroupsInPandas nodes are the allowed forms).
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan"
    )
    has_cross = "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
    if name in ALLOWED_CROSS:
        return  # documented bounded cross — nothing to assert
    assert not has_cross, f"{name}: unexpected cross-product join in plan"
