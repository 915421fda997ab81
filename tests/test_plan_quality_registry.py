"""Registry-wide plan-quality gate: EXPLAIN every lazily-planned query
and reject the two accidental-plan smells that destroy 100 TB runs --
cartesian products and broadcast nested-loop joins -- except where a
query is DOCUMENTED as exactly that (the brute-force ANN baseline).

Queries that execute work at call time (streaming replays, eager LSH
checkpoints, driver-side fits) are excluded here; their plan shapes are
pinned in test_plans_shape.py / their own operator tests instead.
"""

from __future__ import annotations

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry

# documented exceptions:
# - ann_cosine_topk / embedding_dup_pairs: the exact brute-force ANN
#   baseline IS a cross join by design (broadcast query set).
# - source_mixture / q11 / q22: scalar-aggregate comparisons -- the BNLJ
#   build side is a 1-ROW aggregate (global mean / threshold), so the
#   "nested loop" degenerates to a map-side constant join: O(n), scale-safe.
ALLOWED_NESTED_LOOP = {
    "ann_cosine_topk",
    "embedding_dup_pairs",
    "source_mixture",
    "q11_important_stock",
    "q22_dormant_customers",
    "dq_referential",
    "length_drift_ks",
    "bm25_hybrid_search",
    "lm_quality_score",
    "bigram_lm_score",
    "association_rules",
    # broadcast range join against a CONSTANT 10-row percentile edge
    # table -- the intended scale path for binning (no global sort)
    "percentile_bucket_join",
    # 1-row totals broadcast (n_uni/n_big scalars)
    "pmi_collocations",
    # 1-row (slope, intercept) params broadcast onto the holdout
    "forecast_backtest_mape",
    # constant 100-probe broadcast cross join (ann_cosine baseline family)
    "knn_loo_accuracy",
    # 1-row scalar broadcasts (theta / n_parts / n_users / p95)
    "cuped_adjustment",
    "negative_sampling",
    "ltv_curve",
    "expected_shortfall",
    # 1-row median broadcast
    "runs_test_randomness",
}

# eager at call time (streaming jobs, localCheckpoint pipelines,
# driver-side fits): planning them here would run them
EAGER = {
    "streaming_windowed_counts", "streaming_join_replay",
    "streaming_dedup_replay", "streaming_stateful_replay",
    "streaming_session_replay", "streaming_incremental_agg",
    "streaming_outer_join_replay",
    "minhash_lsh_pairs", "minhash_shingle_pairs", "dedup_clusters",
    "pagerank_sim_graph", "ann_ivf_topk", "incremental_watermark",
    "triangle_counts", "label_propagation", "min_plus_shortest_paths",
    "streaming_cms_replay",
}

_LAZY = [q for q in registry() if q.name not in EAGER]


@pytest.mark.parametrize("q", _LAZY, ids=[q.name for q in _LAZY])
def test_no_accidental_cartesian_or_bnlj(q, spark, sf_dir):
    plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{q.name} plans a cartesian product"
    if q.name not in ALLOWED_NESTED_LOOP:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{q.name} plans a broadcast nested-loop join"
        )
