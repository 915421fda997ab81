"""Scaling-slope measurement for the heavy headline queries: run each at
sf0.001 / sf0.01 / sf0.1 in ONE warmed session and print a
rows-vs-seconds table plus the log-log slope between successive scale
factors (slope 1.0 = linear in input rows; < 1 = sublinear; the
interesting failures are > 1).

Interpretation caveats for a single-node local[32] run: fixed per-query
overhead (plan + task launch, ~0.3-0.5 s) dominates at sf0.001, which
BIASES slopes downward at the small end -- the sf0.01 -> sf0.1 column is
the honest one. Usage:

    python tools/scaling_slopes.py [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HEAVY = [
    "minhash_lsh_pairs",
    "minhash_shingle_pairs",
    "dedup_clusters",
    "ann_ivf_topk",
    # r13: the IVF-PQ ADC path (codes-only candidate scoring)
    "ann_ivfpq_topk",
    "semantic_dedup_prune",
    "interval_overlap_pairs",
    # r6: the current top-of-bench lines (r5 verdict item 3)
    "huber_location_2step",
    "survival_split_stump",
    "kmeans_1d_lloyd",
    "decision_stump_split",
    "multimodal_png_stats",
    # r6 late additions: iterative GLM + double rank-pass scale test
    "logistic_newton_1d",
    "fligner_killeen",
    # r7: heaviest of the ext158-185 tier (r6 verdict item 7)
    "matrix_profile_motifs",
    "cochrane_orcutt",
    "henderson_trend",
    # r8: fixed-overhead-sensitive queries tracked round-over-round
    # (r7 verdict item 5): the driver-folded spectral cut and the two
    # r7 streaming replays (trigger-bound; slope shows the data term)
    "spectral_bipartition_nations",
    "streaming_lindley_replay",
    "streaming_kalman_replay",
    # r9: the grid-kNN scale twins (vs their documented all-pairs
    # baselines), the KMV sketch, DGIM fold, and the Sn pair spine
    "lof_grid_knn",
    "lof_embedding_plane",
    "semivariogram_grid",
    "semivariogram_embedding",
    "quantile_sketch_deciles",
    "dgim_error_window_daily",
    "sn_scale_daily",
    "incremental_ivf_update",
    # r10: the density-growth semivariogram twin (vs the exact baseline
    # above), incremental LSH, the Rice coder, and the two
    # calendar-pair nonlinear reads
    "semivariogram_moments",
    "incremental_lsh_update",
    "multimodal_rice_stats",
    "rqa_recurrence_daily",
    "horizontal_visibility_graph",
    # r10 late batches: per-media codecs (row-linear by construction),
    # the events pair screen, the ring lookup, and three calendar folds
    "crc32_media",
    "round_trip_payments",
    "elias_gamma_bits",
    "consistent_hash_ring",
    "lz76_complexity",
    "arith_coder_daily",
    "betting_eprocess_daily",
    "hedge_expert_weights",
    # r11: the fuzzy-match delete-neighborhood twin vs its blocked
    # baseline (the r10 verdict weak), plus every >10 s sf0.1-sweep
    # line that is engine- (not oracle-) dominated (r10 verdict item 5)
    "fuzzy_name_match",
    "fuzzy_name_match_djoin",
    "embedding_dup_pairs",
    "bwt_compressibility_gain",
    "distance_correlation_daily",
    "probit_newton_1d",
    "lsh_recall_eval",
    "pagerank_sim_graph",
    # r12: the sf0.1 sweep's new top-10 lines whose engine-side scaling
    # was asserted, not measured (r11 verdict item 3), plus the two
    # replay-tail queries rewritten this round
    "fellegi_sunter_weights",
    "mg_heavy_hitters_daily",
    "twoway_fe_within",
    "entity_resolution_golden",
    "rich_club_coefficient",
    "lz78_daily_complexity",
    # r12 flagships with a data-sized scan worth tracking: the O(50n)
    # KNN-Shapley distance pass and the LSH-candidate Jaccard curve
    "knn_shapley_valuation",
    "dedup_threshold_sensitivity",
]

SFS = ["sf0.001", "sf0.01", "sf0.1"]
BASE = "/root/testdata"


def main() -> None:
    from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
    from fraud_detection_in_banking_transactions_using_hadoop_spark.session import get_spark
    from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

    names = sys.argv[1:] or HEAVY
    spark = get_spark("scaling")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    by_name = {q.name: q for q in registry()}

    rows = {}
    for sf in SFS:
        rows[sf] = read_table(spark, f"{BASE}/{sf}", "lineitem").count()

    print(f"{'query':28s} " + " ".join(f"{sf:>9s}" for sf in SFS) + "  slope(.001->.01) slope(.01->.1)")
    for name in names:
        q = by_name[name]
        # warm the plan path once at the smallest sf so the first timed
        # run is not paying one-time codegen/import costs
        q.fn(spark, f"{BASE}/sf0.001").count()
        t = {}
        for sf in SFS:
            t0 = time.time()
            q.fn(spark, f"{BASE}/{sf}").count()
            t[sf] = time.time() - t0
        s01 = math.log(t["sf0.01"] / t["sf0.001"]) / math.log(10)
        s1 = math.log(t["sf0.1"] / t["sf0.01"]) / math.log(10)
        print(
            f"{name:28s} "
            + " ".join(f"{t[sf]:8.2f}s" for sf in SFS)
            + f"  {s01:14.2f} {s1:13.2f}"
        )


if __name__ == "__main__":
    main()
