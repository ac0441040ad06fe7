#!/bin/sh
# Round-9 sf1 continuation: session 1 (run_sf1_r9.sh) validated 220
# queries at copies 10 before hard_negative_mining's 16-block unsalted
# join stalled it (fixed — see SCALE.md round 9). This session covers:
#   A2: the 13 remaining non-quadratic queries + the re-lifted
#       target_encode_smoothed + the 18 new round-9 queries, copies 10
#       (reuses the generated corpus);
#   B2: the quadratic-oracle tier (r3/r4 protocol) + the two new
#       quadratic-family members (hard_negative_mining,
#       minhash_estimate_error), copies 3 (regenerates).
set -e
cd "$(dirname "$0")/.."
A2="acf_daily_revenue benford_price_audit cohen_kappa_langid \
hhi_supplier_concentration kendall_tau_daily mase_seasonal_naive \
matryoshka_prefix_nn ols_qty_discount rolling_corr_28d set_except_all \
set_intersect_all spearman_rank_corr target_encode_smoothed \
gini_customer_spend kruskal_wallis_value ks_doclen_lang \
runs_test_daily_revenue cramers_v_lang_source \
interarrival_quartiles_by_segment repurchase_survival dau_overlap_daily \
max_concurrent_sessions attribution_time_decay rich_club_coefficient \
hellinger_source_profiles langid_f1_report phrase_query_docs \
embed_pq_adc_topk adc_recall_eval effective_diameter_landmarks \
watermark_lateness_profile"
B2="dedup_ngram_jaccard dedup_ngram_prefix dedup_minhash_lsh dedup_simhash \
dedup_containment dedup_components dedup_survivors dedup_incremental \
dedup_best_of_cluster corpus_snapshot_diff jaccard_user_similarity \
embed_neardup_pairs triangle_count_neardup clustering_coeff_neardup \
ktruss_neardup dup_span_coverage dedup_max_spans dedup_spans_applied \
fuzzy_name_pairs er_entity_clusters semdedup_prune leakage_safe_split \
decontaminate_overlap ann_lsh_bucketed dbscan_embeddings dbscan_kmeans_cells \
hard_negative_mining minhash_estimate_error"
export SPARK_GRAFT_DRIVER_MEM=48g
echo "=== PHASE A2 ($(echo $A2 | wc -w) queries, copies 10) ==="
python tools/scale_parity.py --copies 10 $A2
echo "=== PHASE B2 ($(echo $B2 | wc -w) queries, copies 3) ==="
python tools/scale_parity.py --copies 3 $B2
echo "=== SF1 SESSION 2 COMPLETE ==="
