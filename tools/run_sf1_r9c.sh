#!/bin/sh
# Round-9 sf1 continuation, session 3: session 2 (run_sf1_r9b.sh) was
# OOM-killed 25/31 queries into phase A2 (log: 25 PASS + the
# rolling_corr_28d values FAIL that became the 128-bit->double cast
# fix). This session:
#   A3: the 5 A2 queries never reached + the 6 queries whose oracles
#       changed in the cast fix + the 8 new round-9 session queries,
#       copies 10 (reuses the phase-A2 corpus — rolling_corr_28d,
#       acf, hhi, ols, zscore already re-validated by hand post-fix);
#   B2: the quadratic-oracle tier at copies 3 (regenerates), as in
#       run_sf1_r9b.sh.
set -e
cd "$(dirname "$0")/.."
A3="rich_club_coefficient hellinger_source_profiles langid_f1_report \
phrase_query_docs watermark_lateness_profile \
gini_customer_spend kruskal_wallis_value target_encode_smoothed \
trend_slope_by_type degree_assortativity_trade \
tvd_value_drift ewma_daily_anomaly quantile_normalize_chars \
rrf_fused_retrieval winnowing_fingerprints winnowing_passage_pairs \
token_fertility_by_lang embed_dim_profile"
B2="dedup_ngram_jaccard dedup_ngram_prefix dedup_minhash_lsh dedup_simhash \
dedup_containment dedup_components dedup_survivors dedup_incremental \
dedup_best_of_cluster corpus_snapshot_diff jaccard_user_similarity \
embed_neardup_pairs triangle_count_neardup clustering_coeff_neardup \
ktruss_neardup dup_span_coverage dedup_max_spans dedup_spans_applied \
fuzzy_name_pairs er_entity_clusters semdedup_prune leakage_safe_split \
decontaminate_overlap ann_lsh_bucketed dbscan_embeddings dbscan_kmeans_cells \
hard_negative_mining minhash_estimate_error"
export SPARK_GRAFT_DRIVER_MEM=32g
echo "=== PHASE A3 ($(echo $A3 | wc -w) queries, copies 10, skip-gen) ==="
python tools/scale_parity.py --copies 10 --skip-gen $A3
echo "=== PHASE B2 ($(echo $B2 | wc -w) queries, copies 3) ==="
python tools/scale_parity.py --copies 3 $B2
echo "=== SF1 SESSION 3 COMPLETE ==="
