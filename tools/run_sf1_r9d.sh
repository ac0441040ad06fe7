#!/bin/sh
# Round-9 sf1 final leg: A4 = the 4 A3 queries the rich_club oracle
# stall blocked + all 12 queries added this session, copies 10
# (skip-gen; rich_club itself re-validated by hand after the histogram
# rewrite); B2 = the quadratic-oracle tier at copies 3 (regenerates).
set -e
cd "$(dirname "$0")/.."
A4="hellinger_source_profiles langid_f1_report phrase_query_docs \
watermark_lateness_profile tvd_value_drift ewma_daily_anomaly \
quantile_normalize_chars rrf_fused_retrieval winnowing_fingerprints \
winnowing_passage_pairs token_fertility_by_lang embed_dim_profile \
dist_moments_by_segment avg_neighbor_degree embed_covariance_pairs \
bowtie_trade_returns"
B2="dedup_ngram_jaccard dedup_ngram_prefix dedup_minhash_lsh dedup_simhash \
dedup_containment dedup_components dedup_survivors dedup_incremental \
dedup_best_of_cluster corpus_snapshot_diff jaccard_user_similarity \
embed_neardup_pairs triangle_count_neardup clustering_coeff_neardup \
ktruss_neardup dup_span_coverage dedup_max_spans dedup_spans_applied \
fuzzy_name_pairs er_entity_clusters semdedup_prune leakage_safe_split \
decontaminate_overlap ann_lsh_bucketed dbscan_embeddings dbscan_kmeans_cells \
hard_negative_mining minhash_estimate_error"
export SPARK_GRAFT_DRIVER_MEM=32g
echo "=== PHASE A4 ($(echo $A4 | wc -w) queries, copies 10, skip-gen) ==="
python tools/scale_parity.py --copies 10 --skip-gen $A4
echo "=== PHASE B2 ($(echo $B2 | wc -w) queries, copies 3) ==="
python tools/scale_parity.py --copies 3 $B2
echo "=== SF1 SESSION 4 COMPLETE ==="
