#!/bin/sh
# Round-10 sf1 leg (r9 verdict item 3): the post-leg-3 additions that
# never went through the 10-copy values-compare protocol
# (negbin/transition-entropy from resampling2.py, the lead-lag xcorr,
# es_weighted_sample which the r9 campaign's 25/25 leg predates), plus
# re-validation of every query whose plan or oracle changed this round
# (WL dictionary-encoded colors, fused bow-tie sweep, the
# mann-whitney wide-double oracle, the km/na pexp clamp).
set -e
cd "$(dirname "$0")/.."
TAIL="negbin_fit_by_type transition_entropy_events xcorr_lead_lag_types \
es_weighted_sample"
CHANGED="wl_colors_trade_graph bowtie_trade_returns mann_whitney_pvalue \
km_na_survival_weekly"
NEW10="fdr_bh_qvalues good_turing_token_mass ngram_diversity_by_source \
markov_stationary_types oov_rate_by_source did_segment_revenue \
stratified_ate_priority borda_source_ranking katz_centrality_trade \
msf_trade_backbone cm_sketch_heavy_hitters markov_absorption_steps \
cuped_adjusted_ab permutation_test_segments"
echo "=== R10 TAIL ($(echo $TAIL | wc -w) queries, copies 10) ==="
python tools/scale_parity.py --copies 10 --skip-gen $TAIL
echo "=== R10 CHANGED ($(echo $CHANGED | wc -w) queries, copies 10, skip-gen) ==="
python tools/scale_parity.py --copies 10 --skip-gen $CHANGED
echo "=== R10 NEW ($(echo $NEW10 | wc -w) queries, copies 10, skip-gen) ==="
python tools/scale_parity.py --copies 10 --skip-gen $NEW10
echo "=== SF1 R10 LEG COMPLETE ==="
