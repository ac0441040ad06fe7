#!/bin/sh
# Round-9 sf1 full-suite re-validation (round-8 verdict item 3):
# phase A = every query EXCEPT the quadratic-oracle dedup/pair tier at
# --copies 10; phase B = that tier at --copies 3 (their brute DuckDB
# oracles are quadratic in dup density — the r3/r4 protocol).
set -e
cd "$(dirname "$0")/.."
PHASE_B="dedup_ngram_jaccard dedup_ngram_prefix dedup_minhash_lsh dedup_simhash \
dedup_containment dedup_components dedup_survivors dedup_incremental \
dedup_best_of_cluster corpus_snapshot_diff jaccard_user_similarity \
embed_neardup_pairs triangle_count_neardup clustering_coeff_neardup \
ktruss_neardup dup_span_coverage dedup_max_spans dedup_spans_applied \
fuzzy_name_pairs er_entity_clusters semdedup_prune leakage_safe_split \
decontaminate_overlap ann_lsh_bucketed dbscan_embeddings dbscan_kmeans_cells"
PHASE_A=$(python - <<EOF
import sys; sys.path.insert(0, ".")
from tvbigdataproject_spark.queries import REGISTRY
b = set("""$PHASE_B""".split())
print(" ".join(sorted(set(REGISTRY) - b)))
EOF
)
export SPARK_GRAFT_DRIVER_MEM=48g
echo "=== PHASE A ($(echo $PHASE_A | wc -w) queries, copies 10) ==="
python tools/scale_parity.py --copies 10 $PHASE_A
echo "=== PHASE B ($(echo $PHASE_B | wc -w) queries, copies 3) ==="
python tools/scale_parity.py --copies 3 $PHASE_B
echo "=== SF1 RUN COMPLETE ==="
