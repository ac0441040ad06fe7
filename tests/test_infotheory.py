"""Semantic bounds for the portable-kernel metric family (sf0.001).

Value-level cross-engine parity is tools/check_parity.py's job; these
pin the METRIC invariants the definitions promise — the checks that
would catch a sign flip or a swapped numerator that parity alone
cannot (both engines would agree on the wrong number).
"""

from __future__ import annotations

import math

from tvbigdataproject_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF_DIR).collect()


def test_entropy_perplexity_consistent(spark):
    for r in _rows(spark, "token_entropy_by_source"):
        assert 0.0 <= r.entropy_nats <= math.log(max(r.n_types, 1)) + 1e-9
        # perplexity must be exp(entropy) to kernel accuracy
        assert abs(r.perplexity - math.exp(r.entropy_nats)) <= 1e-9 * max(
            r.perplexity, 1.0
        )
        assert r.n_types <= r.n_tokens


def test_mutual_info_bounds(spark):
    (r,) = _rows(spark, "mutual_info_lang_source")
    assert 0.0 - 1e-9 <= r.mi_nats <= min(r.h_lang, r.h_source) + 1e-9
    assert -1e-9 <= r.nmi <= 1.0 + 1e-9


def test_theil_nonnegative(spark):
    for r in _rows(spark, "theil_index_by_nation"):
        # Theil T and L are >= 0 up to the 1e-9 stable-sum grain
        assert r.theil_t >= -1e-8
        assert r.theil_l >= -1e-8


def test_jsd_bounds(spark):
    ln2 = math.log(2.0)
    for r in _rows(spark, "js_divergence_by_source"):
        assert -1e-9 <= r.jsd_nats <= ln2 + 1e-9
        assert abs(r.js_distance - math.sqrt(max(r.jsd_nats, 0.0))) <= 1e-9


def test_auc_bounds(spark):
    (r,) = _rows(spark, "auc_quality_langid")
    assert 0.0 <= r.auc <= 1.0
    assert r.n_pos > 0 and r.n_neg > 0


def test_ndcg_bounds(spark):
    (r,) = _rows(spark, "ndcg_bm25_eval")
    assert 0.0 < r.ndcg <= 1.0 + 1e-12
    assert r.dcg_ln <= r.idcg_ln + 1e-9


def test_info_gain_bounds(spark):
    rows = _rows(spark, "info_gain_lang_features")
    assert len(rows) == 3
    for r in rows:
        # IG in [0, H(lang)] up to stable-sum grain
        assert -1e-6 <= r.ig_nats <= r.h_lang + 1e-6


def test_conformal_coverage_sane(spark):
    for r in _rows(spark, "conformal_interval_coverage"):
        assert 0.0 <= r.coverage <= 1.0
        assert r.n_covered <= r.n_test


def test_softmax_shares_sum_to_one(spark):
    rows = _rows(spark, "softmax_temperature_weights")
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, 0.0)
        by_lang[r.lang] += r.share
        assert r.w_unnorm > 0
    for lang, s in by_lang.items():
        assert abs(s - 1.0) <= 1e-6, (lang, s)


def test_log_perplexity_positive(spark):
    for r in _rows(spark, "doc_log_perplexity_bigram"):
        # MLE bigram NLL is >= 0 (c2 <= c1 always)
        assert r.nll_nats >= -1e-12
        assert abs(r.ppl - math.exp(r.nll_nats)) <= 1e-9 * max(r.ppl, 1.0)
