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


def test_pvalues_in_unit_interval(spark):
    for name, col in (
        ("ab_test_pvalue", "p_two_sided"),
        ("mann_whitney_pvalue", "p_two_sided"),
        ("ks_doclen_pvalue", "p_asymptotic"),
        ("kruskal_wallis_pvalue", "p_value"),
        ("poisson_rate_ztest", "p_two_sided"),
        ("logrank_repurchase_segments", "p_value"),
    ):
        (r,) = _rows(spark, name)
        p = getattr(r, col)
        assert p is None or 0.0 <= p <= 1.0, (name, p)


def test_bootstrap_jackknife_ci_bracket_mean(spark):
    (b,) = _rows(spark, "poisson_bootstrap_ci")
    assert b.ci_lo_c <= b.mean_c <= b.ci_hi_c
    (j,) = _rows(spark, "block_jackknife_ci")
    assert j.ci_lo_c <= j.mean_c <= j.ci_hi_c
    assert j.se_jack >= 0.0


def test_km_survival_monotone(spark):
    rows = sorted(_rows(spark, "km_na_survival_weekly"),
                  key=lambda r: r.week)
    last_s, last_h = 1.0 + 1e-12, -1e-12
    for r in rows:
        assert 0.0 <= r.s_km <= last_s + 1e-9, (r.week, r.s_km)
        assert r.h_na >= last_h - 1e-9
        last_s, last_h = r.s_km, r.h_na


def test_glm_fit_matches_reference(spark):
    import numpy as np

    (r,) = _rows(spark, "logistic_irls_fit")
    # independent full-precision IRLS on the same features
    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        "SELECT lang, lower(text) FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    X, y = [], []
    for lang, text in docs:
        toks = text.split(" ")
        n_tok = len(toks)
        mwl = sum(len(w) for w in toks) / n_tok
        X.append([1.0, n_tok / 100.0, mwl / 10.0])
        y.append(1.0 if lang == "en" else 0.0)
    X = np.array(X)
    y = np.array(y)
    b = np.zeros(3)
    for _ in range(3):
        z = X @ b
        mu = 1 / (1 + np.exp(-z))
        A = X.T @ (X * (mu * (1 - mu))[:, None])
        b = b + np.linalg.solve(A, X.T @ (y - mu))
    # the engine's estimator rounds per-row terms to the 1e-9 stable
    # grain; coefficients agree to ~1e-4 on this design
    for got, want in zip((r.beta0, r.beta1, r.beta2), b):
        assert abs(got - want) <= 5e-4 * max(1.0, abs(want)), (got, want)


def test_pr_curve_exactly_one_best(spark):
    rows = _rows(spark, "pr_curve_quality")
    assert sum(r.is_best_f1 for r in rows) == 1
    for r in rows:
        if r.precision is not None:
            assert 0.0 <= r.precision <= 1.0
        assert 0.0 <= r.recall <= 1.0


def test_log_perplexity_positive(spark):
    for r in _rows(spark, "doc_log_perplexity_bigram"):
        # MLE bigram NLL is >= 0 (c2 <= c1 always)
        assert r.nll_nats >= -1e-12
        assert abs(r.ppl - math.exp(r.nll_nats)) <= 1e-9 * max(r.ppl, 1.0)
