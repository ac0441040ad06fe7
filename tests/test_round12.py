"""Round-12 operator tests: mathematical ground truth for the new
sequential-stats / robust-fit tier (oracle parity pins cross-engine
equality; these pin the MATH — a bug shared by both engines would
pass the gate, so the fits are checked against independent
references: numpy linear algebra and brute-force PAVA)."""

from __future__ import annotations

import numpy as np
import pytest

from tvbigdataproject_spark.queries.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF).collect()


def _daily(spark):
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    rows = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y"))
        .select(
            F.datediff("day", F.lit("1992-01-01").cast("date")).alias("x"), "y"
        )
        .orderBy("x")
        .collect()
    )
    return np.array([r["x"] for r in rows]), np.array(
        [float(r["y"]) for r in rows]
    )


def test_pacf_matches_numpy_yule_walker(spark):
    x, y = _daily(spark)
    e = y - y.mean()
    den = (e * e).sum()
    # equi-join lag pairing over the day GRID (the query's documented
    # semantics): pair t with t+k only when both days exist
    idx = {int(v): i for i, v in enumerate(x)}
    r = []
    for k in (1, 2, 3):
        s = sum(
            e[i] * e[idx[int(v) + k]]
            for i, v in enumerate(x)
            if int(v) + k in idx
        )
        r.append(s / den)
    r1, r2, r3 = r
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    p21 = r1 - phi22 * r1
    phi33 = (r3 - p21 * r2 - phi22 * r1) / (1 - p21 * r1 - phi22 * r2)
    row = _rows(spark, "pacf_daily_revenue")[0]
    assert row["pacf1"] == pytest.approx(r1, abs=1e-9)
    assert row["pacf2"] == pytest.approx(phi22, abs=1e-9)
    assert row["pacf3"] == pytest.approx(phi33, abs=1e-9)


def test_motif_pairs_match_numpy_bruteforce(spark):
    x, y = _daily(spark)
    idx = {int(v): i for i, v in enumerate(x)}
    wins = {}
    for v in x:
        v = int(v)
        if all(v + j in idx for j in range(7)):
            wins[v] = np.array([y[idx[v + j]] for j in range(7)])
    best = []
    starts = sorted(wins)
    for i, a in enumerate(starts):
        for b in starts[i + 1 :]:
            if b >= a + 7:
                d = wins[a] - wins[b]
                best.append((float((d * d).sum()), a, b))
    best.sort()
    got = _rows(spark, "ts_motif_pairs")
    assert len(got) == 10
    for row, (d, a, b) in zip(got, best[:10]):
        assert (row["a_start"], row["b_start"]) == (a, b)
        assert row["dist2_d"] == pytest.approx(d, rel=1e-12)


def test_isotonic_matches_pava(spark):
    from pyspark.sql import functions as F

    got = sorted(
        _rows(spark, "isotonic_weekly_trend"), key=lambda r: r["wk"]
    )
    y = np.array([float(r["y"]) for r in got])
    # brute-force PAVA (pool adjacent violators) on the same series
    blocks = [[v, 1] for v in y]  # [sum, count]
    out = []
    for s, c in blocks:
        out.append([s, c])
        while len(out) > 1 and out[-2][0] / out[-2][1] > out[-1][0] / out[-1][1]:
            s2, c2 = out.pop()
            out[-1][0] += s2
            out[-1][1] += c2
    fit = np.concatenate([[s / c] * c for s, c in out])
    yhat = np.array([r["yhat"] for r in got])
    assert np.all(np.diff(yhat) >= -1e-9)  # monotone
    assert yhat == pytest.approx(fit, rel=1e-9)


def test_huber_downweights_and_converges(spark):
    row = _rows(spark, "huber_irls_location")[0]
    mus = [row[f"mu{i}"] for i in range(4)]
    # IRLS steps shrink: |mu3 - mu2| <= |mu1 - mu0|
    assert abs(mus[3] - mus[2]) <= abs(mus[1] - mus[0]) + 1e-9
    # acctbal is left-skewed toward -999 outliers; the robust location
    # must move from the plain mean but stay inside the data range
    assert -999.99 <= mus[3] <= 9999.99 and row["n"] > 0


def test_vif_matches_numpy_inverse(spark):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    rows = li.select(
        F.col("l_quantity").cast("double"),
        F.col("l_discount").cast("double"),
        F.col("l_tax").cast("double"),
    ).collect()
    m = np.array([[r[0], r[1], r[2]] for r in rows])
    R = np.corrcoef(m, rowvar=False)
    vif = np.diag(np.linalg.inv(R))
    got = _rows(spark, "vif_lineitem_features")[0]
    assert got["vif_quantity"] == pytest.approx(vif[0], rel=1e-6)
    assert got["vif_discount"] == pytest.approx(vif[1], rel=1e-6)
    assert got["vif_tax"] == pytest.approx(vif[2], rel=1e-6)


def test_ridge_lambda0_is_ols_and_shrinks(spark):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    rows = li.select(
        F.col("l_quantity").cast("double"),
        F.col("l_discount").cast("double"),
        F.col("l_extendedprice").cast("double"),
    ).collect()
    m = np.array([[r[0], r[1], r[2]] for r in rows])
    # the operator's documented units: discount in hundredths, price
    # in cents (exact-integer moment space; ridge is scale-dependent,
    # so the unit convention IS part of the spec)
    m[:, 1] *= 100.0
    m[:, 2] *= 100.0
    X = m[:, :2] - m[:, :2].mean(axis=0)
    yv = m[:, 2] - m[:, 2].mean()
    C = X.T @ X / len(m)
    cy = X.T @ yv / len(m)
    got = {r["lam"]: r for r in _rows(spark, "ridge_path_qty_discount")}
    for lam in (0.0, 0.1, 1.0, 10.0):
        beta = np.linalg.solve(C + lam * np.eye(2), cy)
        assert got[lam]["beta_qty"] == pytest.approx(beta[0], rel=1e-6)
        assert got[lam]["beta_disc"] == pytest.approx(beta[1], rel=1e-6)
    # shrinkage monotone in magnitude for the dominant coefficient
    assert abs(got[10.0]["beta_qty"]) < abs(got[0.0]["beta_qty"])


def test_neyman_shares_sum_to_one(spark):
    rows = _rows(spark, "neyman_allocation_segments")
    assert len(rows) == 5
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=1e-9)
    assert all(r["sigma"] > 0 for r in rows)
    # allocation within rounding of the budget
    assert abs(sum(r["n_alloc"] for r in rows) - 10_000) <= len(rows)


def test_scurve_probabilities_monotone(spark):
    rows = _rows(spark, "minhash_scurve_design")
    by = {(r["bands"], r["rows_per_band"]): r for r in rows}
    assert len(by) == 6
    # more bands at fixed r => more expected candidates AND recall
    for r in (2, 4):
        for blo, bhi in ((2, 4), (4, 8)):
            assert (
                by[(bhi, r)]["exp_candidates"]
                >= by[(blo, r)]["exp_candidates"] - 1e-9
            )
            assert (
                by[(bhi, r)]["exp_recall_04"]
                >= by[(blo, r)]["exp_recall_04"] - 1e-9
            )
    # recall is a probability
    assert all(0.0 <= r["exp_recall_04"] <= 1.0 + 1e-9 for r in rows)


def test_reciprocity_bounds_and_handcheck(spark):
    row = _rows(spark, "graph_reciprocity")[0]
    assert 0 <= row["n_reciprocal"] <= row["n_edges"]
    assert row["reciprocity"] == pytest.approx(
        row["n_reciprocal"] / row["n_edges"], abs=1e-12
    )
    # loop-free reciprocity: |E ∩ E^T| counts directed edges whose
    # reverse exists; with self-loops excluded every reciprocal dyad
    # contributes exactly 2, so the count is even (this test caught
    # the (0,0) id-collision self-loop the operator now filters)
    assert row["n_reciprocal"] % 2 == 0


def test_page_hinkley_excursion_nonnegative(spark):
    row = _rows(spark, "page_hinkley_drift")[0]
    assert row["max_excursion_milli"] >= 0
    assert row["n_days"] > 0
    # the argmax day lies inside the observed day range
    assert 0 <= row["argmax_day"] <= 4000

def test_ljung_box_matches_manual(spark):
    x, y = _daily(spark)
    e = y - y.mean()
    den = (e * e).sum()
    idx = {int(v): i for i, v in enumerate(x)}
    n = len(y)
    q = 0.0
    for k in range(1, 8):
        s = sum(
            e[i] * e[idx[int(v) + k]]
            for i, v in enumerate(x)
            if int(v) + k in idx
        )
        rk = s / den
        q += rk * rk / (n - k)
    q *= n * (n + 2)
    row = _rows(spark, "ljung_box_daily")[0]
    # per-lag 1e-12 rounding makes the engine value exact-by-spec;
    # the manual float replay agrees to ~1e-6 relative
    assert row["q_ljung_box"] == pytest.approx(q, rel=1e-6)
    assert row["n"] == n


def test_cvm_matches_numpy_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = docs.select("lang", "n_chars").collect()
    a = sorted(r["n_chars"] for r in rows if r["lang"] == "en")
    b = sorted(r["n_chars"] for r in rows if r["lang"] == "zh")
    na, nb = len(a), len(b)
    pooled = sorted(a + b)
    import bisect

    s = 0.0
    for v in pooled:
        f1 = bisect.bisect_right(a, v) / na
        f2 = bisect.bisect_right(b, v) / nb
        s += (f1 - f2) ** 2
    t = s * na * nb / (na + nb) ** 2
    row = _rows(spark, "cvm_doclen_lang")[0]
    assert (row["na"], row["nb"]) == (na, nb)
    assert row["cvm_t"] == pytest.approx(t, rel=1e-9)


def test_entropy_rate_bounds(spark):
    row = _rows(spark, "entropy_rate_markov")[0]
    # 0 <= H <= ln(#states); states bounded by event types (<= 8)
    assert 0.0 <= row["entropy_rate_nats"] <= np.log(8) + 1e-9
    assert row["n_cells"] >= 1


def test_capture_recapture_consistency(spark):
    row = _rows(spark, "capture_recapture_users")[0]
    assert 0 <= row["overlap"] <= min(row["n1"], row["n2"])
    # Chapman is >= the larger sample - 1 and finite
    assert row["chapman_estimate"] >= max(row["n1"], row["n2"]) - 1 - 1e-9
    # on event data the true population bounds the estimate loosely
    assert row["true_users"] >= max(row["n1"], row["n2"])


def test_hurst_in_plausible_range(spark):
    row = _rows(spark, "hurst_rs_daily")[0]
    # R/S grows with block size for any real series
    assert row["rs16"] < row["rs128"]
    # H in (0, 1.2): the estimator caps near 1 for deterministic
    # trends; negative or >1.2 means broken math
    assert 0.0 < row["hurst"] < 1.2


def test_tail_dependence_is_probability(spark):
    row = _rows(spark, "tail_dependence_nations")[0]
    assert 0 <= row["n_joint_extreme"] <= row["n_b_extreme"]
    assert 0.0 <= row["lambda_upper"] <= 1.0


def test_anderson_darling_vs_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = docs.select("lang", "n_chars").collect()
    a = sorted(r["n_chars"] for r in rows if r["lang"] == "en")
    b = sorted(r["n_chars"] for r in rows if r["lang"] == "zh")
    na, nb = len(a), len(b)
    nn = na + nb
    import bisect
    from collections import Counter

    mult = Counter(a + b)
    s = 0.0
    for v in sorted(mult):
        cuma = bisect.bisect_right(a, v)
        cumn = bisect.bisect_right(a, v) + bisect.bisect_right(b, v)
        if cumn >= nn:
            continue
        gap = cuma * nn - cumn * na
        s += mult[v] * gap * gap / (cumn * (nn - cumn))
    a2 = s / (na * nb)
    row = _rows(spark, "anderson_darling_doclen")[0]
    assert (row["na"], row["nb"]) == (na, nb)
    assert row["ad_a2"] == pytest.approx(a2, rel=1e-6)


def test_rank_biserial_in_range_and_consistent(spark):
    row = _rows(spark, "rank_biserial_mwu")[0]
    assert -1.0 <= row["rank_biserial"] <= 1.0
    # r = 1 - 2*U1/(n1*n2) replayed from the row's own U1
    assert row["rank_biserial"] == pytest.approx(
        1.0 - 2.0 * row["u1"] / (row["n1"] * row["n2"]), abs=1e-9
    )


def test_cohens_d_matches_numpy(spark):
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    rows = cust.select("c_mktsegment", "c_acctbal").collect()
    g1 = np.array(
        [r["c_acctbal"] for r in rows if r["c_mktsegment"] == "BUILDING"]
    )
    g2 = np.array(
        [r["c_acctbal"] for r in rows if r["c_mktsegment"] == "MACHINERY"]
    )
    sp = np.sqrt(
        ((len(g1) - 1) * g1.var(ddof=1) + (len(g2) - 1) * g2.var(ddof=1))
        / (len(g1) + len(g2) - 2)
    )
    d = (g1.mean() - g2.mean()) / sp
    row = _rows(spark, "cohens_d_segments")[0]
    assert row["cohens_d"] == pytest.approx(d, rel=1e-9)
    assert abs(row["hedges_g"]) < abs(row["cohens_d"])


def test_odds_ratio_ci_covers_point(spark):
    row = _rows(spark, "odds_ratio_doclen_lang")[0]
    assert row["a"] + row["b"] > 0 and row["c"] + row["d"] > 0
    want = (row["a"] * row["d"]) / (row["b"] * row["c"])
    assert row["odds_ratio"] == pytest.approx(want, rel=1e-12)
    assert row["ci_lo"] <= row["odds_ratio"] <= row["ci_hi"]
    # portable exp/ln round-trip: ci bounds replay from ln_or +/- z*se
    assert row["ci_lo"] == pytest.approx(
        np.exp(row["ln_or"] - 1.959963984540054 * row["se_ln_or"]),
        rel=1e-9,
    )
