"""Property-based tests (hypothesis) for the round-4 operators:
skyline dominance invariants and SSSP relaxation laws on random
inputs — the same strategy the function library uses (small example
budgets; each example is a full Spark job)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tvbigdataproject_spark.operators.skyline import skyline_2d
from tvbigdataproject_spark.operators.traversal import sssp_bounded

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

points = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 10), st.integers(0, 10)),
    min_size=1,
    max_size=40,
)


def _dominates(q, p):
    return q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])


@given(rows=points)
@_slow
def test_skyline_is_exactly_the_undominated_set(spark, rows):
    # dedupe ids so rows are distinguishable, keep duplicate extents
    rows = [(i, float(p), s) for i, (_, p, s) in enumerate(rows)]
    df = spark.createDataFrame(rows, "id long, price double, size long")
    got = {tuple(r) for r in skyline_2d(df, "price", "size").collect()}
    want = {
        p for p in rows if not any(_dominates(q, p) for q in rows)
    }
    assert got == want


edges = st.lists(
    st.tuples(st.integers(1, 6), st.integers(1, 6), st.integers(1, 9)),
    min_size=1,
    max_size=15,
)


def _floyd_bounded(edge_list, source, rounds):
    """Reference: min-cost path with <= rounds edges, by DP over hops."""
    best = {source: 0}
    for _ in range(rounds):
        nxt = dict(best)
        for s, d, w in edge_list:
            if s in best and best[s] + w < nxt.get(d, float("inf")):
                nxt[d] = best[s] + w
        best = nxt
    return best


@given(es=edges, rounds=st.integers(1, 4))
@_slow
def test_sssp_matches_reference_dp(spark, es, rounds):
    df = spark.createDataFrame(es, "src long, dst long, w long")
    got = {r.node: r.dist for r in sssp_bounded(df, source=1, rounds=rounds).collect()}
    assert got == _floyd_bounded(es, 1, rounds)


@given(es=edges)
@_slow
def test_sssp_distances_never_increase_with_more_rounds(spark, es):
    df = spark.createDataFrame(es, "src long, dst long, w long")
    d1 = {r.node: r.dist for r in sssp_bounded(df, source=1, rounds=1).collect()}
    d3 = {r.node: r.dist for r in sssp_bounded(df, source=1, rounds=3).collect()}
    assert set(d1) <= set(d3)
    assert all(d3[n] <= d1[n] for n in d1)


# --- running-balance clamp laws (queries/analytic5.py) ---------------

deltas = st.lists(st.integers(-8000, 8000), min_size=1, max_size=60)


@given(ds=deltas)
@settings(max_examples=200, deadline=None)
def test_floor_clamp_closed_form_identity(ds):
    # the window form used by capped_running_balance: bal_n =
    # S_n - min(0, min_{k<=n} S_k) must equal the sequential
    # definition bal_n = max(0, bal_{n-1} + d_n)
    bal, seq = 0, []
    for d in ds:
        bal = max(0, bal + d)
        seq.append(bal)
    s = run_min = 0
    closed = []
    for d in ds:
        s += d
        run_min = min(run_min, s)
        closed.append(s - min(0, run_min))
    assert closed == seq


@given(ds=deltas)
@settings(max_examples=200, deadline=None)
def test_two_sided_clamp_matches_pandas_walk(ds):
    # the applyInPandas kernel (clamped_inventory_balance) against the
    # sequential definition, and the cap/floor bounds always hold
    import pandas as pd

    from tvbigdataproject_spark.queries.analytic5 import (
        _DRAIN_CENTS,
        _INVENTORY_CAP_CENTS,
        _clamped_walk,
    )

    pdf = pd.DataFrame(
        {
            "user_id": [1] * len(ds),
            "ts": range(len(ds)),
            "event_id": range(len(ds)),
            # kernel recomputes d = round(value*100) - drain
            "value": [(d + _DRAIN_CENTS) / 100.0 for d in ds],
        }
    )
    got = _clamped_walk(pdf)["bal_cents"].tolist()
    bal, want = 0, []
    for d in ds:
        bal = min(_INVENTORY_CAP_CENTS, max(0, bal + d))
        want.append(bal)
    assert got == want
    assert all(0 <= b <= _INVENTORY_CAP_CENTS for b in got)
