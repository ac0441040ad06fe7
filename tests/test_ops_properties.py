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


# --- round-7: maximal repeated spans + span-clipped materialization ---

_corpus = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=18).map(
        lambda ts: " ".join(ts)
    ),
    min_size=1,
    max_size=6,
)


def _ref_spans(texts, n):
    """Pure-Python reference for max_dup_spans: per doc, merge runs of
    1-based shingle positions whose n-gram occurs in >= 2 distinct
    docs; a run covers tokens [min_pos, max_pos + n - 1]."""
    grams = {}
    for d, text in enumerate(texts):
        ws = text.lower().split(" ")
        for i in range(len(ws) - n + 1):
            grams.setdefault(" ".join(ws[i : i + n]), set()).add(d)
    out = {}
    for d, text in enumerate(texts):
        ws = text.lower().split(" ")
        pos = [
            i + 1
            for i in range(len(ws) - n + 1)
            if len(grams[" ".join(ws[i : i + n])]) >= 2
        ]
        runs, cur = [], []
        for p in pos:
            if cur and p - cur[-1] > n:
                runs.append(cur)
                cur = []
            cur.append(p)
        if cur:
            runs.append(cur)
        out[d] = [(r[0], r[-1] + n - 1) for r in runs]
    return out


@given(texts=_corpus)
@_slow
def test_max_dup_spans_matches_reference_model(spark, texts):
    from tvbigdataproject_spark.operators.dedup import max_dup_spans

    n = 3
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {}
    for r in max_dup_spans(df, n=n).collect():
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    want = {
        d: sorted(spans) for d, spans in _ref_spans(texts, n).items() if spans
    }
    assert {d: sorted(s) for d, s in got.items()} == want


@given(texts=_corpus)
@_slow
def test_apply_span_removal_matches_reference_model(spark, texts):
    from tvbigdataproject_spark.operators.dedup import (
        apply_span_removal,
        max_dup_spans,
    )

    n = 3
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    spans = max_dup_spans(df, n=n)
    got = {
        r.doc_id: (r.n_tokens_kept, r.clean_text)
        for r in apply_span_removal(df, spans).collect()
    }
    ref = _ref_spans(texts, n)
    for d, text in enumerate(texts):
        ws = text.lower().split(" ")
        covered = set()
        for lo, hi in ref[d]:
            covered.update(range(lo, hi + 1))
        kept = [w for i, w in enumerate(ws, start=1) if i not in covered]
        assert got[d] == (len(kept), " ".join(kept)), (d, text)
