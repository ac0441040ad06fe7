"""Analytics batch 17: principled attribution, dedup-quality grading,
and two-level changepoint search —

- shapley_channel_attribution  EXACT Shapley values over the four
                               pre-purchase channels — the
                               cooperative-game answer to "which
                               channel earned this conversion" that
                               last-touch / U-shaped / time-decay
                               (attribution_*) only approximate
- bcubed_dedup_eval            B-cubed precision/recall/F1 of the
                               near-dup duplicate clusters against the
                               exact-text gold grouping — the standard
                               clustering-eval metric, here grading
                               the dedup tier's own output
- binseg_two_changepoints      two-level binary segmentation of the
                               daily revenue series (exact integer
                               between-segment gain) — the multi-break
                               extension of cusum_changepoint

Everything is exact-integer inside (bitmask counts, cluster-cell
counts, prefix sums; per-cell 1e9-scaled rounding before any cross-row
float sum), so all three are full-value oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.dedup import _PAIRS_CTE
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# ---------------------------------------------------------------- Q77

_SH_CHANNELS = ("click", "error", "signup", "view")  # bit i = channel i
_SH_K = len(_SH_CHANNELS)


def _shapley_coefs() -> dict[int, list[int]]:
    """coef[j][m]: integer weight (scaled by k! = 24) that the count of
    users with exact pre-purchase channel bitmask m contributes to
    channel j's Shapley value.

    Derivation: with coalition value v(S) = #converters whose channel
    set is a subset of S, 24*phi_j = sum_S w24(|S|) (v(S+j) - v(S))
    over S not containing j, where w24(s) = s!(k-1-s)!. Expanding v as
    the subset-sum of exact-mask counts and swapping sums gives a
    closed integer coefficient per (channel, mask) — the whole Shapley
    computation collapses to ONE 16-row mask-count aggregate times a
    constant matrix. Sanity (tests replicated in the oracle by
    construction): mask {j} -> 24 (full credit), mask {j,o} -> 12
    (even split).
    """
    import math

    w24 = [
        math.factorial(s) * math.factorial(_SH_K - 1 - s)
        for s in range(_SH_K)
    ]
    coefs: dict[int, list[int]] = {}
    others = list(range(_SH_K))
    for j in range(_SH_K):
        row = [0] * (1 << _SH_K)
        rest = [c for c in others if c != j]
        for m in range(1 << _SH_K):
            if not (m >> j) & 1:
                continue  # v(S+j) - v(S) cancels for masks without j
            need = [c for c in rest if (m >> c) & 1]  # S must contain
            free = [c for c in rest if not (m >> c) & 1]
            c = 0
            for t in range(len(free) + 1):
                from math import comb

                c += comb(len(free), t) * w24[len(need) + t]
            row[m] = c
        coefs[j] = row
    return coefs


_SH_COEFS = _shapley_coefs()


def _shapley_sql() -> str:
    bits = " + ".join(
        f"(CASE WHEN bool_or(event_type = '{ch}'"
        f" AND e_us < p_us) THEN {1 << i} ELSE 0 END)"
        for i, ch in enumerate(_SH_CHANNELS)
    )
    masks = f"""
    SELECT {bits} AS m
    FROM (SELECT e.user_id, e.event_type, epoch_us(e.ts) AS e_us, p.p_us
          FROM events e
          JOIN (SELECT user_id, MIN(epoch_us(ts)) AS p_us
                FROM events WHERE event_type = 'purchase'
                GROUP BY 1) p ON e.user_id = p.user_id)
    GROUP BY user_id
    """
    cnt = f"SELECT m, CAST(COUNT(*) AS BIGINT) AS c FROM ({masks}) GROUP BY 1"
    rows = []
    for j, ch in enumerate(_SH_CHANNELS):
        terms = " + ".join(
            f"CASE WHEN m = {m} THEN c * {w} ELSE 0 END"
            for m, w in enumerate(_SH_COEFS[j])
            if w
        )
        rows.append(
            f"SELECT '{ch}' AS channel,"
            f" CAST(SUM({terms}) AS BIGINT) AS phi24 FROM ({cnt})"
        )
    return f"""
    SELECT channel, phi24,
           CAST(phi24 AS DOUBLE) / CAST(24 AS DOUBLE) AS shapley
    FROM ({' UNION ALL '.join(rows)})
    ORDER BY channel
    """


@query(
    "shapley_channel_attribution",
    sql=_shapley_sql(),
    tags=("analytics", "attribution", "causal"),
)
def shapley_channel_attribution(spark, sf_dir):
    """EXACT Shapley attribution of purchases to the four pre-purchase
    channels (event types seen strictly before the user's first
    purchase): coalition value v(S) = converters whose channel set is
    contained in S, and phi_j is the classic Shapley average of
    marginal contributions — the axiomatic attribution (efficiency +
    symmetry + dummy) that the suite's last-touch / U-shaped /
    time-decay heuristics approximate. A user who only saw channel j
    credits j fully; a {{j,o}} user splits evenly — both fall out of
    the formula, not special cases.

    Exactness: the whole game collapses to a 16-row exact-bitmask
    count times a precomputed integer coefficient matrix (k! = 24
    scaling), so phi24 is an exact BIGINT and the reported Shapley is
    one shared division by 24.

    Scale shape: one keyed join against the per-user first-purchase
    anchor, one 16-group aggregate, then constant-size arithmetic —
    the stream shuffles once on user_id.
    """
    ev = read_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    first_buy = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(us).alias("p_us"))
    )
    joined = ev.select("user_id", "event_type", us.alias("e_us")).join(
        first_buy, "user_id"
    )
    mask = sum(
        (
            F.when(
                F.max(
                    F.when(
                        (F.col("event_type") == ch)
                        & (F.col("e_us") < F.col("p_us")),
                        1,
                    ).otherwise(0)
                )
                == 1,
                F.lit(1 << i),
            ).otherwise(F.lit(0))
            for i, ch in enumerate(_SH_CHANNELS)
        ),
        F.lit(0),
    )
    cnt = (
        joined.groupBy("user_id")
        .agg(mask.alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    rows = None
    for j, ch in enumerate(_SH_CHANNELS):
        terms = " + ".join(
            f"CASE WHEN m = {m} THEN c * {w} ELSE 0 END"
            for m, w in enumerate(_SH_COEFS[j])
            if w
        )
        leg = cnt.agg(
            F.expr(f"CAST(SUM({terms}) AS BIGINT)").alias("phi24")
        ).select(F.lit(ch).alias("channel"), "phi24")
        rows = leg if rows is None else rows.unionByName(leg)
    return rows.selectExpr(
        "channel",
        "phi24",
        "CAST(phi24 AS DOUBLE) / CAST(24 AS DOUBLE) AS shapley",
    ).orderBy("channel")


# ---------------------------------------------------------------- Q78

_BC_SCALE = 1_000_000_000
_BC_F1 = (
    "CAST(2 AS DOUBLE) * p_bc * r_bc / (p_bc + r_bc)"
)


def _bcubed_sql() -> str:
    return f"""
    WITH RECURSIVE {_PAIRS_CTE},
    labeled AS (
        SELECT d.doc_id,
               COALESCE(c.component, d.doc_id) AS pred,
               md5(d.text) AS gold
        FROM documents d LEFT JOIN comp c USING (doc_id)
    ),
    cells AS (
        SELECT pred, gold, CAST(COUNT(*) AS BIGINT) AS n_cell
        FROM labeled GROUP BY 1, 2
    ),
    preds AS (SELECT pred, CAST(SUM(n_cell) AS BIGINT) AS n_pred
              FROM cells GROUP BY 1),
    golds AS (SELECT gold, CAST(SUM(n_cell) AS BIGINT) AS n_gold
              FROM cells GROUP BY 1),
    terms AS (
        SELECT CAST(ROUND(CAST(c.n_cell AS DOUBLE) * c.n_cell
                    / p.n_pred * {_BC_SCALE}) AS BIGINT) AS tp,
               CAST(ROUND(CAST(c.n_cell AS DOUBLE) * c.n_cell
                    / g.n_gold * {_BC_SCALE}) AS BIGINT) AS tr
        FROM cells c
        JOIN preds p ON c.pred = p.pred
        JOIN golds g ON c.gold = g.gold
    ),
    tot AS (
        SELECT CAST(SUM(tp) AS BIGINT) AS sp,
               CAST(SUM(tr) AS BIGINT) AS sr,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM labeled) AS n
        FROM terms
    )
    SELECT n AS n_docs, p_bc AS bcubed_precision, r_bc AS bcubed_recall,
           {_BC_F1} AS bcubed_f1
    FROM (SELECT n,
                 CAST(sp AS DOUBLE) / {_BC_SCALE} / CAST(n AS DOUBLE)
                     AS p_bc,
                 CAST(sr AS DOUBLE) / {_BC_SCALE} / CAST(n AS DOUBLE)
                     AS r_bc
          FROM tot)
    """


@query(
    "bcubed_dedup_eval",
    sql=_bcubed_sql(),
    tags=("dedup", "eval", "clustering"),
)
def bcubed_dedup_eval(spark, sf_dir):
    """B-cubed precision/recall/F1 of the near-dup duplicate clusters
    (word-3-gram Jaccard >= 0.4 pairs -> connected components, the
    dedup_components machinery; untouched docs are singletons) against
    the exact-text gold grouping (md5(text)) — the standard
    extrinsic clustering metric, here grading the dedup tier's OWN
    output: precision punishes merging distinct texts into one
    cluster, recall punishes splitting identical texts.

    Exactness: cell/cluster/gold counts are exact integers; each
    cell's n_cell^2/n term is rounded ONCE at 1e9 scale and summed as
    BIGINT (order-free), so P/R/F1 are shared-text doubles.

    Scale shape: rides the shingle-join + components discipline of
    dedup_components (digest-only shuffles, iterative label
    propagation Spark-side), then three keyed aggregates over the
    (pred, gold) cell table — bounded by the corpus, no pairwise work
    beyond the existing blocked candidate join.
    """
    from tvbigdataproject_spark.operators.components import (
        connected_components,
    )
    from tvbigdataproject_spark.operators.dedup import ngram_jaccard_pairs

    docs = read_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.4)
    comp = connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), F.col("label").alias("component")
    )
    labeled = (
        docs.select("doc_id", F.md5("text").alias("gold"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("pred"),
            "gold",
        )
    )
    cells = labeled.groupBy("pred", "gold").agg(
        F.count(F.lit(1)).cast("long").alias("n_cell")
    )
    preds = cells.groupBy("pred").agg(
        F.sum("n_cell").cast("long").alias("n_pred")
    )
    golds = cells.groupBy("gold").agg(
        F.sum("n_cell").cast("long").alias("n_gold")
    )
    terms = (
        cells.join(preds, "pred")
        .join(golds, "gold")
        .selectExpr(
            f"CAST(ROUND(CAST(n_cell AS DOUBLE) * n_cell / n_pred"
            f" * {_BC_SCALE}) AS BIGINT) AS tp",
            f"CAST(ROUND(CAST(n_cell AS DOUBLE) * n_cell / n_gold"
            f" * {_BC_SCALE}) AS BIGINT) AS tr",
        )
    )
    n = labeled.agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = terms.agg(
        F.sum("tp").cast("long").alias("sp"),
        F.sum("tr").cast("long").alias("sr"),
    ).crossJoin(F.broadcast(n))
    return tot.selectExpr(
        "n",
        f"CAST(sp AS DOUBLE) / {_BC_SCALE} / CAST(n AS DOUBLE) AS p_bc",
        f"CAST(sr AS DOUBLE) / {_BC_SCALE} / CAST(n AS DOUBLE) AS r_bc",
    ).selectExpr(
        "n AS n_docs",
        "p_bc AS bcubed_precision",
        "r_bc AS bcubed_recall",
        f"{_BC_F1} AS bcubed_f1",
    )


# ---------------------------------------------------------------- Q79

# between-segment gain of splitting [lo, hi] after position t (prefix
# sums exact BIGINT; gain in shared-text doubles): G = s_l^2/n_l +
# s_r^2/n_r - s^2/n, maximized over t with (gain DESC, day ASC) ties.
_BS_GAIN = (
    "(sl_d * sl_d / CAST(nl AS DOUBLE)"
    " + sr_d * sr_d / CAST(nr AS DOUBLE)"
    " - st_d * st_d / CAST(nt AS DOUBLE))"
)


def _binseg_sql() -> str:
    daily = """
    SELECT CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events GROUP BY 1
    """
    pref = f"""
    SELECT day, cents,
           ROW_NUMBER() OVER (ORDER BY day) AS i,
           CAST(SUM(cents) OVER (ORDER BY day) AS BIGINT) AS ps,
           COUNT(*) OVER () AS t_n,
           CAST(SUM(cents) OVER () AS BIGINT) AS t_s
    FROM ({daily})
    """
    gain1 = f"""
    SELECT day, i,
           {_BS_GAIN.replace('sl_d', 'CAST(ps AS DOUBLE)')
                    .replace('nl', 'i')
                    .replace('sr_d', 'CAST(t_s - ps AS DOUBLE)')
                    .replace('nr', '(t_n - i)')
                    .replace('st_d', 'CAST(t_s AS DOUBLE)')
                    .replace('nt', 't_n')} AS gain
    FROM ({pref}) WHERE i < t_n
    """
    best1 = f"""
    SELECT day AS d1, i AS i1, gain AS g1 FROM ({gain1})
    ORDER BY gain DESC, day LIMIT 1
    """
    seg = f"""
    SELECT p.*, b.i1,
           CASE WHEN p.i <= b.i1 THEN 0 ELSE 1 END AS seg
    FROM ({pref}) p CROSS JOIN ({best1}) b
    """
    pref2 = f"""
    SELECT day, i, seg,
           ROW_NUMBER() OVER (PARTITION BY seg ORDER BY day) AS j,
           CAST(SUM(cents) OVER (PARTITION BY seg ORDER BY day)
                AS BIGINT) AS ps2,
           COUNT(*) OVER (PARTITION BY seg) AS n2,
           CAST(SUM(cents) OVER (PARTITION BY seg) AS BIGINT) AS s2
    FROM ({seg})
    """
    gain2 = f"""
    SELECT day, seg,
           {_BS_GAIN.replace('sl_d', 'CAST(ps2 AS DOUBLE)')
                    .replace('nl', 'j')
                    .replace('sr_d', 'CAST(s2 - ps2 AS DOUBLE)')
                    .replace('nr', '(n2 - j)')
                    .replace('st_d', 'CAST(s2 AS DOUBLE)')
                    .replace('nt', 'n2')} AS gain
    FROM ({pref2}) WHERE j < n2
    """
    best2 = f"""
    SELECT day AS d2, gain AS g2 FROM ({gain2})
    ORDER BY gain DESC, day LIMIT 1
    """
    return f"""
    SELECT 1 AS split_rank, b1.d1 AS day, b1.g1 AS gain
    FROM ({best1}) b1
    UNION ALL
    SELECT 2 AS split_rank, b2.d2 AS day, b2.g2 AS gain
    FROM ({best2}) b2
    ORDER BY split_rank
    """


@query(
    "binseg_two_changepoints",
    sql=_binseg_sql(),
    tags=("analytics", "timeseries", "changepoint"),
)
def binseg_two_changepoints(spark, sf_dir):
    """Two-level binary segmentation of the daily revenue series: the
    first changepoint maximizes the between-segment gain
    G(t) = s_l^2/n_l + s_r^2/n_r - s^2/n (the SSE reduction of a mean
    split, in exact-cent prefix sums); the second is the best split
    WITHIN either resulting segment — the standard greedy multi-break
    extension of the single-shift cusum_changepoint.

    Determinism: prefix sums and counts are exact BIGINTs from cent
    sums; gains are shared-text doubles of exact inputs; both argmaxes
    break ties on (gain DESC, day ASC).

    Scale shape: events collapse map-side to the bounded day grid;
    every window (prefix sums, per-segment re-splits) runs over that
    grid only; the two argmaxes are TakeOrdered(1).
    """
    ev = read_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("day")
    wa = Window.partitionBy()
    pref = daily.select(
        "day",
        "cents",
        F.row_number().over(w).alias("i"),
        F.sum("cents").over(w).cast("long").alias("ps"),
        F.count(F.lit(1)).over(wa).alias("t_n"),
        F.sum("cents").over(wa).cast("long").alias("t_s"),
    )
    g1 = (
        _BS_GAIN.replace("sl_d", "CAST(ps AS DOUBLE)")
        .replace("nl", "i")
        .replace("sr_d", "CAST(t_s - ps AS DOUBLE)")
        .replace("nr", "(t_n - i)")
        .replace("st_d", "CAST(t_s AS DOUBLE)")
        .replace("nt", "t_n")
    )
    gain1 = pref.where(F.col("i") < F.col("t_n")).selectExpr(
        "day", "i", f"{g1} AS gain"
    )
    best1 = gain1.orderBy(F.col("gain").desc(), "day").limit(1).select(
        F.col("day").alias("d1"),
        F.col("i").alias("i1"),
        F.col("gain").alias("g1"),
    )
    seg = pref.crossJoin(F.broadcast(best1)).select(
        "day",
        "cents",
        "i",
        "g1",
        "d1",
        F.when(F.col("i") <= F.col("i1"), 0).otherwise(1).alias("seg"),
    )
    ws = Window.partitionBy("seg").orderBy("day")
    wsa = Window.partitionBy("seg")
    pref2 = seg.select(
        "day",
        "seg",
        F.row_number().over(ws).alias("j"),
        F.sum("cents").over(ws).cast("long").alias("ps2"),
        F.count(F.lit(1)).over(wsa).alias("n2"),
        F.sum("cents").over(wsa).cast("long").alias("s2"),
    )
    g2 = (
        _BS_GAIN.replace("sl_d", "CAST(ps2 AS DOUBLE)")
        .replace("nl", "j")
        .replace("sr_d", "CAST(s2 - ps2 AS DOUBLE)")
        .replace("nr", "(n2 - j)")
        .replace("st_d", "CAST(s2 AS DOUBLE)")
        .replace("nt", "n2")
    )
    gain2 = pref2.where(F.col("j") < F.col("n2")).selectExpr(
        "day", "seg", f"{g2} AS gain"
    )
    best2 = gain2.orderBy(F.col("gain").desc(), "day").limit(1).select(
        F.col("day").alias("d2"), F.col("gain").alias("g2")
    )
    one = best1.selectExpr(
        "1 AS split_rank", "d1 AS day", "g1 AS gain"
    )
    two = best2.selectExpr("2 AS split_rank", "d2 AS day", "g2 AS gain")
    return one.unionByName(two).orderBy("split_rank")
