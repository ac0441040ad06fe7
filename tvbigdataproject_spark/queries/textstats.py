"""Text-analysis operators over the documents table (north-star surface):
token counting, quality scoring, language-ID heuristic, fingerprinting.

Everything is a native Column expression — these run in the scan stage
with zero shuffles, which is exactly what a 100 TB corpus pass needs
(the whole pipeline is embarrassingly parallel map work).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_STOPWORDS = ("the", "a", "of", "and", "to", "in")

# Deterministic keyword profiles for the language-ID heuristic. The
# priority order (ties resolve to the earlier language) is part of the
# operator's contract.
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("merge", "window", "customer", "stream", "filter"),
    "de": ("small", "data", "table", "vector", "order"),
    "es": ("spark", "key", "value", "fast", "line"),
    "fr": ("join", "column", "slow", "batch", "group"),
    "zh": ("big", "row", "scan", "hash", "query"),
}


@query(
    "text_token_stats",
    sql="""
    WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws,
                      string_split_regex(lower(text), '[^a-z0-9]+') AS ws_re
               FROM documents)
    SELECT doc_id,
           len(ws) AS n_tokens,
           len(list_distinct(ws)) AS n_distinct_tokens,
           len(list_filter(ws_re, x -> x <> '')) AS n_alnum_tokens,
           list_aggregate(list_transform(ws, w -> length(w)), 'sum') * 1.0 / len(ws)
               AS avg_token_len,
           n_chars
    FROM t
    """,
    tags=("text",),
)
def text_token_stats(spark, sf_dir):
    """Token counting: whitespace tokens, distinct tokens, regex
    (alphanumeric-run) tokens, mean token length."""
    docs = read_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    ws_re = F.split(F.lower("text"), r"[^a-z0-9]+")
    return docs.select(
        "doc_id",
        F.size(ws).alias("n_tokens"),
        F.size(F.array_distinct(ws)).alias("n_distinct_tokens"),
        F.size(F.filter(ws_re, lambda x: x != "")).alias("n_alnum_tokens"),
        (
            F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
            / F.size(ws)
        ).alias("avg_token_len"),
        "n_chars",
    )


@query(
    "text_quality_score",
    sql=f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    m AS (SELECT doc_id,
                 len(ws) AS n_tokens,
                 len(list_filter(ws, w -> w IN {_STOPWORDS!r})) AS n_stop,
                 len(list_distinct(ws)) AS n_distinct
          FROM t)
    SELECT doc_id,
           n_stop * 1.0 / n_tokens AS stopword_ratio,
           n_distinct * 1.0 / n_tokens AS distinct_ratio,
           0.5 * LEAST(n_tokens / 100.0, 1.0)
                 + 0.3 * (n_distinct * 1.0 / n_tokens)
                 + 0.2 * LEAST(n_stop * 5.0 / n_tokens, 1.0) AS quality_score
    FROM m
    """,
    tags=("text",),
)
def text_quality_score(spark, sf_dir):
    """Heuristic quality score: length saturation + lexical diversity +
    stopword presence (the classic cheap pre-filter for training data).
    Definition shared with plans/llm_prep.py via operators.textstats."""
    from tvbigdataproject_spark.operators.textstats import quality_metrics

    docs = read_table(spark, sf_dir, "documents")
    m = quality_metrics(F.col("text"), _STOPWORDS)
    return docs.select(
        "doc_id",
        m["stopword_ratio"].alias("stopword_ratio"),
        m["distinct_ratio"].alias("distinct_ratio"),
        m["quality_score"].alias("quality_score"),
    )


def _langid_sql() -> str:
    score_cols = ",\n           ".join(
        f"len(list_filter(ws, w -> w IN {kw!r})) AS s_{lang}"
        for lang, kw in _LANG_PROFILES.items()
    )
    langs = list(_LANG_PROFILES)
    branches = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"s_{lang} >= s_{other}" for other in langs[i + 1 :])
        branches.append(f"WHEN {conds} THEN '{lang}'")
    case = "CASE " + " ".join(branches) + f" ELSE '{langs[-1]}' END"
    return f"""
    WITH t AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS ws FROM documents),
    s AS (SELECT doc_id, lang,
           {score_cols}
          FROM t)
    SELECT doc_id, {case} AS predicted_lang,
           CASE WHEN {case} = lang THEN 1 ELSE 0 END AS is_match
    FROM s
    """


@query("text_langid", sql=_langid_sql(), tags=("text", "langid"))
def text_langid(spark, sf_dir):
    """Language-ID heuristic: keyword-profile scores with a deterministic
    priority argmax. (The synthetic corpus shares one vocabulary across
    its `lang` labels, so accuracy is not the contract — the deterministic
    scoring function is.)"""
    from tvbigdataproject_spark.functions.text import _bind

    docs = read_table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")

    # unary-lambda factory: Spark higher-order fns dispatch on lambda
    # arity, so the keyword set must be closed over, not a default arg
    def member_of(kw):
        return lambda w: w.isin(*kw)

    # let-bind the token array once: referencing the raw split() in all
    # five profile filters re-tokenizes per profile (measured 0.57s ->
    # 0.42s at sf0.1 — the round-5 A/B of the vs-r1 drift; the struct
    # packs the five counts through one bound array)
    def body(wsb):
        return F.struct(
            *[
                F.size(F.filter(wsb, member_of(kw))).alias(f"s_{lang}")
                for lang, kw in _LANG_PROFILES.items()
            ]
        )

    scored = docs.select("doc_id", "lang", _bind(ws, body).alias("s")).select(
        "doc_id",
        "lang",
        *[F.col(f"s.s_{lang}").alias(f"s_{lang}") for lang in _LANG_PROFILES],
    )
    langs = list(_LANG_PROFILES)
    pred = None
    for i, lang in enumerate(langs[:-1]):
        cond = None
        for other in langs[i + 1 :]:
            c = F.col(f"s_{lang}") >= F.col(f"s_{other}")
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    pred = pred.otherwise(langs[-1])
    return scored.select(
        "doc_id",
        pred.alias("predicted_lang"),
        F.when(pred == F.col("lang"), 1).otherwise(0).alias("is_match"),
    )


@query(
    "text_fingerprint",
    sql="""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i)
    ),
    sig AS (
        SELECT doc_id,
               MIN(substr(md5('0:' || s), 1, 8))  AS h0,
               MIN(substr(md5('0:' || s), 9, 8))  AS h1,
               MIN(substr(md5('0:' || s), 17, 8)) AS h2,
               MIN(substr(md5('0:' || s), 25, 8)) AS h3
        FROM sh GROUP BY doc_id
    )
    SELECT doc_id, md5(h0 || h1 || h2 || h3) AS fingerprint FROM sig
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprint: md5 over a 4-component min-hash sketch of the
    word-3-gram shingles — a fixed-width content signature that is stable
    under shingle reordering (the batch analogue of a rolling-hash
    winnowing sketch, computed without any shuffle)."""
    from tvbigdataproject_spark.functions import minhash_signature, shingles

    docs = read_table(spark, sf_dir, "documents")
    with_sh = docs.select("doc_id", shingles(F.col("text"), 3).alias("shs")).where(
        F.size("shs") > 0
    )
    sig = with_sh.select("doc_id", minhash_signature(F.col("shs"), num_hashes=4).alias("sig"))
    return sig.select(
        "doc_id",
        F.md5(F.concat_ws("", F.col("sig"))).alias("fingerprint"),
    )
