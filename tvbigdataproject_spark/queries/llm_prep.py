"""Oracle check for the composed training-data prep pipeline."""

from __future__ import annotations

from tvbigdataproject_spark.plans.llm_prep import prepare_corpus
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "llm_prep_pipeline",
    sql="""
    WITH t AS (
        SELECT doc_id, lang, source, text, string_split(lower(text), ' ') AS ws
        FROM documents
    ),
    m AS (
        SELECT doc_id, lang, source, text,
               len(ws) AS n_tokens,
               0.5 * LEAST(len(ws) / 100.0, 1.0)
                 + 0.3 * (len(list_distinct(ws)) * 1.0 / len(ws))
                 + 0.2 * LEAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in')))
                               * 5.0 / len(ws), 1.0) AS quality_score
        FROM t
    ),
    gated AS (
        SELECT * FROM m WHERE n_tokens >= 20 AND quality_score >= 0.45
    ),
    keep AS (
        SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(text)
    ),
    kept AS (
        SELECT g.* FROM gated g JOIN keep k ON g.doc_id = k.doc_id
    ),
    toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws2 FROM kept),
    sh AS (
        SELECT DISTINCT doc_id, ws2[i] || ' ' || ws2[i+1] || ' ' || ws2[i+2] AS s
        FROM toks, UNNEST(range(1, len(ws2) - 1)) AS r(i)
    ),
    sig AS (
        SELECT doc_id,
               md5(MIN(substr(md5('0:' || s), 1, 8))
                   || MIN(substr(md5('0:' || s), 9, 8))
                   || MIN(substr(md5('0:' || s), 17, 8))
                   || MIN(substr(md5('0:' || s), 25, 8))) AS fingerprint
        FROM sh GROUP BY doc_id
    )
    SELECT k.doc_id, k.lang, k.source, k.n_tokens, k.quality_score, sig.fingerprint
    FROM kept k LEFT JOIN sig ON k.doc_id = sig.doc_id
    """,
    tags=("pipeline", "dedup", "text"),
)
def llm_prep_pipeline(spark, sf_dir):
    """The composed corpus-prep pass (plans/llm_prep.py): quality gate →
    exact dedup → stats + fingerprint — checked end-to-end as one query,
    which pins not just each operator but their composition (filter
    thresholds, dedup keep-rule, fingerprint definition)."""
    return prepare_corpus(read_table(spark, sf_dir, "documents"))
