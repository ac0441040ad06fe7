"""Training-data pipeline operators, batch 8: PII detection/redaction.

The privacy-scrub stage of a pretraining pipeline (operators/pii.py
holds the regex tiers and the scale rationale). The synthetic corpus
carries no organic PII, so the registered query embeds DETERMINISTIC
PII derived from each row's own columns before scanning — the
detection counts and the md5 of the scrubbed text then carry real
signal, and the DuckDB oracle replays augmentation, counting, and
redaction bit-for-bit (the patterns live in the RE2 ∩ Java-regex
subset precisely so both engines agree).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.operators.pii import PII_PATTERNS, pii_scan
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# SQL twins of the shared patterns — single-quoted RE2 (DuckDB standard
# strings do not process backslashes, so the patterns paste verbatim)
_SQL_AUG = """
        'contact ' || source || '.' || lang || '@example.com call 415-555-'
        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1 '
        || CASE WHEN doc_id % 3 = 0 THEN 'ssn 123-45-6789 ' ELSE '' END
        || CASE WHEN doc_id % 5 = 0 THEN 'card 4111-1111-1111-1111 ' ELSE '' END
        || text
"""


def _pii_sql() -> str:
    redacted = "aug"
    count_cols = []
    for name, pat, repl in PII_PATTERNS:
        count_cols.append(
            f"len(regexp_extract_all({redacted}, '{pat}')) AS n_{name}"
        )
        redacted = f"regexp_replace({redacted}, '{pat}', '{repl}', 'g')"
    counts = ",\n           ".join(count_cols)
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return f"""
    WITH t AS (SELECT doc_id, {_SQL_AUG} AS aug FROM documents),
    c AS (SELECT doc_id,
           {counts},
           md5({redacted}) AS redacted_md5
          FROM t)
    SELECT doc_id, {total} AS n_pii, n_email, n_credit_card, n_ssn,
           n_phone, n_ipv4, redacted_md5
    FROM c
    """


@query("pii_redaction", sql=_pii_sql(), tags=("llm", "pii", "privacy"))
def pii_redaction(spark, sf_dir):
    """PII scan + redaction over the (deterministically augmented)
    documents table: per-class match counts measured on progressively
    redacted text — so overlapping classes never double-count — plus
    the md5 digest of the fully scrubbed text, which value-checks the
    complete redaction without shipping document bodies through the
    compare. Scan-local: regexp_count/regexp_replace in whole-stage
    codegen, zero shuffles, zero UDFs — at 100 TB this stage is
    document-scan-bandwidth-bound, which is the optimum for a per-row
    rewrite.
    """
    docs = read_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.lit("contact "),
        F.col("source"),
        F.lit("."),
        F.col("lang"),
        F.lit("@example.com call 415-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0.1 "),
        F.when(F.col("doc_id") % 3 == 0, F.lit("ssn 123-45-6789 ")).otherwise(
            F.lit("")
        ),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit("card 4111-1111-1111-1111 ")
        ).otherwise(F.lit("")),
        F.col("text"),
    )
    scanned = pii_scan(
        docs.select("doc_id", aug.alias("text")), text_col="text"
    )
    return scanned.select(
        "doc_id",
        "n_pii",
        "n_email",
        "n_credit_card",
        "n_ssn",
        "n_phone",
        "n_ipv4",
        "redacted_md5",
    )


_HEX16 = "('0x' || substr(md5({x}), 1, 4))::BIGINT"


def _bloom_build_sql() -> str:
    hx = _HEX16.format(x="s || '#' || i")
    pos = f"{hx} % 8192"
    return f"""
    WITH toks AS (
        SELECT source, string_split(lower(text), ' ') AS ws FROM documents
    ),
    sh AS (
        SELECT DISTINCT source,
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i)
    ),
    pos AS (
        SELECT source, {pos} AS p
        FROM sh, UNNEST(range(1, 5)) AS h(i)
    ),
    words AS (
        SELECT source, p // 64 AS w,
               bit_or(CASE WHEN p % 64 = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                           ELSE CAST(1 AS BIGINT) << CAST(p % 64 AS INT) END) AS v
        FROM pos GROUP BY source, p // 64
    ),
    grid AS (
        SELECT source, w
        FROM (SELECT DISTINCT source FROM sh), UNNEST(range(0, 128)) AS g(w)
    ),
    filt AS (
        SELECT grid.source, grid.w, COALESCE(words.v, 0) AS v
        FROM grid LEFT JOIN words
          ON grid.source = words.source AND grid.w = words.w
    )
    SELECT source,
           CAST(SUM(bit_count(v)) AS BIGINT) AS n_set_bits,
           md5(string_agg(CAST(v AS VARCHAR), ',' ORDER BY w)) AS filter_md5
    FROM filt GROUP BY source
    """


@query("bloom_source_filters", sql=_bloom_build_sql(), tags=("llm", "sketch", "bloom"))
def bloom_source_filters(spark, sf_dir):
    """Per-source Bloom filter over each source's distinct word-3-gram
    shingles — the constant-size mergeable membership sketch the dedup/
    decontamination toolchain runs on (operators/bloom.py has the
    scale argument: build is a pure idempotent bit_or aggregation, one
    shuffle of (group, word, partial) rows). Output is the
    value-checkable digest (popcount + md5 of the canonical dense
    layout); the md5-portable probe positions make the oracle replay
    the filter bit for bit — a FULLY value-checked sketch, unlike the
    error-bounded HLL/GK tiers.
    """
    from tvbigdataproject_spark.functions.text import shingles
    from tvbigdataproject_spark.operators.bloom import bloom_build, bloom_summary

    docs = read_table(spark, sf_dir, "documents")
    sh = docs.select(
        "source", F.explode(shingles(F.col("text"), n=3, distinct=True)).alias("s")
    )
    return bloom_summary(bloom_build(sh, group_col="source", key_col="s"))


def _bloom_probe_sql() -> str:
    def bit_test(i: int) -> str:
        hx = _HEX16.format(x=f"s || '#{i}'")
        p = f"({hx} % 8192)"
        return f"((f[CAST({p} // 64 AS INT) + 1] >> CAST({p} % 64 AS INT)) & 1 = 1)"

    all_bits = " AND ".join(bit_test(i) for i in range(1, 5))
    hx = _HEX16.format(x="s || '#' || i")
    pos = f"{hx} % 8192"
    return f"""
    WITH btoks AS (
        SELECT string_split(lower(text), ' ') AS ws FROM documents
        WHERE doc_id % 97 = 0
    ),
    bs AS (
        SELECT DISTINCT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        FROM btoks, UNNEST(range(1, len(ws) - 1)) AS t(i)
    ),
    pos AS (
        SELECT {pos} AS p FROM bs, UNNEST(range(1, 5)) AS h(i)
    ),
    words AS (
        SELECT p // 64 AS w,
               bit_or(CASE WHEN p % 64 = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                           ELSE CAST(1 AS BIGINT) << CAST(p % 64 AS INT) END) AS v
        FROM pos GROUP BY p // 64
    ),
    dense AS (
        SELECT list(COALESCE(words.v, 0) ORDER BY g.w) AS f
        FROM UNNEST(range(0, 128)) AS g(w) LEFT JOIN words ON g.w = words.w
    ),
    probe AS (
        SELECT doc_id,
               list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                              FOR i IN range(1, len(ws) - 1)]) AS shs
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents)
    )
    SELECT doc_id,
           len(shs) AS n_shingles,
           len(list_filter(shs, s -> {all_bits})) AS n_hits
    FROM probe, dense
    """


@query("bloom_contamination_probe", sql=_bloom_probe_sql(), tags=("llm", "sketch", "bloom", "decontamination"))
def bloom_contamination_probe(spark, sf_dir):
    """Benchmark-contamination probe: build ONE Bloom filter from the
    held-out set's shingles (docs with doc_id % 97 == 0 stand in for a
    benchmark), broadcast it (m/64 longs — a one-row attach, the
    declared intended-NLJ pattern), and count per document how many of
    its shingles the filter claims. Docs in the held-out set hit ~all
    shingles; clean docs hit only the fp tail. At 100 TB the filter is
    constant-size regardless of benchmark size — the entire point of
    the sketch; the probe is scan-local.
    """
    from tvbigdataproject_spark.functions.text import shingles
    from tvbigdataproject_spark.operators.bloom import (
        M_BITS,
        bloom_build,
        bloom_might_contain,
    )

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0).select(
        F.lit(1).alias("grp"),
        F.explode(shingles(F.col("text"), n=3, distinct=True)).alias("s"),
    )
    # unconditional filter row: bloom_build emits ZERO rows on an empty
    # benchmark set, which would empty the cross join and drop every doc
    # — while the oracle's dense CTE still materializes the all-zero
    # filter. A global aggregate always returns exactly one row (null
    # on empty input), coalesced to the zero filter, so both engines
    # agree: empty benchmark -> every doc probes with n_hits = 0.
    filt = (
        bloom_build(bench, group_col="grp", key_col="s")
        .agg(F.first("filter").alias("f0"))
        .select(
            F.coalesce(
                F.col("f0"),
                F.array_repeat(F.lit(0).cast("long"), M_BITS // 64),
            ).alias("filter")
        )
    )
    probe = docs.select(
        "doc_id", shingles(F.col("text"), n=3, distinct=True).alias("shs")
    )
    joined = probe.crossJoin(F.broadcast(filt))
    n_hits = F.size(
        F.filter(F.col("shs"), lambda s: bloom_might_contain(F.col("filter"), s))
    )
    return joined.select(
        "doc_id", F.size("shs").alias("n_shingles"), n_hits.alias("n_hits")
    )
