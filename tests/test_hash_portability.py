"""Fuzz the md5-portability contract (hypothesis).

Every dedup tier is hash-verified against DuckDB only because
minhash_signature / simhash_values are bit-reproducible from the md5
formulas in queries/dedup.py — this contract is load-bearing for the
whole oracle harness, so it gets adversarial inputs here: unicode
(accents, CJK, emoji, combining marks), empty strings, repeated tokens,
runs of spaces.

Each hypothesis example is batched into ONE Spark job + one DuckDB query
(a job per doc would make the suite minutes-slow).

Known contract boundary (found by this suite, pinned below): ``lower()``
itself is not engine-portable for code points with special case
mappings — the JVM applies full Unicode mappings (lower('İ') = 'i' +
combining dot, 2 code points) while DuckDB's utf8proc applies simple
ones (lower('İ') = 'i'). This affects the simhash/ngram tokenizers
(they case-fold); minhash hashes raw shingles and is unaffected. The
synthetic corpus contains no such code points, and real deployments
should pre-normalize (NFKC) before sketching.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tvbigdataproject_spark.functions import minhash_signature
from tvbigdataproject_spark.operators.dedup import simhash_values

_slow = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# adversarial alphabet: ascii, accents, sharp-s/dotted-I (case-folding
# hazards), CJK, emoji, combining acute, spaces
_ALPHA = "ab z0ÁéÖüßİ漢字🦆́"

_token = st.text(alphabet=_ALPHA, min_size=0, max_size=8)
_token_lists = st.lists(
    st.lists(_token, min_size=1, max_size=12), min_size=1, max_size=8
)
# simhash case-folds, so its fuzz alphabet excludes the special-case-
# mapping code points where lower() legitimately diverges (İ — see
# module docstring); everything else stays adversarial.
_texts = st.lists(
    st.text(alphabet=_ALPHA.replace("İ", ""), min_size=0, max_size=40),
    min_size=1,
    max_size=8,
)


@given(docs=_token_lists)
@_slow
def test_minhash_signature_matches_duckdb(spark, docs):
    # Spark: signature per doc from the array expression
    sdf = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(docs)],
        "doc_id int, shs array<string>",
    )
    got = {
        r["doc_id"]: r["sig"]
        for r in sdf.select(
            "doc_id", minhash_signature(F.col("shs"), num_hashes=8).alias("sig")
        ).collect()
    }

    # DuckDB: the exact formula from queries/dedup.py::_minhash_sql
    rows = pd.DataFrame(
        [(i, s) for i, toks in enumerate(docs) for s in toks],
        columns=["doc_id", "s"],
    )
    sig_cols = ", ".join(
        f"MIN(substr(md5('{i // 4}:' || s), {(i % 4) * 8 + 1}, 8)) AS h{i}"
        for i in range(8)
    )
    con = duckdb.connect()
    con.register("rows", rows)
    want = {
        int(r[0]): list(r[1:])
        for r in con.execute(
            f"SELECT doc_id, {sig_cols} FROM rows GROUP BY doc_id"
        ).fetchall()
    }
    con.close()
    assert got == want


def test_lower_case_mapping_divergence_is_real():
    # pins the contract boundary: DuckDB (utf8proc, simple mappings)
    # lowercases U+0130 to a single 'i'; the JVM/Python (full mappings)
    # produce 'i' + U+0307. If this ever starts passing as equal, the
    # alphabet restriction above can be lifted.
    con = duckdb.connect()
    duck = con.execute("SELECT lower('İ')").fetchone()[0]
    con.close()
    assert duck == "i"
    assert "İ".lower() == "i̇"
    assert duck != "İ".lower()


@given(texts=_texts)
@_slow
def test_simhash_matches_duckdb(spark, texts):
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: r["simhash"] for r in simhash_values(sdf).collect()
    }

    # DuckDB: the exact formula from queries/dedup.py::_simhash_sql
    bit_sums = ", ".join(f"SUM(((h >> {j}) & 1) * 2 - 1) AS s{j}" for j in range(32))
    sim_expr = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN 1 ELSE 0 END) * {1 << j}" for j in range(32)
    )
    docs = pd.DataFrame(list(enumerate(texts)), columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("docs", docs)
    want = {
        int(r[0]): int(r[1])
        for r in con.execute(
            f"""
            WITH toks AS (
                SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS tok
                FROM docs
            ),
            hashed AS (
                SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
                FROM toks
            ),
            bitsums AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id)
            SELECT doc_id, {sim_expr} FROM bitsums
            """
        ).fetchall()
    }
    con.close()
    assert got == want
