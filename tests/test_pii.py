"""operators/pii.py — detection counts, redaction completeness, class
precedence, and the cross-engine pattern-subset contract."""

from __future__ import annotations

from tvbigdataproject_spark.operators.pii import PII_PATTERNS, pii_scan


def _scan(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r.asDict() for r in pii_scan(df).collect()}


def test_detects_and_counts_each_class(spark):
    got = _scan(
        spark,
        [
            "mail me at jane.doe+x@sub.example.org or bob@ex.io today",
            "call 415-555-0199 or 212.555.0123",
            "server at 192.168.10.1 and 10.0.0.255",
            "ssn 123-45-6789",
            "card 4111-1111-1111-1111 and 5500 0000 0000 0004",
            "nothing sensitive here",
        ],
    )
    assert got[0]["n_email"] == 2 and got[0]["n_pii"] == 2
    assert got[1]["n_phone"] == 2
    assert got[2]["n_ipv4"] == 2
    assert got[3]["n_ssn"] == 1
    assert got[4]["n_credit_card"] == 2
    assert got[5]["n_pii"] == 0


def test_redaction_is_complete_and_stable(spark):
    from pyspark.sql import functions as F
    from tvbigdataproject_spark.operators.pii import pii_redact

    df = spark.createDataFrame(
        [(1, "jane@ex.io 415-555-0199 10.0.0.1 123-45-6789 or 4111-1111-1111-1111")],
        "doc_id long, text string",
    )
    out = df.select(pii_redact(F.col("text")).alias("r")).collect()[0].r
    assert out == "<EMAIL> <PHONE> <IP> <SSN> or <CARD>"
    # re-scanning redacted text finds nothing (tokens carry no digits/@)
    again = _scan(spark, [out])
    assert again[0]["n_pii"] == 0


def test_ssn_takes_precedence_over_phone_shapes(spark):
    # 3-2-4 digits is an SSN, not a phone; 3-3-4 is a phone, not an SSN
    got = _scan(spark, ["a 123-45-6789 b", "a 123-456-7890 b"])
    assert got[0]["n_ssn"] == 1 and got[0]["n_phone"] == 0
    assert got[1]["n_phone"] == 1 and got[1]["n_ssn"] == 0


def test_counts_sum_to_redaction_tokens(spark):
    text = "x jane@ex.io y 10.1.2.3 z 415-555-0100 w jane@ex.io"
    got = _scan(spark, [text])
    assert got[0]["n_pii"] == 4 == got[0]["n_email"] + got[0]["n_ipv4"] + got[0]["n_phone"]


def test_patterns_stay_in_re2_subset():
    # the cross-engine contract: no backreferences, no lookaround
    for _, pat, _ in PII_PATTERNS:
        assert "(?=" not in pat and "(?!" not in pat and "\\1" not in pat
    # and they must compile under RE2 semantics too, not just Java's:
    # duckdb is the oracle engine, so compile each there
    import duckdb

    con = duckdb.connect()
    for _, pat, _ in PII_PATTERNS:
        con.execute("SELECT regexp_matches('probe', ?)", [pat])


def test_adjacent_digit_entities_resolve_leftmost(spark):
    # ambiguity contract: directly adjacent digit entities resolve by
    # leftmost match within the earlier class — the space-separated
    # card alternative can consume '6789 4111-1111-1111' across an
    # SSN boundary. Both engines (Java regex, RE2) agree on leftmost,
    # which is what the oracle parity rests on; pin it.
    got = _scan(spark, ["123-45-6789 4111-1111-1111-1111"])
    assert got[0]["n_credit_card"] == 1 and got[0]["n_ssn"] == 0
