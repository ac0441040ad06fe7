"""Python UDTF surface (Spark 4 ``@udtf``) — API-parity with the
reference's UDTF class row (SURVEY.md §2.8/D7).

The engine's position on UDTFs mirrors its UDF position: they are the
SLOW path (one Python fence per row group), so every production
operator here is native (posexplode / explode over array expressions —
see queries/reshape.py). This module exists because the surface itself
is part of API parity: a user porting a UDTF-based workflow needs the
registration point, the lateral-join call shape, and a reference
implementation whose semantics are pinned by an equivalence test
against the native form (tests/test_functions.py).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, sentence: string")
class SplitSentences:
    """Split text into trimmed sentences on '.', emitting (pos, sentence)
    rows — the classic table-function demo. Exactly equivalent to the
    native form (which is what production code should use):

        select(posexplode(filter(transform(split(text, r'\\.'), trim),
                                 x -> x != '')))
    """

    def eval(self, text: str):  # noqa: D102 — the UDTF contract method
        if text:
            parts = (t.strip() for t in text.split("."))
            for i, s in enumerate(t for t in parts if t):
                yield i, s


def register_udtfs(spark) -> None:
    """Register the module's UDTFs for SQL LATERAL use:

        SELECT d.doc_id, s.* FROM documents d,
               LATERAL split_sentences(d.text) s
    """
    spark.udtf.register("split_sentences", SplitSentences)
