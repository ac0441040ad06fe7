"""Text primitives: tokenization, shingling, cleaning.

All native Column expressions — shingling in particular is the front door
to every dedup sketch (minhash / simhash / n-gram Jaccard) and must not
be a Python UDF: at 100 TB the shingle explode is the widest map stage in
the pipeline and needs to stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column, pattern: str = r"\s+") -> Column:
    """Split text into tokens. Default whitespace split; pass a BPE-ish
    pattern for subword-style counting."""
    return F.split(text, pattern)


def simple_tokens(text: Column) -> Column:
    """Single-space split — matches the oracle's ``string_split(text, ' ')``
    exactly (the synthetic documents are single-space separated)."""
    return F.split(text, " ")


def word_shingles(toks: Column, n: int = 3, distinct: bool = True) -> Column:
    """Word n-grams of a token array as an array<string>.

    Built from sequence + transform + slice + concat_ws — pure codegen,
    no explode needed until the caller wants one row per shingle.
    """
    seq = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(seq, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    guarded = F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
    return F.array_distinct(guarded) if distinct else guarded


def shingles(text: Column, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles straight from a text column (lowercased,
    whitespace-tokenized)."""
    return word_shingles(simple_tokens(F.lower(text)), n=n, distinct=distinct)


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Character n-grams (distinct) — the unit for language-ID style
    profiles."""
    s = F.lower(text)
    seq = F.sequence(F.lit(1), F.length(s) - (n - 1))
    grams = F.transform(seq, lambda i: s.substr(i, F.lit(n)))
    guarded = F.when(F.length(s) >= n, grams).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(guarded)


def simple_clean(text: Column) -> Column:
    """Cheap native text cleaner: lowercase, strip non-alphanumerics,
    collapse whitespace.

    This is the native fallback for the reference's spaCy lemmatizer UDF
    (reference: bigdata/__init__.py:28,31-47) — the one genuinely
    irreducible UDF in the reference. The optional spaCy path lives in
    operators/textstats.py behind an import guard; at scale this native
    version is the default because it stays in codegen.
    """
    lowered = F.lower(F.coalesce(text, F.lit("")))
    stripped = F.regexp_replace(lowered, r"[^a-z0-9\s-]", " ")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))
