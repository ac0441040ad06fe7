"""Deterministic, engine-portable hashing primitives.

Sketch operators (minhash, simhash, fingerprints) need hash functions
that are (a) stable across Spark versions and (b) reproducible by the
DuckDB oracle so correctness is checkable end-to-end. md5 satisfies both
(identical hex output everywhere); Spark's murmur3 ``hash()`` does not
exist in DuckDB, so it is reserved for purely internal partitioning.

At 100 TB md5-per-shingle is still cheap relative to the shuffle it
feeds, and it runs JVM-side inside codegen (no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_seeded(value: Column, seed: int) -> Column:
    """Seeded md5 hex digest: md5(seed || ':' || value)."""
    return F.md5(F.concat(F.lit(f"{seed}:"), value))


def hex16_hash(value: Column) -> Column:
    """16-bit integer hash: first 4 hex chars of md5, as long.

    Portable to SQL as ``('0x' || substr(md5(v),1,4))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(value), 1, 4), 16, 10).cast("long")


def hex_bits_hash(value: Column, hex_chars: int = 8) -> Column:
    """(4*hex_chars)-bit integer hash from an md5 prefix."""
    return F.conv(F.substring(F.md5(value), 1, hex_chars), 16, 10).cast("long")


def minhash_signature(shingle_array: Column, num_hashes: int = 8) -> Column:
    """MinHash signature as array<string> of length ``num_hashes``.

    Each component is the lexicographic minimum of the seeded md5 digests
    of the shingles — min over hex strings is a valid minwise hash family
    and is bit-identical in any engine with md5. Empty shingle sets yield
    nulls (callers filter those out before LSH banding).

    Computed with array_min over transform — no explode, no shuffle; the
    signature is born in the same codegen stage as the shingling.

    NB: the per-seed lambda must stay unary — Spark's higher-order
    functions dispatch on lambda arity (a second parameter would receive
    the element index), so the seed is bound via a closure factory.
    """

    def seeded(prefix: str):
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    comps = [
        F.array_min(F.transform(shingle_array, seeded(f"{i}:")))
        for i in range(num_hashes)
    ]
    return F.array(*comps)


def lsh_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Concatenate signature components into band keys:
    array<string> of length ``bands``; band i covers components
    [i*rows_per_band, (i+1)*rows_per_band)."""
    keys = []
    for b in range(bands):
        parts = [
            F.element_at(signature, b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]
        keys.append(F.concat_ws("|", F.lit(str(b)), *parts))
    return F.array(*keys)
