"""Deterministic, engine-portable hashing primitives.

The dedup/fingerprint operators (operators/dedup.py, operators/textstats.py)
need hash values that an external ANSI-SQL oracle (DuckDB) can reproduce
bit-for-bit, so we avoid engine-native hashes (xxhash64 / DuckDB ``hash()``)
and derive a 60-bit integer from md5, which both engines implement
identically:

    Spark : conv(substr(md5(s), 1, 15), 16, 10)  :: bigint
    DuckDB: ('0x' || substr(md5(s), 1, 15))      :: bigint

60 bits (15 hex chars) keeps every intermediate of the universal-hash family
``(a*h + b) mod p`` inside signed-64 range.

These run JVM-side through whole-stage codegen (md5/conv are builtin
expressions) — at 100 TB this is the difference between a scan-speed
fingerprint pass and a Python-UDF bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^61 - 1: classic modulus for universal hashing over 32-bit
# inputs (a*h + b < 2^62 for a < 2^30, h < 2^32 — no signed-64 overflow).
MERSENNE_P = (1 << 61) - 1

# Deterministic coefficient family (seed fixed; values are arbitrary odd
# constants < 2^30, generated once and frozen so Spark and the SQL oracle
# share them verbatim).
_A0, _B0 = 0x9E3779B1, 0x7F4A7C15  # golden-ratio derived odd constants


def minhash_coeffs(num_perm: int) -> list[tuple[int, int]]:
    """k (a, b) pairs for the permutation family, deterministic in k."""
    coeffs = []
    a, b = _A0, _B0
    for _ in range(num_perm):
        a = (a * 0x85EBCA6B + 0xC2B2AE35) % (1 << 30) | 1  # keep odd, < 2^30
        b = (b * 0x27D4EB2F + 0x165667B1) % (1 << 30)
        coeffs.append((a, b))
    return coeffs


def md5_h60(col: Column) -> Column:
    """60-bit non-negative hash of a string column, oracle-reproducible."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_h32(col: Column) -> Column:
    """32-bit hash (first 8 md5 hex chars) — input domain for minhash perms."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def md5_h60_sql(expr: str) -> str:
    """DuckDB-SQL rendering of :func:`md5_h60` for oracle queries."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def md5_h32_sql(expr: str) -> str:
    """DuckDB-SQL rendering of :func:`md5_h32`."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def perm_hash(h32: Column, a: int, b: int) -> Column:
    """One universal-hash permutation ``(a*h + b) mod p`` of a 32-bit hash."""
    return (h32 * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)


def perm_hash_sql(h32_expr: str, a: int, b: int) -> str:
    """DuckDB-SQL rendering of :func:`perm_hash` (inputs non-negative, so
    ``%`` sign semantics agree between engines)."""
    return f"(({h32_expr} * {a} + {b}) % {MERSENNE_P})"
