"""Portable deterministic hashing — identical values in Spark and ANSI
SQL (DuckDB), which is what makes the dedup/similarity operators
oracle-checkable.

``hash64(s) = int(md5(s)[:15], 16)`` — 60 bits, fits signed 64 safely.
Spark's builtin ``hash``/``xxhash64`` are murmur/xxh-specific and do
NOT match other engines; md5 is the portable common denominator.

Modular arithmetic stays below 2^40 (MOD = 1_000_003) because DuckDB
raises on BIGINT overflow while Spark silently wraps — small moduli
keep both engines in exact agreement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_003

# Whitespace tokenizer class, spelled identically for Java regex (Spark)
# and RE2 (DuckDB).  ``\s`` is NOT portable: Java's ASCII ``\s`` includes
# \x0B (vertical tab), RE2's does not, and Unicode-aware builds widen it
# further — one generator change emitting \x0B would silently fork the
# two engines' tokenizations.  Both engines parse ``\t \n \r \f`` escapes
# inside a character class identically, so this exact text is safe to use
# as a Java Pattern AND inside a DuckDB ``'…'`` literal (RE2).
WS = r"[ \t\n\r\f]+"
WS_CHARS = " \t\n\r\f"

# fixed affine permutations for minhash (a, b) — arbitrary but stable
MINHASH_PERMS: list[tuple[int, int]] = [
    (824393, 93401), (510947, 804211), (299299, 117041), (730013, 411019),
    (384377, 559801), (952583, 261983), (628907, 733721), (147229, 980899),
]


def hash64(c: Column) -> Column:
    """60-bit integer hash of a string column, portable across engines."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_term(h: Column, a: int, b: int) -> Column:
    return (h % MOD * a + b) % MOD


def minhash_term_sql(h_expr: str, a: int, b: int) -> str:
    return f"(({h_expr}) % {MOD} * {a} + {b}) % {MOD}"
