"""Portable deterministic hashing, shared by Spark plans and the DuckDB
oracle SQL.

Spark's ``hash()`` (Murmur3) and DuckDB's ``hash()`` are different
functions, so cross-engine-comparable operators (MinHash, SimHash,
fingerprints) derive integers from MD5 hex — identical in both engines:

    spark:  conv(substring(md5(s), 1, 8), 16, 10)::long
    duckdb: CAST('0x' || substring(md5(s), 1, 8) AS BIGINT)

32 bits of a cryptographic digest: uniform, engine-independent, cheap.
MinHash permutations are universal hashes ``(a*h + b) mod P`` with
``P = 2^31 - 1``; ``h`` is reduced mod P first so ``a*h`` stays far
below 2^63 (no overflow in either engine).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1

# (a, b) pairs for the MinHash permutation family — fixed constants so
# signatures are reproducible across engines and runs. a < 10^6 keeps
# a*h < 2^51.
MINHASH_PERMS: list[tuple[int, int]] = [
    (387143, 552586), (141521, 316113), (739363, 545261), (805005, 6729),
    (552683, 439959), (958191, 387461), (291797, 865469), (104525, 185199),
    (125671, 357479), (686537, 31421), (353673, 755345), (586741, 129337),
]


def hash32(col: Column) -> Column:
    """Engine-portable 32-bit unsigned hash as a non-negative long."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hash32_sql(expr: str) -> str:
    """DuckDB rendering of :func:`hash32` over SQL expression ``expr``."""
    return f"CAST('0x' || substring(md5({expr}), 1, 8) AS BIGINT)"


def hash32_seeded(col: Column, seed: int) -> Column:
    """Independent hash family member: prefix the value with the seed."""
    return hash32(F.concat(F.lit(f"{seed}:"), col))


def hash32_seeded_sql(expr: str, seed: int) -> str:
    return hash32_sql(f"'{seed}:' || {expr}")


def minhash_perm(h_mod: Column, i: int) -> Column:
    """i-th permuted hash of an already-mod-P base hash column."""
    a, b = MINHASH_PERMS[i]
    return (h_mod * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)


def minhash_perm_sql(expr: str, i: int) -> str:
    a, b = MINHASH_PERMS[i]
    return f"(({expr}) * {a} + {b}) % {MERSENNE_P}"


def hash60(col: Column) -> Column:
    """Engine-portable 60-bit hash as a non-negative long (15 MD5 hex
    chars — 16 would overflow signed 64-bit in either engine). Used
    where a value stands in for set-membership identity (e.g. shingle
    fingerprints in the dedup verify stage): within-set collision
    probability for a 10^3-element set is ~10^-13, and because BOTH
    engines derive the same digest, any collision changes both sides
    identically — cross-engine parity is exact regardless."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """DuckDB rendering of :func:`hash60` over SQL expression ``expr``."""
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"
