"""Deterministic, engine-portable hashing primitives.

Every dedup/similarity operator needs hash functions that (a) run JVM-side as
column expressions (no Python on the hot path) and (b) can be reproduced
bit-for-bit in ANSI SQL by the DuckDB correctness oracle.  Spark's
hash/xxhash64 are not portable, so the base hash is the first 8 hex digits of
MD5 (stable across engines), lifted into a family of universal hashes
h_i(x) = (a_i * H(x) + b_i) mod p over the Mersenne prime p = 2^31 - 1.
All arithmetic stays below 2^63 so signed BIGINT math agrees across engines.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1


def h32(col: Column) -> Column:
    """Portable 32-bit-ish hash of a string column, reduced mod p.

    Spark:   conv(substring(md5(x), 1, 8), 16, 10) % p
    DuckDB:  ('0x' || substring(md5(x), 1, 8))::UBIGINT % p
    """
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % F.lit(MERSENNE_P)
    )


def h32_sql(expr: str) -> str:
    """DuckDB SQL rendering of ``h32`` over an arbitrary expression."""
    return f"(('0x' || substring(md5({expr}), 1, 8))::UBIGINT % {MERSENNE_P})::BIGINT"


def h60(col: Column) -> Column:
    """Portable 60-bit hash (first 15 hex digits of MD5) of a string column.

    For corpus-cardinality keys (e.g. one row per distinct n-gram) where
    32 bits would collide at 100 TB scale; 2^60 keeps the birthday bound
    negligible while staying inside signed BIGINT for both engines.
    """
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def h60_sql(expr: str) -> str:
    """DuckDB SQL rendering of ``h60`` over an arbitrary expression."""
    return f"(('0x' || substring(md5({expr}), 1, 15))::UBIGINT)::BIGINT"


def minhash_params(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """(a_i, b_i) pairs for the universal hash family, deterministic in seed.

    a_i ∈ [1, p), b_i ∈ [0, p); a_i * H < 2^62 so no BIGINT overflow.
    """
    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(1, MERSENNE_P)), int(rng.integers(0, MERSENNE_P)))
        for _ in range(num_hashes)
    ]


def affine_hash(h: Column, a: int, b: int) -> Column:
    return (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P)


def affine_hash_sql(h_expr: str, a: int, b: int) -> str:
    return f"(({a}::BIGINT * {h_expr} + {b}) % {MERSENNE_P})"
