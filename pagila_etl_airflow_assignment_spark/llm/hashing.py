"""Cross-engine deterministic hashing primitives.

Spark's native ``xxhash64``/``hash`` have no DuckDB equivalent, so every
hash that must be oracle-verifiable is built from md5 (identical in both
engines): take the first 15 hex digits (60 bits — fits signed int64) as an
integer. Universal-hash family h_i(x) = (a_i * (H(x) mod P) + b_i) mod P over
prime P keeps all arithmetic within int64 in both engines.

These run JVM-side in Spark (whole-stage codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Prime modulus < 2^31 so (a * H') stays < 2^62 in int64 arithmetic.
HASH_P = 1_000_000_007


def md5_int(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative int64 (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_int_sql(expr: str) -> str:
    """Same value in DuckDB SQL."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS UBIGINT)::BIGINT"


def universal_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for k universal hash functions."""
    return [(2 * i + 3, 1_000_003 * i + 12_345) for i in range(k)]


def universal_hash(h_mod_p: Column, a: int, b: int) -> Column:
    """(a * h + b) mod P; ``h_mod_p`` must already be reduced mod P."""
    return (F.lit(a) * h_mod_p + F.lit(b)) % F.lit(HASH_P)


def universal_hash_sql(h_mod_p_expr: str, a: int, b: int) -> str:
    return f"(({a} * {h_mod_p_expr} + {b}) % {HASH_P})"
