"""Shared expression helpers used across operator modules.

Centralizing timestamp micro-arithmetic here is a robustness contract: fixture
and lake producers ship event time as TIMESTAMP, TIMESTAMP_NTZ, or raw long
nanos depending on the writer, and `unix_micros()` rejects NTZ outright
(DATATYPE_MISMATCH). Ingestion normalizes at the source
(sources/parquet.normalize_event_ts), and every arithmetic consumer goes
through `micros()` below — so the next encoding change breaks one function,
not three modules.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def micros(col: Column | str) -> Column:
    """Microseconds since the epoch for EITHER timestamp flavor.

    `cast("timestamp")` is a no-op on TimestampType and reinterprets
    TIMESTAMP_NTZ wall-clock in the session timezone (pinned UTC by
    sources.parquet.ensure_read_confs) — matching DuckDB's `epoch_us()` on
    its naive-UTC read of the same parquet. Stays JVM-side / codegen-able.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))

def isqrt(col: Column | str) -> Column:
    """EXACT integer square root (floor) of a non-negative BIGINT column.

    IEEE-754 sqrt is correctly rounded in both Spark and DuckDB, so
    `FLOOR(SQRT(CAST(x AS DOUBLE)))` lands within ±1 of floor(sqrt(x)) for
    any 63-bit input; the one-step two-sided integer correction then makes
    the result exact — and therefore bit-identical cross-engine, which is
    what lets sqrt-based statistics live in the exact-integer output
    discipline (stddev, EOQ) instead of the float-hash danger zone.

    Overflow discipline: for any c <= 2^63-1 the double seed s0 is at most
    3037000499 (sqrt(2^63) ≈ 3037000499.976, and cast+sqrt are both
    correctly rounded), so s0*s0 and 2*s0 always fit in int64 — but
    (s0+1)^2 does NOT (3037000500^2 > 2^63-1). The up-correction probe is
    therefore written as `c - s0*s0 > 2*s0` (algebraically c >= (s0+1)^2),
    which never forms the overflowing square. Valid for the full
    non-negative BIGINT domain.
    """
    c = F.col(col) if isinstance(col, str) else col
    s0 = F.floor(F.sqrt(c.cast("double"))).cast("long")
    return (
        F.when(c - s0 * s0 > 2 * s0, s0 + 1)
        .when(s0 * s0 > c, s0 - 1)
        .otherwise(s0)
    )


def isqrt_sql(expr: str) -> str:
    """DuckDB twin of ``isqrt``: exact floor-sqrt of a BIGINT expression.

    Mirrors the overflow-free up-probe (`c - s0*s0 > 2*s0`): DuckDB raises
    an out-of-range error on BIGINT overflow, so the naive (s0+1)^2 form
    would abort (rather than wrap) for inputs near 2^63.
    """
    s0 = f"CAST(FLOOR(SQRT(CAST(({expr}) AS DOUBLE))) AS BIGINT)"
    return (
        f"(CASE WHEN ({expr}) - {s0} * {s0} > 2 * {s0} THEN {s0} + 1 "
        f"WHEN {s0} * {s0} > ({expr}) THEN {s0} - 1 ELSE {s0} END)"
    )
