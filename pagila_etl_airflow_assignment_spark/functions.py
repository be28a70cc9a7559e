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
