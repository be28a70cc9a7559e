"""File-ingestion ledger: file-level incremental ingest with exactly-once
accounting (the Auto-Loader / file-notification shape, self-contained).

A 100 TB landing zone receives files continuously; reprocessing the whole
directory per batch is O(history). The ledger records every file already
ingested, so each batch reads ONLY the new files (set difference on file
names — driver-side, but on file METADATA, thousands of entries, never
data).

Ordering contract: the ledger row is appended AFTER the batch's processing
action succeeds — a crash between the two replays the batch's files
(at-least-once), which downstream keyed upserts / dropDuplicates make
effectively exactly-once; the reverse order (ledger first) would silently
LOSE files on crash, the unrecoverable failure mode. Same decision as the
incremental runner's publish-then-watermark ordering
(incremental/runner.py).
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

LEDGER_SCHEMA = StructType(
    [
        StructField("file_path", StringType(), False),
        StructField("n_rows", LongType(), False),
        StructField("ingested_at_us", LongType(), False),
    ]
)


def _list_data_files(source_dir: str) -> list[str]:
    return sorted(
        os.path.join(source_dir, f)
        for f in os.listdir(source_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def processed_files(spark: SparkSession, ledger_path: str) -> set[str]:
    if not os.path.isdir(ledger_path):
        return set()
    return {
        r.file_path for r in spark.read.parquet(ledger_path).select("file_path").collect()
    }


def ingest_new_files(
    spark: SparkSession,
    source_dir: str,
    ledger_path: str,
    process: Callable[[DataFrame], int] | None = None,
) -> list[tuple[str, int]]:
    """Process every data file in ``source_dir`` not yet in the ledger.

    ``process`` receives the new-files DataFrame and must return the row
    count it acted on (its action IS the processing barrier); default just
    counts. Returns [(file, n_rows)] for this batch ([] on no-op — the
    steady-state fast path touches only file listings)."""
    new = [
        f
        for f in _list_data_files(source_dir)
        if f not in processed_files(spark, ledger_path)
    ]
    if not new:
        return []
    out: list[tuple[str, int]] = []
    now_us = int(time.time() * 1_000_000)
    for path in new:  # per-file so the ledger row count is per-file exact
        df = spark.read.parquet(path)
        n = process(df) if process is not None else df.count()
        out.append((path, int(n)))
    rows = [(p, n, now_us) for p, n in out]
    spark.createDataFrame(rows, LEDGER_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(ledger_path)
    return out
