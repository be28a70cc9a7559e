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


QUARANTINE_SCHEMA = StructType(
    [
        StructField("file_path", StringType(), False),
        StructField("error", StringType(), False),
        StructField("quarantined_at_us", LongType(), False),
    ]
)


def quarantined_files(spark: SparkSession, quarantine_path: str | None) -> set[str]:
    if quarantine_path is None or not os.path.isdir(quarantine_path):
        return set()
    return {
        r.file_path
        for r in spark.read.parquet(quarantine_path).select("file_path").collect()
    }


def ingest_new_files(
    spark: SparkSession,
    source_dir: str,
    ledger_path: str,
    process: Callable[[DataFrame], int] | None = None,
    quarantine_path: str | None = None,
) -> list[tuple[str, int]]:
    """Process every data file in ``source_dir`` not yet in the ledger.

    ``process`` receives the new-files DataFrame and must return the row
    count it acted on (its action IS the processing barrier); default just
    counts. Returns [(file, n_rows)] for this batch ([] on no-op — the
    steady-state fast path touches only file listings).

    With ``quarantine_path`` set, a file whose read or processing raises is
    recorded there (path + error) and skipped instead of failing the batch
    — the badRecordsPath discipline lifted to file grain, so one corrupt
    landing-zone file cannot wedge ingestion. Quarantined files are never
    retried (they fail deterministically); an operator re-admits one by
    deleting its quarantine row. Without ``quarantine_path`` the error
    propagates unchanged (fail-fast remains the default contract).

    Crash semantics are unchanged by both features: ledger AND quarantine
    rows are appended only after the whole batch's processing completed, so
    a crash anywhere in the batch replays ALL its files next run
    (at-least-once; keyed/idempotent downstream sinks make it effectively
    exactly-once) — never loses one."""
    done = processed_files(spark, ledger_path) | quarantined_files(
        spark, quarantine_path
    )
    new = [f for f in _list_data_files(source_dir) if f not in done]
    if not new:
        return []
    out: list[tuple[str, int]] = []
    bad: list[tuple[str, str]] = []
    now_us = int(time.time() * 1_000_000)
    for path in new:  # per-file so the ledger row count is per-file exact
        try:
            df = spark.read.parquet(path)
            n = process(df) if process is not None else df.count()
        except Exception as e:  # noqa: BLE001 - quarantine records the cause
            if quarantine_path is None:
                raise
            bad.append((path, f"{type(e).__name__}: {e}"[:500]))
            continue
        out.append((path, int(n)))
    if out:
        rows = [(p, n, now_us) for p, n in out]
        spark.createDataFrame(rows, LEDGER_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(ledger_path)
    if bad:
        qrows = [(p, err, now_us) for p, err in bad]
        spark.createDataFrame(qrows, QUARANTINE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(quarantine_path)
    return out
