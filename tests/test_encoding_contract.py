"""Ingestion is encoding-agnostic BY CONTRACT: the same events data written as
parquet TIMESTAMP(NANOS), TIMESTAMP(MICROS) NTZ, and TIMESTAMP(MICROS) UTC
must produce identical results through both the batch loader and a streaming
query. The fixture has already flipped encodings once between rounds
(nanos -> micros-NTZ) and silently broke every timestamp consumer; this test
is what catches the next flip before the driver does."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pagila_etl_airflow_assignment_spark.sources.parquet import load_table
from pagila_etl_airflow_assignment_spark.streaming.aggregations import (
    hourly_event_counts,
    streaming_hourly_event_counts,
)

ENCODINGS = ("nanos", "micros_ntz", "micros_utc")


def _events_arrow(ts_type: pa.DataType) -> pa.Table:
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    n = 240
    rows = {
        "event_id": list(range(n)),
        "ts": [base + dt.timedelta(minutes=7 * i) for i in range(n)],
        "user_id": [i % 5 for i in range(n)],
        "event_type": [("click", "view", "purchase")[i % 3] for i in range(n)],
        "value": [round(i * 0.25, 2) for i in range(n)],
        "props": ["{}"] * n,
    }
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", ts_type),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    return pa.Table.from_pydict(rows, schema=schema)


@pytest.fixture(scope="module")
def encoded_dirs():
    """One directory per on-disk timestamp encoding, same logical data."""
    dirs = {}
    types = {
        "nanos": pa.timestamp("ns"),
        "micros_ntz": pa.timestamp("us"),
        "micros_utc": pa.timestamp("us", tz="UTC"),
    }
    for name, ts_type in types.items():
        d = tempfile.mkdtemp(prefix=f"events-{name}-")
        # version 2.6 preserves nanos as parquet TIMESTAMP(NANOS) instead of
        # silently coercing to micros — that is the legacy fixture encoding
        pq.write_table(
            _events_arrow(ts_type), f"{d}/events.parquet", version="2.6"
        )
        dirs[name] = d
    yield dirs
    for d in dirs.values():
        shutil.rmtree(d, ignore_errors=True)


def test_batch_load_identical_across_encodings(spark, encoded_dirs):
    collected = {}
    for name, d in encoded_dirs.items():
        df = load_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (
            f"{name}: loader must canonicalize ts to TimestampType, "
            f"got {dict(df.dtypes)['ts']}"
        )
        collected[name] = sorted(tuple(r) for r in df.collect())
    ref = collected["micros_ntz"]
    assert ref[0][1] == dt.datetime(2024, 3, 1, 0, 0, 0), (
        "absolute instants shifted — tz reinterpretation bug, not just skew"
    )
    for name in ENCODINGS:
        assert collected[name] == ref, f"{name} batch read diverges"


def test_streaming_query_identical_across_encodings(spark, encoded_dirs):
    outs = {}
    for name, d in encoded_dirs.items():
        q = (
            streaming_hourly_event_counts(spark, d)
            .writeStream.format("memory")
            .queryName(f"enc_{name}")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix=f"ckpt-enc-{name}-")
            )
            .start()
        )
        q.awaitTermination(120)
        outs[name] = sorted(tuple(r) for r in spark.table(f"enc_{name}").collect())
    want = sorted(
        tuple(r)
        for r in hourly_event_counts(
            load_table(spark, encoded_dirs["micros_ntz"], "events")
        ).collect()
    )
    assert len(want) > 0
    for name in ENCODINGS:
        assert outs[name] == want, f"{name} streaming result diverges"
