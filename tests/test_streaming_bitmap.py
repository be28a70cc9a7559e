"""Stream==batch differential for the bitmap-distinct maintenance: the
BIT_OR word table built incrementally over the event stream must equal the
batch build on the same fixture (the sketch.py contract, exact instead of
approximate)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pagila_etl_airflow_assignment_spark.operators.bitmap import user_bitmaps
from pagila_etl_airflow_assignment_spark.sources.parquet import load_table
from pagila_etl_airflow_assignment_spark.streaming.sketch import (
    streaming_user_bitmaps,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark):
    d = tempfile.mkdtemp(prefix="events-bm-stream-")
    shutil.copy(f"{SF}/events.parquet", f"{d}/events.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_bitmaps_equal_batch(spark, events_dir):
    batch = {
        (r.event_type, r.word): r.bits
        for r in user_bitmaps(load_table(spark, SF, "events")).collect()
    }
    sdf = streaming_user_bitmaps(spark, events_dir)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            sdf.writeStream.format("memory")
            .queryName("bm_stream")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    stream = {
        (r.event_type, r.word): r.bits
        for r in spark.sql("SELECT * FROM bm_stream").collect()
    }
    assert stream == batch
    assert len(batch) > 0
