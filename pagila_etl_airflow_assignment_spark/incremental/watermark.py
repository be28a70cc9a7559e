"""Watermark state table (SURVEY.md I-1): the engine-managed analog of the
reference's ``etl_watermarks`` Postgres table
(etl_script_incremental_pandas.py:58-66,89-95,276-284).

One row per process_name; read before a run, advanced only after the summary
write commits (crash-safe ordering, O-8). The half-open ``(prev, max]`` window
derived from it guarantees no gaps/overlaps across runs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..schemas import ETL_WATERMARKS
from .upsert import merge_upsert, read_parquet_table

# etl_script_incremental_pandas.py:10
DEFAULT_WATERMARK_START = dt.datetime(1900, 1, 1)


class WatermarkStore:
    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir

    def read(self, process_name: str) -> dt.datetime:
        """Previous watermark, or the 1900-01-01 default when absent
        (etl_script_incremental_pandas.py:95)."""
        df = read_parquet_table(self.spark, self.state_dir)
        if df is None:
            return DEFAULT_WATERMARK_START
        row = (
            df.where(F.col("process_name") == process_name)
            .select("last_successful_update_timestamp")
            .first()
        )
        if row is None or row[0] is None:
            return DEFAULT_WATERMARK_START
        return row[0]

    def write(self, process_name: str, ts: dt.datetime) -> None:
        """Upsert keyed by process_name (ON CONFLICT DO UPDATE analog,
        etl_script_incremental_pandas.py:276-284)."""
        updates = self.spark.createDataFrame(
            [(process_name, ts)], schema=ETL_WATERMARKS
        )
        merge_upsert(
            self.spark, self.state_dir, updates, key=["process_name"]
        )
