from .watermark import WatermarkStore, DEFAULT_WATERMARK_START
from .upsert import merge_upsert, read_parquet_table
from .runner import IncrementalRunReport, run_incremental

__all__ = [
    "WatermarkStore",
    "DEFAULT_WATERMARK_START",
    "merge_upsert",
    "read_parquet_table",
    "IncrementalRunReport",
    "run_incremental",
]
