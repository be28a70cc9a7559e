"""File-format sources beyond parquet: CSV and JSON-lines, schema-enforced.

The reference's only source is Postgres (etl_script_incremental_pandas.py:
33-34); a lake engine also ingests raw drops. Two rules that matter at
100 TB:

- **Never infer schemas.** ``inferSchema``/``multiLine`` inference is a full
  extra pass over the data before the real read; both readers here REQUIRE
  an explicit schema (which also makes bad data detectable instead of
  silently retyped).
- **Quarantine, don't crash.** PERMISSIVE mode with a ``_corrupt_record``
  column turns malformed rows into data (filterable, countable, shippable to
  a dead-letter table) instead of failing a 10-hour job at hour nine —
  the file-drop analogue of ``try_to_timestamp`` (SURVEY H-12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.names:
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Schema-enforced CSV read; malformed rows land in ``_corrupt_record``."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-enforced JSON-lines read (one object per line — the splittable
    layout; multiLine JSON is not parallelizable); malformed lines land in
    ``_corrupt_record``."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, corrupt_rows) — the dead-letter
    split every ingest job runs before writing to the lake.

    The corrupt side is lazily ``localCheckpoint``-ed: Spark forbids queries
    whose referenced columns are ONLY the corrupt-record column directly over
    a raw file scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN —
    e.g. ``bad.count()``); cutting the lineage at the filter materializes the
    parse once, which is also what you want before shipping the (small)
    dead-letter side anywhere."""
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).localCheckpoint(eager=False)
    return clean, bad


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Columnar sibling of the parquet reader: explicit schema (no footer
    round-trip surprises), vectorized scan, same predicate-pushdown and
    column-pruning behavior. ORC is the other first-class lake format; the
    engine treats it identically to parquet."""
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)
