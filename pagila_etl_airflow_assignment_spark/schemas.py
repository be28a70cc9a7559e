"""Explicit StructType schemas for every table the engine touches.

Fixed, DDL-style schemas (no inference), mirroring the reference's
create-if-not-exists DDL strings (etl_script_incremental_pandas.py:43-66) and the
four columns its delta query reads (etl_script_incremental_pandas.py:121);
SURVEY.md §1.3.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- reference-parity tables (SURVEY.md §1.3) ---------------------------------

# Source fact table: the four columns the reference reads
# (etl_script_incremental_pandas.py:121). LongType ids for 100 TB headroom.
RENTAL = StructType(
    [
        StructField("rental_id", LongType(), nullable=False),
        StructField("rental_date", TimestampType(), nullable=False),
        StructField("return_date", TimestampType(), nullable=True),
        StructField("last_update", TimestampType(), nullable=False),
    ]
)

# Target summary table (etl_script_incremental_pandas.py:44-51). Column names are
# preserved case-exactly, incl. the camel-case quoted ones.
WEEKLY_RENTAL_SUMMARY = StructType(
    [
        StructField("week_beginning", DateType(), nullable=False),
        StructField("OutstandingRentals", IntegerType(), nullable=True),
        StructField("ReturnedRentals", IntegerType(), nullable=True),
        StructField("newly_rented_during_week", IntegerType(), nullable=True),
        StructField("net_change_in_outstanding", IntegerType(), nullable=True),
        StructField("last_updated", TimestampType(), nullable=True),
    ]
)

# Watermark state table (etl_script_incremental_pandas.py:59-62).
ETL_WATERMARKS = StructType(
    [
        StructField("process_name", StringType(), nullable=False),
        StructField("last_successful_update_timestamp", TimestampType(), nullable=True),
    ]
)

# --- driver fixture tables (/root/testdata, TESTDATA.md) ----------------------

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

# On-disk form for the LEGACY nanos-era fixture only: parquet TIMESTAMP(NANOS)
# read as raw long nanos (session.py nanosAsLong). The fixture encoding has
# changed between rounds (nanos -> micros-NTZ), so NOTHING should hardcode
# this schema for reads — streaming uses sources.parquet.events_stream, which
# probes the real file schema and normalizes via normalize_event_ts. Kept for
# tests that synthesize old-encoding files.
EVENTS_RAW = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
