"""Deterministic `rental`-shaped view derived from the `orders` fixture.

The reference's whole query surface reads one fact table, Pagila `rental`
(rental_id, rental_date, return_date nullable, last_update — README.md:13-17,
etl_script_incremental_pandas.py:121). The driver fixtures don't ship it, so per
FIXTURES.md §5 we derive it from `orders` with ONLY arithmetic that Spark SQL and
DuckDB evaluate identically, making the DuckDB oracle able to reconstruct the
exact same rows:

    rental_id   := o_orderkey
    rental_date := o_orderdate + (o_orderkey % 24) hours          (intra-day times,
                   incl. Monday 00:00 and Sunday 23:00 boundary rows)
    return_date := NULL when o_orderkey % 7 == 0 (~14% open rentals),
                   else rental_date + ((o_orderkey % 1080) + 1) hours (1h .. 45d,
                   so returns often land 0..6 weeks later)
    last_update := GREATEST(rental_date, COALESCE(return_date, rental_date))
                   (the reference's own backfill formula,
                   etl_script_incremental_pandas.py:329)

All modular arithmetic is on o_orderkey (< 2^31 at every sf), so no overflow
divergence between engines; both engines treat the timestamps as naive-UTC.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Interval arithmetic in hours keeps a single dialect-portable unit.
_RENTAL_HOURS_MOD = 24
_RETURN_HOURS_MOD = 1080  # 45 days
_OPEN_RENTAL_MOD = 7  # o_orderkey % 7 == 0 -> still outstanding


def _hours(n: Column) -> Column:
    return F.make_interval(hours=n)


def rental_view(orders: DataFrame) -> DataFrame:
    """Derive the rental fact table from `orders` (schema per schemas.RENTAL)."""
    rental_date = F.col("o_orderdate") + _hours(F.col("o_orderkey") % _RENTAL_HOURS_MOD)
    return_date = F.when(
        F.col("o_orderkey") % _OPEN_RENTAL_MOD == 0, F.lit(None).cast("timestamp")
    ).otherwise(rental_date + _hours(F.col("o_orderkey") % _RETURN_HOURS_MOD + 1))
    return orders.select(
        F.col("o_orderkey").alias("rental_id"),
        rental_date.alias("rental_date"),
        return_date.alias("return_date"),
        F.greatest(rental_date, F.coalesce(return_date, rental_date)).alias(
            "last_update"
        ),
    )


def load_rental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .parquet import load_table

    return rental_view(load_table(spark, sf_dir, "orders"))


# The same derivation in DuckDB SQL, for oracle_sql() CTE reuse. The driver
# pre-registers `orders` as a view over the identical parquet file.
RENTAL_DUCKDB_SQL = """
    SELECT
        o_orderkey AS rental_id,
        o_orderdate + (o_orderkey % 24) * INTERVAL 1 HOUR AS rental_date,
        CASE WHEN o_orderkey % 7 = 0 THEN NULL
             ELSE o_orderdate + (o_orderkey % 24) * INTERVAL 1 HOUR
                  + ((o_orderkey % 1080) + 1) * INTERVAL 1 HOUR
        END AS return_date,
        GREATEST(
            o_orderdate + (o_orderkey % 24) * INTERVAL 1 HOUR,
            COALESCE(
                CASE WHEN o_orderkey % 7 = 0 THEN NULL
                     ELSE o_orderdate + (o_orderkey % 24) * INTERVAL 1 HOUR
                          + ((o_orderkey % 1080) + 1) * INTERVAL 1 HOUR
                END,
                o_orderdate + (o_orderkey % 24) * INTERVAL 1 HOUR)
        ) AS last_update
    FROM orders
"""
