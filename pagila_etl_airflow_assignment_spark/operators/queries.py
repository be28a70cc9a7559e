"""Registered warehouse-operator queries (post-parity extensions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.parquet import load_table
from . import warehouse


@register(
    "warehouse_pricing_summary",
    oracle=warehouse.pricing_summary_sql(),
    survey_rows=("D-2", "D-3", "O-3"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return warehouse.pricing_summary(load_table(spark, sf_dir, "lineitem"))


@register(
    "warehouse_star_join_revenue",
    oracle=warehouse.STAR_JOIN_REVENUE_SQL,
    survey_rows=("C-1", "O-12"),
)
def q_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return warehouse.star_join_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@register(
    "warehouse_salted_aggregation",
    oracle=warehouse.SALTED_AGGREGATION_SQL,
    survey_rows=("O-12",),
)
def q_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return warehouse.salted_aggregation(load_table(spark, sf_dir, "lineitem"))
