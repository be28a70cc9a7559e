"""Incremental view maintenance (IVM) for JOIN views, insert-only case.

The join companion to the aggregate delta-merge (operators/analytics.py
merge_aggregate_delta): a materialized join view V = A ⋈ B absorbs inserts
ΔA, ΔB without re-joining the full bases, via the bilinear delta rule

    V' = V ∪ (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

Cost scales with the DELTAS (each term joins a delta against a base or a
delta — at 100 TB the bases are bucketed on the join key, so the delta-side
joins shuffle only the delta). The oracle is the DIRECT full join of the
updated bases — the identity the maintenance must preserve — so the
differential test is between two genuinely different computations.

The fixture "deltas" are deterministic key-mod slices of orders/lineitem
(new orders AND new lines for existing orders — both delta directions are
exercised, including the ΔA⋈ΔB corner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ORDERS_DELTA_MOD = 7
LINES_DELTA_MOD = 5


def _split(df: DataFrame, key: str, mod: int):
    """(base, delta): rows whose key % mod != 0 are 'already materialized',
    the rest play the newly-inserted delta batch."""
    return (
        df.where(F.col(key) % mod != 0),
        df.where(F.col(key) % mod == 0),
    )


def _join_project(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.join(b, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "o_orderkey",
        "l_linenumber",
        "o_orderstatus",
        F.round(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (
                F.lit(1).cast("decimal(18,2)")
                - F.col("l_discount").cast("decimal(18,2)")
            ),
            2,
        )
        .cast("double")
        .alias("revenue"),
    )


def maintained_join_view(
    orders: DataFrame,
    lineitem: DataFrame,
    orders_mod: int = ORDERS_DELTA_MOD,
    lines_mod: int = LINES_DELTA_MOD,
) -> DataFrame:
    """The four-term IVM union for V = orders ⋈ lineitem. Must equal the
    direct join of the full tables (the oracle) row-for-row."""
    a, da = _split(orders, "o_orderkey", orders_mod)
    b, db = _split(lineitem, "l_orderkey", lines_mod)
    v = _join_project(a, b)
    return (
        v.unionByName(_join_project(da, b))
        .unionByName(_join_project(a, db))
        .unionByName(_join_project(da, db))
        .orderBy("o_orderkey", "l_linenumber")
    )


MAINTAINED_JOIN_VIEW_SQL = """
    SELECT o_orderkey, l_linenumber, o_orderstatus,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2))
                         - CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ORDER BY o_orderkey, l_linenumber
"""
