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


# --- counting IVM: aggregate view under inserts AND deletes -------------------

IVM_INS_MOD = 7
IVM_DEL_MOD = 11


def maintained_agg_view_counting(
    orders: DataFrame, ins_mod: int = IVM_INS_MOD, del_mod: int = IVM_DEL_MOD
) -> DataFrame:
    """Counting-algorithm IVM for an AGGREGATE view under MIXED deltas —
    the general case the insert-only join rule above cannot handle.

    View: per-customer (order count, total spend). Deltas carry a ±1 sign
    (insert/delete); maintenance is one re-aggregate of the view's partials
    unioned with SIGNED delta partials — count absorbs Σ sign, sum absorbs
    Σ sign·price — and groups whose live count reaches 0 are deleted (the
    counting rule: multiplicity, not existence, is what the view stores).
    Exact decimal sums mean a fully-deleted group cancels to exactly 0.

    Fixture roles (deterministic key-mod slices): rows with key%ins_mod = 0
    are the insert batch; of the pre-existing rest, key%del_mod = 0 get
    deleted. The oracle aggregates the FINAL table state directly — the
    identity maintenance must preserve. Cost shape: the view partials never
    rescan history; both delta aggregates are delta-sized."""
    price = F.col("o_totalprice").cast("decimal(18,2)")
    pre = orders.where(F.col("o_orderkey") % ins_mod != 0)
    inserts = orders.where(F.col("o_orderkey") % ins_mod == 0)
    deletes = pre.where(F.col("o_orderkey") % del_mod == 0)

    v0 = pre.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"), F.sum(price).alias("total_spend")
    )
    signed = inserts.withColumn("sign", F.lit(1)).unionByName(
        deletes.withColumn("sign", F.lit(-1))
    )
    delta = signed.groupBy("o_custkey").agg(
        F.sum("sign").cast("long").alias("n_orders"),
        F.sum(F.col("sign") * price).alias("total_spend"),
    )
    return (
        v0.unionByName(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("total_spend").alias("total_spend"),
        )
        .where(F.col("n_orders") > 0)
        .select(
            "o_custkey",
            "n_orders",
            F.col("total_spend").cast("double").alias("total_spend"),
        )
        .orderBy("o_custkey")
    )


def maintained_agg_view_counting_sql(
    ins_mod: int = IVM_INS_MOD, del_mod: int = IVM_DEL_MOD
) -> str:
    return f"""
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_spend
        FROM orders
        WHERE (o_orderkey % {ins_mod} <> 0 AND o_orderkey % {del_mod} <> 0)
           OR o_orderkey % {ins_mod} = 0
        GROUP BY o_custkey
        HAVING COUNT(*) > 0
        ORDER BY o_custkey
    """
