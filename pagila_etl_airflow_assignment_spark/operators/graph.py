"""Co-occurrence graph operators over the order/part bipartite relation.

Market-basket co-occurrence is the canonical "pairs within a basket" fan-out:
naively quadratic, but bounded in practice because the quadratic term is per
BASKET (orders have ≤ ~13 distinct parts in the fixture; real carts are
similarly small), so pair volume is Σ c_i·(c_i−1)/2 with small c_i — linear-ish
in baskets. The ``max_basket`` guard makes the bound explicit: a pathological
mega-basket (data error, bot order) would otherwise contribute c² pairs alone,
the same blow-up the LSH buckets cap with ``max_bucket`` (llm/dedup.py).

Both operators derive from one (orderkey, partkey) distinct projection:
- copurchase_pairs: self-join on the basket key → (part_a < part_b) pair
  counts → distributed top-k (TakeOrderedAndProject, no global sort).
- part_degree: distinct co-purchased neighbors per part — the graph degree
  distribution, from the symmetric closure of the pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _baskets(lineitem: DataFrame, max_basket: int) -> DataFrame:
    """Distinct (orderkey, partkey) with oversized baskets dropped whole —
    the filter is an aggregate-derived semi-join, mirrored in the oracle."""
    items = lineitem.select("l_orderkey", "l_partkey").distinct()
    small = (
        items.groupBy("l_orderkey")
        .agg(F.count("*").alias("basket_size"))
        .where(F.col("basket_size") <= max_basket)
        .select("l_orderkey")
    )
    return items.join(small, "l_orderkey")


def copurchase_pairs(
    lineitem: DataFrame, k: int = 50, max_basket: int = 30
) -> DataFrame:
    """Top-k part pairs by number of shared orders. One shuffle to co-locate
    baskets, a per-basket bounded self-join, one pair-key aggregate."""
    items = _baskets(lineitem, max_basket)
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(k)
    )


def copurchase_pairs_sql(k: int = 50, max_basket: int = 30) -> str:
    return f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), small AS (
            SELECT l_orderkey FROM items
            GROUP BY l_orderkey HAVING COUNT(*) <= {max_basket}
        ), basket AS (
            SELECT i.l_orderkey, i.l_partkey FROM items i
            JOIN small USING (l_orderkey)
        )
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n_orders
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        ORDER BY n_orders DESC, part_a, part_b
        LIMIT {k}
    """


def part_degree(
    lineitem: DataFrame, k: int = 100, max_basket: int = 30
) -> DataFrame:
    """Top-k parts by co-purchase degree (distinct neighbor parts). The
    symmetric closure never materializes pairs twice: neighbors of p are
    counted from the one-directional pair relation unioned with its flip —
    both sides of the union share the basket-join stage."""
    items = _baskets(lineitem, max_basket)
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("q"))
    pairs = a.join(b, "ok").where(F.col("p") != F.col("q"))
    return (
        pairs.groupBy("p")
        .agg(F.count_distinct("q").alias("degree"), F.count("*").alias("n_copurchases"))
        .select(F.col("p").alias("p_partkey"), "degree", "n_copurchases")
        .orderBy(F.desc("degree"), F.desc("n_copurchases"), "p_partkey")
        .limit(k)
    )


def part_degree_sql(k: int = 100, max_basket: int = 30) -> str:
    return f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), small AS (
            SELECT l_orderkey FROM items
            GROUP BY l_orderkey HAVING COUNT(*) <= {max_basket}
        ), basket AS (
            SELECT i.l_orderkey, i.l_partkey FROM items i
            JOIN small USING (l_orderkey)
        )
        SELECT a.l_partkey AS p_partkey,
               COUNT(DISTINCT b.l_partkey) AS degree,
               COUNT(*) AS n_copurchases
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY a.l_partkey
        ORDER BY degree DESC, n_copurchases DESC, p_partkey
        LIMIT {k}
    """
