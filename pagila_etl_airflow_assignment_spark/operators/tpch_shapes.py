"""Classic decision-support query shapes (TPC-H Q2/Q3/Q7/Q10/Q11/Q13/Q15/
Q16/Q17/Q18/Q21/Q22) adapted to the fixture star schema.

The reference's surface is the rental summary (etl.py); these are post-parity
extensions exercising the join/subquery topologies every warehouse engine must
plan well at 100 TB:

- shipping_priority (Q3): double fact join + broadcast-filtered dim + top-k.
  The top-10 is ``orderBy(...).limit(10)`` which Spark plans as
  TakeOrderedAndProject — a per-partition heap + driver merge of 10-row
  partials, never a global sort.
- large_volume_orders (Q18): HAVING on a fact aggregate, then join BACK to the
  dimensions. The having-filtered aggregate is tiny (0.1% of orders), so the
  join-back broadcasts the aggregate, not the fact.
- sole_final_shipper (Q21 shape; fixture has no commit/receipt dates): orders
  with ≥2 suppliers where exactly one supplier shipped on the order's final
  ship date. Aggregates to (order, supplier) grain first, then one window
  over the order key — all work after the first shuffle is on the reduced
  grain (|orders|·avg-suppliers rows, not |lineitem|).
- dormant_rich_customers (Q22 shape; every fixture customer has orders, so
  "no orders at all" is rewritten as "no orders since a cutoff"): scalar
  subquery (broadcast 1-row aggregate) + LEFT ANTI join against the
  date-filtered orders.
- supplier_revenue_concentration (Q11 shape; no partsupp table, so value =
  shipped revenue): per-supplier revenue vs a fraction of the global total —
  the global total is a broadcast 1-row aggregate reused from the same
  pre-aggregated relation, so lineitem is scanned once.
- nation_trade_volume (Q7): customer-nation × supplier-nation revenue matrix;
  the nation dim joins twice under different aliases (both broadcast).
- min_cost_supplier (Q2 shape; unit price proxies partsupp.supplycost):
  correlated-min-per-part rewritten as a rank-1 window over the
  (part, supplier) pre-aggregate — the canonical decorrelation.

Money arithmetic follows operators/warehouse.py: DECIMAL(18,2) sums (exact,
engine-identical), final CAST to DOUBLE (bit-identical nearest-double) so the
driver's hash canonicalization sees the same cells from Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .warehouse import _disc, _one, _price, _qty


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-15",
    k: int = 10,
) -> DataFrame:
    """Q3: top-k unshipped revenue among orders placed before ``cutoff`` by
    ``segment`` customers, revenue from lineitems shipping after ``cutoff``.

    Plan shape: the segment-filtered customer dim broadcasts into orders;
    lineitem ⋈ orders is the one genuine shuffle (orderkey); the aggregate
    runs at order grain; the top-k is TakeOrderedAndProject (no global sort).
    """
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.where(F.to_date("o_orderdate") < F.lit(cutoff).cast("date")).join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    items = lineitem.where(F.to_date("l_shipdate") > F.lit(cutoff).cast("date"))
    return (
        items.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_price() * (_one() - _disc())).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "o_orderkey")
        .limit(k)
    )


def shipping_priority_sql(
    segment: str = "BUILDING", cutoff: str = "1998-06-15", k: int = 10
) -> str:
    p = "CAST(l_extendedprice AS DECIMAL(18,2))"
    d = "CAST(l_discount AS DECIMAL(18,2))"
    return f"""
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM({p} * (CAST(1 AS DECIMAL(18,2)) - {d})) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = '{segment}'
          AND CAST(o_orderdate AS DATE) < DATE '{cutoff}'
          AND CAST(l_shipdate AS DATE) > DATE '{cutoff}'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, o_orderkey
        LIMIT {k}
    """


def large_volume_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_quantity: float = 300.0,
) -> DataFrame:
    """Q18: orders whose total quantity exceeds ``min_quantity``, joined back
    to customer/order attributes.

    The HAVING aggregate reduces orders by ~500× before any join, so the
    join-back broadcasts the filtered aggregate into orders (then customer
    broadcasts as usual) — the fact is scanned exactly once.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .where(F.col("qty") > F.lit(min_quantity))
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice"),
            F.col("qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
    )


def large_volume_orders_sql(min_quantity: float = 300.0) -> str:
    return f"""
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
               CAST(qty AS DOUBLE) AS total_qty
        FROM (
            SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {min_quantity}
        ) big
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_qty DESC, o_orderkey
    """


def sole_final_shipper(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """Q21 shape: per supplier, how many multi-supplier orders it alone closed
    (its lines carry the order's latest ship date and no other supplier's do).

    One shuffle to (orderkey, suppkey) grain, one window over orderkey on the
    reduced grain, one broadcast of the supplier dim. No correlated EXISTS /
    NOT EXISTS pair survives — both collapse into the windowed counts.
    """
    per_supp = lineitem.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.to_date("l_shipdate")).alias("supp_last_ship")
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "supp_last_ship",
        F.count("*").over(w).alias("n_supp"),
        F.max("supp_last_ship").over(w).alias("order_last_ship"),
    ).withColumn(
        "n_at_last",
        F.count(F.when(F.col("supp_last_ship") == F.col("order_last_ship"), 1)).over(w),
    )
    sole = flagged.where(
        (F.col("n_supp") >= 2)
        & (F.col("n_at_last") == 1)
        & (F.col("supp_last_ship") == F.col("order_last_ship"))
    )
    return (
        sole.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_orders_closed"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_orders_closed")
        .orderBy(F.desc("n_orders_closed"), "s_suppkey")
    )


SOLE_FINAL_SHIPPER_SQL = """
    WITH per_supp AS (
        SELECT l_orderkey, l_suppkey, MAX(CAST(l_shipdate AS DATE)) AS supp_last_ship
        FROM lineitem GROUP BY l_orderkey, l_suppkey
    ), ranked AS (
        SELECT l_orderkey, l_suppkey, supp_last_ship,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
               MAX(supp_last_ship) OVER (PARTITION BY l_orderkey) AS order_last_ship
        FROM per_supp
    ), flagged AS (
        SELECT *,
               COUNT(*) FILTER (supp_last_ship = order_last_ship)
                   OVER (PARTITION BY l_orderkey) AS n_at_last
        FROM ranked
    )
    SELECT s_suppkey, s_name, COUNT(*) AS n_orders_closed
    FROM flagged
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE n_supp >= 2 AND n_at_last = 1 AND supp_last_ship = order_last_ship
    GROUP BY s_suppkey, s_name
    ORDER BY n_orders_closed DESC, s_suppkey
"""


def dormant_rich_customers(
    customer: DataFrame, orders: DataFrame, since: str = "2000-01-01"
) -> DataFrame:
    """Q22 shape: above-average-balance customers with no orders since
    ``since``, counted per market segment.

    The global average is a broadcast 1-row aggregate (crossJoin), the
    "no recent orders" is a LEFT ANTI join against the date-filtered order
    keys — no correlated NOT EXISTS reaches the physical plan.
    """
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = orders.where(
        F.to_date("o_orderdate") >= F.lit(since).cast("date")
    ).select("o_custkey")
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_dormant"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


def dormant_rich_customers_sql(since: str = "2000-01-01") -> str:
    return f"""
        SELECT c_mktsegment,
               COUNT(*) AS n_dormant,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
                   AS total_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND CAST(o_orderdate AS DATE) >= DATE '{since}'
          )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """


def supplier_revenue_concentration(
    lineitem: DataFrame, supplier: DataFrame, fraction: float = 0.011
) -> DataFrame:
    """Q11 shape: suppliers whose shipped revenue exceeds ``fraction`` of the
    global total, with their share.

    lineitem is scanned once: the per-supplier aggregate feeds both the
    global total (re-aggregated 1-row, broadcast back) and the filter — the
    second "pass" runs over 100 rows, not the fact.
    """
    per_supp = lineitem.groupBy("l_suppkey").agg(
        F.sum(_price() * (_one() - _disc())).alias("revenue")
    )
    total = per_supp.agg(F.sum("revenue").alias("total_revenue"))
    return (
        per_supp.crossJoin(F.broadcast(total))
        .where(F.col("revenue") > F.col("total_revenue") * F.lit(fraction))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("revenue").cast("double").alias("revenue"),
            # the decimal/decimal quotient would stay DECIMAL in Spark but
            # DOUBLE in DuckDB; divide as double (exact sums, one conversion
            # each side) so round-then-compare sees identical doubles
            F.round(
                F.col("revenue").cast("double") / F.col("total_revenue").cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy(F.desc("revenue"), "s_suppkey")
    )


def supplier_revenue_concentration_sql(fraction: float = 0.011) -> str:
    p = "CAST(l_extendedprice AS DECIMAL(18,2))"
    d = "CAST(l_discount AS DECIMAL(18,2))"
    return f"""
        WITH per_supp AS (
            SELECT l_suppkey,
                   SUM({p} * (CAST(1 AS DECIMAL(18,2)) - {d})) AS revenue
            FROM lineitem GROUP BY l_suppkey
        ), tot AS (SELECT SUM(revenue) AS total_revenue FROM per_supp)
        SELECT s_suppkey, s_name,
               CAST(revenue AS DOUBLE) AS revenue,
               ROUND(CAST(revenue AS DOUBLE) / CAST(total_revenue AS DOUBLE), 6)
                   AS share
        FROM per_supp, tot
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE revenue > total_revenue * {fraction}
        ORDER BY revenue DESC, s_suppkey
    """


def nation_trade_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Q7: revenue between distinct (customer nation → supplier nation) pairs
    per order year. The nation dim joins twice under different aliases; all
    four dims broadcast, so the only shuffles are lineitem ⋈ orders and the
    final (≤ nations² × years)-key aggregate."""
    cust_nation = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("o_orderdate").alias("yr"))
        .agg(F.sum(_price() * (_one() - _disc())).cast("double").alias("revenue"))
        .orderBy("cust_nation", "supp_nation", "yr")
    )


NATION_TRADE_VOLUME_SQL = """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           YEAR(o_orderdate) AS yr,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY cn.n_name, sn.n_name, YEAR(o_orderdate)
    ORDER BY cust_nation, supp_nation, yr
"""


def min_cost_supplier(
    lineitem: DataFrame, supplier: DataFrame, max_parts: int = 2000
) -> DataFrame:
    """Q2 shape: for each part (bounded output via partkey < ``max_parts``),
    the supplier with the lowest observed unit price.

    The correlated ``price = (SELECT MIN ... WHERE partkey = outer.partkey)``
    decorrelates into a rank-1 window over the (part, supplier) pre-aggregate
    — the window input is |parts|·|suppliers-per-part| rows, not |lineitem|,
    and the partkey filter is pushed into the parquet scan.
    """
    unit = (
        lineitem.where(F.col("l_partkey") < max_parts)
        .where(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 6).alias(
                "min_unit_price"
            )
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("min_unit_price", "l_suppkey")
    return (
        unit.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "s_name",
            "min_unit_price",
        )
        .orderBy("p_partkey")
    )


def min_cost_supplier_sql(max_parts: int = 2000) -> str:
    return f"""
        WITH unit AS (
            SELECT l_partkey, l_suppkey,
                   ROUND(MIN(l_extendedprice / l_quantity), 6) AS min_unit_price
            FROM lineitem
            WHERE l_partkey < {max_parts} AND l_quantity > 0
            GROUP BY l_partkey, l_suppkey
        ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY l_partkey ORDER BY min_unit_price, l_suppkey
            ) AS rk
            FROM unit
        )
        SELECT l_partkey AS p_partkey, s_suppkey, s_name, min_unit_price
        FROM ranked JOIN supplier ON l_suppkey = s_suppkey
        WHERE rk = 1
        ORDER BY p_partkey
    """


def promo_revenue_share(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Q14: monthly promo-revenue share — conditional aggregation over the
    broadcast part join, one (month)-keyed agg. The CASE rides the same
    partial+final aggregate as the denominator, so the share needs no second
    pass and no join of two aggregates."""
    rev = _price() * (_one() - _disc())
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        # to_date: DuckDB's month-trunc yields DATE, Spark's TIMESTAMP — align
        .groupBy(F.to_date(F.date_trunc("month", "l_shipdate")).alias("ship_month"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_share_pct"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .orderBy("ship_month")
    )


PROMO_REVENUE_SHARE_SQL = """
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
           round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                     AS DOUBLE), 6) AS promo_share_pct,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY CAST(date_trunc('month', l_shipdate) AS DATE)
    ORDER BY ship_month
"""


def disjunctive_predicate_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Q19: revenue under an OR of three multi-attribute conjunctions
    (brand × size-range × quantity-bound). The disjunction evaluates inside
    the broadcast hash join's post-condition — one fact scan, no union of
    three filtered branches (which would scan the fact three times)."""
    c1 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") < 25)
    )
    c2 = (
        (F.col("p_brand") == "Brand#19")
        & F.col("p_size").between(10, 30)
        & (F.col("l_quantity") < 40)
    )
    c3 = (F.col("p_brand") == "Brand#23") & F.col("p_size").between(20, 50)
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(c1 | c2 | c3)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(_price() * (_one() - _disc())).cast("double").alias("revenue"),
        )
    )


DISJUNCTIVE_PREDICATE_REVENUE_SQL = """
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15 AND l_quantity < 25)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30 AND l_quantity < 40)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50)
"""


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame, exclude_priority: str = "1-URGENT"
) -> DataFrame:
    """Q13 shape (custdist; fixture orders have no comment column, so the
    "special requests" exclusion becomes a priority-class exclusion): how many
    customers placed exactly N qualifying orders, including N = 0.

    Two aggregations, both on reduced grain: orders collapse to per-customer
    counts (one custkey shuffle over the filtered fact), the LEFT join keeps
    zero-order customers, and the distribution aggregate runs on |customers|
    rows keyed by the tiny c_count domain."""
    per_cust = (
        orders.where(F.col("o_orderpriority") != exclude_priority)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("c_count"))
    )
    return (
        customer.join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce("c_count", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def customer_order_distribution_sql(exclude_priority: str = "1-URGENT") -> str:
    return f"""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COALESCE(oc.c_count, 0) AS c_count
            FROM customer
            LEFT JOIN (
                SELECT o_custkey, COUNT(*) AS c_count
                FROM orders WHERE o_orderpriority <> '{exclude_priority}'
                GROUP BY o_custkey
            ) oc ON c_custkey = o_custkey
        ) dist
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#23"
) -> DataFrame:
    """Q17 shape: average yearly revenue lost if small-quantity orders of one
    brand's parts were not taken — lines with ``l_quantity`` below 20% of the
    part's average quantity.

    The correlated AVG subquery decorrelates into a per-part aggregate over
    the brand-filtered lines (the broadcast part dim prunes the fact FIRST, so
    the aggregate and the join-back both run on ~brand-share of lineitem).
    The 20%-of-average threshold is compared in exact arithmetic —
    ``5 · qty · n < Σqty`` with decimal qty and integer n — so Spark and the
    oracle make identical keep/drop decisions with no float divide."""
    brand_parts = part.where(F.col("p_brand") == brand).select("p_partkey")
    brand_lines = lineitem.join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    per_part = brand_lines.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.count("*").alias("n_lines"),
    )
    return (
        brand_lines.join(
            F.broadcast(per_part), F.col("l_partkey") == F.col("agg_partkey")
        )
        .where(
            F.col("l_quantity").cast("decimal(18,2)") * 5 * F.col("n_lines")
            < F.col("sum_qty")
        )
        .agg(
            (F.sum(_price()).cast("double") / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_small_lines"),
        )
    )


def small_quantity_revenue_sql(brand: str = "Brand#23") -> str:
    return f"""
        WITH brand_lines AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = '{brand}'
        ), per_part AS (
            SELECT l_partkey AS agg_partkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                   COUNT(*) AS n_lines
            FROM brand_lines GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                   AS avg_yearly,
               COUNT(*) AS n_small_lines
        FROM brand_lines JOIN per_part ON l_partkey = agg_partkey
        WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * n_lines < sum_qty
    """


def top_revenue_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
) -> DataFrame:
    """Q15 shape: the supplier(s) achieving the maximum shipped revenue in a
    quarter (the view + scalar-MAX of Q15, decorrelated as a rank window).

    Revenue pre-aggregates to |suppliers| rows (one suppkey shuffle over the
    date-pruned fact); the MAX-selection window then runs over that tiny
    relation — never the fact — and ties all surface, exactly like the SQL
    ``revenue = (SELECT MAX ...)``. Exact decimal revenue makes the
    tie-versus-not decision engine-identical; the final cast to double is
    display-only."""
    rev = (
        lineitem.where(
            (F.to_date("l_shipdate") >= F.lit(start).cast("date"))
            & (F.to_date("l_shipdate") < F.lit(end).cast("date"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_price() * (_one() - _disc())).alias("total_revenue"))
    )
    best = rev.withColumn(
        "rnk", F.rank().over(Window.orderBy(F.desc("total_revenue")))
    ).where(F.col("rnk") == 1)
    return (
        best.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def top_revenue_suppliers_sql(
    start: str = "1996-01-01", end: str = "1996-04-01"
) -> str:
    rev = f"""
            SELECT l_suppkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                       AS total_revenue
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) >= DATE '{start}'
              AND CAST(l_shipdate AS DATE) < DATE '{end}'
            GROUP BY l_suppkey
    """
    return f"""
        WITH revenue AS ({rev})
        SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """


def returned_item_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """Q10 shape: top-k customers by revenue lost to returned items
    (``l_returnflag = 'R'``) for orders placed in a quarter.

    The date-filtered orders join the returned lines on orderkey (the one
    fact-fact shuffle); the aggregate collapses to customer grain before the
    broadcast customer/nation joins; top-k is TakeOrderedAndProject."""
    ords = orders.where(
        (F.to_date("o_orderdate") >= F.lit(start).cast("date"))
        & (F.to_date("o_orderdate") < F.lit(end).cast("date"))
    ).select("o_orderkey", "o_custkey")
    returned = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    per_cust = (
        returned.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(_price() * (_one() - _disc())).cast("double").alias("revenue"))
    )
    return (
        per_cust.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "revenue")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(k)
    )


def returned_item_report_sql(
    start: str = "1996-01-01", end: str = "1996-04-01", k: int = 20
) -> str:
    return f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND CAST(o_orderdate AS DATE) >= DATE '{start}'
          AND CAST(o_orderdate AS DATE) < DATE '{end}'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT {k}
    """


def parts_supplier_counts(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    exclude_brand: str = "Brand#13",
    sizes: tuple[int, ...] = (1, 9, 14, 19, 23, 36, 45, 49),
) -> DataFrame:
    """Q16 shape (fixture has no partsupp — the observed (part, supplier)
    pairs in lineitem stand in for it; the "customer complaints" supplier
    exclusion becomes negative ``s_acctbal``): distinct supplier count per
    (brand, type, size) for selected sizes, excluding one brand.

    The part dim broadcasts to prune the fact before the distinct; the
    excluded suppliers are a broadcast LEFT ANTI (NOT IN with no nullable-key
    trap); COUNT(DISTINCT suppkey) runs per bounded (brand, type, size) key
    after the pairs relation dedups — the only wide shuffle carries the
    already-distinct (partkey, suppkey) pairs, not raw lineitem."""
    keep_parts = part.where(
        (F.col("p_brand") != exclude_brand) & F.col("p_size").isin(*sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        lineitem.join(F.broadcast(keep_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count("*").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def parts_supplier_counts_sql(
    exclude_brand: str = "Brand#13",
    sizes: tuple[int, ...] = (1, 9, 14, 19, 23, 36, 45, 49),
) -> str:
    size_list = ", ".join(str(s) for s in sizes)
    return f"""
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> '{exclude_brand}'
          AND p_size IN ({size_list})
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """


def forecast_revenue_change(
    lineitem: DataFrame,
    year: int = 1996,
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """Q6: revenue delta if discounts in a band were eliminated — the
    canonical pushdown probe: one scan, every predicate reaches the parquet
    reader (year bounds, discount band, quantity cap), one partial+final
    aggregate, no join, no shuffle beyond the 1-row reduction."""
    return lineitem.where(
        (F.to_date("l_shipdate") >= F.lit(f"{year}-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("date"))
        & F.col("l_discount").between(disc_lo, disc_hi)
        & (F.col("l_quantity") < max_qty)
    ).agg(
        F.sum(_price() * _disc()).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


def forecast_revenue_change_sql(
    year: int = 1996,
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> str:
    return f"""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '{year}-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '{year + 1}-01-01'
          AND l_discount BETWEEN {disc_lo} AND {disc_hi}
          AND l_quantity < {max_qty}
    """


def national_market_share(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_region: str = "EUROPE",
    share_nation: str = "NATION_5",
) -> DataFrame:
    """Q8 shape: per order year, the revenue share supplied by one nation
    within one customer region's orders.

    The numerator rides the denominator's aggregate as a conditional sum —
    one fact pipeline, not two filtered branches. Exact decimal sums make
    the share division a single deterministic IEEE op. The nation dim joins
    twice (customer side filtered through region, supplier side for the
    share flag) — both broadcast."""
    cust_in_region = (
        customer.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == target_region)
        .select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("s_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "s_nation")
    rev = _price() * (_one() - _disc())
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_in_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("s_nation") == share_nation, rev).otherwise(F.lit(0).cast("decimal(18,2)"))).alias("nation_rev"),
            F.sum(rev).alias("total_rev"),
        )
        .select(
            "o_year",
            (F.col("nation_rev").cast("double") / F.col("total_rev").cast("double")).alias("mkt_share"),
            F.col("total_rev").cast("double").alias("total_rev"),
        )
        .orderBy("o_year")
    )


def national_market_share_sql(
    target_region: str = "EUROPE", share_nation: str = "NATION_5"
) -> str:
    rev = (
        "CAST(l_extendedprice AS DECIMAL(18,2)) * "
        "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
    )
    return f"""
        WITH joined AS (
            SELECT year(o_orderdate) AS o_year, sn.n_name AS s_nation, {rev} AS rev
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region ON cn.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE r_name = '{target_region}'
        )
        SELECT o_year,
               CAST(SUM(CASE WHEN s_nation = '{share_nation}' THEN rev
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                   / CAST(SUM(rev) AS DOUBLE) AS mkt_share,
               CAST(SUM(rev) AS DOUBLE) AS total_rev
        FROM joined
        GROUP BY o_year
        ORDER BY o_year
    """


def product_type_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    type_filter: str = "ECONOMY",
) -> DataFrame:
    """Q9 shape (no partsupp: p_retailprice ÷ 10 proxies unit supply cost):
    profit by supplier nation × order year for one product type.

    Profit = Σ price·(1−disc) − cost·qty in one decimal expression per line;
    the broadcast part dim prunes the fact before the orderkey shuffle (the
    only wide exchange — orders arrives projected to (key, year))."""
    typed = part.where(F.col("p_type") == type_filter).select(
        "p_partkey", (F.col("p_retailprice").cast("decimal(18,2)") / 10).cast("decimal(18,2)").alias("unit_cost")
    )
    amount = _price() * (_one() - _disc()) - F.col("unit_cost") * _qty()
    return (
        lineitem.join(F.broadcast(typed), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(
                supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")).select("s_suppkey", "n_name")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.sum(amount).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def product_type_profit_sql(type_filter: str = "ECONOMY") -> str:
    return f"""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                        - CAST(CAST(p_retailprice AS DECIMAL(18,2)) / 10 AS DECIMAL(18,2))
                          * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_type = '{type_filter}'
        GROUP BY n_name, year(o_orderdate)
        ORDER BY nation, o_year DESC
    """


def dominant_part_suppliers(
    lineitem: DataFrame, supplier: DataFrame, min_share_pct: int = 50
) -> DataFrame:
    """Q20 shape (shipped quantity proxies partsupp availability): suppliers
    that shipped MORE than ``min_share_pct``% of some part's total volume —
    the "who could corner this part" probe.

    Two aggregates on the same (part, supplier) grain relation (exchange
    reuse), the dominance test in exact integer-scaled decimal
    (100·sup_qty > pct·total_qty — no float share), then a semi join into
    the supplier dim: the output is supplier-grain, the fact never leaves
    its first shuffle."""
    ps = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_qty()).alias("sup_qty")
    )
    totals = ps.groupBy("l_partkey").agg(F.sum("sup_qty").alias("total_qty"))
    dominant = (
        ps.join(totals, "l_partkey")
        .where(F.col("sup_qty") * 100 > F.col("total_qty") * min_share_pct)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def dominant_part_suppliers_sql(min_share_pct: int = 50) -> str:
    return f"""
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sup_qty
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ), totals AS (
            SELECT l_partkey, SUM(sup_qty) AS total_qty FROM ps GROUP BY l_partkey
        )
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM ps JOIN totals USING (l_partkey)
            WHERE sup_qty * 100 > total_qty * {min_share_pct}
        )
        ORDER BY s_suppkey
    """


# --- Q12 shape: shipment class vs order priority --------------------------------------

Q12_YEAR = 1997
_HIGH_PRI = ("1-URGENT", "2-HIGH")


def shipmode_priority_counts(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Q12 shape (the fixture has no l_shipmode/receiptdate, so the shipment
    class is the return-flag × line-status pair and the date predicate runs
    on l_shipdate): per shipment class, how many ``{Q12_YEAR}``-shipped lines
    belong to critical-priority (1-URGENT/2-HIGH) orders vs the rest —
    the logistics-mix readout Q12 exists for.

    Shape: the year predicate is pushed to the lineitem scan; orders arrives
    projected to (o_orderkey, o_orderpriority) and the join output is
    immediately collapsed by the bounded (flag, status) key — conditional
    aggregation, no second pass. Output: (l_returnflag, l_linestatus,
    high_line_count, low_line_count) ordered by the class pair."""
    pri = F.col("o_orderpriority").isin(*_HIGH_PRI)
    return (
        lineitem.where(F.year("l_shipdate") == Q12_YEAR)
        .select("l_orderkey", "l_returnflag", "l_linestatus")
        .join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(pri.cast("long")).alias("high_line_count"),
            F.sum((~pri).cast("long")).alias("low_line_count"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def shipmode_priority_counts_sql() -> str:
    high = ", ".join(f"'{p}'" for p in _HIGH_PRI)
    return f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ({high}) THEN 1 ELSE 0 END)
                    AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ({high}) THEN 0 ELSE 1 END)
                    AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE year(l_shipdate) = {Q12_YEAR}
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    year: int = 1996,
) -> DataFrame:
    """Q5: revenue per nation within one region and one order year, counting
    only LOCAL trade — lineitems whose supplier sits in the customer's own
    nation (c_nationkey = s_nationkey).

    Plan shape: region -> nation is a broadcast chain pruning both dims
    before any fact touches them; the year-filtered orders join the
    region's customers (broadcast), lineitem ⋈ orders is the one genuine
    shuffle (orderkey), the supplier dim broadcasts onto l_suppkey, and
    the same-nation predicate rides the join so mismatched rows never
    reach the aggregate. Revenue sums as DECIMAL(18,2) (order-free).
    """
    nat = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    cust = customer.join(
        F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("c_nationkey").alias("cust_nation"))
    ords = (
        orders.where(F.year("o_orderdate") == year)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "cust_nation")
    )
    supp = supplier.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    return (
        lineitem.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("cust_nation") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(_price() * (_one() - _disc())).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def local_supplier_volume_sql(
    region_name: str = "ASIA", year: int = 1996
) -> str:
    p = "CAST(l_extendedprice AS DECIMAL(18,2))"
    d = "CAST(l_discount AS DECIMAL(18,2))"
    return f"""
        SELECT n_name,
               CAST(SUM({p} * (CAST(1 AS DECIMAL(18,2)) - {d})) AS DOUBLE)
                   AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = '{region_name}'
          AND EXTRACT(year FROM o_orderdate) = {year}
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """
