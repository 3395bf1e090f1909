"""Relational query suite over the TPC-H-ish fixtures.

SURVEY.md §2.5 notes the reference has no general join/agg executor — its
query surface is pushdown + key-lookup joins + Python-loop aggregations. This
suite is the "relational completeness" layer (SURVEY §7.2 step 5): scans with
pushdown, equi/semi/anti joins, multi-way star joins, grouped and conditional
aggregation, top-k. All money math is decimal-exact (see functions.numeric)
so results hash-match the DuckDB oracle bit-for-bit.

Scale notes (100 TB thinking):
- Explicit ``broadcast()`` ONLY for bounded dimensions (region: 5 rows,
  nation: 25 rows, scalar subquery results). Everything that grows with
  the scale factor (customer, part, supplier, orders, lineitem) is left
  to AQE: at sf0.1 it will pick a broadcast join anyway from runtime
  sizes; at 100× it switches to shuffled joins instead of OOMing an
  executor on a forced fact-scale broadcast.
- Fact-fact joins (orders ⋈ lineitem) shuffle on the join key once; AQE
  picks sort-merge vs shuffled-hash and splits skewed partitions.
- All filters are expressed on base columns so they push into the parquet
  scan (verify with .explain: PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from gads_etl_spark.catalog import load_table
from gads_etl_spark.functions.numeric import money, rate, qty, dsum, davg
from gads_etl_spark.queries.registry import register

# Exact-decimal revenue term: extendedprice * (1 - discount).
# decimal(12,2) * decimal(4,2) -> decimal(17,4) in Spark, (16,4) in DuckDB;
# values are equal and sums are exact either way.
_REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"


def _rev(li: DataFrame | None = None) -> F.Column:
    return money("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - rate("l_discount"))


@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS sum_disc_price,
           CAST(sum({_REV_SQL} * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("relational", "agg", "flagship"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: grouped sums/averages with exact decimal math.

    Maps reference aggregation semantics A1-A3 (grouped counts/min/max/avg,
    reference src/gads_etl/cli.py:266-306) onto the lineitem fact table.
    Map-side partial aggregation makes this a single shuffle of ~|groups|.
    """
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(qty("l_quantity"), "sum_qty"),
            dsum(money("l_extendedprice"), "sum_base_price"),
            dsum(_rev(), "sum_disc_price"),
            dsum(_rev() * (one + rate("l_tax")), "sum_charge"),
            davg(qty("l_quantity"), "avg_qty"),
            davg(money("l_extendedprice"), "avg_price"),
            davg(rate("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01'
      AND l_shipdate > TIMESTAMP '1997-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY sum({_REV_SQL}) DESC, l_orderkey
    LIMIT 10
    """,
    tags=("relational", "join", "topk", "flagship"),
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: star join + grouped revenue + deterministic top-k.

    Customer is sf-scaled, so its join strategy is left to AQE (a forced
    broadcast works at sf0.1 and OOMs at 100×); orders⋈lineitem shuffles
    once on orderkey. Ranking is on exact decimal revenue with orderkey
    tiebreak so the LIMIT is deterministic across engines/partitionings.
    """
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp")
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    agg = (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev()).alias("_rev_dec"))
        .orderBy(F.desc("_rev_dec"), F.asc("l_orderkey"))
        .limit(10)
    )
    return agg.select(
        "l_orderkey", F.col("_rev_dec").cast("double").alias("revenue"),
        "o_orderdate", "o_orderpriority",
    )


@register(
    "q05_regional_revenue",
    oracle=f"""
    SELECT n_name, CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
                JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    tags=("relational", "join", "agg"),
)
def q05_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join with a co-nation equi constraint.

    Only the bounded dims broadcast (region 5 rows, nation 25 rows);
    customer/supplier are sf-scaled and AQE picks their strategy. The
    region filter reaches customer *through* the broadcast nation join, so
    the fact side is pruned before its shuffle.
    """
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    dim = cust.join(
        broadcast(nation.join(broadcast(region), nation.n_regionkey == region.r_regionkey)),
        cust.c_nationkey == nation.n_nationkey,
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dim, orders.o_custkey == dim.c_custkey)
        .join(supp,
              (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == dim.c_nationkey))
    )
    return joined.groupBy("n_name").agg(dsum(_rev(), "revenue"))


@register(
    "q06_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("relational", "filter", "agg"),
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+agg — the pushdown showcase.

    All three predicates reach the parquet reader (PushedFilters), only 4 of
    11 columns are read (ReadSchema) — at 100 TB this is the difference
    between scanning 4 TB and 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(money("l_extendedprice") * rate("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 45 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("relational", "semijoin", "agg"),
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join, then grouped count.

    Late-shipping orders per priority. Semi join avoids materializing the
    multiplicity of lineitem matches.
    """
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    semi = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 45 DAYS")),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY sum({_REV_SQL}) DESC, c_custkey
    LIMIT 20
    """,
    tags=("relational", "join", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    agg = (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).alias("_rev_dec"))
        .orderBy(F.desc("_rev_dec"), F.asc("c_custkey"))
        .limit(20)
    )
    return agg.select(
        "c_custkey", "c_name", F.col("_rev_dec").cast("double").alias("revenue"),
        F.col("c_acctbal").cast("double").alias("c_acctbal"), "n_name",
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                                 ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
           / CAST(sum({_REV_SQL}) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
    """,
    tags=("relational", "join", "conditional-agg"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation ratio (promo revenue %).

    Conditional agg (A5 in SURVEY §2.4, reference src/gads_etl/cli.py:415-433)
    via sum(CASE WHEN ...). Part dim broadcasts.
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    joined = li.join(part, li.l_partkey == part.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
        F.lit(0).cast("decimal(17,4)")
    )
    return joined.agg(
        (
            F.lit(100.0) * F.sum(promo).cast("double") / F.sum(_rev()).cast("double")
        ).alias("promo_revenue_pct")
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 140
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("relational", "join", "having", "topk"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a grouped join (large-quantity orders).

    Classic Q18 plan: pre-aggregate lineitem by orderkey and apply the
    HAVING threshold *before* joining orders/customer — the join input
    shrinks from |lineitem| to |qualifying orders| (~4× fewer rows at any
    scale, and the filter is applied at the cheapest point). Customer join
    strategy is AQE's call (sf-scaled table, never force-broadcast).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty("l_quantity")).alias("_qty_dec"))
        .where(F.col("_qty_dec") > 140)
    )
    joined = big_orders.join(orders, big_orders.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    return (
        joined.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("_qty_dec").cast("double").alias("total_qty"),
        )
    )


@register(
    "q19_bracket_filter",
    oracle=f"""
    SELECT CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue, count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 45 AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("relational", "join", "filter"),
)
def q19_bracket_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive bracket predicates across a join."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 45) & F.col("l_quantity").between(20, 40))
    )
    return j.where(cond).agg(dsum(_rev(), "revenue"), F.count(F.lit(1)).alias("n_items"))


@register(
    "q22_idle_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS v
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey AS nationkey, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT v FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    """,
    tags=("relational", "antijoin", "subquery"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + anti join (customers
    with above-average balance and no recent orders).

    Anti join is the same primitive as the reference's demotion detection
    (J2, reference src/gads_etl/warehouse/loader.py:92-101).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal_row = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg((F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("v"))
    )
    rich = cust.join(broadcast(avg_bal_row), cust.c_acctbal > F.col("v"), "inner")
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return (
        idle.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("numcust"), dsum(money("c_acctbal"), "totacctbal"))
    )


@register(
    "q08_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(sum(CASE WHEN nation = 'NATION_1' THEN volume
                         ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
        SELECT year(o_orderdate) AS o_year, {_REV_SQL} AS volume, n2.n_name AS nation
        FROM lineitem JOIN part ON p_partkey = l_partkey
                      JOIN supplier ON s_suppkey = l_suppkey
                      JOIN orders ON l_orderkey = o_orderkey
                      JOIN customer ON o_custkey = c_custkey
                      JOIN nation n1 ON c_nationkey = n1.n_nationkey
                      JOIN region ON n1.n_regionkey = r_regionkey
                      JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    )
    GROUP BY o_year
    """,
    tags=("relational", "join", "conditional-agg"),
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional trade volume per
    year — an 8-way join with a conditional-aggregation ratio. Only
    region/nation broadcast; part/supplier/customer join strategy is
    AQE's call."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(
            F.lit("1995-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
        )
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = nation.select(F.col("n_nationkey").alias("c_nkey"), "n_regionkey")
    n2 = nation.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation"))
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(n1), cust.c_nationkey == F.col("c_nkey"))
        .join(broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .join(broadcast(n2), supp.s_nationkey == F.col("s_nkey"))
    )
    vol = j.select(
        F.year("o_orderdate").alias("o_year"), _rev().alias("volume"), F.col("nation")
    )
    nation_vol = F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(17,4)")
    )
    return vol.groupBy("o_year").agg(
        (F.sum(nation_vol).cast("double") / F.sum("volume").cast("double"))
        .alias("mkt_share")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, sum({_REV_SQL}) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    """,
    tags=("relational", "scalar-subquery", "view"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: derived revenue view + equality against its own
    scalar max (exact decimal, so the max-equality is well-defined —
    a double version of this query would be engine-dependent)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    top = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(broadcast(top), F.col("total_rev") == F.col("max_rev"))
        .select("s_suppkey", "s_name",
                F.col("total_rev").cast("double").alias("total_revenue"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT order_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS order_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY order_count
    """,
    tags=("relational", "outerjoin", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count distribution including zero-order
    customers — the LEFT OUTER join keeps unmatched customers and
    count(o_orderkey) counts only non-null matches (count(*) would be
    wrong for the zero group). Double aggregation: per-customer, then
    histogram."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return per_cust.groupBy("order_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
          SELECT 0.2 * avg(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    tags=("relational", "correlated-subquery"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-key scalar subquery (quantity below
    20% of the part's average), decorrelated Spark-style into a
    pre-aggregated per-part threshold joined back — the plan Catalyst
    would produce for the subquery, stated explicitly."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    thresholds = (
        li.groupBy("l_partkey")
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold"))
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
    )
    return joined.agg(
        (F.sum(money("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH supplier_value AS (
        SELECT s_nationkey, l_suppkey,
               sum({_REV_SQL}) AS value_dec
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey, l_suppkey
    )
    SELECT l_suppkey AS suppkey, CAST(value_dec AS DOUBLE) AS supplier_value
    FROM supplier_value
    WHERE value_dec > (SELECT sum(value_dec) * 0.001 FROM supplier_value)
    """,
    tags=("relational", "scalar-subquery", "having"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups filtered against a global scalar aggregate
    (suppliers contributing > 0.1% of total revenue). The scalar side is a
    1-row broadcast — the legitimate broadcast case."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    per_supp = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(_rev()).alias("value_dec"))
    )
    total = per_supp.agg((F.sum("value_dec") * F.lit(0.001)).alias("threshold"))
    return (
        per_supp.join(broadcast(total), per_supp.value_dec > F.col("threshold"))
        .select(F.col("l_suppkey").alias("suppkey"),
                F.col("value_dec").cast("double").alias("supplier_value"))
    )


@register(
    "q07_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN customer ON c_custkey = o_custkey
                  JOIN nation sn ON sn.n_nationkey = s_nationkey
                  JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
    """,
    tags=("relational", "join", "agg"),
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bi-directional nation-pair trade volume by year."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(_rev(), "revenue"))
    )
