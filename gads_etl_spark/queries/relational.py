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


@register(
    "q02_min_cost_supplier",
    oracle="""
    WITH offers AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice) AS min_price
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, p_name, s_name, n_name,
           CAST(o.min_price AS DOUBLE) AS best_price
    FROM offers o
    JOIN part ON p_partkey = o.l_partkey
    JOIN supplier ON s_suppkey = o.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_size < 15 AND p_type = 'ECONOMY'
      AND o.min_price = (SELECT min(o2.min_price) FROM offers o2
                         WHERE o2.l_partkey = o.l_partkey)
    ORDER BY best_price, p_partkey, s_name
    LIMIT 100
    """,
    tags=("relational", "join", "window", "topk"),
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated-min subquery (cheapest supplier per part).

    The reference's analogue is authority selection: pick the winning row per
    key by an extremum (reference src/gads_etl/validator.py:60-69). DuckDB
    states it as a correlated scalar subquery; Spark-first it is a window
    min over the per-(part, supplier) aggregate — one shuffle on partkey,
    no self-join, no correlated re-scan. Dimension decoration (supplier,
    nation) joins after the extremum filter shrinks the row set.
    """
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") < 15) & (F.col("p_type") == "ECONOMY")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    best = offers.withColumn(
        "part_best", F.min("min_price").over(Window.partitionBy("l_partkey"))
    ).where(F.col("min_price") == F.col("part_best"))
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(supp, best.l_suppkey == supp.s_suppkey)
        .join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("p_partkey", "p_name", "s_name", "n_name",
                F.col("min_price").cast("double").alias("best_price"))
        .orderBy("best_price", "p_partkey", "s_name")
        .limit(100)
    )


@register(
    "q09_product_profit",
    oracle=f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(sum({_REV_SQL}
                    - CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(3,2)))
                AS DOUBLE) AS profit
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN part ON p_partkey = l_partkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%rod%'
    GROUP BY n_name, year(o_orderdate)
    """,
    tags=("relational", "join", "agg"),
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by (nation, year) over a LIKE-filtered part set.

    The fixtures have no supplycost column, so cost is modeled as 50% of
    extended price — the shape (5-way star join, substring predicate on a
    dimension, two-level group) is what matters. The LIKE filter cannot
    push to parquet as a range, but Catalyst still prunes part columns and
    AQE sizes the filtered part side for its join strategy. Decimal math
    keeps the profit sum order-independent (exact) across any cluster size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%rod%"))
    nation = load_table(spark, sf_dir, "nation")
    half = F.lit(0.5).cast("decimal(3,2)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(dsum(_rev() - money("l_extendedprice") * half, "profit"))
    )


@register(
    "q12_priority_class",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("relational", "join", "agg"),
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + conditional counts per class.

    Maps reference A5 (CASE-WHEN conditional counting,
    reference src/gads_etl/cli.py:437-456) onto the orders⋈lineitem join.
    The date range pushes into the lineitem scan; the join shuffles both
    sides on orderkey once (AQE picks the physical strategy); the
    conditional sums fold map-side so the final shuffle is |classes| rows.
    """
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@register(
    "q16_supplier_diversity",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("relational", "join", "agg", "setop"),
)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count per part attribute, with an exclusion
    anti-join (suppliers in deficit stand in for the complaints predicate).

    countDistinct plans as a two-phase aggregate (partial distinct per
    partition, then exchange on the group key) — no global dedup shuffle.
    The exclusion list is tiny relative to supplier, so the anti-join's
    build side is small; left to AQE rather than hinted, since "suppliers
    in deficit" is not a bounded dimension at warehouse scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_excess_suppliers",
    oracle="""
    WITH partvol AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(l_quantity AS DECIMAL(12,2))) AS sup_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
        SELECT l_partkey, sum(sup_qty) AS total_qty FROM partvol GROUP BY l_partkey
    )
    SELECT DISTINCT s_name, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
        SELECT pv.l_suppkey FROM partvol pv JOIN tot ON pv.l_partkey = tot.l_partkey
        WHERE pv.sup_qty > CAST(0.5 AS DECIMAL(3,2)) * tot.total_qty
    )
    ORDER BY s_name
    """,
    tags=("relational", "join", "semi"),
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: dominant suppliers via nested aggregate threshold.

    Suppliers who shipped more than half of a part's 1996 volume. The IN
    subquery becomes a left-semi join; the per-part total is a window sum
    over the (part, supplier) aggregate — the same single-shuffle extremum
    pattern as q02. Quantities aggregate in DECIMAL so the > comparison is
    exact (a float sum could flip a borderline dominance test depending on
    reduction order at cluster scale).
    """
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    partvol = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(qty("l_quantity")).alias("sup_qty")
    )
    half = F.lit(0.5).cast("decimal(3,2)")
    dominant = (
        partvol.withColumn(
            "total_qty", F.sum("sup_qty").over(Window.partitionBy("l_partkey"))
        )
        .where(F.col("sup_qty") > half * F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_name", "n_name")
        .distinct()
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("relational", "join", "semi", "anti", "topk"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS correlated on the same fact.

    "The sole supplier at fault": the line's supplier returned goods
    ('R'), the order involves other suppliers, and none of the others
    returned. Round-12 single-scan formulation: the EXISTS/NOT-EXISTS
    pair is a per-order property, so ONE ``groupBy(l_orderkey)`` pass
    replaces the semi+anti self-joins (which re-scanned the largest
    fact 3x — at the 100x tier that was the one probe query above
    linear, 30.6s / 10.9x; see SCALING.md round-12). Both predicates
    reduce to plain min/max aggregates — no countDistinct Expand:

    - EXISTS another line with a different supplier
      <=> not every line has the waiting supplier's suppkey
      <=> ``min(l_suppkey) < max(l_suppkey)`` (the waiting supplier is
      in the set, so any second distinct value qualifies);
    - NOT EXISTS another 'R' line from a different supplier
      <=> exactly one distinct suppkey among 'R' lines
      <=> ``min(r_supp) == max(r_supp)`` with at least one 'R' line.

    numwait counts qualifying l1 ROWS = per-order count of 'R' lines
    (all by that one supplier), summed per supplier. One lineitem scan
    (3 columns), one shuffle on orderkey with full map-side partial
    aggregation, an equi-join with status-'F' orders on the same key,
    and a dimension join to supplier — AQE picks broadcast when the
    dimension fits.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    r_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("min_s"),
            F.max("l_suppkey").alias("max_s"),
            F.min(r_supp).alias("min_rs"),
            F.max(r_supp).alias("max_rs"),
            F.count(r_supp).alias("n_r"),
        )
        .where((F.col("n_r") > 0)
               & (F.col("min_rs") == F.col("max_rs"))
               & (F.col("min_s") < F.col("max_s")))
        .select("l_orderkey",
                F.col("min_rs").alias("wait_suppkey"),
                "n_r")
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey,
                       "left_semi")
        .join(supp, F.col("wait_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_r").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
