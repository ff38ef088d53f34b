"""Classic warehouse query shapes (TPC-H Q2/Q6/Q8–Q15/Q17–Q19/Q22
analogs) over the driver testdata star schema.

The reference executes none of these — its only declared aggregate is
the dormant gold layer (/root/reference/src/sql/create_gold_layer.sql:1-6)
— but a user replacing the reference's SQLite notebook analytics
(/root/reference/notebooks/query_sqlite_db.ipynb) with this engine gets
the full decision-support shape family: disjunctive predicate joins,
correlated scalar subqueries (decorrelated to joins), outer-join
distributions, scalar-threshold HAVING, argmin-per-key, and anti-join
with a scalar gate.

The testdata schema has no partsupp table and no comment/shipmode
columns, so Q2/Q11/Q17 derive per-(part,supplier) unit cost from
lineitem (`l_extendedprice / l_quantity`) and Q12/Q13/Q22 substitute
`o_orderpriority` for the comment/shipmode predicates. The *plan
shapes* — which is what matters for the engine — are preserved.

Scale notes (100 TB posture), per query:
  * every dim (region/nation/supplier/part-filtered/customer) is
    broadcast — no shuffle on the small side;
  * fact-fact joins (lineitem⋈orders) shuffle on the join key once and
    reuse it for the following groupBy where keys align;
  * scalar subqueries become 1-row broadcast cross-joins, not
    driver-side collects — the plan stays fully distributed;
  * correlated subqueries are decorrelated to aggregate-then-join,
    Spark's (and every MPP's) standard rewrite;
  * all money sums go through DECIMAL (functions/deterministic.py) so
    results are partition-order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .functions.deterministic import dsum, oracle_dsum

VOL = "decimal(18,4)"
OVOL = "DECIMAL(18,4)"


def _vol():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def register(_register) -> None:
    """Attach every warehouse-shape query to the registry."""

    @_register(
        "forecast_revenue_q6",
        "TPC-H Q6 shape (conjunctive range predicates, all pushed to scan; "
        "single global agg — the purest filter-pushdown probe)",
        f"""
        SELECT {oracle_dsum('l_extendedprice * l_discount', OVOL)} AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """,
    )
    def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        return (
            li.filter(
                (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
                & F.col("l_discount").between(0.05, 0.07)
                & (F.col("l_quantity") < 24)
            )
            .agg(
                dsum(F.col("l_extendedprice") * F.col("l_discount"), VOL).alias(
                    "revenue"
                ),
                F.count(F.lit(1)).alias("n_lines"),
            )
        )

    @_register(
        "market_share_q8",
        "TPC-H Q8 shape (7-table join; conditional-sum ratio per year; "
        "customer-side region gate, supplier-side nation tagged)",
        f"""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               {oracle_dsum("CASE WHEN sn.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", OVOL)}
                 / {oracle_dsum('l_extendedprice * (1 - l_discount)', OVOL)} AS mkt_share
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1
        ORDER BY 1
        """,
    )
    def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
        sup = load_table(spark, sf_dir, "supplier")
        nation = load_table(spark, sf_dir, "nation")
        region = load_table(spark, sf_dir, "region").filter(
            F.col("r_name") == "EUROPE"
        )
        sn = nation.select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
        )
        cn = nation.select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rk")
        )
        cust = load_table(spark, sf_dir, "customer")
        vol = _vol()
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
            .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
            .join(F.broadcast(region), F.col("cn_rk") == region.r_regionkey)
            .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(
                (
                    dsum(
                        F.when(F.col("sn_name") == "NATION_3", vol).otherwise(
                            F.lit(0)
                        ),
                        VOL,
                    )
                    / dsum(vol, VOL)
                ).alias("mkt_share")
            )
            .orderBy("o_year")
        )

    @_register(
        "product_profit_q9",
        "TPC-H Q9 shape (LIKE-filtered part ⋈ fact, profit expression, "
        "agg by supplier-nation × order-year)",
        f"""
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               {oracle_dsum('l_extendedprice * (1 - l_discount) - l_tax * l_extendedprice', OVOL)} AS sum_profit
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, 2
        ORDER BY nation, o_year
        """,
    )
    def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        part = load_table(spark, sf_dir, "part").filter(
            F.col("p_name").like("%widget%")
        )
        sup = load_table(spark, sf_dir, "supplier")
        nation = load_table(spark, sf_dir, "nation")
        profit = _vol() - F.col("l_tax") * F.col("l_extendedprice")
        return (
            li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
            .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(
                F.col("n_name").alias("nation"),
                F.year("o_orderdate").cast("int").alias("o_year"),
            )
            .agg(dsum(profit, VOL).alias("sum_profit"))
            .orderBy("nation", "o_year")
        )

    @_register(
        "returned_items_q10",
        "TPC-H Q10 shape (returned-lineitem revenue per customer, "
        "deterministic top-20)",
        f"""
        SELECT c_custkey, c_name,
               {oracle_dsum('l_extendedprice * (1 - l_discount)', OVOL)} AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
        """,
    )
    def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
        cust = load_table(spark, sf_dir, "customer")
        orders = load_table(spark, sf_dir, "orders").filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        li = load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_returnflag") == "R"
        )
        nation = load_table(spark, sf_dir, "nation")
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(dsum(_vol(), VOL).alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20)
            .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        )

    @_register(
        "important_parts_q11",
        "TPC-H Q11 shape (per-key agg gated by a scalar fraction-of-total "
        "subquery — the scalar becomes a 1-row broadcast cross-join, no "
        "driver collect)",
        f"""
        SELECT l_partkey,
               {oracle_dsum('l_extendedprice * (1 - l_discount)', OVOL)} AS part_value
        FROM lineitem
        GROUP BY l_partkey
        HAVING {oracle_dsum('l_extendedprice * (1 - l_discount)', OVOL)} >
               0.0005 * (SELECT {oracle_dsum('l_extendedprice * (1 - l_discount)', OVOL)} FROM lineitem)
        ORDER BY part_value DESC, l_partkey
        """,
    )
    def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        per_part = li.groupBy("l_partkey").agg(dsum(_vol(), VOL).alias("part_value"))
        total = li.agg(dsum(_vol(), VOL).alias("total_value"))
        return (
            per_part.join(F.broadcast(total))
            .filter(F.col("part_value") > F.lit(0.0005) * F.col("total_value"))
            .select("l_partkey", "part_value")
            .orderBy(F.desc("part_value"), F.asc("l_partkey"))
        )

    @_register(
        "priority_linestatus_q12",
        "TPC-H Q12 shape (fact-fact join + conditional counts per class)",
        """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
        """,
    )
    def q_priority_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        orders = load_table(spark, sf_dir, "orders")
        high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_linestatus")
            .agg(
                F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
            )
            .orderBy("l_linestatus")
        )

    @_register(
        "customer_distribution_q13",
        "TPC-H Q13 shape (outer join + double aggregation: orders-per-"
        "customer histogram; the left join keeps order-less customers)",
        """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
        """,
    )
    def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
        cust = load_table(spark, sf_dir, "customer")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") != "5-LOW"
        )
        per_cust = (
            cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("c_count"))
        )
        return (
            per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count"))
        )

    @_register(
        "promo_revenue_q14",
        "TPC-H Q14 shape (conditional-ratio aggregate over a part ⋈ fact "
        "join, one output row)",
        f"""
        SELECT 100.0 * {oracle_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", OVOL)}
                 / {oracle_dsum('l_extendedprice * (1 - l_discount)', OVOL)} AS promo_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        """,
    )
    def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        part = load_table(spark, sf_dir, "part")
        vol = _vol()
        return (
            li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .agg(
                (
                    F.lit(100.0)
                    * dsum(
                        F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0)),
                        VOL,
                    )
                    / dsum(vol, VOL)
                ).alias("promo_revenue")
            )
        )

    @_register(
        "top_supplier_q15",
        "TPC-H Q15 shape (per-supplier quarterly revenue; keep rows equal "
        "to the scalar MAX — exact-decimal equality, broadcast scalar)",
        f"""
        WITH rev AS (
            SELECT l_suppkey,
                   SUM(CAST(l_extendedprice * (1 - l_discount) AS {OVOL})) AS total_dec
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_dec AS DOUBLE) AS total_revenue
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_dec = (SELECT MAX(total_dec) FROM rev)
        ORDER BY s_suppkey
        """,
    )
    def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        sup = load_table(spark, sf_dir, "supplier")
        rev = li.groupBy("l_suppkey").agg(
            F.sum(_vol().cast(VOL)).alias("total_dec")
        )
        top = rev.agg(F.max("total_dec").alias("max_dec"))
        return (
            rev.join(F.broadcast(top))
            .filter(F.col("total_dec") == F.col("max_dec"))
            .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
            .select(
                "s_suppkey",
                "s_name",
                F.col("total_dec").cast("double").alias("total_revenue"),
            )
            .orderBy("s_suppkey")
        )

    @_register(
        "small_qty_orders_q17",
        "TPC-H Q17 shape (correlated scalar AVG decorrelated to "
        "aggregate-then-join: lines under 20% of their part's mean "
        "quantity)",
        f"""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                 AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#3' AND p_size < 15
          AND l_quantity < (
              SELECT 0.2 * AVG(l_quantity)
              FROM lineitem l2
              WHERE l2.l_partkey = part.p_partkey
          )
        """,
    )
    def q_small_qty_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part").filter(
            (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 15)
        )
        # decorrelated: per-part mean quantity over ALL lineitem (exact:
        # quantities are integral doubles, their sum is exact in double)
        avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
            F.avg("l_quantity").alias("avg_qty")
        )
        return (
            li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(avg_qty, li.l_partkey == F.col("ap_partkey"))
            .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
            .agg(
                (
                    F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                        "double"
                    )
                    / F.lit(7.0)
                ).alias("avg_yearly")
            )
        )

    @_register(
        "large_volume_customers_q18",
        "TPC-H Q18 shape (HAVING-gated semi-join: orders whose total "
        "quantity exceeds a threshold, joined back to customer)",
        """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               SUM(l_quantity) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
        )
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
        """,
    )
    def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
        cust = load_table(spark, sf_dir, "customer")
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        big = (
            li.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("sq"))
            .filter(F.col("sq") > 250)
            .select(F.col("l_orderkey").alias("big_okey"))
        )
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(big, orders.o_orderkey == F.col("big_okey"), "left_semi")
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
            .agg(F.sum("l_quantity").alias("total_qty"))
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(100)
        )

    @_register(
        "disjunctive_revenue_q19",
        "TPC-H Q19 shape (OR-of-ANDs join predicate — Catalyst pushes the "
        "common p_partkey equi-key to the join and evaluates the "
        "disjunction as a post-join filter)",
        f"""
        SELECT {oracle_dsum('l_extendedprice * (1 - l_discount)', OVOL)} AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
        """,
    )
    def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part")
        cond = (
            (
                (F.col("p_brand") == "Brand#12")
                & F.col("p_size").between(1, 5)
                & F.col("l_quantity").between(1, 11)
            )
            | (
                (F.col("p_brand") == "Brand#23")
                & F.col("p_size").between(1, 10)
                & F.col("l_quantity").between(10, 20)
            )
            | (
                (F.col("p_brand") == "Brand#4")
                & F.col("p_size").between(1, 15)
                & F.col("l_quantity").between(20, 30)
            )
        )
        return (
            li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .filter(cond)
            .agg(
                dsum(_vol(), VOL).alias("revenue"),
                F.count(F.lit(1)).alias("n_lines"),
            )
        )

    @_register(
        "waiting_customers_q22",
        "TPC-H Q22 shape (scalar-subquery balance gate + anti-join to "
        "orders, grouped by nation)",
        f"""
        SELECT c_nationkey,
               COUNT(*) AS numcust,
               {oracle_dsum('c_acctbal')} AS totacctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(*)
            FROM customer WHERE c_acctbal > 0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        )
        GROUP BY c_nationkey
        ORDER BY c_nationkey
        """,
    )
    def q_waiting_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
        cust = load_table(spark, sf_dir, "customer")
        urgent = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        # scalar gate: exact-decimal mean of positive balances, broadcast
        avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
        return (
            cust.join(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("avg_bal"))
            .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
            .groupBy("c_nationkey")
            .agg(
                F.count(F.lit(1)).alias("numcust"),
                dsum("c_acctbal").alias("totacctbal"),
            )
            .orderBy("c_nationkey")
        )

    @_register(
        "parts_supplier_counts_q16",
        "TPC-H Q16 shape (distinct-supplier counts per part class with a "
        "NOT-IN exclusion list → anti-join; partsupp derived from "
        "lineitem)",
        """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT p_brand, p_type,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM part JOIN ps ON p_partkey = l_partkey
        WHERE p_size IN (1, 5, 10, 15, 20, 25)
          AND p_brand <> 'Brand#5'
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type
        ORDER BY supplier_cnt DESC, p_brand, p_type
        """,
    )
    def q_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part").filter(
            F.col("p_size").isin(1, 5, 10, 15, 20, 25)
            & (F.col("p_brand") != "Brand#5")
        )
        excluded = load_table(spark, sf_dir, "supplier").filter(
            F.col("s_acctbal") < 0
        )
        ps = li.select("l_partkey", "l_suppkey").distinct()
        return (
            ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
            .join(
                F.broadcast(excluded),
                ps.l_suppkey == excluded.s_suppkey,
                "left_anti",
            )
            .groupBy("p_brand", "p_type")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"))
        )

    @_register(
        "excess_inventory_suppliers_q20",
        "TPC-H Q20 shape (nested semi-join chain: suppliers whose "
        "shipped quantity of LIKE-filtered parts exceeds a threshold "
        "in a year)",
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
            )
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(l_quantity) > 50
        )
        ORDER BY s_suppkey
        """,
    )
    def q_excess_inventory_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
        sup = load_table(spark, sf_dir, "supplier")
        widget_parts = load_table(spark, sf_dir, "part").filter(
            F.col("p_name").like("%widget%")
        )
        li = load_table(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        heavy = (
            li.join(
                F.broadcast(widget_parts.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"),
                "left_semi",
            )
            .groupBy("l_suppkey", "l_partkey")
            .agg(F.sum("l_quantity").alias("sq"))
            .filter(F.col("sq") > 50)
            .select("l_suppkey")
        )
        return (
            sup.join(heavy, sup.s_suppkey == heavy.l_suppkey, "left_semi")
            .select("s_suppkey", "s_name")
            .orderBy("s_suppkey")
        )

    @_register(
        "waiting_orders_suppliers_q21",
        "TPC-H Q21 shape (EXISTS + NOT-EXISTS on the same fact, "
        "decorrelated to per-order distinct counts: suppliers who were "
        "the ONLY late shipper on a multi-supplier finished order)",
        """
        SELECT s_suppkey, s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders    ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1
              FROM lineitem l3 JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o2.o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY s_suppkey, s_name
        ORDER BY numwait DESC, s_suppkey
        LIMIT 100
        """,
    )
    def q_waiting_orders_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Decorrelated: per order, count distinct suppliers and distinct
        # LATE suppliers; then "exists another supplier" ⟺ n_supp ≥ 2
        # and "no OTHER late supplier" ⟺ n_late = 1 (this line's own
        # supplier is late, so it is the only one). One extra agg on
        # the orderkey replaces two correlated rescans of the fact.
        #
        # r10 (guide §2.4): ONE pass over the fact instead of two. The
        # previous shape re-joined the filtered late lines (a second
        # lineitem scan + an orderkey shuffle + a sort-merge join)
        # against the per-order rollup; but every number the output
        # needs is already available at the (order, supplier) grain —
        # numwait counts each supplier's late status-F LINES in
        # qualifying orders, so carrying that line count through the
        # pair-grain aggregate replaces the whole second branch with a
        # window over the pair table (partitioned by order: ≤ a few
        # suppliers per order, no skew). Plan: 2 lineitem scans → 1,
        # SortMergeJoin + 2 of 4 exchanges gone.
        from .operators.partitioning import fan_out

        sup = load_table(spark, sf_dir, "supplier")
        orders = load_table(spark, sf_dir, "orders")
        # fan the single-row-group fact out BY THE ORDER KEY (guide
        # §2.5): hash clustering on l_orderkey satisfies the pair
        # aggregate AND the per-order window below, so the broadcast
        # join, both aggregations and the window all run in ONE wide
        # stage behind this single explicit exchange.
        li = fan_out(
            load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_suppkey", "l_shipdate"
            ),
            "l_orderkey",
        )
        lo = li.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderstatus"),
            li.l_orderkey == F.col("o_orderkey"),
        ).withColumn(
            "__late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
        )
        per_os = lo.groupBy(
            F.col("l_orderkey").alias("__okey"), F.col("l_suppkey").alias("__skey")
        ).agg(
            F.max(F.col("__late").cast("int")).alias("__any_late"),
            F.sum(
                F.when(
                    F.col("__late") & (F.col("o_orderstatus") == "F"), 1
                ).otherwise(0)
            ).alias("__n_late_f"),
        )
        w = Window.partitionBy("__okey")
        per = per_os.select(
            "__skey",
            "__any_late",
            "__n_late_f",
            F.count(F.lit(1)).over(w).alias("__n_supp"),
            F.sum("__any_late").over(w).alias("__n_late"),
        )
        return (
            per.filter(
                (F.col("__n_supp") >= 2)
                & (F.col("__n_late") == 1)
                & (F.col("__any_late") == 1)
                & (F.col("__n_late_f") > 0)
            )
            .join(F.broadcast(sup), F.col("__skey") == sup.s_suppkey)
            .groupBy("s_suppkey", "s_name")
            .agg(F.sum("__n_late_f").alias("numwait"))
            .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
            .limit(100)
        )

    @_register(
        "min_cost_supplier_q2",
        "TPC-H Q2 shape (argmin-per-key: cheapest EUROPE supplier per "
        "filtered part; unit cost derived from lineitem — no partsupp "
        "table in the testdata; argmin via min(struct) with suppkey "
        "tiebreak)",
        """
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ), eu AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ), ranked AS (
            SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name, unit_cost,
                   ROW_NUMBER() OVER (PARTITION BY p_partkey
                                      ORDER BY unit_cost, s_suppkey) AS rn
            FROM part
            JOIN ps ON p_partkey = l_partkey
            JOIN eu ON s_suppkey = l_suppkey
            WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
        )
        SELECT p_partkey, s_suppkey, s_name, n_name, s_acctbal, unit_cost
        FROM ranked WHERE rn = 1
        ORDER BY s_acctbal DESC, p_partkey
        LIMIT 100
        """,
    )
    def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part").filter(
            (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
        )
        sup = load_table(spark, sf_dir, "supplier")
        nation = load_table(spark, sf_dir, "nation")
        region = load_table(spark, sf_dir, "region").filter(
            F.col("r_name") == "EUROPE"
        )
        eu = (
            sup.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
            .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        )
        # r10 (guide §2.3 aggregate-less-before-the-exchange / §3.2):
        # the part and supplier predicates only constrain the GROUP
        # KEYS of the (partkey, suppkey) aggregate, so pushing them
        # below it as broadcast semi-joins drops ~96% of fact rows
        # BEFORE the shuffle (p_size/p_type keep ~1/25 of parts,
        # EUROPE ~1/5 of suppliers) — the per-group MIN over the
        # surviving groups is unchanged because a key filter never
        # removes rows WITHIN a kept group. The broadcasts are reused
        # by the post-agg joins (same build plans).
        li_pruned = li.join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        ).join(
            F.broadcast(eu.select("s_suppkey")),
            li.l_suppkey == F.col("s_suppkey"),
            "left_semi",
        )
        ps = li_pruned.groupBy("l_partkey", "l_suppkey").agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
        )
        joined = ps.join(
            F.broadcast(part), ps.l_partkey == part.p_partkey
        ).join(F.broadcast(eu), ps.l_suppkey == F.col("s_suppkey"))
        # argmin per part: min(struct) orders by (unit_cost, s_suppkey) —
        # unique tiebreak, equivalent to ROW_NUMBER()=1 but one hash agg
        # instead of a full sort-within-partition window
        best = joined.groupBy("p_partkey").agg(
            F.min(
                F.struct("unit_cost", "s_suppkey", "s_name", "n_name", "s_acctbal")
            ).alias("b")
        )
        return (
            best.select(
                "p_partkey",
                F.col("b.s_suppkey").alias("s_suppkey"),
                F.col("b.s_name").alias("s_name"),
                F.col("b.n_name").alias("n_name"),
                F.col("b.s_acctbal").alias("s_acctbal"),
                F.col("b.unit_cost").alias("unit_cost"),
            )
            .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"))
            .limit(100)
        )
