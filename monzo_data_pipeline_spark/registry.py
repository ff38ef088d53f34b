"""Query registry — the engine's public query surface.

Each entry is one operator row from SURVEY.md §2 expressed as a
(spark, sf_dir) -> DataFrame callable over the driver testdata
tables, paired (where SQL-expressible) with a DuckDB oracle SQL twin.
``__spark_entry__.py`` re-exports this registry to the driver.

Determinism rules (every query here obeys them):
  * no current_timestamp / rand / monotonically_increasing_id;
  * double SUM/AVG goes through DECIMAL (functions/deterministic.py);
  * every LIMIT has a total order with a unique tiebreak;
  * float comparisons (top-k over embeddings) are integer-quantized
    (floor(x·10⁶) as BIGINT) so Spark and DuckDB agree bit-for-bit;
  * every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .ext import dedup_fuzzy as DF
from .ext import multimodal as MM
from .ext import search as SRCH
from .ext import similarity as SIM
from .functions import text as TX
from .functions.deterministic import davg, dsum, oracle_davg, oracle_dsum
from .operators import aggregates as AGG
from .operators import behavioral as BH
from .operators import dedup as DD
from .operators import filters as FL
from .operators import geo as GEO
from .operators import joins as JN
from .operators import projection as PJ
from .operators import setops as SO
from .operators import sketches as SK
from .operators import timeseries as TS
from .operators import windows as WN


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL twin; None → driver does rows-only check
    survey_ref: str  # SURVEY.md §2 row(s) this covers


_SPECS: list[QuerySpec] = []


def _register(name: str, survey_ref: str, oracle: str | None):
    def deco(fn):
        _SPECS.append(QuerySpec(name, fn, oracle, survey_ref))
        return fn

    return deco


# ---------------------------------------------------------------------------
# B1 — flagship: the reference's dormant gold_monthly_spending transform
# (/root/reference/src/sql/create_gold_layer.sql:1-6, never populated there).
# ---------------------------------------------------------------------------


@_register(
    "monthly_spend",
    "B1 (gold monthly agg)",
    f"""
    SELECT CAST(year(o_orderdate) AS INT) AS year,
           CAST(month(o_orderdate) AS INT) AS month,
           {oracle_dsum('o_totalprice')} AS total_spend,
           {oracle_davg('o_totalprice')} AS avg_spend,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_monthly_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AGG.monthly_spend(load_table(spark, sf_dir, "orders"))


@_register(
    "pricing_summary",
    "A9+B1 (filter + multi-agg; TPC-H Q1 shape)",
    f"""
    SELECT l_returnflag, l_linestatus,
           {oracle_dsum('l_quantity')} AS sum_qty,
           {oracle_dsum('l_extendedprice')} AS sum_base_price,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 'DECIMAL(18,4)')} AS sum_disc_price,
           {oracle_davg('l_quantity')} AS avg_qty,
           {oracle_davg('l_discount', 'DECIMAL(18,4)')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AGG.pricing_summary(load_table(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# A-rows: filters, limits, scans, sorts, counts.
# ---------------------------------------------------------------------------


@_register(
    "date_range_filter",
    "A9 (range predicate → parquet pushdown)",
    """
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q_date_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return FL.date_range_filter(li, "l_shipdate", "1996-01-01", "1996-04-01").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"
    )


@_register(
    "top_k_orders",
    "A10+A24 (deterministic LIMIT via TakeOrderedAndProject)",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey DESC
    LIMIT 200
    """,
)
def q_top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return FL.top_k(o, ["o_totalprice", "o_orderkey"], k=200).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@_register("full_scan_region", "A23 (full scan)", "SELECT * FROM region")
def q_full_scan_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "region")


@_register("row_count_lineitem", "A25 (count)", "SELECT COUNT(*) AS cnt FROM lineitem")
def q_row_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AGG.row_count(load_table(spark, sf_dir, "lineitem"))


@_register(
    "latest_events",
    "A24 (latest-snapshot read: ORDER BY ts DESC LIMIT k)",
    """
    SELECT event_id, ts, user_id, event_type
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 100
    """,
)
def q_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return FL.latest_snapshot(ev, "ts", tiebreak=["event_id"], k=100).select(
        "event_id", "ts", "user_id", "event_type"
    )


# ---------------------------------------------------------------------------
# A11/A15/A16/A17 — idempotent merge & entity extraction & first-wins dedup.
# ---------------------------------------------------------------------------


@_register(
    "anti_join_new_keys",
    "A11 (existence-check idempotent insert → left-anti join)",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return DD.anti_join_new_rows(cust, orders, ["c_custkey"]).select("c_custkey", "c_name")


@_register(
    "upsert_last_wins",
    "A11 complement (MERGE upsert: late-arriving corrections — e.g. the "
    "reference's null-until-settled `settled` column — update matched "
    "keys, insert new ones, last version wins)",
    """
    WITH upd AS (
        SELECT * REPLACE ('F' AS o_orderstatus), 1 AS __v
        FROM orders WHERE o_orderkey % 10 = 3
        UNION ALL
        SELECT * REPLACE ('P' AS o_orderstatus,
                          o_totalprice + 5.0 AS o_totalprice), 2 AS __v
        FROM orders WHERE o_orderkey % 20 = 3
    ), latest AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                           ORDER BY __v DESC) AS rn
              FROM upd)
        WHERE rn = 1
    )
    SELECT * FROM orders
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
    UNION ALL
    SELECT * FROM latest
    """,
)
def q_upsert_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    v1 = (
        orders.filter(F.col("o_orderkey") % 10 == 3)
        .withColumn("o_orderstatus", F.lit("F"))
        .withColumn("__v", F.lit(1))
    )
    v2 = (
        orders.filter(F.col("o_orderkey") % 20 == 3)
        .withColumn("o_orderstatus", F.lit("P"))
        .withColumn("o_totalprice", F.col("o_totalprice") + 5.0)
        .withColumn("__v", F.lit(2))
    )
    return DD.upsert_merge(
        orders, v1.unionByName(v2), ["o_orderkey"], order_cols=["__v"]
    )


@_register(
    "versioned_upsert_merge",
    "A11 complement (version-aware upsert: highest version wins across "
    "target AND updates — replay/out-of-order safe, commutative over "
    "batches; the streaming CDC-apply merge)",
    """
    WITH upd AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice + 1.0 AS o_totalprice,
               o_orderdate + INTERVAL 1 DAY AS o_orderdate,
               o_orderpriority
        FROM orders WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice - 1.0,
               o_orderdate - INTERVAL 1 DAY,
               o_orderpriority
        FROM orders WHERE o_orderkey % 9 = 0
    ), tagged AS (
        SELECT *, 0 AS src FROM orders
        UNION ALL
        SELECT *, 1 AS src FROM upd
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                       ORDER BY o_orderdate DESC, src DESC) AS rn
          FROM tagged)
    WHERE rn = 1
    """,
)
def q_versioned_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    newer = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
        .withColumn("o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"))
    )
    older = (
        orders.filter(F.col("o_orderkey") % 9 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") - 1.0)
        .withColumn("o_orderdate", F.col("o_orderdate") - F.expr("INTERVAL 1 DAY"))
    )
    return DD.versioned_upsert(
        orders, newer.unionByName(older), ["o_orderkey"], ["o_orderdate"]
    )


@_register(
    "distinct_entities",
    "A15 (DISTINCT + NOT NULL entity extraction: counterparties shape)",
    """
    SELECT DISTINCT c_nationkey, c_mktsegment
    FROM customer
    WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
    """,
)
def q_distinct_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.distinct_entities(
        load_table(spark, sf_dir, "customer"),
        ["c_nationkey", "c_mktsegment"],
        not_null=["c_nationkey", "c_mktsegment"],
    )


@_register(
    "distinct_projection_wide",
    "A16 (DISTINCT projection: merchants shape)",
    """
    SELECT DISTINCT p_brand, p_type, p_size
    FROM part
    WHERE p_brand IS NOT NULL
    """,
)
def q_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.distinct_entities(
        load_table(spark, sf_dir, "part"), ["p_brand", "p_type", "p_size"], not_null=["p_brand"]
    )


@_register(
    "first_wins_dedup",
    "A17 (INSERT OR IGNORE → deterministic row_number dedup)",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
    FROM (
        SELECT *, row_number() OVER (PARTITION BY l_orderkey
                                     ORDER BY l_linenumber, l_partkey,
                                              l_suppkey, l_quantity) AS __rn
        FROM lineitem
    )
    WHERE __rn = 1
    """,
)
def q_first_wins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so the
    # arrival order includes full tiebreaks — first-wins must name a total
    # order to be deterministic (SURVEY.md §7 hard-part 2).
    li = load_table(spark, sf_dir, "lineitem")
    return DD.first_wins_dedup(
        li, ["l_orderkey"], ["l_linenumber", "l_partkey", "l_suppkey", "l_quantity"]
    ).select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")


@_register(
    "project_cast_stamp",
    "A18 (column-subset projection + explicit money cast)",
    # comparison surface is DOUBLE: Spark DECIMAL -> pandas object[Decimal]
    # but DuckDB DECIMAL -> float64, so a decimal-typed output hash-fails on
    # dtype alone; the money cast stays (decimal round) with a final double.
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS amount,
           l_returnflag
    FROM lineitem
    """,
)
def q_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").withColumn("amount", F.col("l_extendedprice"))
    out = PJ.project_cast_stamp(
        li,
        ["l_orderkey", "l_linenumber", "amount", "l_returnflag"],
        casts={"amount": "decimal(18,2)"},
    )
    return out.withColumn("amount", F.col("amount").cast("double"))


@_register(
    "default_fill",
    "A8 (NULL coalescing to declared defaults)",
    """
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'UNKNOWN') AS segment_filled,
           COALESCE(c_acctbal, 0.0) AS acctbal_filled
    FROM customer
    """,
)
def q_default_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("segment_filled"),
        F.col("c_acctbal").alias("acctbal_filled"),
    )
    return PJ.default_fill(cust, {"segment_filled": "UNKNOWN", "acctbal_filled": 0.0})


# ---------------------------------------------------------------------------
# A19-A22 + A7/C5 — scalar functions, JSON, nested data.
# ---------------------------------------------------------------------------


@_register(
    "scalar_functions",
    "A19 abs / A20 to_json / A22 timestamp format",
    """
    SELECT event_id,
           ABS(value) AS abs_value,
           strftime(ts, '%Y-%m-%d %H:00') AS hour_str,
           to_json([event_type, CAST(user_id AS VARCHAR)]) AS tags_json
    FROM events
    """,
)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.abs("value").alias("abs_value"),
        F.date_format("ts", "yyyy-MM-dd HH:00").alias("hour_str"),
        F.to_json(F.array(F.col("event_type"), F.col("user_id").cast("string"))).alias(
            "tags_json"
        ),
    )


@_register(
    "json_extract",
    "A21/A7 (JSON field access; reference api_client.py:53-55)",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           event_type
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        "event_type",
    )


@_register(
    "struct_flatten",
    "A7/C5 (typed from_json → struct flatten; reference api_client.py:32-109)",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS props_k,
           user_id
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
    """,
)
def q_struct_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    typed = ev.withColumn("props_struct", F.from_json("props", "k INT"))
    flat = PJ.flatten_struct(typed, "props_struct", "props")
    return flat.filter(F.col("props_k") > 50).select("event_id", "props_k", "user_id")


@_register(
    "array_ops",
    "C5 (array columns as first-class: size/element access on embeddings)",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           embedding[1] AS first_val,
           label
    FROM embeddings
    """,
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        "label",
    )


# ---------------------------------------------------------------------------
# B2/B3 — joins.
# ---------------------------------------------------------------------------


@_register(
    "fk_star_join",
    "B3 (fact→dim FK joins, dims broadcast)",
    f"""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           {oracle_dsum('c_acctbal')} AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
)
def q_fk_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "c_nationkey"
    )
    region = load_table(spark, sf_dir, "region").withColumnRenamed(
        "r_regionkey", "n_regionkey"
    )
    joined = JN.fk_join(cust, [(nation, "c_nationkey"), (region, "n_regionkey")], how="inner")
    return (
        joined.groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal").alias("total_acctbal"))
        .orderBy("r_name", "n_name")
    )


_FX_RATES = [
    ("AUTOMOBILE", 1.07),
    ("BUILDING", 0.92),
    ("FURNITURE", 1.25),
    ("HOUSEHOLD", 0.85),
    ("MACHINERY", 1.1),
]
_FX_VALUES = ", ".join(f"('{s}', {r})" for s, r in _FX_RATES)


@_register(
    "broadcast_enrich_rates",
    "B2 (FX-rate broadcast enrichment join; reference currency notebook)",
    f"""
    SELECT c_custkey, c_mktsegment, rate,
           c_acctbal * rate AS base_amount
    FROM customer
    LEFT JOIN (
        SELECT c_mktsegment, CAST(rate AS DOUBLE) AS rate
        FROM (VALUES {_FX_VALUES}) AS v(c_mktsegment, rate)
    ) AS rates USING (c_mktsegment)
    """,
)
def q_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    rates = spark.createDataFrame(_FX_RATES, "c_mktsegment string, rate double")
    return JN.enrich_with_rates(cust, rates, "c_acctbal", "c_mktsegment").select(
        "c_custkey", "c_mktsegment", "rate", "base_amount"
    )


# ---------------------------------------------------------------------------
# C1 — exact dedup; C8 — set ops.
# ---------------------------------------------------------------------------


@_register(
    "exact_dup_groups",
    "C1 (exact duplicate-group detection on documents)",
    """
    SELECT lang, source, COUNT(*) AS n_copies
    FROM documents
    GROUP BY lang, source
    HAVING COUNT(*) > 1
    """,
)
def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.exact_dedup_stats(docs, ["lang", "source"])


@_register(
    "exact_dedup_survivors",
    "C1+A17 (first-wins exact dedup: one survivor per key)",
    """
    SELECT lang, source, doc_id AS survivor_doc_id
    FROM (
        SELECT lang, source, doc_id,
               row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS __rn
        FROM documents
    )
    WHERE __rn = 1
    """,
)
def q_exact_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.first_wins_dedup(docs, ["lang", "source"], ["doc_id"]).select(
        "lang", "source", F.col("doc_id").alias("survivor_doc_id")
    )


@_register(
    "set_except",
    "C8 (multiset EXCEPT ALL: regression diff between runs)",
    """
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    return SO.table_diff(urgent, finished)


@_register(
    "set_intersect",
    "C8 (distinct INTERSECT)",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_cust = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_cust = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return SO.table_common(open_cust, done_cust)


@_register(
    "union_batches",
    "C8 (unionByName of incremental batches + dedup)",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderdate < TIMESTAMP '1997-01-01'
    UNION
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    """,
)
def q_union_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    b1 = FL.date_range_filter(o, "o_orderdate", before="1997-01-01").select(
        "o_orderkey", "o_totalprice"
    )
    b2 = FL.date_range_filter(o, "o_orderdate", since="1996-01-01").select(
        "o_orderkey", "o_totalprice"
    )
    return SO.union_batches(b1, b2).distinct()


# ---------------------------------------------------------------------------
# C9 — ranking / running windows; C10 — rollup & cube; C7 — distinct/approx.
# ---------------------------------------------------------------------------


@_register(
    "top_n_per_group_salted",
    "C9 at scale (two-phase salted top-n: per-(group,salt) local top-n, "
    "then global top-n over S·n survivors — hot groups never sort on one "
    "task; output bit-identical to the single-window form)",
    """
    SELECT year, o_orderkey, o_totalprice, rank_in_group
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS year, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY year(o_orderdate)
                                       ORDER BY o_totalprice DESC, o_orderkey ASC)
                    AS INT) AS rank_in_group
        FROM orders
    )
    WHERE rank_in_group <= 3
    """,
)
def q_top_n_per_group_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn(
        "year", F.year("o_orderdate").cast("int")
    )
    return WN.salted_topk_per_group(
        o, ["year"], "o_totalprice", "o_orderkey", n=3
    ).select(
        "year",
        "o_orderkey",
        "o_totalprice",
        F.col("rank_in_group").cast("int").alias("rank_in_group"),
    )


@_register(
    "top_n_per_group",
    "C9 (top-3 orders per year, deterministic rank window)",
    """
    SELECT year, o_orderkey, o_totalprice, rank_in_group
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS year, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY year(o_orderdate)
                                       ORDER BY o_totalprice DESC, o_orderkey ASC)
                    AS INT) AS rank_in_group
        FROM orders
    )
    WHERE rank_in_group <= 3
    """,
)
def q_top_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn(
        "year", F.year("o_orderdate")
    )
    # descending on value with ascending unique tiebreak: express directly
    from pyspark.sql import Window

    w = Window.partitionBy("year").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rank_in_group", F.row_number().over(w))
        .filter(F.col("rank_in_group") <= 3)
        .select("year", "o_orderkey", "o_totalprice", "rank_in_group")
    )


@_register(
    "running_total",
    "C9 (per-customer running balance, decimal-exact prefix sums)",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
    FROM orders
    """,
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return WN.running_total(
        o, ["o_custkey"], ["o_orderdate", "o_orderkey"], "o_totalprice"
    ).select("o_custkey", "o_orderkey", "running_total")


@_register(
    "rollup_spend",
    "C10 (rollup with subtotals + grand total)",
    f"""
    SELECT CAST(year(o_orderdate) AS INT) AS year,
           CAST(month(o_orderdate) AS INT) AS month,
           {oracle_dsum('o_totalprice')} AS total_spend,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (1, 2)
    ORDER BY 1 NULLS FIRST, 2 NULLS FIRST
    """,
)
def q_rollup_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AGG.rollup_spend(load_table(spark, sf_dir, "orders"))


@_register(
    "cube_spend",
    "C10 (cube over status × priority)",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           {oracle_dsum('o_totalprice')} AS total_spend,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY 1 NULLS FIRST, 2 NULLS FIRST
    """,
)
def q_cube_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AGG.cube_spend(load_table(spark, sf_dir, "orders"))


@_register(
    "exact_distinct_counts",
    "C7 twin (exact distinct counts — oracle-checkable)",
    """
    SELECT COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderstatus) AS n_statuses,
           COUNT(*) AS n_orders
    FROM orders
    """,
)
def q_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AGG.exact_distinct_counts(load_table(spark, sf_dir, "orders"))


from .operators.sketches import (  # noqa: E402
    grid_quantile_by_group_sql,
    grid_quantile_sql,
)

# the deterministic-HLL CTE chain (shared construction with the
# hll_distinct_orders oracle in analytics_shapes.py), keyed here on
# orders.o_custkey
_HLL_CUSTKEY_SQL = """
    k AS (
        SELECT DISTINCT o_custkey AS v FROM orders
        WHERE o_custkey IS NOT NULL
    ), h AS (
        SELECT (((v % 2147483647) + 2147483647) % 2147483647
                * 2654435761 % 2147483647) * 2147483648
             + (((v % 2147483647) + 2147483647) % 2147483647
                * 40503 + 12345) % 2147483647 AS hh
        FROM k
    ), bw AS (
        SELECT CAST(hh & 1023 AS INT) AS b,
               CAST(hh >> 10 AS BIGINT) AS w
        FROM h
    ), reg AS (
        SELECT b,
               MAX(CASE WHEN w > 0 THEN
                     CAST(bit_count((w & -w) - 1) AS INT) + 1
                   ELSE 53 END) AS reg
        FROM bw GROUP BY 1
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS seen,
               SUM(CAST(CAST(1 AS BIGINT) << (63 - reg) AS HUGEINT)
                   * 2) AS ssum
        FROM reg
    )"""


@_register(
    "approx_aggregates",
    "C7 (deterministic sketches, r6: distinct customers via the "
    "engine-agnostic HLL, price median/p99 via the binary-exponent "
    "quantile grid — approximate in accuracy, bit-identical across "
    "engines, so the ESTIMATES are hash-checked; Spark's native "
    "HLL++/GK forms remain as operators, tolerance-pinned in tests — "
    "operators/aggregates.py::approx_aggregates_sketch)",
    f"""
    WITH {_HLL_CUSTKEY_SQL},
    pq AS (
        SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        FROM orders
    ),{grid_quantile_sql('pq', [500_000, 990_000], 'gq')}
    SELECT CASE WHEN seen > 0 THEN
             CAST(CAST(720539 AS HUGEINT) * 1024 * 1024
                  * CAST(18446744073709551616 AS HUGEINT)
                  // ((ssum + (1024 - seen)
                       * CAST(18446744073709551616 AS HUGEINT))
                      * 1000000) AS BIGINT)
           END AS approx_customers,
           (SELECT est FROM gq_est WHERE p_ppm = 500000)
               AS approx_median_price_cents,
           (SELECT est FROM gq_est WHERE p_ppm = 990000)
               AS approx_p99_price_cents
    FROM s
    """,
)
def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ext.shared import orders_custkey_monthly_registers

    return AGG.approx_aggregates_sketch(
        load_table(spark, sf_dir, "orders"),
        custkey_registers=orders_custkey_monthly_registers(spark, sf_dir),
    )


# ---------------------------------------------------------------------------
# C6 — windowed event-time aggregation (batch twin of the streaming path).
# ---------------------------------------------------------------------------


@_register(
    "tumbling_window_agg",
    "C6 (event-time tumbling window, batch twin of streaming/windows.py)",
    f"""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           {oracle_dsum('value', 'DECIMAL(18,6)')} AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "decimal(18,6)").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# C4 + north-star text analysis.
# ---------------------------------------------------------------------------


@_register(
    "word_frequencies",
    "C4 (tokenize→explode→count; top-100 corpus words)",
    r"""
    SELECT word, n
    FROM (
        SELECT word, COUNT(*) AS n
        FROM (
            SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
            FROM documents
        )
        WHERE word <> ''
        GROUP BY word
    )
    ORDER BY n DESC, word ASC
    LIMIT 100
    """,
)
def q_word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.word_frequencies(docs).orderBy(F.desc("n"), F.asc("word")).limit(100)


@_register(
    "token_stats",
    "C4/north-star (token counting + char stats per doc)",
    r"""
    SELECT doc_id,
           length(text) AS n_chars_computed,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens,
           lang
    FROM documents
    """,
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.char_length("text").alias("n_chars_computed"),
        TX.token_count("text").alias("n_tokens"),
        "lang",
    )


@_register(
    "pack_sequences",
    "north-star (sequence packing: whole docs into fixed-token-budget "
    "training bins; sharded prefix-sum, never a global sort)",
    r"""
    WITH toks AS (
        SELECT doc_id, doc_id % 32 AS shard,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
        FROM documents
    ), packed AS (
        SELECT doc_id, shard, n_tok,
               CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                            ROWS UNBOUNDED PRECEDING) - n_tok)
                          / 256.0) AS BIGINT) AS bin
        FROM toks
    )
    SELECT shard, bin, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM packed GROUP BY shard, bin
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.pack_sequences(docs, capacity=256, n_shards=32)


_STOPWORD_SQL = ", ".join(f"'{w}'" for w in TX.STOPWORDS)


@_register(
    "lang_id_heuristic",
    "north-star (language-ID via stopword/ASCII heuristic)",
    rf"""
    SELECT lang_pred, COUNT(*) AS n_docs
    FROM (
        SELECT CASE
                 WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                          t -> t IN ({_STOPWORD_SQL})))
                      / greatest(len(regexp_split_to_array(trim(lower(text)), '\s+')), 1)
                      >= 0.15
                 THEN 'en'
                 WHEN length(regexp_replace(text, '[^\x00-\x7F]', '', 'g'))
                      / greatest(length(text), 1) >= 0.9
                 THEN 'other_latin'
                 ELSE 'non_latin'
               END AS lang_pred
        FROM documents
    )
    GROUP BY lang_pred
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(TX.lang_id_heuristic("text").alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _fp_fold_sql(expr: str, base: int) -> str:
    """DuckDB twin of one base-``base`` polynomial fold over string
    ``expr`` (ext/dedup_fuzzy.py::_poly_hash62's per-base half)."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, length({expr}) + 1), "
        f"i -> CAST(ascii({expr}[i]) AS BIGINT))), "
        f"(a, b) -> (a * {base} + b) % 2147483647)"
    )


@_register(
    "doc_fingerprints",
    "north-star (62-bit engine-agnostic content fingerprint: the "
    "two-base polynomial fold family shared with the near-dup "
    "promotions — functions/text.py::doc_fingerprint_portable; the "
    "xxhash64 fast path stays for single-engine use)",
    f"""
    WITH d AS (
        SELECT doc_id, trim(lower(text)) AS t FROM documents
    )
    SELECT doc_id,
           CAST({_fp_fold_sql('t', 131)} * 2147483648
                + {_fp_fold_sql('t', 137)} AS BIGINT) AS fingerprint
    FROM d
    """,
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", TX.doc_fingerprint_portable("text").alias("fingerprint")
    )


# ---------------------------------------------------------------------------
# C3 — similarity search (brute-force quantized-integer top-k; exact parity).
# ---------------------------------------------------------------------------


def _quantize(col):
    return F.floor(col.cast("double") * F.lit(1000000.0)).cast("long")


@_register(
    "cosine_topk_bruteforce",
    "C3 (brute-force top-k similarity; integer-quantized dot for parity)",
    """
    WITH q AS (SELECT embedding AS q_embedding FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           CAST(list_sum(list_transform(list_zip(e.embedding, q.q_embedding),
                p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * 1000000.0) AS BIGINT)
                   * CAST(FLOOR(CAST(p[2] AS DOUBLE) * 1000000.0) AS BIGINT)))
                AS BIGINT) AS dot_q,
           e.label
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> 0
    ORDER BY dot_q DESC, vec_id ASC
    LIMIT 10
    """,
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    query_vec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding")
    )
    prods = F.zip_with(
        "embedding", "q_embedding", lambda x, y: _quantize(x) * _quantize(y)
    )
    dot_q = F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)
    return (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(query_vec))
        .select("vec_id", dot_q.alias("dot_q"), "label")
        .orderBy(F.desc("dot_q"), F.asc("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Heavier relational shapes: fact-fact shuffle join, having, pivot,
# analytics — the plans that must survive a 100× scale-up.
# ---------------------------------------------------------------------------


@_register(
    "revenue_per_customer",
    "B3+B1 at scale (fact-fact shuffle join + broadcast dim + agg)",
    f"""
    SELECT c_custkey, c_name,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 'DECIMAL(18,4)')} AS revenue,
           COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY c_custkey, c_name
    """,
)
def q_revenue_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Eager aggregation (partial-agg pushdown through the join — a
    # rewrite Catalyst does NOT apply): lineitem collapses to one row
    # per orderkey BEFORE the join, so the join input shrinks from
    # |lineitem| to |orders| — at 100 TB that is the difference between
    # shuffling the biggest table and shuffling the fact's key set.
    # Exact because the decimal partial sums re-aggregate associatively
    # (same algebra as pipeline/incremental.py). Customer stays a
    # broadcast dim.
    cust = load_table(spark, sf_dir, "customer")
    orders = FL.date_range_filter(
        load_table(spark, sf_dir, "orders"), "o_orderdate", since="1996-01-01"
    )
    from .operators.partitioning import fan_out

    # fan the single-row-group fact out BY THE ORDER KEY (guide §2.5):
    # the decimal revenue aggregate and the orders join then run wide
    # behind one explicit exchange (cluster-scale scans pass through)
    li = fan_out(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        "l_orderkey",
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        ).alias("__rev_dec"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum("__rev_dec").cast("double").alias("revenue"),
            F.sum("__n").alias("n_items"),
        )
    )


@_register(
    "frequent_customers_having",
    "B1 (agg + HAVING post-filter)",
    f"""
    SELECT o_custkey, COUNT(*) AS n_orders,
           {oracle_dsum('o_totalprice')} AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
)
def q_frequent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_spend"))
        .filter(F.col("n_orders") >= 15)
    )


@_register(
    "pivot_status_by_month",
    "C10 family (pivot = grouped conditional aggregation)",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS year,
           CAST(month(o_orderdate) AS INT) AS month,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explicit pivot values → no extra distinct-discovery job, and the
    # plan is a single hash agg with conditional counters
    piv = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("year"), F.month("o_orderdate").alias("month"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "year",
        "month",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


@_register(
    "orders_above_customer_avg",
    "C9 (analytic window: rows above their partition average)",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM (
        SELECT o_orderkey, o_custkey, o_totalprice,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
        FROM orders
    )
    WHERE o_totalprice > 1.5 * cust_avg
    """,
)
def q_orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey")
    o = load_table(spark, sf_dir, "orders")
    avg_exact = (
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        o.withColumn("cust_avg", avg_exact)
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@_register(
    "sliding_window_agg",
    "C6 (sliding window: 1h window / 30m slide — each event in 2 buckets)",
    f"""
    WITH floored AS (
        SELECT ts, value,
               date_trunc('hour', ts)
               + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                      ELSE INTERVAL 0 MINUTE END AS f30
        FROM events
    ), assigned AS (
        SELECT x.ws, value
        FROM floored,
             LATERAL (SELECT unnest([f30, f30 - INTERVAL 30 MINUTE]) AS ws) x
    )
    SELECT ws AS window_start, ws + INTERVAL 1 HOUR AS window_end,
           COUNT(*) AS n_events,
           {oracle_dsum('value', 'DECIMAL(18,6)')} AS total_value
    FROM assigned
    GROUP BY ws
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "decimal(18,6)").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


@_register(
    "sessionization",
    "C6 (session windows; oracle = lag/cumsum sessionization — new session "
    "when the gap to the previous event EXCEEDS 15 min: session_window "
    "spans [ts, ts+gap) but merges on touch, so an exact-gap successor "
    "joins the session; verified against Spark on the boundary case)",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 15 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 15 MINUTE AS session_end,
           user_id,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.windows import sessionized_counts

    return sessionized_counts(
        load_table(spark, sf_dir, "events"), gap="15 minutes"
    )


# ---------------------------------------------------------------------------
# Scalar breadth: CASE bucketing, string functions, quality/token scoring.
# ---------------------------------------------------------------------------


@_register(
    "case_bucketing",
    "A8 family (CASE WHEN bucketing + agg)",
    f"""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS bucket,
           COUNT(*) AS n_orders,
           {oracle_dsum('o_totalprice')} AS total_spend
    FROM orders
    GROUP BY 1
    """,
)
def q_case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_spend"))
    )


@_register(
    "string_functions",
    "A19-A22 family (string scalar breadth: upper/substr/concat/regexp)",
    r"""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           substr(p_name, 1, 10) AS name10,
           concat(p_brand, '#', p_type) AS tag,
           regexp_replace(p_type, '\s+', '_', 'g') AS type_slug,
           length(p_name) AS name_len
    FROM part
    """,
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 10).alias("name10"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("tag"),
        F.regexp_replace("p_type", r"\s+", "_").alias("type_slug"),
        F.length("p_name").alias("name_len"),
    )


@_register(
    "quality_scores",
    "north-star (composite document quality score, fully SQL-expressible)",
    rf"""
    WITH feats AS (
        SELECT doc_id,
               least(length(text) / 500.0, 1.0) AS length_feat,
               len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                   t -> t IN ({_STOPWORD_SQL})))
               / greatest(len(regexp_split_to_array(trim(lower(text)), '\s+')), 1)
                   AS sw_ratio,
               (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
               / greatest(length(text), 1) AS punct_ratio
        FROM documents
    )
    SELECT doc_id,
           round(0.4 * length_feat + 0.4 * sw_ratio + 0.2 * (1.0 - punct_ratio), 6)
               AS quality
    FROM feats
    """,
)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.quality_score("text").alias("quality"))


@_register(
    "bpe_token_counts",
    "north-star (BPE-ish tokenizer-regex token counting)",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                AS INT) AS n_bpe_tokens,
           lang
    FROM documents
    """,
)
def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", TX.bpe_ish_token_count("text").alias("n_bpe_tokens"), "lang"
    )


@_register(
    "shipping_priority_q3",
    "TPC-H Q3 shape (3-way join + filter + agg + deterministic top-10)",
    f"""
    SELECT l_orderkey,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 'DECIMAL(18,4)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    # eager aggregation: lineitem collapses to one row per orderkey
    # BEFORE the joins (grouping key ⊇ join key, so the later groupBy
    # vanishes — the join is 1:1 against the pre-aggregate); the join
    # then moves |orders-with-late-lines| rows instead of |lineitem|
    per_order = li.groupBy("l_orderkey").agg(
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "decimal(18,4)"
        ).alias("revenue")
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@_register(
    "local_supplier_volume_q5",
    "TPC-H Q5 shape (6-table join: fact-fact + 4 broadcast dims)",
    f"""
    SELECT n_name,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 'DECIMAL(18,4)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1995-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(sup),
            (li.l_suppkey == sup.s_suppkey)
            & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "decimal(18,4)").alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"))
    )


# ---------------------------------------------------------------------------
# Breadth: grouping sets (SQL entry path), datetime/conditional/arg-extrema/
# array aggregation functions.
# ---------------------------------------------------------------------------


@_register(
    "grouping_sets",
    "C10 (explicit GROUPING SETS + grouping flags, via the spark.sql path)",
    """
    WITH o AS (
        SELECT CAST(year(o_orderdate) AS INT) AS y, o_orderstatus AS st
        FROM orders
    )
    SELECT y, st, COUNT(*) AS n,
           CAST(GROUPING(y) AS INT) AS g_year,
           CAST(GROUPING(st) AS INT) AS g_status
    FROM o
    GROUP BY GROUPING SETS ((y), (st), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL entry path (§3.2): the engine accepts SQL text, same Catalyst
    # plan as the DataFrame API
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        WITH o AS (
            SELECT CAST(year(o_orderdate) AS INT) AS y, o_orderstatus AS st
            FROM __orders_gs
        )
        SELECT y, st, COUNT(*) AS n,
               CAST(GROUPING(y) AS INT) AS g_year,
               CAST(GROUPING(st) AS INT) AS g_status
        FROM o
        GROUP BY GROUPING SETS ((y), (st), ())
        """
    )


@_register(
    "datetime_functions",
    "A22 family (datediff/trunc/extract/add_months breadth)",
    """
    SELECT o_orderkey,
           datediff('day', DATE '1995-01-01', o_orderdate) AS days_since,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(extract(dow FROM o_orderdate) AS INT) AS dow_sun0,
           o_orderdate + INTERVAL 3 MONTH AS plus3m
    FROM orders
    """,
)
def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        # Spark dayofweek is 1=Sunday; emit DuckDB's 0=Sunday convention
        (F.dayofweek("o_orderdate") - 1).alias("dow_sun0"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus3m"),
    )


@_register(
    "conditional_aggregates",
    "C7 family (count_if/bool_or/bool_and conditional aggregation)",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (o_totalprice > 100000) AS n_big,
           bool_or(o_orderstatus = 'P') AS any_pending,
           bool_and(o_totalprice > 0) AS all_positive
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
    )


@_register(
    "arg_extrema",
    "C9 family (max_by/min_by with deterministic struct tiebreak)",
    """
    SELECT o_orderpriority,
           max(struct_pack(p := o_totalprice, k := o_orderkey)).k AS biggest_order,
           min(struct_pack(p := o_totalprice, k := -o_orderkey)).k * -1
               AS smallest_order
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_arg_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_by on bare price is tie-nondeterministic; ordering by a
    # (price, key) struct makes the winner total — same trick as the
    # oracle's ROW() comparator
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max(F.struct("o_totalprice", "o_orderkey"))["o_orderkey"].alias(
            "biggest_order"
        ),
        (
            F.min(F.struct(F.col("o_totalprice"), (-F.col("o_orderkey")).alias("o_orderkey")))[
                "o_orderkey"
            ]
            * -1
        ).alias("smallest_order"),
    )


@_register(
    "sorted_array_agg",
    "C4/C9 family (collect_list → array_sort → slice: deterministic array "
    "agg; the output array is ','-serialized — array-typed output columns "
    "crash the driver's pandas canonicalizer)",
    """
    SELECT o_orderpriority,
           array_to_string(list(o_orderkey ORDER BY o_orderkey)[1:5], ',')
               AS first_orders,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_sorted_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # collect_list order is partition-dependent; array_sort restores a
    # total order before slicing — the deterministic array-agg idiom
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(
            F.transform(
                F.slice(F.array_sort(F.collect_list("o_orderkey")), 1, 5),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("first_orders"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "string_agg",
    "C4 family (ordered string aggregation)",
    """
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").withColumnRenamed(
        "r_regionkey", "n_regionkey"
    )
    return (
        nation.join(F.broadcast(region), "n_regionkey")
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
        )
    )


@_register(
    "order_max_item",
    "B3 family (decorrelated per-group max joined back to the fact)",
    """
    SELECT o_orderkey, o_totalprice, m.max_item_price
    FROM orders
    JOIN (
        SELECT l_orderkey AS o_orderkey, MAX(l_extendedprice) AS max_item_price
        FROM lineitem GROUP BY 1
    ) m USING (o_orderkey)
    WHERE o_totalprice < 3 * m.max_item_price
    """,
)
def q_order_max_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    m = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.max("l_extendedprice").alias("max_item_price"))
    )
    return (
        o.join(m, "o_orderkey")
        .filter(F.col("o_totalprice") < 3 * F.col("max_item_price"))
        .select("o_orderkey", "o_totalprice", "max_item_price")
    )


@_register(
    "date_spine_densification",
    "B1 family (calendar-spine left join: months with zero orders appear)",
    f"""
    WITH spine AS (
        SELECT d AS month_start
        FROM generate_series(TIMESTAMP '1994-01-01', TIMESTAMP '2002-12-01',
                             INTERVAL 1 MONTH) t(d)
    ), agg AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               COUNT(*) AS n_orders,
               {oracle_dsum('o_totalprice')} AS total_spend
        FROM orders GROUP BY 1
    )
    SELECT spine.month_start,
           COALESCE(agg.n_orders, 0) AS n_orders,
           COALESCE(agg.total_spend, 0.0) AS total_spend
    FROM spine LEFT JOIN agg USING (month_start)
    """,
)
def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sequence() generates the spine ON the cluster — no driver loop
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1994-01-01").cast("timestamp"),
                F.lit("2002-12-01").cast("timestamp"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month_start")
    )
    agg = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month_start"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_spend"))
    )
    return spine.join(agg, "month_start", "left").select(
        "month_start",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
    )


@_register(
    "unpivot_melt",
    "C10 family (unpivot/melt: wide counters → long rows)",
    """
    WITH a AS (
        SELECT o_orderstatus AS st,
               COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
               COUNT(*) FILTER (o_orderpriority = '5-LOW') AS low
        FROM orders GROUP BY 1
    )
    SELECT st, prio, n FROM a UNPIVOT (n FOR prio IN (urgent, low))
    """,
)
def q_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("st"))
        .agg(
            F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("urgent"),
            F.count_if(F.col("o_orderpriority") == "5-LOW").alias("low"),
        )
    )
    return wide.unpivot("st", ["urgent", "low"], "prio", "n")


@_register(
    "ntile_quartiles",
    "C9 family (ntile bucketing over a total order)",
    """
    SELECT quartile,
           COUNT(*) AS n,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi
    FROM (
        SELECT o_totalprice,
               CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INT)
                   AS quartile
        FROM orders
    )
    GROUP BY quartile
    """,
)
def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact ntile with NO global-order window (SCALE_DESIGN cliff #1,
    # closed in r3): boundary cut pairs are computed cluster-side and
    # broadcast as literals; assignment is map-side. Bit-identical to
    # ntile(4) OVER (ORDER BY o_totalprice, o_orderkey).
    o = load_table(spark, sf_dir, "orders")
    nt = WN.exact_ntile(o, 4, "o_totalprice", "o_orderkey", out_col="quartile")
    return nt.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@_register(
    "null_safe_equality",
    "A8 family (null-safe equality join: NULL keys match NULL)",
    """
    SELECT e1.event_id AS id_a, e2.event_id AS id_b
    FROM (SELECT event_id, CASE WHEN value > 0 THEN event_type END AS k
          FROM events WHERE event_id < 200) e1
    JOIN (SELECT event_id, CASE WHEN value > 0 THEN event_type END AS k
          FROM events WHERE event_id >= 200 AND event_id < 400) e2
      ON e1.k IS NOT DISTINCT FROM e2.k
    """,
)
def q_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.when(F.col("value") > 0, F.col("event_type"))
    e1 = ev.filter(F.col("event_id") < 200).select(
        F.col("event_id").alias("id_a"), k.alias("k")
    )
    e2 = ev.filter((F.col("event_id") >= 200) & (F.col("event_id") < 400)).select(
        F.col("event_id").alias("id_b"), k.alias("k")
    )
    return e1.join(e2, e1.k.eqNullSafe(e2.k)).select("id_a", "id_b")


@_register(
    "union_by_name_missing",
    "C8 (schema-evolution union: by-name alignment, missing cols → NULL)",
    """
    SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
    FROM orders WHERE o_orderstatus = 'P'
    UNION ALL BY NAME
    SELECT o_orderkey, o_orderpriority
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "P").select(
        "o_orderkey", "o_totalprice", F.lit(None).cast("string").alias("o_orderpriority")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderpriority")
    return a.unionByName(b, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# C2 + north-star fuzzy dedup (documents table).
# ---------------------------------------------------------------------------

# DuckDB twin of ext.dedup_fuzzy.word_shingles (5-word shingles, distinct):
# t[i:i+4] is 1-based inclusive slicing = 5 tokens, matching Spark's
# slice(toks, i, 5).
_SHINGLES_CTE = r"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
), sh AS (
    SELECT DISTINCT doc_id, array_to_string(t[i.i:i.i+4], ' ') AS shingle
    FROM toks,
         LATERAL (SELECT unnest(range(1, greatest(len(t)-3, 2))) AS i) i
), sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)
"""


@_register(
    "ngram_jaccard_pairs",
    "C2/north-star (n-gram Jaccard near-dup; blocked pair generation)",
    _SHINGLES_CTE
    + """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) / (CAST(sa.n_sh AS DOUBLE) + sb.n_sh - COUNT(*)) AS jaccard
    FROM sh a
    JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    JOIN sizes sa ON sa.doc_id = a.doc_id
    JOIN sizes sb ON sb.doc_id = b.doc_id
    GROUP BY a.doc_id, b.doc_id, sa.n_sh, sb.n_sh
    HAVING COUNT(*) / (CAST(sa.n_sh AS DOUBLE) + sb.n_sh - COUNT(*)) >= 0.6
    """,
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ext.shared import ngram_jaccard_pairs_06

    return ngram_jaccard_pairs_06(spark, sf_dir)


@_register(
    "benchmark_contamination",
    "north-star (decontamination: train docs sharing ≥3 shingles with an "
    "eval set; eval side broadcasts — no corpus-sized shuffle)",
    _SHINGLES_CTE
    + """
    SELECT t.doc_id AS train_doc, b.doc_id AS bench_doc,
           COUNT(*) AS n_overlap
    FROM sh t
    JOIN sh b ON t.shingle = b.shingle
    WHERE b.doc_id % 50 = 0 AND t.doc_id % 50 <> 0
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    """,
)
def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # deterministic pseudo-eval set: every 50th doc
    return DF.contamination_check(
        train=docs.filter(F.col("doc_id") % 50 != 0),
        benchmark=docs.filter(F.col("doc_id") % 50 == 0),
        min_overlap=3,
    )


from .ext.dedup_fuzzy import _AFFINE_A as _AFA, _AFFINE_B as _AFB

_A_SQL = "[" + ", ".join(str(x) for x in _AFA) + "]"
_B_SQL = "[" + ", ".join(str(x) for x in _AFB) + "]"

_POLY_FOLD = """list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, length({col}) + 1),
                              i -> CAST(ascii({col}[i]) AS BIGINT))),
               (a, b) -> (a * {base} + b) % 2147483647)"""


@_register(
    "minhash_lsh_near_dup",
    "C2 (MinHash+LSH near-dedup: shingle→minhash→band→bucket-join→verify — "
    "r3: engine-agnostic polynomial hash family, so the WHOLE pipeline "
    "(64-slot signatures, 16×4 banding, exact-Jaccard verify) is "
    "oracle-checked, not rows-only)",
    _SHINGLES_CTE.rstrip()
    + f""",
hd AS MATERIALIZED (
    SELECT DISTINCT doc_id,
           {_POLY_FOLD.format(base=131, col='shingle')} * 2147483648
           + {_POLY_FOLD.format(base=137, col='shingle')} AS h62
    FROM sh
), slots AS MATERIALIZED (
    SELECT doc_id, i.i AS slot,
           MIN((({_A_SQL})[i.i + 1] * (h62 % 2147483647)
                + ({_B_SQL})[i.i + 1]) % 2147483647) AS g
    FROM hd, LATERAL (SELECT unnest(range(0, 64)) AS i) i
    GROUP BY doc_id, i.i
), bands AS MATERIALIZED (
    SELECT doc_id, slot // 4 AS band, list(g ORDER BY slot) AS bvals
    FROM slots GROUP BY doc_id, slot // 4
), cands AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bvals = b.bvals AND a.doc_id < b.doc_id
), hsizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM hd GROUP BY doc_id)
SELECT c.doc_a, c.doc_b,
       COUNT(*) / (CAST(sa.n_sh AS DOUBLE) + sb.n_sh - COUNT(*)) AS jaccard
FROM cands c
JOIN hd x ON x.doc_id = c.doc_a
JOIN hd y ON y.doc_id = c.doc_b AND y.h62 = x.h62
JOIN hsizes sa ON sa.doc_id = c.doc_a
JOIN hsizes sb ON sb.doc_id = c.doc_b
GROUP BY c.doc_a, c.doc_b, sa.n_sh, sb.n_sh
HAVING COUNT(*) / (CAST(sa.n_sh AS DOUBLE) + sb.n_sh - COUNT(*)) >= 0.6
""",
)
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DF.minhash_near_dup_pairs(docs, threshold=0.6, hash_family="poly")


@_register(
    "simhash_near_dup",
    "north-star (SimHash 64-bit + pigeonhole-blocked Hamming pairs — r3: "
    "64 engine-agnostic affine hyperplanes over the polynomial fold, so "
    "signature, 4×16-bit chunk blocking, and Hamming verify are all "
    "oracle-checked)",
    f"""
WITH toks AS MATERIALIZED (
    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
    FROM documents
), hm AS MATERIALIZED (
    SELECT doc_id,
           (({_POLY_FOLD.format(base=131, col='tok')} * 2147483648
             + {_POLY_FOLD.format(base=137, col='tok')}) % 2147483647) AS h
    FROM toks
), bits AS MATERIALIZED (
    SELECT doc_id, j.j AS j,
           SUM(CASE WHEN (({_A_SQL})[j.j + 1] * h
                          + ({_B_SQL})[j.j + 1]) % 2147483647
                         > 1073741823 THEN 1 ELSE -1 END) AS b
    FROM hm, LATERAL (SELECT unnest(range(0, 64)) AS j) j
    GROUP BY doc_id, j.j
), sig AS MATERIALIZED (
    -- CAST: SUM yields HUGEINT; leaving it would make xor(sim_a, sim_b)
    -- run in 128-bit, where mixed-sign pairs sign-extend to 64 extra
    -- set bits and bit_count silently exceeds the Hamming threshold —
    -- dropping true near-pairs (66 missing rows at sf0.1, r4 find)
    SELECT doc_id,
           CAST(SUM(CASE WHEN b > 0 THEN
                 (CASE WHEN j = 63 THEN -9223372036854775807 - 1
                       ELSE (CAST(1 AS BIGINT) << CAST(j AS INT)) END)
               ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
), chunks AS (
    SELECT doc_id, simhash, c.c AS chunk_idx,
           (simhash >> CAST(c.c * 16 AS INT)) & 65535 AS chunk_val
    FROM sig, LATERAL (SELECT unnest(range(0, 4)) AS c) c
), cands AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.simhash AS sim_a, b.simhash AS sim_b
    FROM chunks a JOIN chunks b
      ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
     AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
FROM cands
WHERE bit_count(xor(sim_a, sim_b)) <= 6
""",
)
def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DF.simhash_near_dup_pairs(docs, max_hamming=6, hash_family="poly")


_CLUSTERS_ORACLE_SQL = (
    _SHINGLES_CTE
    + """
    , pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a
        JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        JOIN sizes sa ON sa.doc_id = a.doc_id
        JOIN sizes sb ON sb.doc_id = b.doc_id
        GROUP BY a.doc_id, b.doc_id, sa.n_sh, sb.n_sh
        HAVING COUNT(*) / (CAST(sa.n_sh AS DOUBLE) + sb.n_sh - COUNT(*)) >= 0.6
    ), edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION
        SELECT doc_b AS u, doc_a AS v FROM pairs
    ), reach AS (
        WITH RECURSIVE r(u, v) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM r JOIN edges e ON r.v = e.u
        )
        SELECT * FROM r
    )
    SELECT u AS doc_id,
           least(u, MIN(v)) AS cluster_id
    FROM reach
    GROUP BY u
    """
)


@_register(
    "near_dup_clusters",
    "C2/iterative (connected components over the near-dup graph: min-label "
    "propagation to fixpoint; oracle = recursive-CTE transitive closure)",
    _CLUSTERS_ORACLE_SQL,
)
def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ext.shared import ngram_jaccard_pairs_06

    # pair build rides the session memo (three queries consume the
    # identical 0.6-threshold pair set); the CC iteration is the work
    return DF.near_dup_clusters(ngram_jaccard_pairs_06(spark, sf_dir))


# ---------------------------------------------------------------------------
# C3 — similarity search (knn join + bucketed LSH pairs).
# ---------------------------------------------------------------------------


@_register(
    "knn_join",
    "C3 (brute-force k-NN join: top-3 neighbors for 10 query vectors)",
    """
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qvec
        FROM embeddings WHERE vec_id < 10
    ), scored AS (
        SELECT q.query_id, e.vec_id,
               CAST(list_sum(list_transform(list_zip(e.embedding, q.qvec),
                    p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * 1000000.0) AS BIGINT)
                       * CAST(FLOOR(CAST(p[2] AS DOUBLE) * 1000000.0) AS BIGINT)))
                    AS BIGINT) AS dot_q
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, dot_q, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY dot_q DESC, vec_id ASC) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.knn_join(emb, queries_df, k=3)


@_register(
    "bucketed_near_pairs",
    "C3 (sign-LSH bucketed near-pair search, quantized cosine)",
    """
    WITH b AS (
        SELECT vec_id, embedding,
               CAST(list_sum(list_transform(range(1, 9),
                    j -> CASE WHEN embedding[j] >= 0
                         THEN CAST(pow(2, 8 - j) AS BIGINT) ELSE 0 END))
                    AS INT) AS bucket
        FROM embeddings
    ), pairs AS (
        SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b, a.embedding AS va, b2.embedding AS vb
        FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
    ), scored AS (
        SELECT vec_a, vec_b,
               list_sum(list_transform(list_zip(va, vb),
                    p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * 1000000.0) AS BIGINT)
                       * CAST(FLOOR(CAST(p[2] AS DOUBLE) * 1000000.0) AS BIGINT)))
               / sqrt(
                 CAST(list_sum(list_transform(va,
                      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                         * CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))) AS DOUBLE)
                 *
                 CAST(list_sum(list_transform(vb,
                      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                         * CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))) AS DOUBLE)
               ) AS cosine
        FROM pairs
    )
    SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= 0.2
    """,
)
def q_bucketed_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.bucketed_near_pairs(emb, threshold=0.2, n_bits=8)


# ---------------------------------------------------------------------------
# Join breadth: as-of, semi, full-outer; window analytics; percentiles; IVF.
# ---------------------------------------------------------------------------

_QDOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * 1000000.0) AS BIGINT) "
    "   * CAST(FLOOR(CAST(p[2] AS DOUBLE) * 1000000.0) AS BIGINT)))"
)


@_register(
    "asof_join",
    "custom operator (as-of join: latest purchase value at or before each "
    "click, per user; Spark composition = union + running last_value; "
    "oracle = DuckDB native ASOF JOIN)",
    """
    WITH clicks AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT clicks.ts, clicks.user_id, clicks.event_id,
           purchases.value AS last_purchase_value
    FROM clicks
    ASOF LEFT JOIN purchases
      ON clicks.user_id = purchases.user_id AND clicks.ts >= purchases.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("last_purchase_value")
    )
    return JN.asof_join(
        clicks, purchases, ts_col="ts", by=["user_id"], right_vals=["last_purchase_value"]
    )


@_register(
    "semi_join",
    "A11 family (left-semi join: EXISTS)",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.join(urgent, "c_custkey", "left_semi").select("c_custkey", "c_name")


@_register(
    "full_outer_join",
    "B3 family (full outer join with null-side coalescing)",
    """
    SELECT n_name, COALESCE(s.n_suppliers, 0) AS n_suppliers
    FROM nation
    FULL OUTER JOIN (
        SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1
    ) s ON n_nationkey = s_nationkey
    """,
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("n_nationkey"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return nation.join(sup, "n_nationkey", "full_outer").select(
        "n_name", F.coalesce(F.col("__n"), F.lit(0)).alias("n_suppliers")
    )


@_register(
    "lag_lead_analytics",
    "C9 (lag/lead/first_value window analytics)",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_totalprice) OVER w AS first_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
    )


@_register(
    "exact_percentiles",
    "C7 twin (exact interpolated percentiles per group, rounded to absorb "
    "the engines' algebraically-equivalent-but-FP-different interpolation)",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
    )


@_register(
    "ivf_topk",
    "C3 scale path (IVF-bucketed ANN: centroid assign → probe one cell)",
    f"""
    WITH centroids AS (
        SELECT vec_id AS cell, embedding AS cvec FROM embeddings WHERE vec_id < 16
    ), scored AS (
        SELECT e.vec_id, e.embedding, c.cell,
               {_QDOT.format(a='e.embedding', b='c.cvec')} AS score
        FROM embeddings e CROSS JOIN centroids c
    ), assigned AS (
        SELECT vec_id, embedding, cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY score DESC, cell ASC) AS rn
            FROM scored
        ) WHERE rn = 1
    ), q AS (
        SELECT cell AS q_cell, embedding AS qvec FROM assigned WHERE vec_id = 0
    )
    SELECT a.vec_id, a.cell,
           CAST({_QDOT.format(a='a.embedding', b='q.qvec')} AS BIGINT) AS dot_q
    FROM assigned a CROSS JOIN q
    WHERE a.cell = q.q_cell AND a.vec_id <> 0
    ORDER BY dot_q DESC, a.vec_id ASC
    LIMIT 5
    """,
)
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.ivf_topk(emb, query_id=0, n_centroids=16, k=5)


_ANN_EVAL_QIDS = [0, 7, 57, 123, 200]


@_register(
    "ann_recall_at_k",
    "C3/north-star (r10: the ANN EVALUATION every index deployment "
    "runs before trusting its probe settings — recall@10 of the "
    "3-probe IVF path vs exact brute force per query, "
    "|exact ∩ approx|·10⁶ DIV k; both sides deterministic integer "
    "dots with id tie-breaks, so the recall table itself "
    "hash-checks — ext/similarity.py::ann_recall_eval)",
    f"""
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qv FROM embeddings
        WHERE vec_id IN ({", ".join(str(i) for i in _ANN_EVAL_QIDS)})
    ), sc AS (
        SELECT q.qid, e.vec_id,
               {_QDOT.format(a='e.embedding', b='q.qv')} AS d
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.qid
    ), exact AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY d DESC, vec_id ASC) AS rn
            FROM sc
        ) WHERE rn <= 10
    ), cent AS (
        SELECT vec_id AS cell, embedding AS cvec FROM embeddings
        WHERE vec_id < 16
    ), asg AS (
        SELECT vec_id, cell FROM (
            SELECT e.vec_id, c.cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_QDOT.format(a='e.embedding', b='c.cvec')}
                                DESC, c.cell ASC) AS rn
            FROM embeddings e CROSS JOIN cent c
        ) WHERE rn = 1
    ), probe AS (
        SELECT qid, cell FROM (
            SELECT q.qid, c.cell,
                   row_number() OVER (
                       PARTITION BY q.qid
                       ORDER BY {_QDOT.format(a='c.cvec', b='q.qv')}
                                DESC, c.cell ASC) AS rn
            FROM cent c CROSS JOIN q
        ) WHERE rn <= 3
    ), approx AS (
        SELECT qid, vec_id FROM (
            SELECT p.qid, a.vec_id,
                   row_number() OVER (
                       PARTITION BY p.qid
                       ORDER BY {_QDOT.format(a='e.embedding', b='q.qv')}
                                DESC, a.vec_id ASC) AS rn
            FROM asg a
            JOIN probe p ON a.cell = p.cell
            JOIN embeddings e ON e.vec_id = a.vec_id
            JOIN q ON q.qid = p.qid
            WHERE a.vec_id <> p.qid
        ) WHERE rn <= 10
    )
    SELECT ex.qid,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS recall_ppm
    FROM exact ex
    LEFT JOIN approx ap ON ap.qid = ex.qid AND ap.vec_id = ex.vec_id
    GROUP BY ex.qid ORDER BY ex.qid
    """,
)
def q_ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.ann_recall_eval(
        emb, _ANN_EVAL_QIDS, k=10, n_centroids=16, n_probe=3
    )


@_register(
    "ivf_topk_multiprobe",
    "C3 scale path (multi-probe IVF: rank cells for the query, probe top-3 — "
    "the recall knob over single-probe)",
    f"""
    WITH centroids AS (
        SELECT vec_id AS cell, embedding AS cvec FROM embeddings WHERE vec_id < 16
    ), scored AS (
        SELECT e.vec_id, e.embedding, c.cell,
               {_QDOT.format(a='e.embedding', b='c.cvec')} AS score
        FROM embeddings e CROSS JOIN centroids c
    ), assigned AS (
        SELECT vec_id, embedding, cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY score DESC, cell ASC) AS rn
            FROM scored
        ) WHERE rn = 1
    ), q AS (
        SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0
    ), probe AS (
        SELECT cell FROM (
            SELECT c.cell, {_QDOT.format(a='c.cvec', b='q.qvec')} AS s
            FROM centroids c CROSS JOIN q
        ) ORDER BY s DESC, cell ASC LIMIT 3
    )
    SELECT a.vec_id, a.cell,
           CAST({_QDOT.format(a='a.embedding', b='q.qvec')} AS BIGINT) AS dot_q
    FROM assigned a
    JOIN probe p ON a.cell = p.cell
    CROSS JOIN q
    WHERE a.vec_id <> 0
    ORDER BY dot_q DESC, a.vec_id ASC
    LIMIT 5
    """,
)
def q_ivf_topk_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.ivf_topk_multiprobe(emb, query_id=0, n_centroids=16, k=5, n_probe=3)


# ---------------------------------------------------------------------------
# C5/north-star — multimodal binary columns.
# ---------------------------------------------------------------------------


@_register(
    "media_metadata",
    "C5/north-star (binary payload + typed metadata struct; metadata-only scan)",
    """
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           'text/plain' AS mime
    FROM documents
    """,
)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.documents_as_media(load_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id", F.col("meta.n_bytes").alias("n_bytes"), F.col("meta.mime").alias("mime")
    )


_MEDIA_CLEAN_SQL = r"""
        CASE WHEN length(regexp_replace(COALESCE(text, ''),
                                        '[^\x20-\x7e]', '', 'g')) = 0
             THEN ' '
             ELSE regexp_replace(COALESCE(text, ''), '[^\x20-\x7e]', '', 'g')
        END"""

_MEDIA_CODES_CTE = f"""
    WITH d AS (
        SELECT doc_id AS media_id, {_MEDIA_CLEAN_SQL} AS clean
        FROM documents
    ), s AS (
        SELECT media_id, length(clean) AS L,
               list_transform(range(1, length(clean) + 1),
                              i -> CAST(ascii(clean[i]) AS BIGINT)) AS codes
        FROM d
    )"""


@_register(
    "media_feature_extract",
    "C5/north-star (REAL feature extraction: ext/images.py decode under "
    "Arrow-batched mapInPandas — integer-exact [w, h, c, pix_sum, "
    "per-channel sums] vector; oracle recomputes every statistic from the "
    "deterministic raster-cycling rule)",
    f"""{_MEDIA_CODES_CTE}
    SELECT media_id, TRUE AS valid, CAST(781 AS BIGINT) AS n_bytes,
           array_to_string(
           [CAST(16 AS BIGINT), CAST(16 AS BIGINT), CAST(3 AS BIGINT),
            CAST((768 // L) * list_sum(codes)
                 + CASE WHEN 768 % L = 0 THEN 0
                        ELSE list_sum(codes[1:(768 % L)]) END AS BIGINT),
            CAST(list_sum(list_transform(range(0, 256),
                 p -> codes[((p*3 + 0) % L) + 1])) AS BIGINT),
            CAST(list_sum(list_transform(range(0, 256),
                 p -> codes[((p*3 + 1) % L) + 1])) AS BIGINT),
            CAST(list_sum(list_transform(range(0, 256),
                 p -> codes[((p*3 + 2) % L) + 1])) AS BIGINT)], ',') AS feature
    FROM s ORDER BY media_id
    """,
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The feature vector is serialized to a ','-joined string of its
    # (integer-exact) elements: array-typed output columns crash the
    # driver's pandas canonicalizer. extract_features() itself keeps
    # the array<double> API.
    from .ext import images as IMG

    docs = load_table(spark, sf_dir, "documents")
    media = MM.images_as_media(IMG.documents_as_images(docs), width=16, height=16)
    feats = MM.extract_features(media)
    return feats.select(
        "media_id",
        "valid",
        "n_bytes",
        F.array_join(
            F.transform("feature", lambda x: x.cast("bigint").cast("string")), ","
        ).alias("feature"),
    )


@_register(
    "frame_sampling",
    "north-star (frame-sample shape: payload → per-offset rows)",
    """
    SELECT doc_id AS media_id,
           CAST(i.i AS INT) AS frame_idx,
           CAST(i.i * 64 AS INT) AS byte_offset
    FROM documents,
         LATERAL (SELECT unnest(range(0, greatest((octet_length(encode(text))-1)//64 + 1, 1))) AS i) i
    """,
)
def q_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.documents_as_media(load_table(spark, sf_dir, "documents"))
    return MM.sample_frames(media, every_n_bytes=64).select(
        "media_id", "frame_idx", F.col("byte_offset").cast("int").alias("byte_offset")
    )


@_register(
    "audio_windowing",
    "C5/north-star (audio framing: overlapping byte-range windows over the "
    "opaque payload — STFT-style 40-byte windows every 16; payload is utf-8 "
    "text so the oracle checks the slices as substrings)",
    """
    SELECT doc_id AS media_id, CAST(i.i AS INT) AS win_idx,
           CAST(i.i * 16 AS BIGINT) AS byte_offset,
           CAST(40 AS BIGINT) AS win_bytes,
           substring(text, CAST(i.i * 16 + 1 AS INT), 40) AS window_text
    FROM documents,
         LATERAL (SELECT unnest(range(0,
             greatest((octet_length(encode(text)) - 40) // 16, 0) + 1)) AS i) i
    WHERE octet_length(encode(text)) >= 40
    """,
)
def q_audio_windowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.documents_as_media(load_table(spark, sf_dir, "documents"))
    wins = MM.window_audio(
        media, sample_rate=1000, bytes_per_sample=1, window_ms=40, hop_ms=16
    )
    return wins.select(
        "media_id",
        "win_idx",
        "byte_offset",
        "win_bytes",
        F.decode(F.col("window_payload"), "UTF-8").alias("window_text"),
    )


@_register(
    "media_resize",
    "C5/north-star (REAL resize slot: decode → nearest-neighbor resample → "
    "P6 re-encode with the meta struct rewritten; the oracle recomputes the "
    "resized raster sum by the (2y, 2x) source-sampling index rule and the "
    "JVM side checksums the actual re-encoded payload bytes)",
    f"""{_MEDIA_CODES_CTE}
    SELECT media_id, TRUE AS valid, CAST(203 AS BIGINT) AS n_bytes,
           8 AS width, 8 AS height,
           CAST(list_sum(list_transform(range(0, 192),
             j -> codes[(((((j // 24) * 2) * 16 + ((j // 3) % 8) * 2) * 3
                          + (j % 3)) % L) + 1])) AS BIGINT) AS pix_sum
    FROM s ORDER BY media_id
    """,
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ext import images as IMG

    docs = load_table(spark, sf_dir, "documents")
    media = MM.images_as_media(IMG.documents_as_images(docs), width=16, height=16)
    resized = MM.resize_media(media, target_w=8, target_h=8)
    # content check stays JVM-side: the P6 payload is printable ASCII
    # (nearest-neighbor sampling of an ASCII raster), so the pixel sum
    # is one decode+split per row feeding the HOF — the split() input
    # is evaluated once per row, only the ascii() lambda runs per char
    pix = (
        "aggregate(transform(split(decode(substring(payload, 12, 192), 'UTF-8'), "
        "''), c -> CAST(ascii(c) AS BIGINT)), CAST(0 AS BIGINT), (a, b) -> a + b)"
    )
    return resized.select(
        "media_id",
        "valid",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.expr(pix).alias("pix_sum"),
    )


@_register(
    "jpeg_decode_stats",
    "C5/north-star (REAL baseline JPEG codec — numpy Huffman + dequant + "
    "IDCT, ext/jpeg.py — under the gate: constant-8×8-block grayscale "
    "JPEGs roundtrip bit-exact with the all-ones quant table, so the "
    "oracle recomputes every pixel sum from the character-cycling rule)",
    f"""{_MEDIA_CODES_CTE}
    SELECT media_id, TRUE AS valid, 16 AS width, 16 AS height,
           1 AS channels, CAST(256 AS BIGINT) AS n_pixels,
           CAST(64 * (codes[(0 % L) + 1] + codes[(1 % L) + 1]
                      + codes[(2 % L) + 1] + codes[(3 % L) + 1])
                AS BIGINT) AS pix_sum
    FROM s ORDER BY media_id
    """,
)
def q_jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ext import images as IMG
    from .ext.jpeg import documents_as_jpegs

    docs = load_table(spark, sf_dir, "documents")
    return IMG.image_stats(documents_as_jpegs(docs))


# ---------------------------------------------------------------------------
# Breadth batch 4: correlated-exists aggregation (TPC-H Q4 shape), volume
# shipping (Q7 shape), time-RANGE windows, rank distributions, algebraic
# moments, deterministic mode, sampling, regex/array/map/posexplode.
# ---------------------------------------------------------------------------


@_register(
    "exists_agg_priority",
    "A11/B1 (correlated EXISTS folded to semi-join + agg; TPC-H Q4 shape)",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_exists_agg_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = FL.date_range_filter(
        load_table(spark, sf_dir, "orders"), "o_orderdate", "1996-01-01", "1996-07-01"
    )
    heavy = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 45)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        o.join(heavy, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@_register(
    "volume_shipping_q7",
    "B3 (TPC-H Q7 shape: 4-table join, cross-nation revenue by year)",
    f"""
    SELECT n1.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 'DECIMAL(18,4)')} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2')
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select("n_nationkey", F.col("n_name").alias("cust_nation"))
    )
    # dims broadcast; the only shuffles are lineitem⋈orders on orderkey
    # and the final tiny agg.
    cn = F.broadcast(c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "cust_nation"
    ))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cn, o.o_custkey == cn.c_custkey)
        .groupBy("cust_nation", F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
                "decimal(18,4)",
            ).alias("revenue")
        )
        .orderBy("cust_nation", "ship_year")
    )


@_register(
    "rolling_7day_spend",
    "C9 (time-RANGE window: per-customer trailing-7-day spend)",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_sum
    FROM orders
    """,
)
def q_rolling_7day_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return WN.rolling_range_sum(
        o.select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"),
        partition_cols=["o_custkey"],
        ts_col="o_orderdate",
        value_col="o_totalprice",
        lookback_seconds=7 * 86400,
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rolling_sum")


@_register(
    "percentrank_cumedist",
    "C9 (percent_rank + cume_dist, tie-stable; floor-quantized micros — "
    "decimal round() is HALF_UP vs HALF_EVEN across engines and 2^a·5^b "
    "partition sizes make exact ties)",
    """
    SELECT c_nationkey, c_acctbal,
           CAST(FLOOR(percent_rank() OVER w * 1000000) AS BIGINT) AS pct_rank_micro,
           CAST(FLOOR(cume_dist() OVER w * 1000000) AS BIGINT) AS cume_dist_micro
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC)
    """,
)
def q_percentrank_cumedist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return WN.rank_distribution(c, ["c_nationkey"], "c_acctbal")


@_register(
    "algebraic_moments",
    "C7 (stddev/corr from exact decimal power sums — order-independent "
    "second moments; see operators/aggregates.py::algebraic_moments)",
    AGG.oracle_algebraic_moments(),
)
def q_algebraic_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AGG.algebraic_moments(load_table(spark, sf_dir, "lineitem"))


@_register(
    "deterministic_mode",
    "C7 family (mode with total-order tiebreak: most common p_type per brand)",
    """
    SELECT p_brand, mode_value, n_occurrences FROM (
        SELECT p_brand, p_type AS mode_value, COUNT(*) AS n_occurrences,
               row_number() OVER (PARTITION BY p_brand
                                  ORDER BY COUNT(*) DESC, p_type ASC) AS rn
        FROM part GROUP BY p_brand, p_type
    ) WHERE rn = 1
    """,
)
def q_deterministic_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AGG.deterministic_mode(load_table(spark, sf_dir, "part"), "p_brand", "p_type")


@_register(
    "systematic_sample",
    "north-star (deterministic keyed sampling: reproducible across engines, "
    "runs, and partitionings — unlike TABLESAMPLE/rand())",
    f"""
    SELECT COUNT(*) AS n_sampled,
           {oracle_dsum('l_extendedprice')} AS sum_price
    FROM lineitem
    WHERE (l_orderkey * 31 + l_linenumber) % 97 < 5
    """,
)
def q_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sampled = li.filter(
        (F.col("l_orderkey") * 31 + F.col("l_linenumber")) % 97 < 5
    )
    return sampled.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        dsum("l_extendedprice").alias("sum_price"),
    )


@_register(
    "snapshot_diff_cdc",
    "C8 extension (keyed CDC between table versions: added/removed/updated — "
    "row-level EXCEPT can't tell an update from delete+insert)",
    """
    WITH old_v AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 0
    ), new_v AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT * FROM (
        SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                         OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                    THEN 'updated' END AS change_type
        FROM old_v o FULL JOIN new_v n ON o.o_orderkey = n.o_orderkey
    ) WHERE change_type IS NOT NULL
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old_v = orders.filter(F.col("o_orderkey") % 7 != 0)
    new_v = orders.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 10.0
        ).otherwise(F.col("o_totalprice")),
    )
    return SO.snapshot_diff(
        old_v, new_v, keys=["o_orderkey"],
        compare_cols=["o_orderstatus", "o_totalprice"],
    )


@_register(
    "source_mixture_sample",
    "north-star (data mixing: per-source target rates via keyed modular "
    "sampling — deterministic, incrementally stable, no rand())",
    """
    SELECT source, COUNT(*) AS n_kept,
           CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+')) ) AS BIGINT)
               AS tokens_kept
    FROM documents
    WHERE (source IN ('src0', 'src1') AND doc_id % 97 < 97)
       OR (source IN ('src2', 'src3') AND doc_id % 97 < 30)
       OR (source = 'src4' AND doc_id % 97 < 10)
    GROUP BY source
    """,
)
def q_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mixed = FL.source_mixture_sample(
        docs,
        rates={"src0": 97, "src1": 97, "src2": 30, "src3": 30, "src4": 10},
    )
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(TX.token_count("text")).alias("tokens_kept"),
    )


@_register(
    "stratified_fixed_n_sample",
    "north-star (stratified fixed-n sample: first 50 rows per stratum in "
    "key order — deterministic train/eval splitting)",
    """
    SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
           CAST(rank_in_group AS INT) AS rank_in_group
    FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_orderkey, l_linenumber,
                                           l_quantity, l_extendedprice) AS rank_in_group
        FROM lineitem
    ) WHERE rank_in_group <= 50
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is not unique in the synthetic data —
    # extend the ordering until the selected row SET is deterministic.
    return WN.top_n_per_group(
        li.select(
            "l_returnflag", "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
        ),
        partition_cols=["l_returnflag"],
        order_cols=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
        n=50,
        descending=False,
        # 3 return flags << cluster width: two-phase salted top-n
        # (guide §2.5) — exact, see top_n_per_group
        salt_buckets=spark.sparkContext.defaultParallelism,
    ).select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.col("rank_in_group").cast("int").alias("rank_in_group"),
    )


@_register(
    "weighted_sample_ares",
    "north-star sampling (r10: A-ES weighted reservoir sampling — "
    "Efraimidis-Spirakis priorities u^(1/w) realized LOG-DOMAIN in "
    "exact fixed point: u hash-derived from the KMV 62-bit family, "
    "priority = −log₂(u)·2³⁶ DIV w via the Q16 shift-and-square "
    "recurrence, top-100 by (priority, key) — the weight-"
    "proportional sampler training-data mixtures need, with the KMV "
    "bottom-k MERGE LAW (states from batches compose exactly; "
    "law-tested in tests/test_sketches_skew.py) — "
    "operators/sketches.py::weighted_sample_ares)",
    SK.ares_oracle_sql(
        "orders",
        "o_orderkey",
        "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)",
        n=100,
    ),
)
def q_weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("w_cents"),
    )
    return SK.weighted_sample_ares(o, "o_orderkey", "w_cents", n=100)


@_register(
    "regexp_extract_brand",
    "A21 family (regexp capture-group extraction + agg)",
    """
    SELECT CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INT) AS brand_num,
           COUNT(*) AS n_parts
    FROM part
    GROUP BY 1 ORDER BY 1
    """,
)
def q_regexp_extract_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("int").alias("brand_num"))
        .groupBy("brand_num")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("brand_num")
    )


@_register(
    "posexplode_words",
    "C5 family (positional explode: array element + ordinal)",
    """
    SELECT p_partkey, CAST(i AS INT) AS pos, words[i + 1] AS word
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS words
          FROM part WHERE p_partkey < 500),
         LATERAL (SELECT unnest(range(0, len(words))) AS i) t
    """,
)
def q_posexplode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word")
    )


@_register(
    "array_functions_breadth",
    "C5 family (array distinct/sort/join/size over tokenized text)",
    """
    SELECT p_partkey,
           array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ',')
               AS sorted_words,
           CAST(len(list_distinct(string_split(p_name, ' '))) AS INT) AS n_distinct_words
    FROM part
    """,
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    words = F.array_distinct(F.split("p_name", " "))
    return p.select(
        "p_partkey",
        F.array_join(F.array_sort(words), ",").alias("sorted_words"),
        F.size(words).cast("int").alias("n_distinct_words"),
    )


@_register(
    "array_set_algebra",
    "C5 family (array set algebra: union/intersect/except/overlap between "
    "two token sets per row — the schema-free set ops arrays carry)",
    """
    WITH t AS (
        SELECT p_partkey,
               list_distinct(string_split(p_name, ' ')) AS a,
               list_distinct(string_split(p_type, ' ')) AS b
        FROM part
    )
    SELECT p_partkey,
           array_to_string(list_sort(list_distinct(a || b)), ',') AS union_ab,
           coalesce(array_to_string(list_sort(list_intersect(a, b)), ','), '') AS inter_ab,
           coalesce(array_to_string(list_sort(list_filter(a, x -> NOT list_contains(b, x))), ','), '')
               AS a_minus_b,
           len(list_intersect(a, b)) > 0 AS overlaps
    FROM t
    ORDER BY p_partkey
    """,
)
def q_array_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    a = F.array_distinct(F.split("p_name", " "))
    b = F.array_distinct(F.split("p_type", " "))
    return p.select(
        "p_partkey",
        F.array_join(F.array_sort(F.array_union(a, b)), ",").alias("union_ab"),
        F.array_join(F.array_sort(F.array_intersect(a, b)), ",").alias("inter_ab"),
        F.array_join(F.array_sort(F.array_except(a, b)), ",").alias("a_minus_b"),
        F.arrays_overlap(a, b).alias("overlaps"),
    ).orderBy("p_partkey")


@_register(
    "map_type_pipeline",
    "C5 family (MapType: entries→map→filter→explode round trip; per "
    "customer the 1997 order count survives the map round trip)",
    """
    SELECT o_custkey, CAST(yr AS INT) AS yr, n_orders
    FROM (
        SELECT o_custkey, year(o_orderdate) AS yr, COUNT(*) AS n_orders
        FROM orders GROUP BY 1, 2
    ) WHERE yr = 1997
    """,
)
def q_map_type_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_year = o.groupBy(
        "o_custkey", F.year("o_orderdate").cast("int").alias("yr")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    as_map = per_year.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("yr", "n_orders")))
        ).alias("orders_by_year")
    )
    kept = as_map.select(
        "o_custkey",
        F.explode(
            F.map_filter("orders_by_year", lambda k, _v: k == F.lit(1997))
        ).alias("yr", "n_orders"),
    )
    return kept.select("o_custkey", "yr", "n_orders")


@_register(
    "range_band_join",
    "custom operator (range join on a fixed-width grid rewritten as an "
    "equi-join on floor(v/width) — operators/joins.py::band_join; oracle "
    "= the naive BETWEEN range join)",
    """
    WITH bands AS (
        SELECT CAST(i AS BIGINT) * 25000.0 AS band_lo,
               (CAST(i AS BIGINT) + 1) * 25000.0 AS band_hi,
               'band_' || lpad(CAST(i AS VARCHAR), 2, '0') AS band_label
        FROM range(0, 20) t(i)
    )
    SELECT band_label, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders JOIN bands
      ON o_totalprice >= band_lo AND o_totalprice < band_hi
    GROUP BY band_label ORDER BY band_label
    """,
)
def q_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bands = (
        spark.range(20)
        .select(
            (F.col("id") * 25000.0).alias("band_lo"),
            ((F.col("id") + 1) * 25000.0).alias("band_hi"),
            F.concat(F.lit("band_"), F.lpad(F.col("id").cast("string"), 2, "0")).alias(
                "band_label"
            ),
        )
    )
    return (
        JN.band_join(o, "o_totalprice", 25000.0, bands)
        .groupBy("band_label")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .orderBy("band_label")
    )


@_register(
    "embedding_cosine_near_dup",
    "C1/C3 (embedding-cosine near-dup dedup: greedy keep-min-id over "
    "LSH-bucketed candidate pairs; ext/similarity.py::"
    "embedding_dedup_survivors)",
    """
    WITH b AS (
        SELECT vec_id, embedding,
               CAST(list_sum(list_transform(range(1, 9),
                    j -> CASE WHEN embedding[j] >= 0
                         THEN CAST(pow(2, 8 - j) AS BIGINT) ELSE 0 END))
                    AS INT) AS bucket
        FROM embeddings
    ), pairs AS (
        SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b, a.embedding AS va, b2.embedding AS vb
        FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
    ), dropped AS (
        SELECT DISTINCT vec_b FROM pairs
        WHERE list_sum(list_transform(list_zip(va, vb),
                   p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * 1000000.0) AS BIGINT)
                      * CAST(FLOOR(CAST(p[2] AS DOUBLE) * 1000000.0) AS BIGINT)))
              / sqrt(
                CAST(list_sum(list_transform(va,
                     x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                        * CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))) AS DOUBLE)
                *
                CAST(list_sum(list_transform(vb,
                     x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                        * CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))) AS DOUBLE)
              ) >= 0.2
    )
    SELECT vec_id, label FROM embeddings e
    WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.vec_b = e.vec_id)
    """,
)
def q_embedding_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.embedding_dedup_survivors(emb, threshold=0.2, n_bits=8)


@_register(
    "interval_join_attribution",
    "C6 (stream-stream interval join, batch twin: purchases attributed to "
    "clicks by the same user within the preceding hour; "
    "streaming/joins.py::attribute_purchases)",
    """
    WITH clicks AS (
        SELECT user_id, ts AS click_ts, event_id AS click_id
        FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
        FROM events WHERE event_type = 'purchase'
    )
    SELECT purchase_id, click_id, p.user_id AS user_id,
           purchase_ts, click_ts,
           CAST(floor(epoch(purchase_ts)) AS BIGINT)
             - CAST(floor(epoch(click_ts)) AS BIGINT) AS gap_seconds
    FROM purchases p
    JOIN clicks c
      ON p.user_id = c.user_id
     AND c.click_ts <= p.purchase_ts
     AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
    """,
)
def q_interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.joins import attribute_purchases

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return attribute_purchases(clicks, purchases, max_gap_seconds=3600)


@_register(
    "token_repetition_stats",
    "C4/north-star (Gopher-style repetition quality signal: top-token "
    "frequency ratio per doc; functions/text.py::token_repetition_stats)",
    r"""
    WITH t AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        FROM documents
    ), c AS (
        SELECT doc_id, tok, COUNT(*) AS n
        FROM t WHERE tok <> '' GROUP BY doc_id, tok
    )
    SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens, MAX(n) AS top_token_n,
           CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS top_token_ratio
    FROM c GROUP BY doc_id
    """,
)
def q_token_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.token_repetition_stats(docs)


@_register(
    "dup_ngram_stats",
    "C4/north-star (duplicate-trigram fraction per doc — longer-span "
    "repetition signal; functions/text.py::dup_ngram_stats)",
    r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents
    ), g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gr
        FROM toks WHERE len(t) >= 3
    )
    SELECT doc_id, COUNT(*) AS n_grams,
           COUNT(DISTINCT gr) AS n_distinct,
           1.0 - CAST(COUNT(DISTINCT gr) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS dup_fraction
    FROM g GROUP BY doc_id
    """,
)
def q_dup_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.dup_ngram_stats(docs, n=3)


@_register(
    "variant_json_stats",
    "C5/A21 (semi-structured scale path: VariantType via parse_json — "
    "binary-encoded, typed access without a declared schema; the "
    "Spark-4 successor to get_json_object string re-parsing)",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
           MAX(CAST(json_extract(props, '$.k') AS INT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_variant_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@_register(
    "fuzzy_name_pairs",
    "C2-adjacent (entity resolution by edit distance: the reference's "
    "merchant/counterparty name dedup generalized — distinct names, "
    "Ed-Join q-gram prefix blocking, residual levenshtein ≤ 3)",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM names a JOIN names b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY name_a, name_b
    """,
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # blocked, never all-pairs: Ed-Join q-gram prefix filtering bounds
    # candidate generation to Σ|rare-gram block|² — the oracle SQL is
    # blocking-agnostic, so the hash match proves completeness
    from .ext.dedup_fuzzy import edit_distance_pairs

    names = load_table(spark, sf_dir, "part").select("p_name")
    return (
        edit_distance_pairs(names, "p_name", max_dist=3)
        .withColumn("edit_dist", F.col("edit_dist").cast("int"))
        .orderBy("name_a", "name_b")
    )


@_register(
    "bitmap_exact_distinct",
    "C7-exact (roaring-bitmap distinct users per event type: EXACT "
    "and mergeable, unlike HLL; operators/sketches.py::bitmap_distinct)",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketches import bitmap_distinct

    ev = load_table(spark, sf_dir, "events")
    return bitmap_distinct(ev, ["event_type"], "user_id").orderBy("event_type")


@_register(
    "scd2_intervals",
    "A24-generalized (snapshot log → SCD Type-2 validity intervals; "
    "operators/behavioral.py::scd2_intervals — the reference's "
    "append-only balance/pots snapshots as full-history dimension)",
    """
    SELECT user_id, event_id, value,
           ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           (LEAD(ts) OVER w IS NULL) AS is_current
    FROM events
    WHERE event_type = 'signup'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.behavioral import scd2_intervals

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    )
    return scd2_intervals(ev).select(
        "user_id", "event_id", "value", "valid_from", "valid_to", "is_current"
    )


@_register(
    "funnel_conversion",
    "north-star analytics (strictly-ordered view→click→purchase "
    "funnel; operators/behavioral.py::funnel_counts)",
    """
    WITH f1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), f2 AS (
        SELECT e.user_id, MIN(ts) AS t2
        FROM events e JOIN f1 ON e.user_id = f1.user_id AND e.ts > f1.t1
        WHERE event_type = 'click' GROUP BY e.user_id
    ), f3 AS (
        SELECT e.user_id, MIN(ts) AS t3
        FROM events e JOIN f2 ON e.user_id = f2.user_id AND e.ts > f2.t2
        WHERE event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM f1) AS n_view,
           (SELECT COUNT(*) FROM f2) AS n_click,
           (SELECT COUNT(*) FROM f3) AS n_purchase
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.behavioral import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(ev)


@_register(
    "cohort_retention",
    "north-star analytics (daily retention triangle: first-active "
    "cohort × day offset; operators/behavioral.py::cohort_retention)",
    """
    WITH activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS activity_day FROM events
    ), cohorts AS (
        SELECT user_id, MIN(activity_day) AS cohort_day
        FROM activity GROUP BY user_id
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(datediff('day', cohort_day, activity_day) AS INT) AS offset_days,
           COUNT(*) AS n_users
    FROM activity JOIN cohorts USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.behavioral import cohort_retention

    # ISO-serialize the date output: a raw DATE column materializes as
    # object[datetime.date] from Spark but datetime64 ('... 00:00:00')
    # from DuckDB — different strings under the driver's pandas
    # canonicalizer (the only raw-DATE output in the registry)
    ev = load_table(spark, sf_dir, "events")
    ret = cohort_retention(ev)
    return ret.withColumn("cohort_day", F.date_format("cohort_day", "yyyy-MM-dd"))


@_register(
    "tfidf_top_terms",
    "C4/north-star (TF-IDF-style salient terms, top-3 per doc; "
    "rarity ratio instead of log-idf for cross-engine bit-parity — "
    "functions/text.py::tf_rarity_top_terms)",
    r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
        FROM documents
    ), tf AS (
        SELECT doc_id, word, COUNT(*) AS tf
        FROM toks WHERE word <> '' GROUP BY doc_id, word
    ), df AS (
        SELECT word, COUNT(*) AS df FROM tf GROUP BY word
    ), n AS (
        SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
        SELECT doc_id, word, tf, df,
               CAST(floor(CAST(tf * (n_docs + 1) AS DOUBLE)
                          / CAST(df + 1 AS DOUBLE) * 1000000.0) AS BIGINT)
                 AS score_q
        FROM tf JOIN df USING (word) CROSS JOIN n
    )
    SELECT doc_id, word, tf, df, score_q, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY score_q DESC, word) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.tf_rarity_top_terms(docs, top_per_doc=3)


@_register(
    "chunk_documents",
    "north-star (fixed-size overlapping char chunking for training "
    "shards: sequence→explode→substring, fully map-side — "
    "functions/text.py::chunk_documents)",
    """
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           substring(text, CAST(i AS INT) * 400 + 1, 500) AS chunk_text,
           length(substring(text, CAST(i AS INT) * 400 + 1, 500)) AS chunk_len
    FROM (
        SELECT doc_id, text,
               unnest(range(0, CAST(floor((length(text) - 1) / 400) AS BIGINT) + 1))
                 AS i
        FROM documents WHERE length(text) > 0
    )
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.chunk_documents(docs, chunk_size=500, stride=400)


@_register(
    "bigram_counts",
    "C4 (adjacent-pair bigrams via array-lambda transform, no "
    "self-join; top-50 corpus bigrams)",
    r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents WHERE trim(text) <> ''
    ), bigrams AS (
        SELECT unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])) AS bigram
        FROM toks WHERE len(t) >= 2
    )
    SELECT bigram, n FROM (
        SELECT bigram, COUNT(*) AS n FROM bigrams GROUP BY bigram
    )
    ORDER BY n DESC, bigram ASC
    LIMIT 50
    """,
)
def q_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        TX.bigram_counts(docs)
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(50)
    )


@_register(
    "interval_band_revenue",
    "beyond-§2 (general range join: arbitrary OVERLAPPING unaligned price "
    "bands × orders, rewritten bucketed-equi-join; "
    "operators/joins.py::interval_bucket_join)",
    f"""
    WITH bands(band, lo, hi) AS (VALUES
        ('budget',       1000.0,  60000.0),
        ('mid',         60000.0, 180000.0),
        ('premium',    180000.0, 500000.0),
        ('whale',      250000.0, 499000.0),
        ('promo_target', 47500.0, 151300.0)
    )
    SELECT band, COUNT(*) AS n_orders,
           {oracle_dsum('o_totalprice')} AS revenue
    FROM orders o JOIN bands b
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY band
    """,
)
def q_interval_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Overlapping + unaligned on purpose: 'whale' nests inside 'premium'
    # and 'promo_target' straddles 'budget'/'mid' — shapes a partition-
    # based bucketing cannot express, but the cell rewrite handles.
    bands = spark.createDataFrame(
        [
            ("budget", 1000.0, 60000.0),
            ("mid", 60000.0, 180000.0),
            ("premium", 180000.0, 500000.0),
            ("whale", 250000.0, 499000.0),
            ("promo_target", 47500.0, 151300.0),
        ],
        "band string, lo double, hi double",
    )
    orders = load_table(spark, sf_dir, "orders")
    joined = JN.interval_bucket_join(
        orders.select("o_orderkey", "o_totalprice"),
        "o_totalprice",
        bands,
        "lo",
        "hi",
        bucket_width=20000.0,
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


@_register(
    "resample_gap_fill",
    "beyond-§2 (time-series resample: hourly grid densification + "
    "forward-fill + linear interpolation over the reference's "
    "snapshot-log shape; operators/timeseries.py::resample_gap_fill)",
    """
    WITH b AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS v
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), bounds AS (
        SELECT event_type, min(h) AS h0, max(h) AS h1 FROM b GROUP BY event_type
    ), spine AS (
        SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ), dense AS (
        SELECT s.event_type, s.h, b.v
        FROM spine s LEFT JOIN b ON s.event_type = b.event_type AND s.h = b.h
    ), filled AS (
        SELECT event_type, h, v,
            last_value(v IGNORE NULLS) OVER w_back AS pv,
            last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                OVER w_back AS ph,
            first_value(v IGNORE NULLS) OVER w_fwd AS nv,
            first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                OVER w_fwd AS nh
        FROM dense
        WINDOW
          w_back AS (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          w_fwd AS (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, h, v, pv AS ffill_v,
        CASE WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) *
                  ((CAST(epoch(h) AS DOUBLE) - CAST(epoch(ph) AS DOUBLE))
                 / (CAST(epoch(nh) AS DOUBLE) - CAST(epoch(ph) AS DOUBLE)))
        END AS lerp_v
    FROM filled
    """,
)
def q_resample_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return TS.resample_gap_fill(
        ev, ["event_type"], "ts", "value", granularity="hour"
    )


@_register(
    "value_histogram",
    "north-star (fixed-width histogram: the distribution profile every "
    "quality dashboard needs; single map-side-combined hash agg)",
    """
    SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(value) AS lo,
           MAX(value) AS hi
    FROM events
    GROUP BY 1
    """,
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("value") / 25.0).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


@_register(
    "zscore_outliers",
    "beyond-§2 (per-group z-score anomaly detection: exact-decimal power "
    "sums broadcast back onto the fact; "
    "operators/aggregates.py::zscore_outliers)",
    """
    WITH s AS (
        SELECT event_type, COUNT(value) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sxx
        FROM events GROUP BY event_type
    ), scored AS (
        SELECT event_id, e.event_type AS event_type, value,
               round((value - sx / CAST(n AS DOUBLE))
                     / sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
                            / CAST(n AS DOUBLE)), 6) AS z
        FROM events e JOIN s ON e.event_type = s.event_type
    )
    SELECT event_id, event_type, value, z FROM scored WHERE abs(z) >= 3.0
    """,
)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return AGG.zscore_outliers(
        ev, ["event_type"], "value", ["event_id"], threshold=3.0
    )


@_register(
    "grid_radius_join",
    "beyond-§2 (spatial radius join on a fixed grid: 3×3 neighbor-cell "
    "equi-join + exact residual distance — the join the reference's "
    "merchant lat/long columns imply; operators/geo.py::grid_radius_join)",
    """
    WITH c AS (
        SELECT c_custkey,
               CAST((c_custkey * 48271) % 100000 AS DOUBLE) / 1000.0 AS cx,
               CAST((c_custkey * 69621) % 100000 AS DOUBLE) / 1000.0 AS cy
        FROM customer
    ), s AS (
        SELECT s_suppkey,
               CAST((s_suppkey * 48271) % 100000 AS DOUBLE) / 1000.0 AS sx,
               CAST((s_suppkey * 69621) % 100000 AS DOUBLE) / 1000.0 AS sy
        FROM supplier
    )
    SELECT s_suppkey, COUNT(*) AS n_within,
           CAST(MIN(FLOOR(((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy))
                          * 1000000.0)) AS BIGINT) AS min_d2_q
    FROM c JOIN s
      ON (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= 1.0
    GROUP BY s_suppkey
    """,
)
def q_grid_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic synthetic planar coordinates from the integer keys
    # (testdata has no geo columns; the reference's schema does —
    # create_bronze_layer.sql:27-28): pure integer arithmetic, so both
    # engines derive bit-identical doubles.
    def coords(df, key, x, y):
        return df.select(
            key,
            ((F.col(key) * 48271) % 100000).cast("double").alias("__t1"),
            ((F.col(key) * 69621) % 100000).cast("double").alias("__t2"),
        ).select(
            key,
            (F.col("__t1") / 1000.0).alias(x),
            (F.col("__t2") / 1000.0).alias(y),
        )

    cust = coords(load_table(spark, sf_dir, "customer"), "c_custkey", "cx", "cy")
    supp = coords(load_table(spark, sf_dir, "supplier"), "s_suppkey", "sx", "sy")
    pairs = GEO.grid_radius_join(
        cust, "cx", "cy", supp, "sx", "sy", radius=1.0, broadcast_b=True
    )
    return pairs.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).alias("n_within"),
        F.min(F.floor(F.col("d2") * 1000000.0)).cast("bigint").alias("min_d2_q"),
    )


# ---------------------------------------------------------------------------
# Robust stats: MAD outliers (the median twin of zscore_outliers) and a
# sort-free equi-depth histogram (operators/aggregates.py).
# ---------------------------------------------------------------------------


@_register(
    "mad_robust_outliers",
    "C7/north-star (median-absolute-deviation anomaly profile per group)",
    """
    WITH med AS (
        SELECT event_type, round(quantile_cont(value, 0.5), 4) AS med_r
        FROM events GROUP BY event_type
    ), mad AS (
        SELECT e.event_type,
               round(quantile_cont(abs(e.value - m.med_r), 0.5), 4) AS mad_r
        FROM events e JOIN med m USING (event_type)
        GROUP BY e.event_type
    )
    SELECT e.event_type, m.med_r, d.mad_r, COUNT(*) AS n,
           COUNT(*) FILTER (WHERE abs(e.value - m.med_r) > 3 * d.mad_r)
               AS n_outliers
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    GROUP BY e.event_type, m.med_r, d.mad_r
    ORDER BY e.event_type
    """,
)
def q_mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AGG.mad_outliers(
        load_table(spark, sf_dir, "events"), ["event_type"], "value"
    )


@_register(
    "equi_depth_histogram",
    "C7/north-star (equi-depth histogram without a global sort: quantile "
    "cutpoints broadcast, bucket = map-side fold)",
    """
    WITH cuts AS (
        SELECT list_transform(
                   quantile_cont(value,
                       [0.05, 0.10, 0.15, 0.20, 0.25, 0.30, 0.35, 0.40, 0.45,
                        0.50, 0.55, 0.60, 0.65, 0.70, 0.75, 0.80, 0.85, 0.90,
                        0.95]),
                   q -> round(q, 4)) AS cuts
        FROM events
    )
    SELECT CAST(len(list_filter(cuts, q -> q < value)) AS BIGINT)
               AS bucket,
           COUNT(*) AS n,
           MIN(value) AS lo,
           MAX(value) AS hi
    FROM events, cuts
    GROUP BY 1 ORDER BY 1
    """,
)
def q_equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AGG.equi_depth_histogram(
        load_table(spark, sf_dir, "events"), "value", n_buckets=20
    )


@_register(
    "mad_robust_outliers_approx",
    "C7 scale path (r6: MAD profile via the deterministic quantile "
    "grid — per-group bounded mergeable cell state instead of the "
    "exact value→count map, estimates bit-identical across engines "
    "and hash-checked; the GK form stays as mad_outliers_approx, "
    "tolerance-pinned in tests — operators/aggregates.py::"
    "mad_outliers_sketch)",
    f"""
    WITH q AS MATERIALIZED (
        SELECT event_type AS g,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL
    ),{grid_quantile_by_group_sql('q', [500_000], 'm1')},
    med AS (SELECT g, est AS med_cents FROM m1_est),
    d AS MATERIALIZED (
        SELECT q.g, ABS(q.v - med.med_cents) AS v,
               q.v AS raw, med.med_cents
        FROM q JOIN med USING (g)
    ),{grid_quantile_by_group_sql('d', [500_000], 'm2')},
    mad AS (SELECT g, est AS mad_cents FROM m2_est)
    SELECT d.g AS event_type, d.med_cents, mad.mad_cents,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (
               WHERE ABS(d.raw - d.med_cents) > 3 * mad.mad_cents
           ) AS BIGINT) AS n_outliers
    FROM d JOIN mad USING (g)
    GROUP BY 1, 2, 3
    ORDER BY 1
    """,
)
def q_mad_robust_outliers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ext.shared import events_value_cells_by_type

    return AGG.mad_outliers_sketch(
        load_table(spark, sf_dir, "events"),
        ["event_type"],
        "value",
        cells=events_value_cells_by_type(spark, sf_dir),
    ).orderBy("event_type")


@_register(
    "equi_depth_histogram_approx",
    "C7 scale path (r6: equi-depth histogram with deterministic-grid "
    "cutpoints — bounded mergeable cell state at 100 TB, estimates "
    "bit-identical across engines and hash-checked; the GK form "
    "stays as equi_depth_histogram_approx the operator, tolerance-"
    "pinned in tests — operators/aggregates.py::"
    "equi_depth_histogram_sketch)",
    f"""
    WITH q AS MATERIALIZED (
        SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL
    ),{grid_quantile_sql('q', [i * 50_000 for i in range(1, 20)], 'gq')},
    cuts AS (SELECT list_sort(list(est)) AS cuts FROM gq_est)
    SELECT CAST(len(list_filter(cuts, c -> c < v)) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(v) AS lo_cents,
           MAX(v) AS hi_cents
    FROM q, cuts
    GROUP BY 1 ORDER BY 1
    """,
)
def q_equi_depth_histogram_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ext.shared import events_value_cells_by_type

    return AGG.equi_depth_histogram_sketch(
        load_table(spark, sf_dir, "events"),
        "value",
        n_buckets=20,
        cells=events_value_cells_by_type(spark, sf_dir),
    )


# ---------------------------------------------------------------------------
# DataFrame-native k-means (ext/similarity.py::kmeans_fit) — the IVF
# centroid trainer; fixed iterations, deterministic init, decimal means.
# Rows-only check: 3 Lloyd iterations are not SQL-expressible in DuckDB
# (verified instead by invariants in tests/test_kmeans.py: monotone SSE,
# assignment optimality, centroid==mean).
# ---------------------------------------------------------------------------


@_register(
    "label_centroids",
    "C3/north-star (per-label class-prototype vectors in exact micro-units)",
    """
    WITH ex AS (
        SELECT label, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings
    ), q AS (
        SELECT label, pos,
               CAST(SUM(FLOOR(CAST(v AS DOUBLE) * 1000000.0)) AS BIGINT) AS sq,
               COUNT(*) AS n
        FROM ex GROUP BY label, pos
    )
    SELECT label, CAST(MIN(n) AS BIGINT) AS n,
           array_to_string(
             list(CAST(sq // n AS BIGINT) ORDER BY pos), ',') AS centroid_q
    FROM q GROUP BY label ORDER BY label
    """,
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ','-serialize the centroid vector: array-typed output columns crash
    # the driver's pandas canonicalizer; label_centroids() keeps the array
    cent = SIM.label_centroids(load_table(spark, sf_dir, "embeddings"))
    return cent.select(
        "label",
        "n",
        F.array_join(
            F.transform("centroid_q", lambda x: x.cast("string")), ","
        ).alias("centroid_q"),
    )


@_register(
    "kmeans_cluster_profile",
    "C3/north-star (Lloyd k-means cell profile; IVF trainer). Oracle "
    "(r4, promoted from rows-only): the fixed-round Lloyd loop unrolled "
    "as chained materialized CTEs — exact because assignment is integer "
    "arithmetic and the centroid update is decimal-sum → IEEE-double "
    "divide on both engines (ext/similarity.py::kmeans_profile_oracle_sql)",
    SIM.kmeans_profile_oracle_sql(k=8, iters=3),
)
def q_kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ext.shared import kmeans_assignment_8_3

    return SIM.kmeans_cluster_profile(
        load_table(spark, sf_dir, "embeddings"),
        k=8,
        iters=3,
        assigned=kmeans_assignment_8_3(spark, sf_dir),
    )


@_register(
    "kmeans_representatives",
    "C3/C2 north-star (semantic-dedup medoids: per k-means cluster the "
    "vector nearest its centroid — one exemplar replaces a cluster of "
    "near-duplicate embeddings; oracle = the same Lloyd chain ending in "
    "a per-cluster argmin)",
    SIM.kmeans_representatives_oracle_sql(k=8, iters=3),
)
def q_kmeans_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ext.shared import kmeans_assignment_8_3

    return SIM.kmeans_representatives(
        load_table(spark, sf_dir, "embeddings"),
        k=8,
        iters=3,
        assigned=kmeans_assignment_8_3(spark, sf_dir),
    )


@_register(
    "pq_rerank_topk",
    "C3/north-star scale path (product quantization: jointly-trained "
    "sub-codebooks, 32x-compressed codes, ADC table-lookup shortlist, "
    "exact re-rank of k*oversample survivors — the IVF-PQ query shape). "
    "Oracle (r4, promoted from rows-only): the per-subspace Lloyd "
    "trainer + encode + ADC + re-rank unrolled as chained materialized "
    "CTEs (ext/similarity.py::pq_rerank_oracle_sql); recall + exactness "
    "anchors stay in tests/test_pq.py",
    SIM.pq_rerank_oracle_sql(
        m=8, ksub=8, iters=2, dim=64, query_id=0, k=10, oversample=5
    ),
)
def q_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cbs = SIM.pq_fit(emb, m=8, ksub=8, iters=2)
    return SIM.pq_adc_rerank_topk(emb, cbs, query_id=0, k=10, oversample=5)


# ---------------------------------------------------------------------------
# SCD2 temporal dimension lookup (operators/behavioral.py::scd2_lookup):
# the join every warehouse does against a type-2 dim.
# ---------------------------------------------------------------------------


@_register(
    "scd2_temporal_lookup",
    "A24/B3 generalization (event-time enrichment against SCD2 intervals: "
    "signup-value validity windows looked up at purchase time)",
    """
    WITH dim AS (
        SELECT user_id, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to,
               value AS dim_value
        FROM events WHERE event_type = 'signup'
    ), facts AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, f.ts, f.value, d.valid_from, d.dim_value
    FROM facts f
    LEFT JOIN dim d
      ON f.user_id = d.user_id
     AND d.valid_from <= f.ts
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    ORDER BY f.event_id
    """,
)
def q_scd2_temporal_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dim = BH.scd2_intervals(
        ev.filter(F.col("event_type") == "signup").withColumnRenamed(
            "value", "dim_value"
        )
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return BH.scd2_lookup(facts, dim)


# ---------------------------------------------------------------------------
# Event-sequence analytics (operators/behavioral.py + windows.py):
# Markov transitions, top session paths, period-over-period movers.
# ---------------------------------------------------------------------------


@_register(
    "event_transition_matrix",
    "C9/north-star (first-order Markov transitions over the event stream)",
    """
    WITH nxt AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS to_type
        FROM events
    ), cnt AS (
        SELECT from_type, to_type, COUNT(*) AS n
        FROM nxt WHERE to_type IS NOT NULL GROUP BY from_type, to_type
    ), tot AS (
        SELECT from_type, CAST(SUM(n) AS BIGINT) AS total FROM cnt GROUP BY from_type
    )
    SELECT from_type, to_type, n, CAST((n * 1000000) // total AS BIGINT) AS prob_q
    FROM cnt JOIN tot USING (from_type)
    ORDER BY from_type, to_type
    """,
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return BH.transition_counts(load_table(spark, sf_dir, "events"))


@_register(
    "scd2_compressed_intervals",
    "A24/C-ext (SCD2 change compression: drop no-op snapshots before "
    "interval building — raw snapshot logs fragment intervals)",
    """
    WITH ordered AS (
        SELECT user_id, ts, event_id, value,
               lag(value) OVER w AS prev_v, lag(ts) OVER w AS prev_ts
        FROM events WHERE event_type = 'signup'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
        SELECT user_id, ts, event_id, value FROM ordered
        WHERE prev_ts IS NULL OR (value IS DISTINCT FROM prev_v)
    ), iv AS (
        SELECT user_id, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to,
               value
        FROM changes
    )
    SELECT user_id, valid_from, valid_to, value,
           valid_to IS NULL AS is_current
    FROM iv ORDER BY user_id, valid_from
    """,
)
def q_scd2_compressed_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    signup = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select("user_id", "ts", "event_id", "value")
    )
    compressed = BH.compress_changes(signup)
    return BH.scd2_intervals(compressed).select(
        "user_id", "valid_from", "valid_to", "value", "is_current"
    )


@_register(
    "row_fingerprints",
    "A-ext (hashdiff change-detection fingerprints: md5 over null-safe "
    "canonicalized columns — cross-engine identical, the CDC compare key)",
    r"""
    SELECT c_custkey,
           md5(concat_ws(chr(31),
               CAST(c_custkey AS VARCHAR),
               coalesce(c_name, chr(0)),
               CAST(c_nationkey AS VARCHAR),
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR)))
               AS fingerprint
    FROM customer
    ORDER BY c_custkey
    """,
)
def q_row_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(
            F.concat_ws(
                "\x1f",
                F.col("c_custkey").cast("string"),
                F.coalesce(F.col("c_name"), F.lit("\x00")),
                F.col("c_nationkey").cast("string"),
                F.col("c_acctbal").cast("decimal(18,2)").cast("string"),
            )
        ).alias("fingerprint"),
    ).orderBy("c_custkey")


@_register(
    "session_paths_top",
    "C6+C9/north-star (top within-session event-type paths; gap split as in "
    "sessionization — new session when the µs gap STRICTLY exceeds 15 min)",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 15 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, event_type, ts, event_id,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ), paths AS (
        SELECT user_id, sid,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM numbered GROUP BY user_id, sid
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path ASC
    LIMIT 20
    """,
)
def q_session_paths_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    return BH.session_paths(load_table(spark, sf_dir, "events"))


@_register(
    "wow_revenue_movers",
    "C9/north-star (week-over-week revenue movers per order priority)",
    f"""
    WITH weekly AS (
        SELECT o_orderpriority,
               CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week,
               {oracle_dsum('o_totalprice')} AS revenue
        FROM orders
        GROUP BY 1, 2
    ), lagged AS (
        SELECT o_orderpriority, week, revenue,
               lag(revenue) OVER (PARTITION BY o_orderpriority ORDER BY week)
                   AS prev_value
        FROM weekly
    )
    SELECT o_orderpriority, week, revenue, prev_value,
           CAST(FLOOR((revenue - prev_value) / prev_value * 1000000.0) AS BIGINT)
               AS change_q
    FROM lagged
    WHERE prev_value IS NOT NULL AND prev_value <> 0
    ORDER BY abs(change_q) DESC, o_orderpriority, week
    LIMIT 20
    """,
)
def q_wow_revenue_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    weekly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            "o_orderpriority",
            F.date_trunc("week", F.col("o_orderdate")).alias("week"),
        )
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    return (
        WN.period_over_period(weekly, "o_orderpriority", "week", "revenue")
        .orderBy(F.abs(F.col("change_q")).desc(), "o_orderpriority", "week")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Search-engine ops over the corpus (ext/search.py): inverted index,
# log-free BM25 ranking, corpus-adaptive stopword removal.
# ---------------------------------------------------------------------------


@_register(
    "inverted_index",
    "C4/north-star (term → posting-list index build)",
    r"""
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
        FROM documents
    ), tf AS (
        SELECT doc_id, word, COUNT(*) AS tf
        FROM tok WHERE word <> '' GROUP BY doc_id, word
    )
    SELECT word, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
           array_to_string(list_sort(list(doc_id))[1:1000], ',') AS postings
    FROM tf GROUP BY word HAVING COUNT(*) >= 2
    ORDER BY word
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ','-serialize the posting list: array-typed output columns crash
    # the driver's pandas canonicalizer; inverted_index() keeps the array
    idx = SRCH.inverted_index(load_table(spark, sf_dir, "documents"))
    return idx.withColumn(
        "postings",
        F.array_join(F.transform("postings", lambda x: x.cast("string")), ","),
    )


@_register(
    "sharded_inverted_index",
    "C4/north-star scale path (posting lists sharded by (term, "
    "doc-range): map-side shard key splits stopword hash buckets, "
    "bounded state per group; ext/search.py::shard_postings)",
    r"""
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
        FROM documents
    ), tf AS (
        SELECT doc_id, word, COUNT(*) AS tf
        FROM tok WHERE word <> '' GROUP BY doc_id, word
    )
    SELECT word, CAST(doc_id // 100 AS BIGINT) AS shard_id,
           COUNT(*) AS df_shard,
           CAST(SUM(tf) AS BIGINT) AS total_tf_shard,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM tf GROUP BY word, shard_id
    ORDER BY word, shard_id
    """,
)
def q_sharded_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = SRCH.doc_term_frequencies(load_table(spark, sf_dir, "documents"))
    sharded = SRCH.shard_postings(tf, doc_range=100).orderBy("word", "shard_id")
    # ','-serialize the posting list (driver-canon-safe output convention)
    return sharded.withColumn(
        "postings",
        F.array_join(F.transform("postings", lambda x: x.cast("string")), ","),
    )


@_register(
    "bm25_keyword_search",
    "C4/north-star (log-free BM25 top-k ranking; k1=1.2, b=1)",
    r"""
    WITH doc AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        FROM documents
    ), tok AS (
        SELECT doc_id, len(toks) AS dl, unnest(toks) AS word FROM doc
    ), tf AS (
        SELECT doc_id, word, COUNT(*) AS tf, MIN(dl) AS dl
        FROM tok WHERE word IN ('spark', 'hash', 'merge')
        GROUP BY doc_id, word
    ), dfreq AS (
        SELECT word, COUNT(*) AS df FROM tf GROUP BY word
    ), stats AS (
        SELECT COUNT(*) AS n_docs, CAST(SUM(len(toks)) AS BIGINT) AS total_tokens
        FROM doc
    ), scored AS (
        SELECT tf.doc_id,
               FLOOR(CAST((2*n_docs - 2*df + 1) * 11 * tf * total_tokens AS DOUBLE)
                     / CAST((2*df + 1) * (5*tf*total_tokens + 6*dl*n_docs) AS DOUBLE)
                     * 1000000.0) AS score_term_q
        FROM tf JOIN dfreq USING (word) CROSS JOIN stats
    )
    SELECT doc_id, COUNT(*) AS n_terms_matched,
           CAST(SUM(score_term_q) AS BIGINT) AS score_q
    FROM scored GROUP BY doc_id
    ORDER BY score_q DESC, doc_id ASC
    LIMIT 20
    """,
)
def q_bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SRCH.bm25_scores(load_table(spark, sf_dir, "documents"))


@_register(
    "heavy_hitter_words",
    "C4/C7 (exact heavy hitters: tokens above a support threshold — the "
    "exact twin of the count-min frequent-item sketch; integer ratio compare)",
    r"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
        FROM documents
    ), cnt AS (
        SELECT word, COUNT(*) AS n FROM tok WHERE word <> '' GROUP BY word
    ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cnt)
    SELECT word, n, CAST((n * 1000000) // total AS BIGINT) AS freq_ppm
    FROM cnt, tot
    WHERE n * 50 > total
    ORDER BY n DESC, word ASC
    """,
)
def q_heavy_hitter_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    wf = TX.word_frequencies(load_table(spark, sf_dir, "documents"))
    total = wf.agg(F.sum("n").alias("total"))
    return (
        wf.crossJoin(F.broadcast(total))
        .filter(F.col("n") * 50 > F.col("total"))
        .withColumn(
            "freq_ppm", F.expr("CAST((n * 1000000) DIV total AS BIGINT)")
        )
        .select("word", "n", "freq_ppm")
        .orderBy(F.desc("n"), F.asc("word"))
    )


@_register(
    "curriculum_quality_sample",
    "north-star (quality-curriculum sampling: score → quartile tiers → "
    "per-tier keyed modular keep rates; the pre-training reweighting pass)",
    rf"""
    WITH feats AS (
        SELECT doc_id,
               least(length(text) / 500.0, 1.0) AS length_feat,
               len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                   t -> t IN ({_STOPWORD_SQL})))
               / greatest(len(regexp_split_to_array(trim(lower(text)), '\s+')), 1)
                   AS sw_ratio,
               (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
               / greatest(length(text), 1) AS punct_ratio
        FROM documents
    ), q AS (
        SELECT doc_id,
               round(0.4 * length_feat + 0.4 * sw_ratio
                     + 0.2 * (1.0 - punct_ratio), 6) AS quality
        FROM feats
    ), cuts AS (
        SELECT list_transform(quantile_cont(quality, [0.25, 0.50, 0.75]),
                              x -> round(x, 6)) AS cuts
        FROM q
    ), tiered AS (
        SELECT doc_id, quality,
               CAST(len(list_filter(cuts, c -> c < quality)) AS BIGINT) AS tier
        FROM q, cuts
    )
    SELECT doc_id, quality, tier
    FROM tiered
    WHERE doc_id % 100 < [10, 25, 50, 100][CAST(tier + 1 AS INT)]
    ORDER BY doc_id
    """,
)
def q_curriculum_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.curriculum_sample(load_table(spark, sf_dir, "documents"))


@_register(
    "textrank_keywords",
    "C4/north-star (TextRank: weighted PageRank over the word-adjacency "
    "graph, 3 fixed iterations, all-integer micro-unit arithmetic)",
    r"""
    WITH doc AS (
        SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        FROM documents
    ), pairs AS (
        SELECT toks[i] AS src, toks[i+1] AS dst
        FROM doc,
             (SELECT unnest(range(1, (SELECT COALESCE(MAX(len(toks)), 1)
                                      FROM doc))) AS i)
        WHERE i + 1 <= len(toks)
    ), edges AS (
        SELECT src, dst, COUNT(*) AS w FROM pairs
        WHERE src <> '' AND dst <> '' GROUP BY src, dst
    ), nodes AS (
        SELECT DISTINCT word
        FROM (SELECT src AS word FROM edges UNION SELECT dst AS word FROM edges)
    ), stats AS (SELECT COUNT(*) AS n FROM nodes),
    outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src),
    r0 AS (SELECT word, CAST(1000000 // n AS BIGINT) AS r FROM nodes, stats),
    c1 AS (
        SELECT e.dst, CAST(SUM((r.r * e.w) // o.ow) AS BIGINT) AS s
        FROM edges e JOIN outw o ON e.src = o.src JOIN r0 r ON r.word = e.src
        GROUP BY e.dst
    ), r1 AS (
        SELECT nd.word,
               CAST((3000000 // (20 * st.n))
                    + (17 * COALESCE(c1.s, 0)) // 20 AS BIGINT) AS r
        FROM nodes nd CROSS JOIN stats st LEFT JOIN c1 ON c1.dst = nd.word
    ), c2 AS (
        SELECT e.dst, CAST(SUM((r.r * e.w) // o.ow) AS BIGINT) AS s
        FROM edges e JOIN outw o ON e.src = o.src JOIN r1 r ON r.word = e.src
        GROUP BY e.dst
    ), r2 AS (
        SELECT nd.word,
               CAST((3000000 // (20 * st.n))
                    + (17 * COALESCE(c2.s, 0)) // 20 AS BIGINT) AS r
        FROM nodes nd CROSS JOIN stats st LEFT JOIN c2 ON c2.dst = nd.word
    ), c3 AS (
        SELECT e.dst, CAST(SUM((r.r * e.w) // o.ow) AS BIGINT) AS s
        FROM edges e JOIN outw o ON e.src = o.src JOIN r2 r ON r.word = e.src
        GROUP BY e.dst
    ), r3 AS (
        SELECT nd.word,
               CAST((3000000 // (20 * st.n))
                    + (17 * COALESCE(c3.s, 0)) // 20 AS BIGINT) AS r
        FROM nodes nd CROSS JOIN stats st LEFT JOIN c3 ON c3.dst = nd.word
    )
    SELECT word, r AS rank_q FROM r3
    ORDER BY rank_q DESC, word ASC
    LIMIT 20
    """,
)
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SRCH.textrank_keywords(load_table(spark, sf_dir, "documents"))


@_register(
    "adaptive_stopword_filter",
    "C4/north-star (corpus-adaptive boilerplate-token removal, order-preserving)",
    r"""
    WITH doc AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        FROM documents
    ), dfreq AS (
        SELECT word, COUNT(*) AS df
        FROM (SELECT DISTINCT doc_id, unnest(toks) AS word FROM doc)
        WHERE word <> '' GROUP BY word
    ), stats AS (SELECT COUNT(*) AS n_docs FROM documents),
    stops AS (
        SELECT list(word ORDER BY word) AS stop_list
        FROM dfreq, stats WHERE df * 100 >= 50 * n_docs
    )
    SELECT doc_id,
           coalesce(array_to_string(
               list_filter(toks, t -> NOT coalesce(
                   list_contains(stop_list, t), false)),
               ' '), '') AS clean_text,
           len(toks) - len(list_filter(toks, t -> NOT coalesce(
                   list_contains(stop_list, t), false)))
               AS n_removed
    FROM doc CROSS JOIN stops
    ORDER BY doc_id
    """,
)
def q_adaptive_stopword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SRCH.adaptive_stopword_filter(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Privacy audits (GDPR family, round 3): the export gates that run
# BEFORE pseudonymized data ships.
# ---------------------------------------------------------------------------


@_register(
    "k_anonymity_audit",
    "north-star/GDPR (k-anonymity re-identification audit: quasi-identifier "
    "equivalence classes smaller than k — one map-side-combined agg)",
    """
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS class_size
    FROM events
    GROUP BY user_id, event_type
    HAVING COUNT(*) < 12
    """,
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.erasure import k_anonymity_audit

    ev = load_table(spark, sf_dir, "events")
    return k_anonymity_audit(ev, ["user_id", "event_type"], k=12)


@_register(
    "l_diversity_audit",
    "north-star/GDPR (l-diversity attribute-disclosure audit: quasi classes "
    "whose sensitive column is constant — k-anonymous yet leaking)",
    """
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS class_size,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_sensitive_values
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(DISTINCT o_orderstatus) < 2
    """,
)
def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.erasure import l_diversity_audit

    o = load_table(spark, sf_dir, "orders")
    return l_diversity_audit(o, ["o_custkey"], "o_orderstatus", l_min=2)


@_register(
    "t_closeness_audit",
    "north-star/GDPR (r9: t-closeness distribution-disclosure audit — "
    "per quasi class, the ordered-ground-metric Earth Mover's Distance "
    "between the class's sensitive distribution and the global one, "
    "EXACT in integers: emd_ppm = 1e6*sum_i|c_i*N - g_i*N_c| DIV "
    "((m-1)*N_c*N) in DECIMAL(38,0); catches the skewed-but-diverse "
    "class k-anonymity and l-diversity both pass — one fact-scale agg, "
    "then bounded C*m grid math with triangular self-joins, no "
    "unpartitioned window — pipeline/erasure.py::t_closeness_audit)",
    """
    WITH cls AS (
        SELECT o_orderpriority, o_orderstatus,
               CAST(FLOOR(o_totalprice / 25000) AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1, 2, 3
    ), gl AS (
        SELECT v, SUM(n) AS gn FROM cls GROUP BY 1
    ), gcum AS (
        SELECT v, SUM(gn) OVER (ORDER BY v) AS g FROM gl
    ), tot AS (
        SELECT o_orderpriority, o_orderstatus, SUM(n) AS class_size
        FROM cls GROUP BY 1, 2
    ), nm AS (
        SELECT SUM(gn) AS N, COUNT(*) AS m FROM gl
    ), ccum AS (
        SELECT c.o_orderpriority, c.o_orderstatus, d.v AS dv,
               SUM(c.n) AS c
        FROM cls c JOIN gl d ON c.v <= d.v
        GROUP BY 1, 2, 3
    ), grid AS (
        -- full class x domain grid: a class with no mass at or below
        -- a value has cumulative 0 there and still contributes
        SELECT t.o_orderpriority, t.o_orderstatus, t.class_size,
               g.v AS dv
        FROM tot t CROSS JOIN gl g
    ), diff AS (
        SELECT gr.o_orderpriority, gr.o_orderstatus, gr.class_size,
               nm.N, nm.m,
               ABS(CAST(COALESCE(cc.c, 0) AS HUGEINT) * nm.N
                   - CAST(g.g AS HUGEINT) * gr.class_size) AS d
        FROM grid gr
        LEFT JOIN ccum cc
          ON gr.o_orderpriority = cc.o_orderpriority
         AND gr.o_orderstatus = cc.o_orderstatus AND gr.dv = cc.dv
        JOIN gcum g ON gr.dv = g.v
        CROSS JOIN nm
    )
    SELECT o_orderpriority, o_orderstatus,
           CAST(class_size AS BIGINT) AS class_size,
           CASE WHEN m <= 1 THEN 0 ELSE
             CAST(CAST(1000000 AS HUGEINT) * SUM(d)
                  // ((m - 1) * CAST(class_size AS HUGEINT) * N)
                  AS BIGINT) END AS emd_ppm
    FROM diff
    GROUP BY o_orderpriority, o_orderstatus, class_size, N, m
    ORDER BY 1, 2
    """,
)
def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.erasure import t_closeness_audit

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") / 25000)
        .cast("long")
        .alias("price_band"),
    )
    return t_closeness_audit(
        o, ["o_orderpriority", "o_orderstatus"], "price_band"
    ).orderBy("o_orderpriority", "o_orderstatus")


@_register(
    "reversal_matching",
    "north-star/fin (payment-reversal reconciliation screen: earliest "
    "same-user same-amount reversal within the window; blocked equi-join "
    "on (user, amount), min-struct pick - no window, no user x user)",
    """
    WITH p AS (
        SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us,
               CAST(floor(value) AS BIGINT) AS amt
        FROM events WHERE event_type = 'purchase'
    ), r AS (
        SELECT user_id, event_id AS reversal_id, epoch_us(ts) AS r_us,
               CAST(floor(value) AS BIGINT) AS amt
        FROM events WHERE event_type = 'error'
    ), cand AS (
        SELECT p.user_id, p.purchase_id, p.p_us, p.amt,
               r.reversal_id, r.r_us,
               row_number() OVER (PARTITION BY p.purchase_id
                                  ORDER BY r.r_us, r.reversal_id) AS rn
        FROM p JOIN r ON p.user_id = r.user_id AND p.amt = r.amt
        WHERE r.r_us > p.p_us AND r.r_us <= p.p_us + 2592000000000
    )
    SELECT user_id, purchase_id, reversal_id, amt,
           (r_us - p_us) // 1000000 AS gap_s
    FROM cand WHERE rn = 1
    """,
)
def q_reversal_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.fin import reversal_matching

    return reversal_matching(load_table(spark, sf_dir, "events"))


@_register(
    "rfm_segments",
    "B1/north-star (RFM customer segmentation: recency/frequency/monetary "
    "quartiles composed via exact_ntile — broadcast cut pairs, no global "
    "window; anchor = corpus max date, never wall-clock)",
    """
    WITH cust AS (
        SELECT o_custkey,
               ((SELECT MAX(CAST(epoch(o_orderdate) AS BIGINT)) FROM orders)
                - MAX(CAST(epoch(o_orderdate) AS BIGINT))) // 86400
                   AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, recency_days, n_orders, monetary_cents,
           CAST(ntile(4) OVER (ORDER BY recency_days, o_custkey) AS INT) AS r_nt,
           CAST(ntile(4) OVER (ORDER BY n_orders, o_custkey) AS INT) AS f_nt,
           CAST(ntile(4) OVER (ORDER BY monetary_cents, o_custkey) AS INT) AS m_nt,
           CAST(ntile(4) OVER (ORDER BY recency_days, o_custkey) * 100
                + ntile(4) OVER (ORDER BY n_orders, o_custkey) * 10
                + ntile(4) OVER (ORDER BY monetary_cents, o_custkey) AS INT)
               AS segment
    FROM cust
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.fin import rfm_segments

    return rfm_segments(load_table(spark, sf_dir, "orders"))


_CORR_M_CTE = """
    WITH q AS (
        SELECT CAST(floor(l_quantity * 100) AS HUGEINT) AS a,
               CAST(floor(l_extendedprice * 100) AS HUGEINT) AS b,
               CAST(floor(l_discount * 100) AS HUGEINT) AS c
        FROM lineitem
    ), m AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(a) AS sa, SUM(b) AS sb, SUM(c) AS sc,
               SUM(a*a) AS saa, SUM(b*b) AS sbb, SUM(c*c) AS scc,
               SUM(a*b) AS sab, SUM(a*c) AS sac, SUM(b*c) AS sbc
        FROM q
    )"""


def _corr_sql(a: str, b: str, sp: str, sa: str, sb: str, da: str, db: str) -> str:
    return f"""
    SELECT '{a}' AS col_a, '{b}' AS col_b,
           CAST(floor(CAST(n*{sp} - {sa}*{sb} AS DOUBLE)
                      / sqrt(CAST(n*{da} - {sa}*{sa} AS DOUBLE))
                      / sqrt(CAST(n*{db} - {sb}*{sb} AS DOUBLE))
                      * 1000000) AS BIGINT) AS corr_micro
    FROM m"""


@_register(
    "correlation_matrix",
    "A6/north-star (pairwise Pearson over numeric columns in ONE scan + one "
    "wide agg — exact DECIMAL(38,0) moments, log-free: division and "
    "correctly-rounded sqrt on exact integers, so floor(corr*1e6) is "
    "bit-identical cross-engine)",
    f"""{_CORR_M_CTE}
    {_corr_sql('l_quantity', 'l_extendedprice', 'sab', 'sa', 'sb', 'saa', 'sbb')}
    UNION ALL
    {_corr_sql('l_quantity', 'l_discount', 'sac', 'sa', 'sc', 'saa', 'scc')}
    UNION ALL
    {_corr_sql('l_extendedprice', 'l_discount', 'sbc', 'sb', 'sc', 'sbb', 'scc')}
    """,
)
def q_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.quality import correlation_matrix

    li = load_table(spark, sf_dir, "lineitem")
    return correlation_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount"], scale=100
    )


# ---------------------------------------------------------------------------
# Classic warehouse shapes (TPC-H Q2/Q6/Q8-Q15/Q17-Q19/Q22 analogs) live in
# their own module; they register through the same decorator.
# ---------------------------------------------------------------------------

from . import warehouse_shapes as _WS  # noqa: E402

_WS.register(_register)

# Round-2 banking-analytics + corpus-curation + real-image shapes —
# registered AFTER every round-1 entry so the driver's checked prefix
# of the registry stays stable across rounds.

from . import fin_curation_shapes as _FC  # noqa: E402

_FC.register(_register)

# Round-4 web-corpus curation shapes (passage dedup, quality
# classifier, splits, phrase search, KS drift) — appended after all
# earlier rounds for the same prefix-stability reason.

from . import corpus_shapes as _CS  # noqa: E402

_CS.register(_register)

# Round-5 analytics shapes (PageRank, skyline, autocorrelation,
# referential-integrity screen) — appended after all earlier rounds
# for the same prefix-stability reason.

from . import analytics_shapes as _AS  # noqa: E402

_AS.register(_register)


# ---------------------------------------------------------------------------
# Public accessors (consumed by __spark_entry__.py).
# ---------------------------------------------------------------------------


# The driver's correctness gate hash-checks the FIRST 50 registry
# entries only (the full registry runs under tools/oracle_check.py). This
# curated prefix puts at least one query from EVERY operator family
# inside that window — flagship agg, filters/limits, fin analytics,
# GDPR, merge/dedup, projection, reconciliation, scalars, nested,
# star/broadcast/TPC-H joins, as-of, PQ, set ops, salted windows, the
# de-fanged exact ntile, rollup/pivot, exact sketch twins, streaming
# batch twins, the text family, packing, ANN (brute/IVF/LSH/JL),
# near-dup (jaccard/cluster/contamination/entity), BPE, real image /
# video / media codecs, profiling. Names are stable; only order moved.
_DRIVER_PREFIX = [
    "monthly_spend",
    "pricing_summary",
    "date_range_filter",
    "top_k_orders",
    "spend_trend_slopes",
    "pseudonymized_activity",
    "anti_join_new_keys",
    "project_cast_stamp",
    "reconciliation_checksums",
    # r7: scalar_functions, lang_id_heuristic, quality_scores,
    # exact_percentiles, ngram_jaccard_pairs rotated out (scalars stay
    # exercised via project_cast_stamp/reconciliation_checksums, text
    # via word_frequencies, exact quantiles via exact_distinct_counts'
    # family + the grid sketch below, n-gram candidates via
    # near_dup_clusters/fuzzy_name_pairs/benchmark_contamination) so
    # every round-6 family gets hard-gate sampling: the deterministic
    # grid+HLL sketches, grouped HLL, star CC, k-core, subsampled JPEG
    "hll_monthly_customers",
    "near_dup_clusters_star",
    "k_core_copurchase",
    # r6: array_ops + token_stats rotated out (nested/scalar coverage
    # stays via struct_flatten/scalar_functions, text via
    # word_frequencies/lang_id/quality_scores) so the round-5 graph +
    # rank-statistics families get hard-gate sampling too
    # r8: exact_dup_groups, ntile_quartiles, pivot_status_by_month,
    # bucketed_near_pairs, jpeg_decode_stats rotated out (exact dedup
    # stays sampled via first_wins_dedup, windows via running_total +
    # top_n_per_group_salted, rollup/pivot via rollup_spend, ANN
    # bucketing via ivf_topk + cosine_topk_bruteforce, JPEG via
    # jpeg_subsampled_decode_stats + image_decode_stats) so every
    # round-7 family gets hard-gate sampling: delta-frontier SSSP,
    # LPA communities, the Z-order layout audit, and the grid/bitmap
    # sketch merge laws
    "communities_copurchase",
    "zorder_layout_orders",
    "bitmap_merge_distinct",
    # r8 (same round, not deferred a generation): directed SCC and
    # the erasure×layout audit enter the hard gate immediately;
    # ivf_topk and random_projection_embed rotate out (ANN stays
    # sampled via cosine_topk_bruteforce + pq_rerank_topk +
    # kmeans_cluster_profile, JL projection via the pq/kmeans
    # pipelines that consume its vectors)
    "scc_part_precedence",
    "zorder_erasure_layout",
    # r8 (late-round additions, sampled immediately like SCC above):
    # the KMV/theta family — merge law + the intersection estimator;
    # approx_aggregates rotates out (the o_totalprice sketch trio
    # stays sampled via grid_merge_quantiles + hll_monthly_customers,
    # which exercise the same grid/HLL machinery) and image_decode_stats
    # rotates out (images stay via jpeg_subsampled_decode_stats +
    # media_feature_extract + video_frame_stats)
    # r9 rotation: the r8 families the hard gate had not yet sampled
    # enter immediately — the KMV point estimator, the theta
    # A-NOT-B difference (replacing the intersection twin: same
    # state machinery, newest estimator), the persisted-IVF real
    # probe (now that the memo holds the ARTIFACT, the gate times
    # and checks the true DPP search), the IVM delta rule + counting
    # retractions, and the forward/tolerance as-of. Rotated out,
    # each with its family still sampled: theta_intersect_customers
    # (→ theta_diff), word_frequencies (text via bpe_merge_table),
    # running_total (windows via top_n_per_group_salted),
    # set_except (setops machinery trivial + full-gate green),
    # exact_distinct_counts (distinct via hll/kmv entries),
    # table_profile (wide aggs via reconciliation_checksums)
    "kmv_distinct_parts",
    "ivf_index_search",
    "ivm_join_delta",
    "ivm_retraction_view",
    "asof_forward_tolerance",
    # r9 NEW families sampled immediately (the r8-late-addition
    # pattern — no one-round lag): the delete-side join-view delta
    # rule, the deterministic count-min and Bloom sketches, the
    # t-closeness privacy audit, the Holt forecast fold, and the
    # bucketed co-located join. Rotated out, each recorded green in
    # CORRECTNESS_r08 with its family still sampled:
    # sssp_copurchase (graph via scc/communities/k_core/hits),
    # grid_merge_quantiles (merge laws via kmv_merge+bitmap_merge),
    # cosine_topk_bruteforce (ANN via ivf_index_search +
    # pq_rerank_topk), tumbling_window_agg (streaming twins via
    # sessionization), broadcast_enrich_rates (broadcast joins via
    # fk_star_join + bucketed_colocated_join),
    # interval_join_attribution (time joins via the asof pair).
    # Full-gate-only this round: cms_merge_counts, ppr_trade_graph,
    # score_calibration_bins, cohens_kappa_labels (same machinery as
    # their sampled siblings).
    "ivm_join_retraction",
    # r10 rotation: the five r9 families the hard gate had not yet
    # sampled enter now (cms_merge_counts, cohens_kappa_labels,
    # ppr_trade_graph, score_calibration_bins, shard_rebalance_audit)
    # plus the three r10 NEW families sampled immediately (the
    # IVF-PQ composite index search, the Q16 bigram-LM perplexity
    # scores, and the A-ES weighted reservoir sample). Rotated out,
    # each green in CORRECTNESS_r09 with its family still sampled:
    # cms_heavy_parts (CMS via cms_merge_counts), kmv_merge_distinct
    # (KMV via kmv_distinct_parts, merge laws via
    # bitmap_merge_distinct), pq_rerank_topk (PQ/ADC via
    # ivfpq_index_search, which composes it with the IVF probe),
    # struct_flatten (projection via project_cast_stamp),
    # asof_nearest_join (as-of via asof_forward_tolerance),
    # theta_diff_customers (theta states via kmv_distinct_parts),
    # fuzzy_name_pairs (near-dup via near_dup_clusters +
    # near_dup_clusters_star), jpeg_subsampled_decode_stats (media
    # via video_frame_stats + media_feature_extract).
    "cms_merge_counts",
    "cohens_kappa_labels",
    "ppr_trade_graph",
    "score_calibration_bins",
    "shard_rebalance_audit",
    "ivfpq_index_search",
    "lm_perplexity_scores",
    "weighted_sample_ares",
    "bloom_join_prune",
    "t_closeness_audit",
    "holt_forecast_revenue",
    "bucketed_colocated_join",
    "spearman_balance_spend",
    "first_wins_dedup",
    "fk_star_join",
    "shipping_priority_q3",
    # r8: the nearest-direction as-of (newest code in the family)
    # replaces the backward twin in the hard gate; backward stays
    # green in the full gate and is a sub-plan of nearest anyway
    # r4: pq_rerank_topk is hash-checked now (pq_rerank_oracle_sql), so
    # the PQ compression family returns to the prefix; ivf_topk below
    # keeps the IVF family covered.
    "top_n_per_group_salted",
    "rollup_spend",
    "sessionization",
    "hits_customer_supplier",
    "pack_sequences",
    "near_dup_clusters",
    # r8 (late additions, sampled immediately): the IVM fold law and
    # the seasonal decomposition; benchmark_contamination rotates out
    # (near-dup/contamination machinery stays sampled via
    # near_dup_clusters, near_dup_clusters_star, fuzzy_name_pairs) and
    # kmeans_cluster_profile rotates out (ANN/clustering stays via
    # cosine_topk_bruteforce + pq_rerank_topk)
    "ivm_revenue_view",
    "bpe_merge_table",
    "video_frame_stats",
    # r4: kmeans_cluster_profile is hash-checked now
    # (kmeans_profile_oracle_sql) — it takes media_resize's slot
    # (image_resize semantics stay covered via image_decode_stats +
    # media_feature_extract, both real-codec paths)
    "seasonal_decompose_revenue",
    "media_feature_extract",
]


def specs() -> list[QuerySpec]:
    by_name = {s.name: s for s in _SPECS}
    head = [by_name[n] for n in _DRIVER_PREFIX if n in by_name]
    in_head = set(_DRIVER_PREFIX)
    return head + [s for s in _SPECS if s.name not in in_head]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.fn for s in specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in specs() if s.oracle is not None}
