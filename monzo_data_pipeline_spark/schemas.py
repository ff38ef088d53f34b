"""Explicit StructType schemas.

Two families:
  1. Medallion tables, mapped from the reference DDL
     (/root/reference/src/sql/create_bronze_layer.sql:1-65,
      create_silver_layer.sql:1-46, create_gold_layer.sql:1-6).
     Money policy (SURVEY.md §7): bronze keeps integer minor units
     (LongType pence) exactly as the reference stores them
     (create_bronze_layer.sql:4); silver converts to
     DecimalType(18,2) pounds instead of replicating the
     reference's lossy INTEGER→REAL re-type
     (create_silver_layer.sql:4).
  2. Driver testdata tables (/root/testdata/sf*/ — TESTDATA.md),
     declared so reads never rely on inference.

Everything is a fixed, declared schema — the reference has no schema
inference or evolution (SURVEY.md §1.2) and neither do we.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Wire-format (pre-flatten) schema: what the REST source yields before the
# nested-struct flatten operator (reference api_client.py:32-109).
# ---------------------------------------------------------------------------

ADDRESS_STRUCT = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("postcode", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
    ]
)

MERCHANT_STRUCT = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("logo", T.StringType()),
        T.StructField("emoji", T.StringType()),
        T.StructField("online", T.BooleanType()),
        T.StructField("atm", T.BooleanType()),
        T.StructField("address", ADDRESS_STRUCT),
        T.StructField("google_places_id", T.StringType()),
        T.StructField("suggested_tags", T.ArrayType(T.StringType())),
        T.StructField("foursquare_id", T.StringType()),
        T.StructField("website", T.StringType()),
    ]
)

COUNTERPARTY_STRUCT = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("account_number", T.LongType()),
        T.StructField("sort_code", T.LongType()),
    ]
)

TRANSACTION_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("description", T.StringType()),
        T.StructField("amount", T.LongType(), nullable=False),
        T.StructField("currency", T.StringType(), nullable=False),
        T.StructField("created", T.TimestampType(), nullable=False),
        T.StructField("category", T.StringType()),
        T.StructField("notes", T.StringType()),
        T.StructField("is_load", T.BooleanType()),
        T.StructField("settled", T.TimestampType()),  # late-arriving: null until settled
        T.StructField("local_amount", T.LongType()),
        T.StructField("local_currency", T.StringType()),
        T.StructField("counterparty", COUNTERPARTY_STRUCT),
        T.StructField("merchant", MERCHANT_STRUCT),
    ]
)

# ---------------------------------------------------------------------------
# Bronze layer (reference create_bronze_layer.sql:1-65). 32-column flat fact.
# ---------------------------------------------------------------------------

BRONZE_TRANSACTIONS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("description", T.StringType()),
        T.StructField("amount", T.LongType(), nullable=False),  # pence
        T.StructField("currency", T.StringType(), nullable=False),
        T.StructField("created", T.TimestampType(), nullable=False),
        T.StructField("category", T.StringType()),
        T.StructField("notes", T.StringType()),
        T.StructField("is_load", T.BooleanType()),
        T.StructField("settled", T.TimestampType()),
        T.StructField("local_amount", T.LongType()),
        T.StructField("local_currency", T.StringType()),
        T.StructField("counterparty_name", T.StringType()),
        T.StructField("counterparty_account_num", T.LongType()),
        T.StructField("counterparty_sort_code", T.LongType()),
        T.StructField("merchant_id", T.StringType()),
        T.StructField("merchant_name", T.StringType()),
        T.StructField("merchant_category", T.StringType()),
        T.StructField("merchant_logo", T.StringType()),
        T.StructField("merchant_emoji", T.StringType()),
        T.StructField("merchant_online", T.BooleanType()),
        T.StructField("merchant_atm", T.BooleanType()),
        T.StructField("merchant_address", T.StringType()),
        T.StructField("merchant_city", T.StringType()),
        T.StructField("merchant_postcode", T.StringType()),
        T.StructField("merchant_country", T.StringType()),
        T.StructField("merchant_latitude", T.DoubleType()),
        T.StructField("merchant_longitude", T.DoubleType()),
        T.StructField("merchant_google_places_id", T.StringType()),
        T.StructField("merchant_suggested_tags", T.ArrayType(T.StringType())),
        T.StructField("merchant_foursquare_id", T.StringType()),
        T.StructField("merchant_website", T.StringType()),
        T.StructField("date_retrieved", T.TimestampType()),
    ]
)

BRONZE_BALANCE_SCHEMA = T.StructType(
    [
        T.StructField("balance", T.LongType()),
        T.StructField("total_balance", T.LongType()),
        T.StructField("currency", T.StringType()),
        T.StructField("spend_today", T.LongType()),
        T.StructField("date_retrieved", T.TimestampType()),
    ]
)

BRONZE_POTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("style", T.StringType()),
        T.StructField("balance", T.LongType()),
        T.StructField("currency", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("product_id", T.StringType()),
        T.StructField("current_account_id", T.StringType()),
        T.StructField("cover_image_url", T.StringType()),
        T.StructField("isa_wrapper", T.BooleanType()),
        T.StructField("round_up", T.BooleanType()),
        T.StructField("round_up_multiplier", T.LongType()),
        T.StructField("is_tax_pot", T.BooleanType()),
        T.StructField("created", T.TimestampType()),
        T.StructField("updated", T.TimestampType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("locked", T.BooleanType()),
        T.StructField("available_for_bills", T.BooleanType()),
        T.StructField("has_virtual_cards", T.BooleanType()),
        T.StructField("date_retrieved", T.TimestampType()),
    ]
)

# ---------------------------------------------------------------------------
# Silver layer (reference create_silver_layer.sql:1-46).
# ---------------------------------------------------------------------------

SILVER_TRANSACTIONS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("description", T.StringType()),
        T.StructField("amount", T.DecimalType(18, 2)),  # pounds; see money policy above
        T.StructField("currency", T.StringType()),
        T.StructField("created", T.TimestampType()),
        T.StructField("category", T.StringType()),
        T.StructField("notes", T.StringType()),
        T.StructField("is_load", T.BooleanType()),
        T.StructField("settled", T.TimestampType()),
        T.StructField("local_amount", T.DecimalType(18, 2)),
        T.StructField("local_currency", T.StringType()),
        T.StructField("counterparty_account_num", T.LongType()),
        T.StructField("counterparty_sort_code", T.LongType()),
        T.StructField("merchant_id", T.StringType()),
        T.StructField("inserted_at", T.TimestampType()),
    ]
)

SILVER_COUNTERPARTIES_SCHEMA = T.StructType(
    [
        T.StructField("account_num", T.LongType(), nullable=False),
        T.StructField("sort_code", T.LongType(), nullable=False),
        T.StructField("name", T.StringType()),
    ]
)

SILVER_MERCHANTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("name", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("logo", T.StringType()),
        T.StructField("emoji", T.StringType()),
        T.StructField("online", T.BooleanType()),
        T.StructField("atm", T.BooleanType()),
        T.StructField("address", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("postcode", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("google_places_id", T.StringType()),
        T.StructField("suggested_tags", T.ArrayType(T.StringType())),
        T.StructField("foursquare_id", T.StringType()),
        T.StructField("website", T.StringType()),
    ]
)

GOLD_MONTHLY_SPENDING_SCHEMA = T.StructType(
    [
        T.StructField("year", T.IntegerType()),
        T.StructField("month", T.IntegerType()),
        T.StructField("total_spend", T.DecimalType(38, 2)),
        T.StructField("avg_spend", T.DoubleType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md / FIXTURES.md §B).
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),  # JSON
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)
