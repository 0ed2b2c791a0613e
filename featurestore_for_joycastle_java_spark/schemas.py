"""Typed schemas: the reference's event record + all driver fixture tables.

The reference consumes schemaless JSON maps and validates a fixed 7-field
list (``eventFields``, ConsumerMultiThread.java:27-34; DDL :70-78). Here the
same record is a proper ``StructType`` — ``from_json`` with an explicit
schema reproduces the reference's dynamic-in/fixed-out behavior (declared
fields surface, missing keys become null, extras dropped).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference event schema (ConsumerMultiThread.java:27-34, README.md:83-95) ---

#: The 7 required fields, in the reference's declared order (CMT:27-34).
EVENT_FIELDS = [
    "EventID",
    "PlayerID",
    "EventTimestamp",
    "EventType",
    "EventDetails",
    "DeviceType",
    "Location",
]

#: Event types whose EventDetails gets numeric extraction (CMT:26).
EXTRACT_EVENT_TYPES = ("InAppPurchase", "SessionEnd")

#: First-match numeric pattern (CMT:121): decimal preferred over integer at
#: the same start position, so "4.99 USD" -> 4.99, "level 7" -> 7.
NUMBER_PATTERN = r"(\d+\.\d+|\d+)"

#: Typed ingest schema. The reference stores everything as TEXT (CMT:71-77);
#: we keep raw EventDetails as string and surface the extracted number in a
#: proper numeric column (EventValue) instead of type-punning in place.
GAME_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("EventID", T.StringType()),
        T.StructField("PlayerID", T.StringType()),
        T.StructField("EventTimestamp", T.StringType()),
        T.StructField("EventType", T.StringType()),
        T.StructField("EventDetails", T.StringType()),
        T.StructField("DeviceType", T.StringType()),
        T.StructField("Location", T.StringType()),
    ]
)

# --- Driver fixture schemas (/root/testdata/sf*/, see FIXTURES.md) ---

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
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
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

#: All fixture tables, name -> schema, matching the DuckDB oracle's views.
FIXTURE_SCHEMAS = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

TABLE_NAMES = list(FIXTURE_SCHEMAS)
