"""Schema registry.

Two schema families:

* **Fixture tables** — the driver-generated TPC-H-ish star schema plus
  ``events``/``documents``/``embeddings`` (``/root/testdata/sf*``,
  schemas verified from the parquet footers, see FIXTURES.md §A).
  Declared explicitly so readers never pay schema inference and so
  column pruning has a stable contract.

* **Harvest tables** — the reference's six-table relational model
  (reference: harvest.py:161-289), mapped per SURVEY.md §1.3:
  ``INTEGER PK AUTOINCREMENT`` → stable surrogate ``long``; ``TEXT`` →
  ``string``; ``DATETIME`` → ``timestamp``.  UNIQUE / FK / CHECK
  constraints are not engine-enforced in Spark; they live in
  ``harvest.constraints`` as load-time assertions.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


# --- fixture tables (driver-generated) --------------------------------------

REGION = _st(("r_regionkey", IntegerType(), True), ("r_name", StringType(), True))

NATION = _st(
    ("n_nationkey", IntegerType(), True),
    ("n_name", StringType(), True),
    ("n_regionkey", IntegerType(), True),
)

CUSTOMER = _st(
    ("c_custkey", LongType(), True),
    ("c_name", StringType(), True),
    ("c_nationkey", IntegerType(), True),
    ("c_acctbal", DoubleType(), True),
    ("c_mktsegment", StringType(), True),
)

SUPPLIER = _st(
    ("s_suppkey", LongType(), True),
    ("s_name", StringType(), True),
    ("s_nationkey", IntegerType(), True),
    ("s_acctbal", DoubleType(), True),
)

PART = _st(
    ("p_partkey", LongType(), True),
    ("p_name", StringType(), True),
    ("p_brand", StringType(), True),
    ("p_type", StringType(), True),
    ("p_size", IntegerType(), True),
    ("p_retailprice", DoubleType(), True),
)

ORDERS = _st(
    ("o_orderkey", LongType(), True),
    ("o_custkey", LongType(), True),
    ("o_orderstatus", StringType(), True),
    ("o_totalprice", DoubleType(), True),
    ("o_orderdate", TimestampType(), True),
    ("o_orderpriority", StringType(), True),
)

LINEITEM = _st(
    ("l_orderkey", LongType(), True),
    ("l_partkey", LongType(), True),
    ("l_suppkey", LongType(), True),
    ("l_linenumber", IntegerType(), True),
    ("l_quantity", DoubleType(), True),
    ("l_extendedprice", DoubleType(), True),
    ("l_discount", DoubleType(), True),
    ("l_tax", DoubleType(), True),
    ("l_returnflag", StringType(), True),
    ("l_linestatus", StringType(), True),
    ("l_shipdate", TimestampType(), True),
)

# The on-disk unit of events.ts has CHANGED across fixture
# regenerations (timestamp[ns] in round 1, timestamp[us] as of round
# 4) — so the loader inspects the parquet footer per path and picks a
# read schema, rather than assuming either (io/loaders.py:events_ts_unit).
#
# EVENTS_RAW: read shape for a NANOS footer — Spark cannot map INT64
# TIMESTAMP(NANOS) to TimestampType (PARQUET_TYPE_ILLEGAL), so ts is
# read as long nanos and floored to µs by the loader.
EVENTS_RAW = _st(
    ("event_id", LongType(), True),
    ("ts", LongType(), True),
    ("user_id", LongType(), True),
    ("event_type", StringType(), True),
    ("value", DoubleType(), True),
    ("props", StringType(), True),
)

# EVENTS_NTZ: read shape for a MICROS/MILLIS footer written without a
# timezone (isAdjustedToUTC=false → TIMESTAMP_NTZ); the loader casts to
# session-local TimestampType so downstream queries see one type.
EVENTS_NTZ = _st(
    ("event_id", LongType(), True),
    ("ts", TimestampNTZType(), True),
    ("user_id", LongType(), True),
    ("event_type", StringType(), True),
    ("value", DoubleType(), True),
    ("props", StringType(), True),
)

EVENTS = _st(
    ("event_id", LongType(), True),
    ("ts", TimestampType(), True),
    ("user_id", LongType(), True),
    ("event_type", StringType(), True),
    ("value", DoubleType(), True),
    ("props", StringType(), True),
)

DOCUMENTS = _st(
    ("doc_id", LongType(), True),
    ("text", StringType(), True),
    ("lang", StringType(), True),
    ("source", StringType(), True),
    ("n_chars", LongType(), True),
)

EMBEDDINGS = _st(
    ("vec_id", LongType(), True),
    ("embedding", ArrayType(FloatType(), True), True),
    ("label", IntegerType(), True),
)

FIXTURE_SCHEMAS: dict[str, StructType] = {
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

FIXTURE_TABLES = tuple(FIXTURE_SCHEMAS)


# --- harvest-domain tables (reference relational model) ----------------------
# reference: harvest.py:188-197 (terms), :200-213 (term_fields),
# :216-233 (translations), :236-249 (appeals), :252-262 (appeal_messages),
# :265-274 (users).

SPARQL_BINDINGS = _st(
    ("concept", StringType(), True),  # nullable on the wire; load path filters
    ("prefLabel", StringType(), True),
    ("altLabel", StringType(), True),
    ("definition", StringType(), True),
)

TERMS = _st(
    ("id", LongType(), False),
    ("uri", StringType(), False),
    ("created_at", TimestampType(), False),
    ("updated_at", TimestampType(), False),
)

TERM_FIELDS = _st(
    ("id", LongType(), False),
    ("term_id", LongType(), False),
    ("field_uri", StringType(), False),
    ("field_term", StringType(), False),
    ("original_value", StringType(), False),
    ("created_at", TimestampType(), False),
    ("updated_at", TimestampType(), False),
)

TRANSLATIONS = _st(
    ("id", LongType(), False),
    ("term_field_id", LongType(), False),
    ("language", StringType(), False),
    ("value", StringType(), False),
    ("status", StringType(), False),
    ("created_at", TimestampType(), False),
    ("updated_at", TimestampType(), False),
    ("created_by", StringType(), False),
    ("modified_at", TimestampType(), True),
    ("modified_by", StringType(), True),
    ("reviewed_by", StringType(), True),
)

APPEALS = _st(
    ("id", LongType(), False),
    ("translation_id", LongType(), False),
    ("opened_by", StringType(), False),
    ("opened_at", TimestampType(), False),
    ("closed_at", TimestampType(), True),
    ("status", StringType(), False),
    ("resolution", StringType(), True),
)

APPEAL_MESSAGES = _st(
    ("id", LongType(), False),
    ("appeal_id", LongType(), False),
    ("author", StringType(), False),
    ("message", StringType(), False),
    ("created_at", TimestampType(), False),
)

USERS = _st(
    ("username", StringType(), False),
    ("reputation", LongType(), False),
    ("joined_at", TimestampType(), False),
    ("extra", StringType(), True),
)

HARVEST_SCHEMAS: dict[str, StructType] = {
    "terms": TERMS,
    "term_fields": TERM_FIELDS,
    "translations": TRANSLATIONS,
    "appeals": APPEALS,
    "appeal_messages": APPEAL_MESSAGES,
    "users": USERS,
}

# CHECK-constraint domains (reference: harvest.py:221-223, :244) — enforced by
# harvest.constraints at load time.
TRANSLATION_LANGUAGES = ("nl", "fr", "de", "es", "it", "pt")
TRANSLATION_STATUSES = ("draft", "review", "approved", "rejected", "merged")
APPEAL_STATUSES = ("open", "closed", "resolved")
