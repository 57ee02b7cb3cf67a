"""Scalar function pack: string / date / math / conditional / JSON / array / map.

All built-in ``pyspark.sql.functions`` — JVM-side, inside whole-stage
codegen, zero Python in the hot path.  This is the §2.2 scalar surface;
the reference analogues are the URI regex validation (harvest.py:28-51),
the OPTIONAL null-coalescing (harvest.py:360-361) and the
string-assembled query text (harvest.py:54-87).

Oracle caveats handled here (DuckDB 1.0 vs Spark 4):
  * DuckDB ``log`` is log10, Spark ``F.log`` is ln — oracle uses ``ln``;
  * DuckDB ``date_trunc`` returns DATE for month grain — cast TIMESTAMP;
  * DuckDB ``dayofweek`` is 0=Sunday, Spark is 1=Sunday — oracle adds 1;
  * float arrays are cast to double and rounded on both sides so
    accumulation/representation noise can't flip the value hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, MapType, StringType

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table


@query(
    "q_scalar_string",
    oracle="""
SELECT c_custkey,
       lower(c_name)                                   AS lower_name,
       upper(c_mktsegment)                             AS upper_seg,
       trim(concat('  ', c_name, ' '))                 AS trimmed,
       substring(c_name, 1, 8)                         AS name_prefix,
       split_part(c_name, '#', 2)                      AS name_number,
       concat_ws('|', c_mktsegment, c_name)            AS joined,
       regexp_extract(c_name, '[0-9]+')                AS digits,
       CAST(length(c_name) AS INTEGER)                 AS name_len,
       CAST(levenshtein(c_mktsegment, 'BUILDING') AS INTEGER) AS lev_to_building
FROM customer
WHERE c_custkey <= 200
""",
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String pack: case, trim, substring, split_part, concat_ws,
    regexp_extract, length, levenshtein."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.filter(F.col("c_custkey") <= 200).select(
        "c_custkey",
        F.lower("c_name").alias("lower_name"),
        F.upper("c_mktsegment").alias("upper_seg"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_number"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("joined"),
        F.regexp_extract("c_name", "[0-9]+", 0).alias("digits"),
        F.length("c_name").alias("name_len"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).alias(
            "lev_to_building"
        ),
    )


@query(
    "q_scalar_date",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER)      AS order_year,
       CAST(month(o_orderdate) AS INTEGER)     AS order_month,
       CAST(day(o_orderdate) AS INTEGER)       AS order_day,
       CAST(quarter(o_orderdate) AS INTEGER)   AS order_quarter,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS order_dow,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-12-31') AS INTEGER)
           AS days_to_1998_end
FROM orders
WHERE o_orderkey <= 2000
""",
)
def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date pack: year/month/day/quarter/dayofweek, date_trunc,
    datediff."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate")).alias(
            "days_to_1998_end"
        ),
    )


@query(
    "q_scalar_math",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       CAST(round(l_extendedprice, 0) AS DOUBLE)        AS price_rounded,
       CAST(abs(l_discount - 0.05) AS DOUBLE)           AS disc_dev,
       CAST(round(ln(l_extendedprice), 6) AS DOUBLE)    AS price_ln,
       CAST(round(sqrt(l_quantity), 6) AS DOUBLE)       AS qty_sqrt,
       CAST(ceil(l_tax * 100) AS BIGINT)                AS tax_pct_ceil,
       CAST(floor(l_quantity / 10) AS BIGINT)           AS qty_decile,
       CAST(l_orderkey % 7 AS BIGINT)                   AS key_mod7,
       CAST(round(power(1 + l_tax, 2), 6) AS DOUBLE)    AS tax_compound
FROM lineitem
WHERE l_orderkey <= 500
""",
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math pack: round/abs/ln/sqrt/ceil/floor/mod/power."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") <= 500).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 0).alias("price_rounded"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.ceil(F.col("l_tax") * 100).alias("tax_pct_ceil"),
        F.floor(F.col("l_quantity") / 10).alias("qty_decile"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.round(F.pow(F.lit(1) + F.col("l_tax"), 2), 6).alias("tax_compound"),
    )


@query(
    "q_scalar_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END                            AS price_band,
       coalesce(nullif(o_orderpriority, '1-URGENT'), 'URGENT!') AS priority_renamed,
       greatest(o_totalprice, 150000.0)              AS floor_at_150k,
       least(o_totalprice, 150000.0)                 AS cap_at_150k,
       CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END AS status_or_null
FROM orders
WHERE o_orderkey <= 2000
""",
)
def q_scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional pack: CASE WHEN chains, coalesce, nullif,
    greatest/least — the reference's OPTIONAL null handling
    (harvest.py:360-361) as column ops."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("URGENT!")
        ).alias("priority_renamed"),
        F.greatest(F.col("o_totalprice"), F.lit(150000.0)).alias("floor_at_150k"),
        F.least(F.col("o_totalprice"), F.lit(150000.0)).alias("cap_at_150k"),
        F.when(F.col("o_orderstatus") == "O", F.lit(None).cast("string"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status_or_null"),
    )


@query(
    "q_scalar_json",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS DOUBLE)
           AS avg_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
""",
)
def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON pack: get_json_object on the semi-structured ``events.props``
    column (the SPARQL-bindings-as-JSON analogue, SURVEY §1.1) feeding
    a numeric aggregate."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg(k), 4).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
    )


@query(
    "q_scalar_map",
    oracle="""
SELECT event_id,
       array_to_string(list_sort(json_keys(props)), ',')       AS prop_keys,
       CAST(json_extract_string(props, '$.k') AS BIGINT)       AS k_value,
       CAST(len(json_keys(props)) AS INTEGER)                  AS n_keys
FROM events
WHERE event_id < 1000
""",
)
def q_scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map pack: parse JSON into MapType, then map_keys / element_at /
    size — the typed-map view of semi-structured props.

    Every output column is scalar: the key list is emitted as a sorted
    comma-joined string because the driver's hash canonicalization
    (pandas sort_values) cannot order array cells — oracled queries must
    never return array/map-typed columns."""
    events = load_table(spark, sf_dir, "events")
    props_map = F.from_json("props", MapType(StringType(), LongType()))
    return events.filter(F.col("event_id") < 1000).select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(props_map)), ",").alias("prop_keys"),
        F.element_at(props_map, "k").alias("k_value"),
        F.size(F.map_keys(props_map)).alias("n_keys"),
    )


@query(
    "q_scalar_array",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       CAST(round(CAST(embedding[1] AS DOUBLE), 6) + 0.0 AS DOUBLE) AS first_component,
       CAST(round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))), 4) AS DOUBLE)
           AS l2_norm,
       CAST(round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) / len(embedding), 6) + 0.0 AS DOUBLE)
           AS mean_component
FROM embeddings
WHERE vec_id < 100
""",
)
def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array pack over ``embeddings.embedding``: size, element_at, and
    higher-order ``transform``/``aggregate`` for the L2 norm and mean —
    all JVM-side lambda expressions, no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq_sum = F.aggregate(
        as_double, F.lit(0.0), lambda acc, x: acc + x * x
    )
    comp_sum = F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x)
    return emb.filter(F.col("vec_id") < 100).select(
        "vec_id",
        F.size("embedding").alias("dim"),
        # signed-zero sweep (r13): embeddings are signed; `+ 0.0`
        # folds a rounded -0.0 (driver hash distinguishes signed zeros).
        (
            F.round(F.element_at("embedding", 1).cast("double"), 6)
            + F.lit(0.0)
        ).alias("first_component"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        (F.round(comp_sum / F.size("embedding"), 6) + F.lit(0.0)).alias(
            "mean_component"
        ),
    )


@query(
    "q_scalar_variant",
    oracle="""
SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS BIGINT)
           AS k_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS max_k
FROM events
GROUP BY 1
""",
)
def q_scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type:
    ``parse_json`` shreds the JSON string into the binary variant
    encoding ONCE, and ``variant_get`` extracts a typed path from it —
    unlike ``get_json_object`` (q_scalar_json), repeated extractions
    reuse the parsed representation instead of re-parsing text, which
    is the difference at 100 TB between one JSON parse per row and one
    per path reference.  Output: per k-bucket event counts and bounds,
    oracled against DuckDB's JSON extraction."""
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        events.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
