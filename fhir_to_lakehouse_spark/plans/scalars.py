"""Scalar function families: string, date/time, conditional, array/json.

Covers SURVEY.md §2.10 — the reference itself only exercises
cast/from_json/explode/split/getItem (P1-P10 at
/root/reference/src/bundle_processor.py:65-75); the full families are
exposed here as oracle-checked queries. All Catalyst built-ins: these
stay inside WholeStageCodegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import load_table


@query(
    "scalar_string_family",
    oracle="""
    SELECT p_partkey,
           LOWER(p_name)                                   AS lname,
           UPPER(p_brand)                                  AS ubrand,
           CAST(LENGTH(p_name) AS INT)                     AS name_len,
           SUBSTRING(p_type, 1, 5)                         AS type5,
           REPLACE(p_name, ' ', '_')                       AS snake,
           CONCAT(p_brand, ':', p_type)                    AS brand_type,
           TRIM(p_name)                                    AS trimmed,
           CAST(STRPOS(p_name, 'a') AS INT)                AS first_a
    FROM part
    """,
)
def scalar_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/length/substring/replace/concat/trim/instr."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.regexp_replace("p_name", " ", "_").alias("snake"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.col("p_name")).alias("trimmed"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
    )


@query(
    "scalar_regexp_extract",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1)        AS first_word,
           CAST(regexp_matches(p_type, 'BRUSHED') AS BOOLEAN) AS is_brushed
    FROM part
    """,
)
def scalar_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract + rlike (reference P5 split-by-regex analog)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.col("p_type").rlike("BRUSHED").alias("is_brushed"),
    )


@query(
    "scalar_split_getitem",
    oracle="""
    SELECT p_partkey,
           string_split(p_type, ' ')[1]                        AS type_head,
           string_split(p_type, ' ')[-1]                       AS type_tail,
           CAST(len(string_split(p_name, ' ')) AS INT)         AS n_words
    FROM part
    """,
)
def scalar_split_getitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + array index + size — exactly the reference's request-URL
    parse (P5/P6, /root/reference/src/bundle_processor.py:72-74)."""
    part = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_type"), " ")
    return part.select(
        "p_partkey",
        words.getItem(0).alias("type_head"),
        F.element_at(words, -1).alias("type_tail"),
        F.size(F.split(F.col("p_name"), " ")).alias("n_words"),
    )


@query(
    "scalar_date_family",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT)                      AS yr,
           CAST(MONTH(o_orderdate) AS INT)                     AS mo,
           CAST(DAYOFMONTH(o_orderdate) AS INT)                AS dom,
           CAST(QUARTER(o_orderdate) AS INT)                   AS qtr,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY         AS due,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                DATE '1998-12-31') AS INT)                     AS days_to_eoy
    FROM orders
    """,
)
def scalar_date_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/quarter/date_trunc/date_add/datediff."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("timestamp")
        .alias("due"),
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_eoy"),
    )


@query(
    "scalar_conditional_family",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END                              AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN')     AS status_label,
           CAST(o_totalprice > 150000 AS BOOLEAN)           AS is_big,
           LEAST(o_totalprice, 200000.0)                    AS capped,
           GREATEST(o_totalprice, 50000.0)                  AS floored
    FROM orders
    """,
)
def scalar_conditional_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / least / greatest."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        (F.col("o_totalprice") > 150000).alias("is_big"),
        F.least(F.col("o_totalprice"), F.lit(200000.0)).alias("capped"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("floored"),
    )


@query(
    "scalar_math_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_discount - 0.05), 6)        AS d_abs,
           CAST(CEIL(l_quantity) AS BIGINT)        AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT)       AS qty_floor,
           ROUND(SQRT(l_extendedprice), 6)         AS price_sqrt,
           ROUND(LN(l_extendedprice), 6)           AS price_ln,
           ROUND(POWER(1 + l_tax, 2), 6)           AS tax_sq,
           CAST(l_quantity AS BIGINT) % 7          AS qty_mod7
    FROM lineitem
    """,
)
def scalar_math_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/ceil/floor/sqrt/ln/power/mod."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("d_abs"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
    )


@query(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string column (reference P2
    from_json analog, /root/reference/src/bundle_processor.py:67)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", k.alias("k"), (k % 10).alias("k_bucket"))


@query(
    "scalar_json_map_family",
    oracle="""
    SELECT event_id,
           event_type                                  AS jt_type,
           CAST(value AS VARCHAR)                      AS jt_value,
           array_to_string(
             map_keys(MAP {'a': value, 'b': value * 2}), ',')  AS mkeys,
           CAST(map_values(MAP {'a': value, 'b': value * 2})[1]
                AS DOUBLE)                             AS mval_a,
           CAST(map_values(MAP {'a': value, 'b': value * 2})[2]
                AS DOUBLE)                             AS mval_b,
           'STRUCT<a: BIGINT, b: STRING, c: ARRAY<DOUBLE>>' AS json_schema
    FROM events
    """,
)
def scalar_json_map_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.10 map/json rounding-out: json_tuple (multi-field JSON
    extraction as a generator), map construction + map_keys/map_values,
    and schema_of_json (whose output on a literal is a constant the
    oracle pins as a golden — DuckDB has no analog, but the VALUE is
    what the driver hashes).

    json_tuple is exercised on a JSON document built from the row
    itself (to_json of a struct), so extraction is verified against
    the known source columns; map entry order is the construction
    order in both engines, making keys/values arrays deterministic."""
    ev = load_table(spark, sf_dir, "events")
    js = F.to_json(F.struct("event_type", "value"))
    m = F.map_from_arrays(
        F.array(F.lit("a"), F.lit("b")),
        F.array(F.col("value"), F.col("value") * 2),
    )
    return (
        ev.select("event_id", js.alias("js"), m.alias("m"))
        .select(
            "event_id",
            F.json_tuple(F.col("js"), "event_type", "value").alias(
                "jt_type", "jt_value"
            ),
            # keys CSV + values unpacked to scalars at the boundary
            # (registry convention: no ARRAY output columns); the map
            # construction and map_keys/map_values still run as maps
            F.array_join(F.map_keys("m"), ",").alias("mkeys"),
            F.element_at(F.map_values("m"), 1)
            .cast("double")
            .alias("mval_a"),
            F.element_at(F.map_values("m"), 2)
            .cast("double")
            .alias("mval_b"),
            F.schema_of_json(F.lit('{"a":1,"b":"x","c":[1.5]}')).alias(
                "json_schema"
            ),
        )
    )


@query(
    "scalar_date_convert_family",
    oracle="""
    SELECT o_orderkey,
           CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE)  AS as_date,
           CAST(datediff('month', DATE '1995-01-01',
                         date_trunc('month', o_orderdate)) AS DOUBLE)
                                                            AS months_since_95,
           CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE)
             + INTERVAL 10 DAY = CAST(strftime(o_orderdate + INTERVAL 10 DAY,
                                               '%Y-%m-%d') AS DATE) AS add_roundtrip
    FROM orders
    """,
)
def scalar_date_convert_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.10 date rounding-out: to_date (string -> DATE
    conversion through an explicit format round-trip) and
    months_between. The months_between operands are truncated to month
    starts so the fractional 31-day-rule component is exactly zero and
    DuckDB's month-boundary datediff is the precise equivalent."""
    orders = load_table(spark, sf_dir, "orders")
    as_date = F.to_date(F.date_format("o_orderdate", "yyyy-MM-dd"), "yyyy-MM-dd")
    mb = F.months_between(
        F.date_trunc("month", "o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
    )
    return orders.select(
        "o_orderkey",
        as_date.alias("as_date"),
        mb.alias("months_since_95"),
        (
            F.date_add(as_date, 10)
            == F.to_date(
                F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 10), "yyyy-MM-dd"),
                "yyyy-MM-dd",
            )
        ).alias("add_roundtrip"),
    )
