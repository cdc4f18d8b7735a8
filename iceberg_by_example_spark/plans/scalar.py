"""Scalar function inventory: string / date / math / conditional /
array / json (gap §2.13 — the reference's only scalar is a date cast,
LT:149, and count(*) aliasing, LT:125).

All expressions are built-in ``pyspark.sql.functions`` — JVM-side,
inside whole-stage codegen. No Python UDFs anywhere in this module.
Transcendentals (ln/pow) are rounded to 6 decimals before comparison:
libm implementations may differ in the last ulp across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_by_example_spark.plans.registry import register
from iceberg_by_example_spark.sources.tpch import load_table


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           SUBSTR(p_type, 1, 5) AS type_prefix,
           LENGTH(p_name) AS name_len,
           LEN(STRING_SPLIT(p_name, ' ')) AS name_words,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_brand, 'Brand#', 'B') AS brand_short,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           CONTAINS(p_type, 'BRASS') AS is_brass
    FROM part
    """,
    category="scalar",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.size(F.split("p_name", " ")).alias("name_words"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.col("p_type").contains("BRASS").alias("is_brass"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DAYOFWEEK(o_orderdate) AS INT) AS order_dow,
           STRFTIME(o_orderdate, '%Y-%m') AS year_month,
           CAST(DATE_TRUNC('quarter', o_orderdate) AS TIMESTAMP) AS order_quarter,
           CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_date,
           DATEDIFF('day', CAST('1995-01-01' AS DATE), CAST(o_orderdate AS DATE)) AS days_since_epoch_start
    FROM orders WHERE o_orderkey < 1000
    """,
    category="scalar",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions. DuckDB DAYOFWEEK is 0=Sunday..6; Spark
    dayofweek is 1=Sunday..7 — normalized here to DuckDB's convention."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("order_dow"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
        F.date_trunc("quarter", "o_orderdate").alias("order_quarter"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_extendedprice - 30000.0) AS abs_dev,
           ROUND(l_extendedprice, -2) AS price_hundreds,
           CAST(FLOOR(l_quantity / 7.0) AS BIGINT) AS qty_bucket,
           CAST(CEIL(l_discount * 100.0) AS BIGINT) AS disc_pct_ceil,
           ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
           ROUND(LN(l_extendedprice + 1.0), 6) AS price_ln,
           CAST(l_orderkey % 16 AS BIGINT) AS key_mod
    FROM lineitem WHERE l_orderkey < 500
    """,
    category="scalar",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 30000.0).alias("abs_dev"),
        F.round("l_extendedprice", -2).alias("price_hundreds"),
        F.floor(F.col("l_quantity") / 7.0).alias("qty_bucket"),
        F.ceil(F.col("l_discount") * 100.0).alias("disc_pct_ceil"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("price_ln"),
        (F.col("l_orderkey") % 16).alias("key_mod"),
    )


@register(
    "scalar_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'medium'
                ELSE 'large' END AS qty_class,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS return_kind,
           CASE WHEN l_discount > 0.05 THEN l_extendedprice * l_discount ELSE 0.0 END
             AS discount_amount,
           IF(l_tax > 0.0, TRUE, FALSE) AS taxed
    FROM lineitem WHERE l_orderkey < 500
    """,
    category="scalar",
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
        .alias("qty_class"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias("return_kind"),
        F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice") * F.col("l_discount"))
        .otherwise(0.0)
        .alias("discount_amount"),
        (F.col("l_tax") > 0.0).alias("taxed"),
    )


@register(
    "scalar_array_funcs",
    oracle="""
    SELECT vec_id,
           LEN(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           ROUND(CAST(embedding[64] AS DOUBLE), 6) AS last_elem,
           LEN(LIST_FILTER(embedding, x -> x > 0)) AS positive_n
    FROM embeddings
    """,
    category="scalar",
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over the embedding column (ArrayType(FloatType)).
    Element access is 1-based in both engines (element_at / [])."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.round(F.element_at("embedding", 64).cast("double"), 6).alias("last_elem"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("positive_n"),
    )


@register(
    "scalar_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS prop_k,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events WHERE event_id < 1000
    """,
    category="scalar",
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select(
        "event_id",
        k.alias("prop_k"),
        (k % 10).alias("k_mod"),
    )


@register(
    "scalar_string_extras",
    oracle="""
    SELECT p_partkey,
           REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
           REVERSE(p_brand) AS brand_rev,
           LEFT(p_name, 6) AS name_left,
           RIGHT(p_type, 4) AS type_right,
           TRANSLATE(p_brand, '#', '-') AS brand_dash,
           REPEAT('*', p_size % 5) AS stars,
           POSITION('a' IN p_name) AS first_a
    FROM part WHERE p_partkey < 400
    """,
    category="scalar",
)
def scalar_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function batch: regexp_extract, reverse,
    left/right, translate, repeat, position."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 400)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.reverse("p_brand").alias("brand_rev"),
        F.substring("p_name", 1, 6).alias("name_left"),
        F.expr("right(p_type, 4)").alias("type_right"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("stars"),
        F.instr("p_name", "a").alias("first_a"),
    )


@register(
    "scalar_array_extras",
    oracle="""
    WITH t AS (
      SELECT vec_id, embedding[1:8] AS v8 FROM embeddings WHERE vec_id < 100)
    SELECT vec_id,
           LEN(v8) AS n,
           ROUND(CAST(LIST_SORT(LIST_TRANSFORM(v8, x -> ROUND(CAST(x AS DOUBLE), 4)))[1] AS DOUBLE), 4) AS min_r4,
           ROUND(CAST(LIST_SORT(LIST_TRANSFORM(v8, x -> ROUND(CAST(x AS DOUBLE), 4)))[8] AS DOUBLE), 4) AS max_r4,
           LIST_POSITION(LIST_TRANSFORM(v8, x -> x > 0), TRUE) AS first_pos_idx,
           LEN(FLATTEN([v8, v8])) AS doubled_len
    FROM t
    """,
    category="scalar",
)
def scalar_array_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second array-function batch: slice, sort_array, array_position,
    flatten — over the embedding vectors (rounded to kill float-repr
    noise in the sort comparison)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    v8 = F.slice("embedding", 1, 8)
    r4 = F.transform(v8, lambda x: F.round(x.cast("double"), 4))
    return e.select(
        "vec_id",
        F.size(v8).alias("n"),
        F.round(F.element_at(F.sort_array(r4), 1), 4).alias("min_r4"),
        F.round(F.element_at(F.sort_array(r4), 8), 4).alias("max_r4"),
        F.array_position(
            F.transform(v8, lambda x: x > 0), True
        ).alias("first_pos_idx"),
        F.size(F.flatten(F.array(v8, v8))).alias("doubled_len"),
    )


@register(
    "scalar_variant_funcs",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_typed,
           JSON_STRUCTURE(props) = '{"k":"UBIGINT"}' AS is_int_object
    FROM events WHERE event_id < 500
    """,
    category="scalar",
)
def scalar_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4): the
    JSON string parses ONCE into the binary variant encoding, then
    typed path access (``variant_get``) reads it without re-parsing —
    at 100 TB the difference between parse-per-access
    (``get_json_object`` re-parses the string for every extraction)
    and parse-once-read-many. ``schema_of_variant`` gives the typed
    shape the parser inferred; the oracle checks the same facts
    through DuckDB's JSON type (`json_structure`)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_typed"),
        (F.schema_of_variant(v) == F.lit("OBJECT<k: BIGINT>")).alias(
            "is_int_object"
        ),
    )


@register(
    "scalar_try_funcs",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0 THEN NULL
                ELSE n_chars / CAST(doc_id % 5 AS DOUBLE) END
             AS chars_per_bucket,
           TRY_CAST(SUBSTR(text, 1, 3) AS BIGINT) AS first3_as_int,
           (STRING_SPLIT(text, ' '))[60] AS token60
    FROM documents
    """,
    category="scalar",
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: Spark 4 runs with ANSI mode ON by
    default, where division by zero, bad casts, and out-of-range
    element access THROW — the ``try_*`` family is the production
    idiom that degrades them to NULL instead, per row, without
    disabling ANSI for the whole job. try_divide (zero denominators),
    try_cast (non-numeric strings), try_element_at (index past the
    array end) each produce NULLs the oracle reproduces with DuckDB's
    native NULL-on-failure semantics."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.try_divide(
            F.col("n_chars").cast("double"),
            (F.col("doc_id") % 5).cast("double"),
        ).alias("chars_per_bucket"),
        F.substring("text", 1, 3).try_cast("bigint").alias(
            "first3_as_int"
        ),
        F.try_element_at(F.split("text", " "), F.lit(60)).alias("token60"),
    )
