"""UDF / UDAF / UDTF registration surface (gap §2.13).

Demonstrates every user-function extension point PySpark offers, with
the performance ladder made explicit:

1. built-in column expressions — always first choice (everything else
   in this repo);
2. ``pandas_udf`` — Arrow-batched, vectorized, the acceptable Python
   path (used here);
3. ``applyInPandas`` — grouped-map UDAF shape;
4. row-at-a-time ``udf`` / Python UDTF — API completeness only; kept
   off the bench path deliberately (10-100x slower than built-ins).

Each query still carries a DuckDB oracle: the UDFs compute
deterministic integer/string results, so registration mechanics — not
float luck — are what's under test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf
from pyspark.sql.types import IntegerType, StringType

from iceberg_by_example_spark.plans.registry import register
from iceberg_by_example_spark.sources.tpch import load_table


@pandas_udf(IntegerType())
def pandas_token_count(texts: pd.Series) -> pd.Series:
    """Vectorized token counter — one Arrow batch per call."""
    return texts.str.split(" ").str.len().astype("int32")


@udf(StringType())
def py_brand_code(brand: str) -> str:
    """Row-at-a-time UDF (API demo; the slow path by design)."""
    return brand.replace("Brand#", "B-") if brand else None


@register(
    "udf_pandas_vectorized",
    oracle="""
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' ')) AS udf_tokens,
           LEN(STRING_SPLIT(text, ' ')) * 2 AS udf_tokens_doubled
    FROM documents
    """,
    category="udf",
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas_udf (Arrow-vectorized) token count, checked against the
    pure-SQL equivalent."""
    d = load_table(spark, sf_dir, "documents")
    tok = pandas_token_count(F.col("text"))
    return d.select(
        "doc_id",
        tok.alias("udf_tokens"),
        (tok * 2).alias("udf_tokens_doubled"),
    )


@register(
    "udf_row_and_sql_registration",
    oracle="""
    SELECT p_partkey,
           REPLACE(p_brand, 'Brand#', 'B-') AS brand_code
    FROM part WHERE p_partkey < 200
    """,
    category="udf",
)
def udf_row_and_sql_registration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time UDF + spark.udf.register for SQL call sites —
    registration mechanics, deliberately on a small slice."""
    spark.udf.register("brand_code_sql", py_brand_code)
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_udf_view")
    return spark.sql(
        """
        SELECT p_partkey, brand_code_sql(p_brand) AS brand_code
        FROM part_udf_view WHERE p_partkey < 200
        """
    )


def _center_on_min(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map UDAF shape: per-group transform with full-group
    visibility. Subtraction against the group min is exact in doubles
    (no accumulation), keeping the oracle comparison deterministic."""
    out = pdf[["o_orderkey", "o_orderpriority", "o_totalprice"]].copy()
    out["price_over_group_min"] = pdf["o_totalprice"] - pdf["o_totalprice"].min()
    return out


@register(
    "udaf_apply_in_pandas",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           o_totalprice - MIN(o_totalprice) OVER (PARTITION BY o_orderpriority)
             AS price_over_group_min
    FROM orders WHERE o_orderkey < 3000
    """,
    category="udf",
)
def udaf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: each priority group arrives as one
    pandas frame (Arrow), is transformed with group-level context, and
    returns with a declared schema. The distributed shape: one shuffle
    on the group key, groups processed independently."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    return o.groupBy("o_orderpriority").applyInPandas(
        _center_on_min,
        schema=(
            "o_orderkey long, o_orderpriority string, o_totalprice double, "
            "price_over_group_min double"
        ),
    )


@register(
    "udtf_tokenize",
    oracle="""
    SELECT doc_id, tok AS token, pos
    FROM (
      SELECT doc_id,
             UNNEST(STRING_SPLIT(text, ' ')) AS tok,
             GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS pos
      FROM documents WHERE doc_id < 20)
    """,
    category="udf",
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row → N token rows with
    positions. API-completeness demo on a small slice; the vectorized
    equivalent is ``posexplode(split(...))``, which is what the oracle
    and any hot path should use."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string, pos int")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield doc_id, tok, i + 1

    spark.udtf.register("tokenize_udtf", Tokenize)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("docs_udtf_view")
    return spark.sql(
        """
        SELECT t.doc_id, t.token, t.pos
        FROM docs_udtf_view d,
             LATERAL tokenize_udtf(d.doc_id, d.text) t
        """
    )


@register(
    "scalar_map_struct",
    oracle="""
    SELECT p_partkey,
           MAP{'brand': p_brand, 'type': p_type}['brand'][1] AS from_map,
           {'size': p_size, 'price': p_retailprice}.size AS from_struct,
           STRUCT_PACK(brand := p_brand, size := p_size).brand AS struct_brand
    FROM part WHERE p_partkey < 300
    """,
    category="scalar",
)
def scalar_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map and struct construction + field extraction (gap §2.13;
    reference F4 only builds a map literal as a CALL argument)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    s = F.struct(
        F.col("p_size").alias("size"), F.col("p_retailprice").alias("price")
    )
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("from_map"),
        s.getField("size").alias("from_struct"),
        F.struct(
            F.col("p_brand").alias("brand"), F.col("p_size").alias("size")
        )
        .getField("brand")
        .alias("struct_brand"),
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT doc_id, LENGTH(text) AS n_chars,
           LEN(STRING_SPLIT(text, ' ')) AS n_tokens
    FROM documents
    """,
    category="udf",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the zero-copy end of the Python interop ladder —
    batches arrive as Arrow RecordBatches and results return as Arrow,
    skipping even the pandas conversion ``mapInPandas`` pays. For
    byte-shoveling transforms (feature extraction, tokenizer calls,
    codec work) this is the cheapest possible Python hop; the
    computation here (char/token counts via pyarrow.compute) is
    deliberately SQL-expressible so the whole path oracle-checks."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = load_table(spark, sf_dir, "documents")

    def stats(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int32()),
                    pc.cast(
                        pc.list_value_length(
                            pc.split_pattern(text, pattern=" ")
                        ),
                        pa.int32(),
                    ),
                ],
                names=["doc_id", "n_chars", "n_tokens"],
            )

    return d.select("doc_id", "text").mapInArrow(
        stats, "doc_id long, n_chars int, n_tokens int"
    )
