"""Multimodal column plumbing (north-star extension).

Images/audio/video ride through the lake as opaque ``binary`` columns
with typed metadata structs. The Spark-side plumbing — schema, batch
shape, partitioning, Arrow transfer — is real and tested; the actual
codec calls (image decode, resampling) are stubbed behind a
deterministic fake because the media libraries aren't in this
container (marked STUB below). Swapping the fake for PIL/librosa is a
one-function change; nothing in the plan moves.

The corpus has no binary table, so ``multimodal_manifest`` synthesizes
payloads from ``documents.text`` (utf-8 bytes) — which also makes the
byte-level plumbing oracle-checkable (DuckDB ENCODE/SHA256 agree).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_by_example_spark.plans.registry import register
from iceberg_by_example_spark.sources.tpch import load_table


@register(
    "multimodal_manifest",
    oracle="""
    SELECT doc_id,
           OCTET_LENGTH(ENCODE(text)) AS payload_bytes,
           SHA256(text) AS payload_sha256,
           CASE WHEN OCTET_LENGTH(ENCODE(text)) < 200 THEN 'thumb'
                WHEN OCTET_LENGTH(ENCODE(text)) < 400 THEN 'standard'
                ELSE 'large' END AS size_class
    FROM documents
    """,
    category="multimodal",
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload manifest: byte length, content digest, size
    bucketing — the asset-catalog query every multimodal pipeline runs
    before a decode fan-out. Payload = utf-8 bytes of text (stand-in
    for image bytes); all expressions JVM-side."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("payload_bytes"),
        F.sha2("text", 256).alias("payload_sha256"),
        F.when(F.octet_length(payload) < 200, "thumb")
        .when(F.octet_length(payload) < 400, "standard")
        .otherwise("large")
        .alias("size_class"),
    )


# --- decode / feature-extract fan-out (Arrow-batched Pandas path) ----------

DECODED_SCHEMA = (
    "doc_id long, payload_bytes int, width int, height int, channels int, "
    "mean_intensity double"
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, int, float]:
    """STUB: a real build calls PIL.Image.open(BytesIO(payload)) here.

    Deterministic fake derived from the payload so tests have stable
    expectations: dimensions from the byte length, "mean intensity"
    from a byte checksum.
    """
    n = len(payload)
    width = 64 + (n % 64)
    height = 64 + ((n // 64) % 64)
    channels = 3
    mean_intensity = (sum(payload[:256]) % 2551) / 10.0
    return width, height, channels, mean_intensity


def decode_binary_batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode each Arrow batch of (doc_id, payload).

    This is the real 100 TB shape: Arrow moves columnar batches across
    the Python boundary once per ~10k rows (not per row); each executor
    decodes its partition's batches independently; the output schema is
    fixed so the optimizer can prune downstream.
    """
    for pdf in pdfs:
        decoded = [_decode_image_stub(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload_bytes": [len(p) for p in pdf["payload"]],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "channels": [d[2] for d in decoded],
                "mean_intensity": [d[3] for d in decoded],
            }
        )


@register(
    "multimodal_decode_stats",
    oracle=None,  # stubbed decoder is engine-internal; invariants in pytest
    category="multimodal",
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode fan-out + feature aggregation: binary payloads →
    mapInPandas decode (Arrow batches) → per-size-class stats. The
    plumbing (schema, batch iteration, partition parallelism) is what
    this operator demonstrates; the codec is the stub above."""
    d = load_table(spark, sf_dir, "documents")
    binary_df = d.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    decoded = binary_df.mapInPandas(decode_binary_batches, DECODED_SCHEMA)
    return (
        decoded.groupBy("channels")
        .agg(
            F.count("*").alias("n_assets"),
            F.min("width").alias("min_width"),
            F.max("width").alias("max_width"),
            F.min("height").alias("min_height"),
            F.max("height").alias("max_height"),
        )
    )
