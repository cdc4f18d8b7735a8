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


def _pil_image_module():
    """Capability probe, same pattern as the avro delete-format probe
    (versioned.py G7): return ``PIL.Image`` when Pillow is importable,
    else None. Resolved at import time on each process — driver and
    executors probe their own environment, so a mixed cluster degrades
    per-worker instead of failing."""
    try:
        from PIL import Image  # noqa: PLC0415 — probe must be lazy

        return Image
    except ImportError:
        return None


_PIL = _pil_image_module()


def _decode_image_stub(payload: bytes) -> tuple[int, int, int, float]:
    """STUB decode: deterministic fake derived from the payload so
    tests have stable expectations — dimensions from the byte length,
    "mean intensity" from a byte checksum. Used when Pillow is absent
    (this container) or the payload isn't a decodable image (the
    registered queries feed utf-8 text bytes, so graded results are
    stub-deterministic even on a Pillow-equipped cluster)."""
    n = len(payload)
    width = 64 + (n % 64)
    height = 64 + ((n // 64) % 64)
    channels = 3
    mean_intensity = (sum(payload[:256]) % 2551) / 10.0
    return width, height, channels, mean_intensity


def _decode_image(payload: bytes) -> tuple[int, int, int, float]:
    """Decode one payload: real codec when the probe found Pillow AND
    the bytes are a decodable image; the deterministic stub otherwise.
    The (width, height, channels, mean_intensity) contract — and hence
    the Spark-side schema and plan — is identical on both paths."""
    if _PIL is not None:
        import io

        try:
            img = _PIL.open(io.BytesIO(payload))
            img.load()
        except Exception:
            return _decode_image_stub(payload)
        import numpy as np

        arr = np.asarray(img, dtype=np.float64)
        channels = arr.shape[2] if arr.ndim == 3 else 1
        return (
            int(img.size[0]),
            int(img.size[1]),
            int(channels),
            float(arr.mean()),
        )
    return _decode_image_stub(payload)


def decode_binary_batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode each Arrow batch of (doc_id, payload).

    This is the real 100 TB shape: Arrow moves columnar batches across
    the Python boundary once per ~10k rows (not per row); each executor
    decodes its partition's batches independently; the output schema is
    fixed so the optimizer can prune downstream.
    """
    for pdf in pdfs:
        decoded = [_decode_image(p) for p in pdf["payload"]]
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


RESIZED_SCHEMA = "doc_id long, width int, height int, scale double"


def resize_metadata_batches(
    pdfs: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """STUB resize: a real build decodes and resamples pixels here
    (PIL ``Image.resize``). The metadata transform — fit the longer
    side to 224 preserving aspect — is the real logic and is what
    downstream partitioning/batching depends on."""
    target = 224
    for pdf in pdfs:
        longer = pdf[["width", "height"]].max(axis=1)
        scale = target / longer
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": (pdf["width"] * scale).round().astype("int32"),
                "height": (pdf["height"] * scale).round().astype("int32"),
                "scale": scale,
            }
        )


FRAMES_SCHEMA = "doc_id long, frame_no int, frame_offset_bytes long"


def frame_sample_batches(
    pdfs: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """STUB frame sampler: a real build demuxes video here (pyav).
    One input row fans out to N frame rows — the row-explosion shape —
    sampling every ~256 bytes of payload as a stand-in for every Nth
    frame. Deterministic from the payload length."""
    stride = 256
    for pdf in pdfs:
        out_ids, out_nos, out_offs = [], [], []
        for doc_id, n in zip(pdf["doc_id"], pdf["payload_bytes"]):
            for i, off in enumerate(range(0, int(n), stride)):
                out_ids.append(doc_id)
                out_nos.append(i)
                out_offs.append(off)
        yield pd.DataFrame(
            {
                "doc_id": out_ids,
                "frame_no": out_nos,
                "frame_offset_bytes": out_offs,
            }
        )


@register(
    "multimodal_resize",
    oracle=None,  # stub codec; metadata math checked in pytest
    category="multimodal",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize fan-out: decode dims → aspect-preserving resize-to-224
    metadata (stub pixels). Chains two mapInPandas stages — the
    multi-step media pipeline shape."""
    d = load_table(spark, sf_dir, "documents")
    binary_df = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    decoded = binary_df.mapInPandas(decode_binary_batches, DECODED_SCHEMA)
    resized = decoded.mapInPandas(resize_metadata_batches, RESIZED_SCHEMA)
    return resized.select(
        "doc_id", "width", "height", F.round("scale", 6).alias("scale")
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS n FROM documents)
    SELECT doc_id,
           CAST(i AS INT) AS frame_no,
           CAST(i * 256 AS BIGINT) AS frame_offset_bytes
    FROM f, LATERAL (SELECT UNNEST(GENERATE_SERIES(0, CAST(CEIL(n / 256.0) AS BIGINT) - 1)) AS i)
    """,
    category="multimodal",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one asset row → N frame rows (every 256-byte
    stride stands in for every Nth video frame). The fan-out runs in
    mapInPandas; the oracle reproduces the arithmetic with a lateral
    series — so even the stubbed sampler is hash-verified."""
    d = load_table(spark, sf_dir, "documents")
    binary_df = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    with_len = binary_df.select(
        "doc_id", F.octet_length("payload").alias("payload_bytes")
    )
    return with_len.mapInPandas(frame_sample_batches, FRAMES_SCHEMA)


@register(
    "multimodal_decode_stats",
    oracle=None,  # stubbed decoder is engine-internal; invariants in pytest
    category="multimodal",
    bench=True,
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


# ---------------------------------------------------------------------------
# binaryFile source: raw-asset ingest (the step BEFORE any decode)
# ---------------------------------------------------------------------------

# A deterministic on-disk blob corpus, generated at import time so BOTH
# engines (Spark's binaryFile source and DuckDB's read_blob oracle) see
# identical files no matter which grades first — the registry module
# import always precedes any query or oracle run. Payloads are ASCII
# (md5-hex chains) because DuckDB's BLOB→VARCHAR cast is the identity
# only for printable bytes; real media bytes would hash differently in
# the oracle, not in Spark. 40 files ≈ 10 KB total.
BINARY_CORPUS_DIR = "/tmp/iceberg_by_example_binary_corpus"
_BINARY_CORPUS_N = 40


def _ensure_binary_corpus() -> str:
    import hashlib
    import os

    os.makedirs(BINARY_CORPUS_DIR, exist_ok=True)
    for i in range(_BINARY_CORPUS_N):
        path = os.path.join(BINARY_CORPUS_DIR, f"blob_{i:03d}.bin")
        if os.path.exists(path):
            continue
        h = hashlib.md5(f"blob:{i}".encode()).hexdigest()
        payload = (h * (1 + i % 8)).encode("ascii")  # 32..256 bytes
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)  # atomic: concurrent imports never race
    return BINARY_CORPUS_DIR


_ensure_binary_corpus()


@register(
    "multimodal_binary_ingest",
    oracle=f"""
    SELECT REGEXP_EXTRACT(filename, '([^/]+)$', 1) AS asset,
           CAST(size AS BIGINT) AS n_bytes,
           MD5(content::VARCHAR) AS checksum
    FROM read_blob('{BINARY_CORPUS_DIR}/*.bin')
    """,
    category="multimodal",
)
def multimodal_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-asset ingest via Spark's ``binaryFile`` source — the step
    every multimodal pipeline runs BEFORE any decode: a directory of
    media files becomes (path, length, content) rows with no Python in
    the loop, ready for the ``mapInPandas`` decode fan-out above.
    Emits (asset, n_bytes, checksum) so the oracle verifies the
    CONTENT actually read, not just the listing.

    Scale shape: binaryFile is a standard FileScan — files partition
    across executors, `pathGlobFilter`/`recursiveFileLookup` prune at
    listing time, and content bytes never touch the driver. (The demo
    corpus is import-time-deterministic; see ``_ensure_binary_corpus``
    for why the payloads are ASCII.)"""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(BINARY_CORPUS_DIR)
    )
    return df.select(
        F.regexp_extract("path", r"([^/]+)$", 1).alias("asset"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("checksum"),
    )
