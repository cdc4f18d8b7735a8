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


def _decode_bmp_pixels(payload: bytes):
    """REAL codec, no media library needed: parse an uncompressed
    24-bit bottom-up BMP (BITMAPINFOHEADER) with struct + numpy and
    return the (h, w, 3) top-down RGB uint8 array, or None when the
    bytes aren't that format. Uncompressed BMP is a 54-byte header
    plus raw BGR rows padded to 4 bytes — fully decodable
    in-container, which is what makes the ``*_real`` queries genuine
    bytes→pixels pipelines rather than stubs (compressed formats
    still route through the Pillow probe)."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0 or h <= 0:
        return None
    row_bytes = (w * 3 + 3) & ~3
    if len(payload) < data_off + row_bytes * h:
        return None
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)[:, : w * 3]
    # bottom-up BGR storage → top-down RGB array
    return np.ascontiguousarray(rows.reshape(h, w, 3)[::-1, :, ::-1])


def _decode_bmp(payload: bytes):
    """(width, height, channels, mean_intensity) from a BMP payload,
    or None. Mean is an exact integer sum → one double division —
    bit-identical to the generator's independent computation."""
    arr = _decode_bmp_pixels(payload)
    if arr is None:
        return None
    h, w, _ = arr.shape
    mean = float(int(arr.sum(dtype="uint64"))) / (w * h * 3)
    return w, h, 3, mean


def _decode_image(payload: bytes) -> tuple[int, int, int, float]:
    """Decode one payload: Pillow when the probe found it and the
    bytes decode; else the in-container BMP codec for uncompressed
    BMPs; else the deterministic stub. The (width, height, channels,
    mean_intensity) contract — and hence the Spark-side schema and
    plan — is identical on every path."""
    if _PIL is not None:
        import io

        try:
            img = _PIL.open(io.BytesIO(payload))
            img.load()
        except Exception:
            img = None
        if img is not None:
            import numpy as np

            arr = np.asarray(img, dtype=np.float64)
            channels = arr.shape[2] if arr.ndim == 3 else 1
            return (
                int(img.size[0]),
                int(img.size[1]),
                int(channels),
                float(arr.mean()),
            )
    bmp = _decode_bmp(payload)
    if bmp is not None:
        return bmp
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
    (PIL ``Image.resize``; ``multimodal_resize_real`` below does it
    genuinely for BMPs). The metadata transform — fit the longer side
    to 224 preserving aspect — is the real logic and is what
    downstream partitioning/batching depends on. Rounding is
    HALF-UP via floor(x+0.5): pandas ``.round()`` is half-to-EVEN,
    which no portable SQL ROUND reproduces — half-up is what the
    oracle can state as ``FLOOR(x + 0.5)`` in both engines."""
    import numpy as np

    target = 224
    for pdf in pdfs:
        longer = pdf[["width", "height"]].max(axis=1)
        scale = target / longer
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": np.floor(pdf["width"] * scale + 0.5).astype("int32"),
                "height": np.floor(pdf["height"] * scale + 0.5).astype("int32"),
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
    # The stub decoder's dims are pure functions of the payload byte
    # length, so the WHOLE two-stage mapInPandas chain is
    # hash-verifiable: the oracle restates stub-decode + aspect-fit
    # arithmetic over OCTET_LENGTH — a green row proves every document
    # crossed both Arrow fan-outs exactly once with the right values
    # (the same trick multimodal_frame_sample already uses).
    oracle="""
    WITH f AS (
      SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS n FROM documents),
    dims AS (
      SELECT doc_id,
             64 + (n % 64) AS w0,
             64 + ((n // 64) % 64) AS h0
      FROM f),
    s AS (
      SELECT doc_id, w0, h0,
             224.0 / GREATEST(w0, h0) AS scale
      FROM dims)
    SELECT doc_id,
           CAST(FLOOR(w0 * scale + 0.5) AS INT) AS width,
           CAST(FLOOR(h0 * scale + 0.5) AS INT) AS height,
           ROUND(scale, 6) AS scale
    FROM s
    """,
    category="multimodal",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize fan-out: decode dims → aspect-preserving resize-to-224
    metadata (stub pixels; ``multimodal_resize_real`` resamples real
    BMP pixels). Chains two mapInPandas stages — the multi-step media
    pipeline shape."""
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
    # Same OCTET_LENGTH trick as multimodal_resize: the stub dims are
    # functions of byte length, so the decode fan-out + aggregation
    # hash-verifies end-to-end (text payloads stub-decode even on a
    # Pillow-equipped cluster — see _decode_image_stub).
    oracle="""
    WITH f AS (SELECT OCTET_LENGTH(ENCODE(text)) AS n FROM documents)
    SELECT CAST(3 AS INT) AS channels,
           COUNT(*) AS n_assets,
           CAST(MIN(64 + (n % 64)) AS INT) AS min_width,
           CAST(MAX(64 + (n % 64)) AS INT) AS max_width,
           CAST(MIN(64 + ((n // 64) % 64)) AS INT) AS min_height,
           CAST(MAX(64 + ((n // 64) % 64)) AS INT) AS max_height
    FROM f
    """,
    category="multimodal",
    bench=True,
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode fan-out + feature aggregation: binary payloads →
    mapInPandas decode (Arrow batches) → per-size-class stats. The
    plumbing (schema, batch iteration, partition parallelism) is what
    this operator demonstrates; the codec is the stub above
    (``multimodal_decode_real`` exercises the genuine BMP path)."""
    d = load_table(spark, sf_dir, "documents")
    # r19 note: a repartition before the Python stage (fan the decode
    # across every core's worker) was prototyped and measured SLOWER
    # at this scale (noop floor 0.27s -> 0.54s): the stub decode is
    # cheap enough that shuffling the payloads and paying 32 Arrow
    # batch round-trips costs more than the single warm worker. A
    # deployment decoding real media (CPU-heavy per byte) re-makes
    # that call with its own measurement — the plan point is that
    # parallelism here is ONE repartition away, not a rewrite.
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


def _ensure_corpus_file(path: str, payload: bytes) -> None:
    """Write ``payload`` to ``path`` (atomic tmp+rename, so concurrent
    imports never race) unless the file already holds exactly those
    bytes. Existence alone is not enough: an edit to a generator or
    encoder would otherwise leave a stale /tmp file that no longer
    matches the freshly recomputed oracle literals, producing
    confusing false-red grading rows. Byte-comparing the tiny corpus
    files at import is cheaper than any versioning scheme and can
    never drift from it."""
    import os

    if os.path.exists(path):
        with open(path, "rb") as f:
            if f.read() == payload:
                return
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def _ensure_binary_corpus() -> str:
    import hashlib
    import os

    os.makedirs(BINARY_CORPUS_DIR, exist_ok=True)
    for i in range(_BINARY_CORPUS_N):
        h = hashlib.md5(f"blob:{i}".encode()).hexdigest()
        payload = (h * (1 + i % 8)).encode("ascii")  # 32..256 bytes
        _ensure_corpus_file(
            os.path.join(BINARY_CORPUS_DIR, f"blob_{i:03d}.bin"), payload
        )
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


# ---------------------------------------------------------------------------
# REAL image decode: deterministic BMP corpus → binaryFile → mapInPandas
# ---------------------------------------------------------------------------

# Same import-time-deterministic-corpus pattern as the blob corpus
# above, but the files are REAL uncompressed 24-bit BMPs whose pixels
# come from a fixed arithmetic pattern (no RNG): image i is
# (24+4i) × (32+8i), pixel[r,c,ch] = (3r + 5c + 7ch + 11i) mod 256.
# The oracle states each file's decoded stats as literals computed at
# import from the SAME pixel arrays by an independent path (direct
# array arithmetic, no BMP round-trip) — so the driver row verifies
# the full bytes → header parse → pixel array → stats decode chain.
IMAGE_CORPUS_DIR = "/tmp/iceberg_by_example_image_corpus"
_IMAGE_CORPUS_N = 12


def _encode_bmp(arr) -> bytes:
    """Minimal uncompressed 24-bit bottom-up BMP encoder for an
    (h, w, 3) uint8 array (RGB in-memory; rows stored BGR, which
    doesn't move the mean the query verifies)."""
    import struct

    import numpy as np

    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 0, 0, 0, 0)
    rows = bytearray()
    bgr = arr[:, :, ::-1]
    pad = b"\x00" * (row_bytes - w * 3)
    for r in range(h - 1, -1, -1):  # bottom-up storage
        rows += bgr[r].astype(np.uint8).tobytes() + pad
    return header + info + bytes(rows)


def _image_pixels(i: int):
    """The fixed per-image pixel pattern (see the block comment)."""
    import numpy as np

    h, w = 24 + 4 * i, 32 + 8 * i
    r = np.arange(h, dtype=np.uint32)[:, None, None]
    c = np.arange(w, dtype=np.uint32)[None, :, None]
    ch = np.arange(3, dtype=np.uint32)[None, None, :]
    return ((3 * r + 5 * c + 7 * ch + 11 * i) % 256).astype("uint8")


def _image_expected() -> list[tuple[str, int, int, int, float]]:
    """(asset, width, height, channels, mean) per corpus image,
    computed straight from the arrays — the decoder never runs here."""
    rows = []
    for i in range(_IMAGE_CORPUS_N):
        arr = _image_pixels(i)
        h, w, _ = arr.shape
        mean = float(int(arr.sum(dtype="uint64"))) / (w * h * 3)
        rows.append((f"img_{i:03d}.bmp", w, h, 3, round(mean, 4)))
    return rows


def _ensure_image_corpus() -> str:
    import os

    os.makedirs(IMAGE_CORPUS_DIR, exist_ok=True)
    for i in range(_IMAGE_CORPUS_N):
        _ensure_corpus_file(
            os.path.join(IMAGE_CORPUS_DIR, f"img_{i:03d}.bmp"),
            _encode_bmp(_image_pixels(i)),
        )
    return IMAGE_CORPUS_DIR


_ensure_image_corpus()

DECODE_REAL_SCHEMA = (
    "asset string, width int, height int, channels int, mean_intensity double"
)


def decode_bmp_batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for the REAL decode path: every payload MUST
    parse as BMP — a silent stub fallback here would let a codec
    regression grade green, so a non-BMP payload raises instead."""
    for pdf in pdfs:
        decoded = []
        for asset, payload in zip(pdf["asset"], pdf["payload"]):
            d = _decode_bmp(bytes(payload))
            if d is None:
                raise ValueError(f"{asset}: not an uncompressed 24-bit BMP")
            decoded.append(d)
        yield pd.DataFrame(
            {
                "asset": pdf["asset"],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "channels": [d[2] for d in decoded],
                "mean_intensity": [round(d[3], 4) for d in decoded],
            }
        )


@register(
    "multimodal_decode_real",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(
        f"('{a}', {w}, {h}, {c}, CAST({m!r} AS DOUBLE))"
        for a, w, h, c, m in _image_expected()
    )
    + ") AS t(asset, width, height, channels, mean_intensity)",
    category="multimodal",
)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end, no media library: binaryFile scan
    of the deterministic BMP corpus → Arrow-batched ``mapInPandas`` →
    header parse + pixel-array stats per file (``_decode_bmp``). The
    oracle is the independent pixel-arithmetic expectation, so a
    driver-green row certifies actual bytes→pixels decoding — the
    capability multimodal_decode_stats demonstrates the PLUMBING of
    with its probe-gated codec.

    Scale shape: identical to any decode fan-out — files partition
    across executors, one Python crossing per Arrow batch, fixed
    output schema for downstream pruning; swap the codec per format."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp")
        .load(IMAGE_CORPUS_DIR)
        .select(
            F.regexp_extract("path", r"([^/]+)$", 1).alias("asset"),
            F.col("content").alias("payload"),
        )
    )
    decoded = df.mapInPandas(decode_bmp_batches, DECODE_REAL_SCHEMA)
    return decoded.select(
        "asset", "width", "height", "channels", "mean_intensity"
    )


# --- real pixel resample over the same corpus ------------------------------

THUMB = 16  # fixed thumbnail edge; nearest-neighbor index selection


def _nn_thumbnail(arr):
    """Nearest-neighbor THUMB×THUMB resample of an (h, w, 3) array:
    out[r, c] = src[floor(r·h/T), floor(c·w/T)] — pure integer index
    selection, so the result is bit-exact and engine-independent
    (interpolating resamplers are float-rounding-dependent; the
    nearest-neighbor kernel is the one you can hash-verify)."""
    h, w, _ = arr.shape
    rows = [(r * h) // THUMB for r in range(THUMB)]
    cols = [(c * w) // THUMB for c in range(THUMB)]
    return arr[rows][:, cols]


def _resize_expected() -> list[tuple[str, int, int, str, float]]:
    """(asset, out_w, out_h, thumb_md5, thumb_mean) computed from the
    generator's pixel arrays directly — the BMP encoder/decoder and
    the Spark path never run here."""
    import hashlib

    rows = []
    for i in range(_IMAGE_CORPUS_N):
        thumb = _nn_thumbnail(_image_pixels(i))
        mean = float(int(thumb.sum(dtype="uint64"))) / thumb.size
        rows.append(
            (
                f"img_{i:03d}.bmp",
                THUMB,
                THUMB,
                hashlib.md5(thumb.tobytes()).hexdigest(),
                round(mean, 4),
            )
        )
    return rows


RESIZE_REAL_SCHEMA = (
    "asset string, out_w int, out_h int, thumb_md5 string, thumb_mean double"
)


def resize_bmp_batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode BMP → nearest-neighbor thumbnail →
    md5 of the exact resampled pixel bytes + mean. Raises on non-BMP
    payloads (same no-silent-fallback stance as the decode worker)."""
    import hashlib

    import numpy as np

    for pdf in pdfs:
        out = {k: [] for k in ("asset", "out_w", "out_h", "thumb_md5", "thumb_mean")}
        for asset, payload in zip(pdf["asset"], pdf["payload"]):
            arr = _decode_bmp_pixels(bytes(payload))
            if arr is None:
                raise ValueError(f"{asset}: not an uncompressed 24-bit BMP")
            thumb = _nn_thumbnail(arr)
            mean = float(int(thumb.sum(dtype="uint64"))) / thumb.size
            out["asset"].append(asset)
            out["out_w"].append(THUMB)
            out["out_h"].append(THUMB)
            out["thumb_md5"].append(
                hashlib.md5(np.ascontiguousarray(thumb).tobytes()).hexdigest()
            )
            out["thumb_mean"].append(round(mean, 4))
        yield pd.DataFrame(out)


@register(
    "multimodal_resize_real",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(
        f"('{a}', {w}, {h}, '{m5}', CAST({mn!r} AS DOUBLE))"
        for a, w, h, m5, mn in _resize_expected()
    )
    + ") AS t(asset, out_w, out_h, thumb_md5, thumb_mean)",
    category="multimodal",
)
def multimodal_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel resampling end-to-end: BMP corpus → decode → exact
    nearest-neighbor 16×16 thumbnail → md5 OF THE RESAMPLED PIXEL
    BYTES. The oracle's md5s come from the generator's arrays via an
    independent path, so a green row certifies every selected pixel —
    the strongest verifiable claim a resize can make (interpolating
    kernels can't be hash-pinned; they'd be mean-±ε checked instead).
    ``multimodal_resize`` keeps the metadata-only aspect-fit shape for
    the Pillow-gated path."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp")
        .load(IMAGE_CORPUS_DIR)
        .select(
            F.regexp_extract("path", r"([^/]+)$", 1).alias("asset"),
            F.col("content").alias("payload"),
        )
    )
    resized = df.mapInPandas(resize_bmp_batches, RESIZE_REAL_SCHEMA)
    return resized.select(
        "asset", "out_w", "out_h", "thumb_md5", "thumb_mean"
    )


# ---------------------------------------------------------------------------
# REAL audio decode: deterministic WAV (RIFF/PCM16) corpus
# ---------------------------------------------------------------------------

# The audio twin of the BMP path: canonical 44-byte RIFF header + raw
# little-endian int16 PCM — fully decodable with struct + numpy. Sample
# i of clip k is ((i·7919 + k·104729) mod 4001) − 2000 (primes keep the
# pattern aperiodic; no trig, no floats in generation).
AUDIO_CORPUS_DIR = "/tmp/iceberg_by_example_audio_corpus"
_AUDIO_CORPUS_N = 8
_AUDIO_RATE = 16_000


def _audio_samples(k: int):
    import numpy as np

    n = 1600 + 800 * k  # 0.1–0.45 s at 16 kHz
    i = np.arange(n, dtype=np.int64)
    return ((i * 7919 + k * 104729) % 4001 - 2000).astype("int16")


def _encode_wav(samples, rate: int = _AUDIO_RATE) -> bytes:
    """Canonical mono PCM16 WAV: RIFF/fmt/data chunks, no extensions."""
    import struct

    data = samples.tobytes()
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16
        )
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def _decode_wav(payload: bytes):
    """Parse mono PCM16 WAV; returns (rate, samples) or None. Walks
    the chunk list (a real reader can't assume fmt/data adjacency)."""
    import struct

    import numpy as np

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, rate, bits, channels = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = pos + 8
        if body + size > len(payload):
            # Truncated chunk: a declared size past the end of the
            # payload would make np.frombuffer(count=n) raise instead
            # of honoring the '(rate, samples) or None' contract (the
            # BMP decoder has the analogous len() bounds check).
            return None
        if cid == b"fmt ":
            if size < 16:
                return None
            fmt, channels, rate = struct.unpack_from("<HHI", payload, body)
            bits = struct.unpack_from("<H", payload, body + 14)[0]
            if fmt != 1:
                return None  # compressed
        elif cid == b"data":
            if rate is None or bits != 16 or channels != 1:
                return None
            n = size // 2
            samples = np.frombuffer(
                payload, dtype="<i2", count=n, offset=body
            )
            return rate, samples
        pos = body + size + (size & 1)  # chunks are word-aligned
    return None


def _audio_expected() -> list[tuple[str, int, float, float, int]]:
    """(asset, n_samples, duration_sec, rms, peak) from the generator's
    arrays directly — encoder/decoder never run here. RMS is computed
    exact-integer (Σs² ≤ n·2000² ≪ 2^63) then one sqrt, rounded 4."""
    import math

    rows = []
    for k in range(_AUDIO_CORPUS_N):
        s = _audio_samples(k).astype("int64")
        n = int(s.size)
        rms = math.sqrt(int((s * s).sum()) / n)
        rows.append(
            (
                f"clip_{k:03d}.wav",
                n,
                round(n / _AUDIO_RATE, 4),
                round(rms, 4),
                int(abs(s).max()),
            )
        )
    return rows


def _ensure_audio_corpus() -> str:
    import os

    os.makedirs(AUDIO_CORPUS_DIR, exist_ok=True)
    for k in range(_AUDIO_CORPUS_N):
        _ensure_corpus_file(
            os.path.join(AUDIO_CORPUS_DIR, f"clip_{k:03d}.wav"),
            _encode_wav(_audio_samples(k)),
        )
    return AUDIO_CORPUS_DIR


_ensure_audio_corpus()

AUDIO_REAL_SCHEMA = (
    "asset string, n_samples long, duration_sec double, rms double, peak int"
)


def audio_stats_batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: WAV → samples → level stats. Raises on
    undecodable payloads (no silent fallback)."""
    import math

    for pdf in pdfs:
        out = {k: [] for k in ("asset", "n_samples", "duration_sec", "rms", "peak")}
        for asset, payload in zip(pdf["asset"], pdf["payload"]):
            d = _decode_wav(bytes(payload))
            if d is None:
                raise ValueError(f"{asset}: not a mono PCM16 WAV")
            rate, s = d
            s64 = s.astype("int64")
            n = int(s64.size)
            out["asset"].append(asset)
            out["n_samples"].append(n)
            out["duration_sec"].append(round(n / rate, 4))
            out["rms"].append(round(math.sqrt(int((s64 * s64).sum()) / n), 4))
            out["peak"].append(int(abs(s64).max()))
        yield pd.DataFrame(out)


@register(
    "multimodal_audio_stats_real",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(
        f"('{a}', CAST({n} AS BIGINT), CAST({d!r} AS DOUBLE), "
        f"CAST({r!r} AS DOUBLE), {p})"
        for a, n, d, r, p in _audio_expected()
    )
    + ") AS t(asset, n_samples, duration_sec, rms, peak)",
    category="multimodal",
)
def multimodal_audio_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end, no media library: binaryFile scan
    of the deterministic WAV corpus → Arrow-batched ``mapInPandas`` →
    RIFF chunk walk → PCM sample array → duration / RMS / peak. The
    oracle is the generator-side expectation computed without the
    codec, so a green row certifies actual bytes→samples decoding —
    the audio twin of ``multimodal_decode_real`` (compressed audio
    would be probe-gated on librosa/soundfile, same as PIL)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .load(AUDIO_CORPUS_DIR)
        .select(
            F.regexp_extract("path", r"([^/]+)$", 1).alias("asset"),
            F.col("content").alias("payload"),
        )
    )
    stats = df.mapInPandas(audio_stats_batches, AUDIO_REAL_SCHEMA)
    return stats.select("asset", "n_samples", "duration_sec", "rms", "peak")


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup (dHash) over a planted near-dup corpus
# ---------------------------------------------------------------------------

# Image dedup is the multimodal twin of document dedup: training sets
# carry the same picture at many resolutions, and exact checksums
# (multimodal_binary_ingest) miss every one of them. dHash — the
# difference hash: grayscale → 8×9 nearest-neighbor thumbnail →
# 64 horizontal-gradient sign bits — is the standard cheap perceptual
# key (LAION-style pipelines bucket on it before any embedding pass).
#
# The corpus plants provable duplicates: PHASH_GROUPS base patterns,
# each emitted at PHASH_VARIANTS exact nearest-neighbor upscales.
# dHash downsamples by floor-index selection, and floor(floor(a/b)/c)
# = floor(a/(b·c)) makes the thumbnail of a k× NN upscale IDENTICAL
# to the thumbnail of its base — so within-group hashes match exactly
# by construction, while distinct base patterns differ. The oracle
# recomputes every hash from the generator's pixel arrays (no BMP
# round-trip), so a green row certifies bytes → pixels → grayscale →
# thumbnail → gradient bits end-to-end.
PHASH_CORPUS_DIR = "/tmp/iceberg_by_example_phash_corpus"
PHASH_GROUPS = 4
PHASH_VARIANTS = 3
_DHASH_ROWS, _DHASH_COLS = 8, 9  # 8 rows × (9-1) gradients = 64 bits


def _phash_base_pixels(g: int):
    """Base pattern for group g — same arithmetic family as the decode
    corpus but keyed on the group, so groups differ and variants
    within a group share one source of truth."""
    import numpy as np

    h, w = 24 + 4 * g, 32 + 8 * g
    r = np.arange(h, dtype=np.uint32)[:, None, None]
    c = np.arange(w, dtype=np.uint32)[None, :, None]
    ch = np.arange(3, dtype=np.uint32)[None, None, :]
    return ((3 * r + 5 * c + 7 * ch + 13 * g) % 256).astype("uint8")


def _phash_pixels(g: int, v: int):
    """Variant v of group g: exact (v+1)× nearest-neighbor upscale."""
    base = _phash_base_pixels(g)
    k = v + 1
    return base.repeat(k, axis=0).repeat(k, axis=1)


def _dhash_hex(arr) -> str:
    """64-bit dHash as 16 hex chars: integer grayscale
    (299R+587G+114B)//1000, floor-index 8×9 thumbnail, row-major
    horizontal-gradient bits (1 ⇔ left < right). Pure integer index
    selection and comparisons — bit-exact on any engine."""
    h, w, _ = arr.shape
    gray = (
        299 * arr[:, :, 0].astype("uint32")
        + 587 * arr[:, :, 1].astype("uint32")
        + 114 * arr[:, :, 2].astype("uint32")
    ) // 1000
    rows = [(r * h) // _DHASH_ROWS for r in range(_DHASH_ROWS)]
    cols = [(c * w) // _DHASH_COLS for c in range(_DHASH_COLS)]
    thumb = gray[rows][:, cols]
    bits = 0
    for r in range(_DHASH_ROWS):
        for c in range(_DHASH_COLS - 1):
            bits = (bits << 1) | int(thumb[r, c] < thumb[r, c + 1])
    return f"{bits:016x}"


def _phash_assets() -> list[tuple[str, int, int]]:
    return [
        (f"ph_{g}_{v}.bmp", g, v)
        for g in range(PHASH_GROUPS)
        for v in range(PHASH_VARIANTS)
    ]


def _phash_expected() -> list[tuple[str, str]]:
    """(asset, dhash) straight from the generator arrays — the BMP
    encoder/decoder never runs here."""
    return [
        (asset, _dhash_hex(_phash_pixels(g, v)))
        for asset, g, v in _phash_assets()
    ]


def _ensure_phash_corpus() -> str:
    import os

    os.makedirs(PHASH_CORPUS_DIR, exist_ok=True)
    for asset, g, v in _phash_assets():
        _ensure_corpus_file(
            os.path.join(PHASH_CORPUS_DIR, asset),
            _encode_bmp(_phash_pixels(g, v)),
        )
    return PHASH_CORPUS_DIR


_ensure_phash_corpus()

PHASH_SCHEMA = "asset string, phash string"


def dhash_bmp_batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: BMP bytes → dHash hex. Raises on a non-BMP
    payload (same no-silent-fallback rule as the decode worker)."""
    for pdf in pdfs:
        hashes = []
        for asset, payload in zip(pdf["asset"], pdf["payload"]):
            arr = _decode_bmp_pixels(bytes(payload))
            if arr is None:
                raise ValueError(f"{asset}: not an uncompressed 24-bit BMP")
            hashes.append(_dhash_hex(arr))
        yield pd.DataFrame({"asset": pdf["asset"], "phash": hashes})


@register(
    "multimodal_phash_dedup",
    oracle="WITH hashes(asset, phash) AS (VALUES "
    + ", ".join(f"('{a}', '{h}')" for a, h in _phash_expected())
    + """)
    SELECT phash, COUNT(*) AS n_images,
           STRING_AGG(asset, ',' ORDER BY asset) AS assets
    FROM hashes GROUP BY phash
    """,
    category="multimodal",
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate image grouping: binaryFile scan →
    Arrow-batched dHash (``dhash_bmp_batches``) → groupBy on the
    64-bit hash → duplicate groups with member lists. Finds the
    same-image-different-resolution duplicates that byte checksums
    miss; the planted corpus makes the expected groups provable (see
    the block comment), and the oracle recomputes every hash by the
    independent pixel-arithmetic path.

    Scale shape: decode+hash is a map over files (one Python crossing
    per Arrow batch, 16-byte output per image); the group step
    shuffles HASHES, never pixels — at LAION scale that is gigabytes
    against the corpus's petabytes. Hamming-ball (distance > 0)
    matching adds the simhash pigeonhole trick on 16-bit bands of the
    same key; exact grouping is the graded baseline."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp")
        .load(PHASH_CORPUS_DIR)
        .select(
            F.regexp_extract("path", r"([^/]+)$", 1).alias("asset"),
            F.col("content").alias("payload"),
        )
    )
    hashed = df.mapInPandas(dhash_bmp_batches, PHASH_SCHEMA)
    return hashed.groupBy("phash").agg(
        F.count("*").alias("n_images"),
        F.array_join(F.array_sort(F.collect_list("asset")), ",").alias(
            "assets"
        ),
    )


# ---------------------------------------------------------------------------
# Hamming-ball pHash matching (banded near-duplicate images)
# ---------------------------------------------------------------------------

# Exact-hash grouping (multimodal_phash_dedup) catches resamples; a
# re-encode or mild edit flips a FEW dHash bits, so production image
# dedup matches within a Hamming ball. The scalable plan is the
# simhash pigeonhole: split the 64-bit hash into HAM_BANDS bands —
# any pair within distance HAM_MAX shares at least one intact band
# (HAM_MAX < HAM_BANDS), so banded equality joins generate every true
# candidate and the exact popcount filter keeps the ball.
#
# The corpus PLANTS the decision boundary. A base image is an 8×9
# designed grayscale grid (equal RGB channels and 299+587+114 = 1000
# make gray == the designed value; at exactly thumbnail resolution
# the floor-index downsample is the identity, so every gradient bit
# is chosen, not emergent). Variants: an exact NN upscale (distance
# 0), a 1-bit flip (inside the ball), and a 4-bit flip placed one per
# band (outside the ball AND sharing no band — provably filtered at
# candidate time, not just at verify time).
PHASH_HAM_DIR = "/tmp/iceberg_by_example_phash_ham_corpus"
HAM_GROUPS = 3
HAM_BANDS = 4  # 16 bits per band
HAM_MAX = 3  # ball radius; < HAM_BANDS ⇒ pigeonhole recall guarantee


def _ham_grid(g: int):
    """Designed 8×9 grayscale grid for group g: each horizontal
    gradient's sign is a seeded coin flip realized as a ±8 step, so
    any single bit can be flipped later by inverting one step."""
    import random as _random

    import numpy as np

    rng = _random.Random(7000 + g)
    grid = np.zeros((_DHASH_ROWS, _DHASH_COLS), dtype="int32")
    for r in range(_DHASH_ROWS):
        v = 128
        grid[r, 0] = v
        for c in range(_DHASH_COLS - 1):
            v = v + 8 if rng.random() < 0.5 else v - 8
            grid[r, c + 1] = v
    return grid


def _ham_flip(grid, r: int):
    """Invert the last gradient of row r (bit r·8+7) by reflecting the
    final cell around its predecessor — touches exactly one bit."""
    out = grid.copy()
    out[r, -1] = 2 * out[r, -2] - out[r, -1]
    return out


def _ham_pixels(grid, k: int):
    """k× NN upscale of a grid, stacked to equal-channel RGB (gray
    recovers the grid exactly: (299v+587v+114v)//1000 == v)."""
    import numpy as np

    g8 = grid.astype("uint8")
    up = g8.repeat(k, axis=0).repeat(k, axis=1)
    return np.stack([up, up, up], axis=2)


def _ham_variants(g: int):
    """(suffix, pixel array) per group: base, dup (distance 0), near
    (distance 1, flip in row 1 = band 0), far (distance 4, one flip
    in each band: rows 0, 2, 4, 6)."""
    base = _ham_grid(g)
    far = base
    for r in (0, 2, 4, 6):
        far = _ham_flip(far, r)
    return [
        ("base", _ham_pixels(base, 2)),
        ("dup", _ham_pixels(base, 3)),
        ("near", _ham_pixels(_ham_flip(base, 1), 2)),
        ("far", _ham_pixels(far, 2)),
    ]


def _ham_assets() -> list[tuple[str, "object"]]:
    return [
        (f"hb_{g}_{suffix}.bmp", arr)
        for g in range(HAM_GROUPS)
        for suffix, arr in _ham_variants(g)
    ]


def _ham_expected() -> list[tuple[str, str]]:
    """(asset, dhash) from the generator grids — codec never runs."""
    return [(asset, _dhash_hex(arr)) for asset, arr in _ham_assets()]


def _ensure_ham_corpus() -> str:
    import os

    os.makedirs(PHASH_HAM_DIR, exist_ok=True)
    for asset, arr in _ham_assets():
        _ensure_corpus_file(
            os.path.join(PHASH_HAM_DIR, asset), _encode_bmp(arr)
        )
    return PHASH_HAM_DIR


_ensure_ham_corpus()


def _hamming64(a, b):
    """Popcount of XOR over two 16-hex-char hashes, computed on two
    32-bit halves (a full 64-bit parse can overflow the signed type
    when bit 63 is set). Twin: BIT_COUNT(XOR(...))."""
    h = lambda col, lo: F.conv(F.substring(col, lo, 8), 16, 10).cast("long")
    return F.bit_count(h(a, 1).bitwiseXOR(h(b, 1))) + F.bit_count(
        h(a, 9).bitwiseXOR(h(b, 9))
    )


@register(
    "multimodal_phash_hamming",
    oracle="WITH hashes(asset, phash) AS (VALUES "
    + ", ".join(f"('{a}', '{h}')" for a, h in _ham_expected())
    + f""")
    , banded AS (
      SELECT asset, phash, b, SUBSTR(phash, 1 + 4*b, 4) AS band_val
      FROM hashes, LATERAL (SELECT UNNEST(RANGE(0, {HAM_BANDS})) AS b)),
    cand AS (
      SELECT DISTINCT a.asset AS asset_a, a.phash AS ph_a,
                      x.asset AS asset_b, x.phash AS ph_b
      FROM banded a JOIN banded x
        ON a.b = x.b AND a.band_val = x.band_val AND a.asset < x.asset)
    SELECT asset_a, asset_b,
           CAST(BIT_COUNT(XOR(('0x' || SUBSTR(ph_a, 1, 8))::BIGINT,
                              ('0x' || SUBSTR(ph_b, 1, 8))::BIGINT))
              + BIT_COUNT(XOR(('0x' || SUBSTR(ph_a, 9, 8))::BIGINT,
                              ('0x' || SUBSTR(ph_b, 9, 8))::BIGINT))
              AS BIGINT) AS hamming
    FROM cand
    WHERE BIT_COUNT(XOR(('0x' || SUBSTR(ph_a, 1, 8))::BIGINT,
                        ('0x' || SUBSTR(ph_b, 1, 8))::BIGINT))
        + BIT_COUNT(XOR(('0x' || SUBSTR(ph_a, 9, 8))::BIGINT,
                        ('0x' || SUBSTR(ph_b, 9, 8))::BIGINT)) <= {HAM_MAX}
    """,
    category="multimodal",
)
def multimodal_phash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs within a Hamming-{HAM_MAX} ball of
    dHash: real BMP decode → 64-bit hash → {HAM_BANDS}-band pigeonhole
    candidates (any pair within the ball shares an intact 16-bit band)
    → exact popcount verify. The planted corpus proves both sides of
    the boundary: the 1-bit variant is found, the 4-bit variant (one
    flip per band) shares NO band — dropped at candidate generation,
    demonstrating the recall/cost line rather than asserting it.

    Scale shape: identical to simhash text dedup — the band join
    buckets 16-byte keys, pair work is Σ bucket², and popcount runs
    only on banded candidates. Pixels never shuffle; after the decode
    map the whole pipeline is 24-byte rows."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp")
        .load(PHASH_HAM_DIR)
        .select(
            F.regexp_extract("path", r"([^/]+)$", 1).alias("asset"),
            F.col("content").alias("payload"),
        )
    )
    hashed = df.mapInPandas(dhash_bmp_batches, PHASH_SCHEMA)
    banded = hashed.select(
        "asset",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.substring("phash", 1 + 4 * b, 4).alias("band_val"),
                    )
                    for b in range(HAM_BANDS)
                ]
            )
        ).alias("s"),
    ).select("asset", "phash", "s.b", "s.band_val")
    a, x = banded.alias("a"), banded.alias("x")
    cand = (
        a.join(
            x,
            (F.col("a.b") == F.col("x.b"))
            & (F.col("a.band_val") == F.col("x.band_val"))
            & (F.col("a.asset") < F.col("x.asset")),
        )
        .select(
            F.col("a.asset").alias("asset_a"),
            F.col("a.phash").alias("ph_a"),
            F.col("x.asset").alias("asset_b"),
            F.col("x.phash").alias("ph_b"),
        )
        .distinct()
    )
    ham = _hamming64(F.col("ph_a"), F.col("ph_b"))
    return cand.select(
        "asset_a", "asset_b", ham.alias("hamming")
    ).filter(F.col("hamming") <= HAM_MAX)
