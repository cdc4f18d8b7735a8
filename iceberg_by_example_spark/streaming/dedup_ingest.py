"""Bloom-prefiltered, exactly-once streaming dedup ingest.

The production composition SCALING.md's ingest story describes, wired
end to end: a document stream lands in the versioned lakehouse with
every microbatch (1) deduplicated WITHIN the batch (keep-first by
fingerprint), (2) prefiltered against a Bloom bitset of the standing
corpus fingerprints so only Bloom-positive docs pay the exact index
join (``operators/dedup.dedup_bloom_prefilter``'s plan, verbatim),
and (3) committed exactly-once to BOTH the document table and the
fingerprint index table via the (stream-id, batch-id) snapshot
markers of ``streaming/ingest.py``.

Crash-recovery is per-table idempotent: ``foreachBatch`` replays the
last unacknowledged batch id after a restart, and each table skips
batch ids already on its branch lineage — so a crash between the two
commits re-runs the batch, the already-committed table acknowledges
without writing, and the other catches up. The index table therefore
always trails-or-matches the document table by less than one batch,
and a fingerprint is only probed AGAINST after its batch committed —
replays cannot double-insert or self-collide.

Scale shape (same argument as ``dedup_bloom_prefilter``): the set-bit
relation saturates at BLOOM_BITS rows (128 KB packed) and broadcasts
at any corpus size; the batch explodes to BLOOM_HASHES narrow rows
per doc; the ONLY index-sized operation per batch is the exact join
of the (true dups + ε false positives) candidate subset. A real
deployment keeps the packed bitset resident on the executors and
folds in each batch's new fingerprints incrementally; rebuilding it
from the index table per microbatch (as the test-scale code here
does) is the same plan with a worse constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_by_example_spark.operators.dedup import (
    BLOOM_HASHES,
    _bloom_bit,
)
from iceberg_by_example_spark.streaming.ingest import (
    BATCH_ID_KEY,
    STREAM_ID_KEY,
    last_committed_batch_id,
)
from iceberg_by_example_spark.tables.versioned import MAIN, VersionedTable

FINGERPRINT_COL = "fp"


def fingerprint_docs(docs: DataFrame) -> DataFrame:
    """Whitespace-canonicalized md5 fingerprint, identical to the
    batch operators' (dedup_exact / dedup_incremental_exact /
    dedup_bloom_prefilter) so stream- and batch-ingested corpora
    dedup against each other."""
    return docs.withColumn(
        FINGERPRINT_COL,
        F.md5(F.regexp_replace(F.trim(F.lower("text")), " +", " ")),
    )


def survivors_against_index(
    batch: DataFrame, index_fps: DataFrame
) -> DataFrame:
    """The per-batch dedup plan: keep-first within the batch by
    fingerprint (injective struct-MIN on doc_id — deterministic under
    replay), then Bloom-prefilter against the corpus fingerprints and
    exact-verify ONLY the Bloom-positive subset. Returns the batch
    rows that should be appended (fingerprint column included, so the
    caller can extend the index from the same relation)."""
    fp = fingerprint_docs(batch)
    first = fp.groupBy(FINGERPRINT_COL).agg(
        F.min(F.struct("doc_id")).alias("_w")
    )
    batch_unique = fp.join(first, FINGERPRINT_COL).filter(
        F.col("doc_id") == F.col("_w.doc_id")
    ).drop("_w")

    bits = (
        index_fps.select(
            F.explode(
                F.array(
                    *[
                        _bloom_bit(F.col(FINGERPRINT_COL), j)
                        for j in range(1, BLOOM_HASHES + 1)
                    ]
                )
            ).alias("bit")
        )
        .distinct()
        .withColumn("_set", F.lit(1))
    )
    bp = batch_unique.select(
        FINGERPRINT_COL,
        F.explode(
            F.array(
                *[
                    _bloom_bit(F.col(FINGERPRINT_COL), j)
                    for j in range(1, BLOOM_HASHES + 1)
                ]
            )
        ).alias("bit"),
    )
    cand = (
        bp.join(F.broadcast(bits), "bit", "left")
        .groupBy(FINGERPRINT_COL)
        .agg(F.bool_and(F.col("_set").isNotNull()).alias("_cand"))
    )
    with_cand = batch_unique.join(cand, FINGERPRINT_COL)
    # Bloom has no false negatives: negatives are new by construction
    positives_new = (
        with_cand.filter(F.col("_cand"))
        .join(index_fps, FINGERPRINT_COL, "left_anti")
        .drop("_cand")
    )
    negatives = with_cand.filter(~F.col("_cand")).drop("_cand")
    return positives_new.unionByName(negatives)


def make_dedup_committer(
    docs_table: VersionedTable,
    index_table: VersionedTable,
    branch: str = MAIN,
    stream_id: str = "dedup-ingest",
):
    """The ``foreachBatch`` handler: dedup the microbatch against the
    standing index, append survivors to ``docs_table`` and their
    fingerprints to ``index_table``, each exactly-once via the
    snapshot batch-id markers. Exposed for direct testing (replay a
    batch id to exercise the idempotency path)."""

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        marker = {STREAM_ID_KEY: stream_id, BATCH_ID_KEY: int(batch_id)}
        docs_last = last_committed_batch_id(docs_table, stream_id, branch)
        idx_last = last_committed_batch_id(index_table, stream_id, branch)
        if (
            docs_last is not None
            and batch_id <= docs_last
            and idx_last is not None
            and batch_id <= idx_last
        ):
            return  # full replay — both tables already have this batch
        index_fps = index_table.read(branch=branch).select(FINGERPRINT_COL)
        keep = survivors_against_index(batch_df, index_fps)
        # Pin the survivor set: both commits must write the SAME rows,
        # and the second must not recompute against the index the
        # first just extended.
        keep = keep.localCheckpoint(eager=True)
        if docs_last is None or batch_id > docs_last:
            docs_table.append(
                keep.drop(FINGERPRINT_COL),
                branch=branch,
                summary_extra=marker,
            )
        if idx_last is None or batch_id > idx_last:
            index_table.append(
                keep.select(FINGERPRINT_COL),
                branch=branch,
                summary_extra=marker,
            )

    return commit_batch


def stream_dedup_ingest(
    stream_df: DataFrame,
    docs_table: VersionedTable,
    index_table: VersionedTable,
    checkpoint_dir: str,
    branch: str = MAIN,
    stream_id: str | None = None,
):
    """Start the streaming query: document stream → Bloom-prefiltered
    dedup → exactly-once lakehouse append (docs + fingerprint index)."""
    return (
        stream_df.writeStream.foreachBatch(
            make_dedup_committer(
                docs_table, index_table, branch, stream_id or checkpoint_dir
            )
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
