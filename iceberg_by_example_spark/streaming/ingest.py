"""Streaming ingest into the versioned lakehouse.

``foreachBatch`` bridges Structured Streaming and VersionedTable: each
microbatch lands as one snapshot commit (append or merge), so the
streaming pipeline inherits the table's time travel, branches, and WAP
audit — the reference's batch lifecycle, continuously fed.

At scale this is the standard lakehouse CDC shape: microbatch commits
are atomic metadata swaps; readers at a branch never see a partial
batch; a bad batch is one snapshot rollback away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from iceberg_by_example_spark.tables.versioned import MAIN, VersionedTable


def stream_append(
    stream_df: DataFrame,
    table: VersionedTable,
    branch: str = MAIN,
    checkpoint_dir: str | None = None,
    merge_on: str | None = None,
) -> StreamingQuery:
    """Start a streaming query committing each microbatch to ``table``.

    ``merge_on``: when set, each batch is upserted by that key (MERGE
    semantics — last write wins within the stream); otherwise appended.
    """

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if merge_on:
            table.merge(batch_df, on=merge_on, branch=branch)
        else:
            table.append(batch_df, branch=branch)

    writer = stream_df.writeStream.foreachBatch(commit_batch).outputMode(
        "append"
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
