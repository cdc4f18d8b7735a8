"""Small shared engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def detach(df: DataFrame) -> DataFrame:
    """Pin a result to executor block storage so it survives deletion
    of its backing files (scratch tables the query built and tears
    down in its ``finally``).

    ``localCheckpoint(eager=True)`` materializes the partitions where
    they already live — unlike ``collect()`` + ``createDataFrame`` it
    never funnels the rows through the driver, so it stays O(rows /
    executors) per node at any scale.
    """
    return df.localCheckpoint(eager=True)
