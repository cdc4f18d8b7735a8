"""Small shared engine utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_micros(col: str | Column) -> Column:
    """Microseconds since the epoch for TIMESTAMP *or* TIMESTAMP_NTZ.

    ``unix_micros`` rejects TIMESTAMP_NTZ (the type parquet
    ``timestamp[us]`` without tz metadata loads as). The session
    timezone is pinned to UTC (session.py), so casting NTZ -> TIMESTAMP
    is a pure reinterpretation with no DST ambiguity.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


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
