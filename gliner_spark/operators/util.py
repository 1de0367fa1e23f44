"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input has fewer partitions than the session's
    parallelism — small local files arrive as one split, which would run
    a following ``mapInPandas`` stage single-threaded. At cluster scale
    the scan has ≫ cores splits and this is a no-op (no shuffle added).
    """
    if df.isStreaming:  # partitioning is the source's business there
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
