"""Event-stream analytics (batch formulations; streaming variants in
``gliner_spark.streaming``).

These fill the relational-category coverage of SURVEY.md §2.2 with the
operators the KG pipeline itself doesn't exercise: stateful-style window
functions (sessionization via lag + cumulative sum), time-bucketed
aggregation, and top-k per group — each with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """(user_id, session_id, n_events, first_ts, last_ts, total_value):
    classic gap-based sessionization — lag over (user, ts), new-session
    flag on gap > threshold, cumulative sum to number sessions.

    One shuffle (partitionBy user_id); sessions never span partitions so
    the plan scales linearly with users. Skewed single-user firehoses are
    the caveat at 10^12 rows — there, pre-split by (user_id, day) first.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps arrive as TIMESTAMP_NTZ; route through timestamp
    # (session tz = UTC) to get epoch seconds
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    flagged = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    sessioned = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def hourly_rollup(events: DataFrame) -> DataFrame:
    """(hour, event_type, n, total_value, n_users): tumbling 1-hour
    buckets — the batch twin of the streaming windowed aggregation."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def top_users_by_type(events: DataFrame, k: int = 3) -> DataFrame:
    """(event_type, rank, user_id, total_value): top-k users per event
    type by summed value — ranking window over an aggregate, ties broken
    by user_id for cross-engine determinism."""
    per_user = events.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 4).alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("total_value"), F.asc("user_id")
    )
    return (
        per_user.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("event_type", "rank", "user_id", "total_value")
    )
