"""Event sessionization: gap-based session assignment + per-session stats.

Beyond the reference surface (it has no windowed/stateful operators —
SURVEY §2.7); this is the standard large-scale event-pipeline shape:
``lag`` over (user, time) marks session starts, a running sum turns the
marks into session sequence numbers, then one aggregation per session.

Scale posture: one shuffle on user_id (the window partition key) feeds
both window functions and the final aggregation — Catalyst reuses the
partitioning, so the whole operator is a single exchange over the
events; no driver state, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str = "value",
) -> DataFrame:
    """Assign events to sessions (a new session starts after a gap of
    more than ``gap_minutes`` of inactivity) and return per-session stats:
    (user_id, session_seq, session_start, session_end, n_events,
    sum_value). Timestamps render second-resolution for engine-portable
    comparison; the value sum is exact decimal.
    """
    # TIMESTAMP_NTZ (parquet timestamps without zone) casts to long only
    # via TIMESTAMP; the session tz is UTC so the hop is value-preserving
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_session = (
        prev.isNull()
        | (F.col(ts_col).cast("long") - prev.cast("long") > gap_minutes * 60)
    )
    seq = F.sum(new_session.cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = events.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(value_col),
        seq.alias("session_seq"),
    )
    return (
        marked.groupBy(user_col, "session_seq")
        .agg(
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sum_value"),
        )
        .select(
            F.col(user_col).cast("long").alias(user_col),
            F.col("session_seq").cast("long").alias("session_seq"),
            "session_start",
            "session_end",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("sum_value").cast("string").alias("sum_value"),
        )
    )
