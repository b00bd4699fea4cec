"""Event sessionization — batch (gaps-and-islands) and streaming
(session windows).

The batch formulation reuses the same islands skeleton as the genomic
``merge``/``cluster`` sweeps (``operators/intervals.py``): a session breaks
when the gap to the previous event of the same user exceeds ``gap``.  Fully
shuffle-parallel on ``user_id`` — no driver loops, no state beyond the
window frame.  The streaming variant is the native ``session_window`` with a
watermark (state bounded by the gap + watermark horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Batch sessionization: one row per (user, session) with
    ``session_start``, ``session_end``, ``n_events`` and (optionally)
    ``value_sum``.  A new session starts when the gap since the user's
    previous event exceeds ``gap_seconds``."""
    ts = F.col(ts_col).cast("timestamp")
    epoch = F.unix_timestamp(ts)
    w = Window.partitionBy(user_col).orderBy(epoch)
    brk = (
        F.when(
            F.lag(epoch).over(w).isNull()
            | (epoch - F.lag(epoch).over(w) > gap_seconds),
            1,
        )
        .otherwise(0)
    )
    island = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    df = events.withColumn("__epoch", epoch).withColumn("__session", island)
    aggs = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None and value_col in events.columns:
        aggs.append(F.sum(F.col(value_col)).alias("value_sum"))
    has_value = value_col is not None and value_col in events.columns
    return (
        df.groupBy(F.col(user_col), F.col("__session"))
        .agg(*aggs)
        .select(user_col, "session_start", "session_end", "n_events",
                *(["value_sum"] if has_value else []))
    )


def streaming_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Streaming sessionization with the native ``session_window``: sessions
    close ``gap`` after the last event; the watermark bounds state."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None and value_col in events.columns:
        aggs.append(F.sum(F.col(value_col)).alias("value_sum"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(*aggs)
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            *(["value_sum"] if value_col is not None and value_col in events.columns else []),
        )
    )
