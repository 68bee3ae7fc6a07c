"""Sessionization: split each user's event stream into sessions at
inactivity gaps — the standard behavioral-analytics operator
(classic gaps-and-islands), expressed with Spark's NATIVE
``session_window`` so the same definition runs in batch and in
Structured Streaming (where the window state merges out-of-order
events and the watermark expires closed sessions).

Scale shape: session_window is an aggregation, not a window
function — partial session buffers merge map-side and the single
shuffle is keyed by (user, session), so one hyperactive user splits
across their sessions rather than funnelling an entire history
through one task's sort (the lag()-cumsum formulation pays exactly
that funnel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, total_value):
    one row per session; a session ends when the next event arrives
    ``gap_seconds`` or more after the previous one. Epoch-seconds
    boundaries (session_end = last event's time, not the timeout
    horizon); total_value rounded to 6 digits."""
    sw = F.session_window(F.col(ts_col), f"{gap_seconds} seconds")
    return (
        events.groupBy(F.col(user_col), sw)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("total_value"),
            F.max(F.col(ts_col)).alias("_last"),
        )
        .select(
            user_col,
            F.unix_timestamp(F.col("session_window.start"))
            .cast("long")
            .alias("session_start"),
            F.unix_timestamp("_last").cast("long").alias("session_end"),
            F.col("n_events").cast("long").alias("n_events"),
            "total_value",
        )
    )


def sessionize_sql(
    table: str,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    """DuckDB gaps-and-islands equivalent (lag + running sum): a new
    island starts when the gap to the previous event is >=
    ``gap_seconds`` (session_window merges an event only while it is
    STRICTLY inside the previous event's gap horizon)."""
    return f"""
WITH brk AS (
  SELECT {user_col}, {ts_col}, {value_col},
    CASE WHEN epoch({ts_col}) - epoch(lag({ts_col}) OVER w)
              >= {gap_seconds}
         THEN 1 ELSE 0 END AS _b
  FROM {table}
  WINDOW w AS (PARTITION BY {user_col} ORDER BY {ts_col})
), isl AS (
  SELECT *, sum(_b) OVER (PARTITION BY {user_col} ORDER BY {ts_col}
                          ROWS UNBOUNDED PRECEDING) AS _s
  FROM brk
)
SELECT {user_col},
  floor(epoch(min({ts_col})))::BIGINT AS session_start,
  floor(epoch(max({ts_col})))::BIGINT AS session_end,
  count(*)::BIGINT AS n_events,
  round(sum({value_col}), 6) AS total_value
FROM isl GROUP BY {user_col}, _s
"""
