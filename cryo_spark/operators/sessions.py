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


def _event_time(df: DataFrame, ts_col: str):
    """Timestamp expression adaptive to the table's ts encoding (the
    driver testdata has shipped events.ts both as timestamp[us] and
    as int64 NANOSECONDS — a bare cast would silently read nanos as
    seconds)."""
    if dict(df.dtypes).get(ts_col) == "bigint":
        return F.timestamp_seconds(
            F.col(ts_col) / F.lit(1_000_000_000)
        )
    return F.col(ts_col).cast("timestamp")


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
    # only rewrite a non-timestamp encoding: replacing an
    # already-timestamp column would drop a stream's watermark
    # attribute (the column becomes a new attribute without it)
    if not dict(events.dtypes)[ts_col].startswith("timestamp"):
        events = events.withColumn(ts_col, _event_time(events, ts_col))
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


def resample_ffill(
    events: DataFrame,
    step_seconds: int = 60,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Regularize an event stream onto a fixed time grid with
    forward fill: for each key, one row per ``step_seconds`` tick
    from its first to its last event, carrying the latest value at
    or before the tick — the gap-filling step before joining
    irregular telemetry against anything grid-aligned.

    Returns (user_id, tick, value): tick = epoch seconds on the
    grid (floor-aligned), value = last observation <= tick.

    Scale shape: the grid explodes from one (first, last) row per
    key (a partial min/max aggregate — never sized by event count);
    grid and events union-sort once per key (the as-of union-window
    trick, |grid|+|events| rows); last(ignorenulls) forward-fills in
    the same window pass. Per-task sort is bounded by one key's
    ticks + events."""
    from pyspark.sql import Window

    e = F.floor(F.unix_timestamp(_event_time(events, ts_col))).cast("long")
    obs = events.select(
        F.col(user_col),
        e.alias("_t"),
        F.col(value_col).alias("_v"),
    )
    bounds = obs.groupBy(user_col).agg(
        F.min("_t").alias("_lo"), F.max("_t").alias("_hi")
    )
    step = F.lit(step_seconds)
    g_lo = F.ceil(F.col("_lo") / step).cast("long") * step_seconds
    g_hi = F.floor(F.col("_hi") / step).cast("long") * step_seconds
    # a key whose events all fall strictly BETWEEN two ticks has
    # g_lo > g_hi — F.sequence would raise 'Illegal sequence
    # boundaries'; such a key owns no ticks, matching the oracle's
    # generate_series (which returns zero rows there)
    grid = bounds.select(
        F.col(user_col),
        F.explode(
            F.when(g_lo <= g_hi, F.sequence(g_lo, g_hi, step)).otherwise(
                F.array().cast("array<bigint>")
            )
        ).alias("_t"),
    ).withColumn("_v", F.lit(None).cast("double"))
    # union-window: events sort before a same-timestamp tick (grid
    # rows carry _is_grid=1) so a tick takes the value AT its time
    unioned = obs.withColumn("_is_grid", F.lit(0)).unionByName(
        grid.withColumn("_is_grid", F.lit(1))
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy("_t", "_is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        "value", F.last("_v", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_is_grid") == 1).select(
        user_col, F.col("_t").alias("tick"), "value"
    )


def resample_ffill_sql(
    table: str,
    step_seconds: int = 60,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    """DuckDB equivalent (grid via generate_series + as-of fill via
    the same union-window)."""
    k = step_seconds
    return f"""
WITH obs AS (
  SELECT {user_col}, floor(epoch({ts_col}))::BIGINT AS _t,
         {value_col} AS _v, 0 AS _is_grid
  FROM {table}
), bounds AS (
  SELECT {user_col}, min(_t) AS _lo, max(_t) AS _hi
  FROM obs GROUP BY {user_col}
), grid AS (
  SELECT {user_col}, g.t AS _t, NULL::DOUBLE AS _v, 1 AS _is_grid
  FROM bounds,
    LATERAL unnest(generate_series(
      CAST(ceil(_lo / {k}.0) AS BIGINT) * {k},
      CAST(floor(_hi / {k}.0) AS BIGINT) * {k}, {k})) AS g(t)
), unioned AS (
  SELECT * FROM obs UNION ALL SELECT * FROM grid
), filled AS (
  SELECT {user_col}, _t, _is_grid,
    last_value(_v IGNORE NULLS) OVER (
      PARTITION BY {user_col} ORDER BY _t, _is_grid
      ROWS UNBOUNDED PRECEDING) AS value
  FROM unioned
)
SELECT {user_col}, _t AS tick, value
FROM filled WHERE _is_grid = 1
"""
