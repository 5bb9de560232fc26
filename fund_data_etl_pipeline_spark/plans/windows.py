"""Event-time windowing over the ``events`` table (engine extension,
SURVEY.md §2.12).

These are the BATCH formulations of the streaming aggregations in
streaming/file_ingest.py — identical semantics (Structured Streaming runs
the same plan incrementally), which is what makes them oracle-checkable:
tumbling and sliding windows map to time_bucket arithmetic in DuckDB,
session windows to the gaps-and-islands pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import round2
from ..sources import load_table
from . import register

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _win_cols(prefix: str = "window") -> list:
    return [
        F.date_format(F.col(f"{prefix}.start"), _TS_FMT).alias("window_start"),
        F.date_format(F.col(f"{prefix}.end"), _TS_FMT).alias("window_end"),
    ]


@register(
    "events_tumbling_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR,
                    '%Y-%m-%d %H:%M:%S') AS window_end,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round2(F.sum("value"), 2).alias("sum_value"),
        )
        .select(*_win_cols(), "event_type", "n", "sum_value")
    )


@register(
    "events_sliding_window",
    oracle="""
    WITH starts AS (
      SELECT time_bucket(INTERVAL 30 MINUTES, ts) AS s, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES, value
      FROM events
    )
    SELECT strftime(s, '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(s + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
           COUNT(*) AS n,
           -- 6dp: beyond the exact decimal precision of avg(2dp values),
           -- so the rounding never sits on a half-way boundary
           ROUND(AVG(value), 6) AS avg_value
    FROM starts
    GROUP BY 1, 2
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event lands in 2."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            round2(F.avg("value"), 6).alias("avg_value"),
        )
        .select(*_win_cols(), "n", "avg_value")
    )


@register(
    "events_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value,
             -- strict >: Spark MERGES an event at prev_ts + exactly the
             -- gap (sessions combine when next.start <= prev.end), verified
             -- by tests/test_relational.py::test_session_window_exact_gap
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 10 MINUTES OR
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    islands AS (
      SELECT *, SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM ordered
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 10 MINUTES, '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM islands
    GROUP BY user_id, session_id
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap — Spark's
    session_window vs the DuckDB gaps-and-islands formulation."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "10 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round2(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), _TS_FMT).alias(
                "session_start"
            ),
            F.date_format(F.col("session_window.end"), _TS_FMT).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
