"""Gap-based sessionization: the canonical event-stream feature op the
reference's time-delta machinery (W9's LEAD deltas) naturally extends
to. A new session starts when the gap since the user's previous event
exceeds the timeout; the session id is the running count of
session-start markers — a LAG + conditional running sum, all ROWS
frames over one (user) exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import read_table

SESSION_GAP_MIN = 30


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    with_sessions = (
        ev.withColumn("gap_us", gap_us)
        .withColumn(
            "new_session",
            F.when(
                F.col("gap_us").isNull()
                | (F.col("gap_us") > SESSION_GAP_MIN * 60_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(run))
    )
    return with_sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.unix_micros(F.min("ts")).alias("session_start_us"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("session_value"),
    )


USER_SESSIONS_ORACLE = f"""
WITH gapped AS (
    SELECT *,
        epoch_us(ts) - LAG(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
    FROM events
),
marked AS (
    SELECT *,
        CASE WHEN gap_us IS NULL OR gap_us > {SESSION_GAP_MIN} * 60000000
             THEN 1 ELSE 0 END AS new_session
    FROM gapped
),
sessioned AS (
    SELECT *,
        SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM marked
)
SELECT
    user_id,
    CAST(session_id AS BIGINT) AS session_id,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    epoch_us(MIN(ts)) AS session_start_us,
    epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
FROM sessioned
GROUP BY 1, 2
"""
