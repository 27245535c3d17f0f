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


def sessioned_events(ev: DataFrame) -> DataFrame:
    """Gap-based session-id assignment (shared by the session rollup
    and the association-rules miner): LAG gap + conditional running
    sum over one (user) exchange."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (
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


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    with_sessions = sessioned_events(ev)
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


# --------------------------------------------------------------------------
# Strict-order funnel conversion: view → click → purchase, where each
# stage must happen AFTER the user's previous stage (a click before
# the first view doesn't count — the ordering is the analysis). Three
# chained per-user AGGREGATES, each joined back on user_id: stage k's
# timestamp is min(ts WHERE type=k AND ts > stage k−1). Originally
# one windowed pass (min-over-partition ×3), but full-partition
# window frames buffer the entire per-user partition in one task — a
# 1e8-event bot user at production scale is an OOM, the
# weighted-median 100× probe's failure class (PLANS.md §probe-caught
# OOM). The aggs are map-side combinable and every join keys on
# user_id, so the chain stays on one exchange's partitioning.
FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    u1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    u2 = (
        u1.join(ev, "user_id", "left")
        .groupBy("user_id", "t_view")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).alias("t_click")
        )
    )
    per_user = (
        u2.join(ev, "user_id", "left")
        .groupBy("user_id", "t_view", "t_click")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).alias("t_purchase")
        )
    )
    counts = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count("t_view").cast("bigint").alias("n_view"),
        F.count("t_click").cast("bigint").alias("n_click"),
        F.count("t_purchase").cast("bigint").alias("n_purchase"),
    )
    stages = F.array(
        F.struct(F.lit("1_view").alias("stage"), F.col("n_view").alias("n_reached")),
        F.struct(F.lit("2_click").alias("stage"), F.col("n_click").alias("n_reached")),
        F.struct(
            F.lit("3_purchase").alias("stage"), F.col("n_purchase").alias("n_reached")
        ),
    )
    return counts.select(
        F.explode(stages).alias("s"), "n_users", "n_view"
    ).select(
        F.col("s.stage").alias("stage"),
        F.col("s.n_reached").alias("n_reached"),
        (F.col("s.n_reached").cast("double") / F.col("n_users")).alias("user_share"),
        (F.col("s.n_reached").cast("double") / F.col("n_view")).alias(
            "conversion_from_view"
        ),
    )


FUNNEL_CONVERSION_ORACLE = """
WITH u1 AS (
    SELECT user_id, MIN(ts) FILTER (WHERE event_type = 'view') AS t_view
    FROM events GROUP BY 1
),
u2 AS (
    SELECT u1.user_id, u1.t_view,
           MIN(e.ts) FILTER (WHERE e.event_type = 'click' AND e.ts > u1.t_view)
               AS t_click
    FROM u1 LEFT JOIN events e USING (user_id)
    GROUP BY 1, 2
),
u3 AS (
    SELECT u2.user_id, u2.t_view, u2.t_click,
           MIN(e.ts) FILTER (WHERE e.event_type = 'purchase' AND e.ts > u2.t_click)
               AS t_purchase
    FROM u2 LEFT JOIN events e USING (user_id)
    GROUP BY 1, 2, 3
),
counts AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(t_view) AS BIGINT) AS n_view,
           CAST(COUNT(t_click) AS BIGINT) AS n_click,
           CAST(COUNT(t_purchase) AS BIGINT) AS n_purchase
    FROM u3
)
SELECT s.stage,
       s.n_reached,
       CAST(s.n_reached AS DOUBLE) / c.n_users AS user_share,
       CAST(s.n_reached AS DOUBLE) / c.n_view AS conversion_from_view
FROM counts c,
     LATERAL (VALUES ('1_view', c.n_view), ('2_click', c.n_click),
                     ('3_purchase', c.n_purchase)) AS s(stage, n_reached)
"""


# --------------------------------------------------------------------------
# Weekly cohort retention: users grouped by first-activity week; for
# each (cohort, week-offset) cell, how many of the cohort were active.
# Shape: per-user first-ts agg (one user shuffle) → distinct
# (user, active-week) pairs (reuses the same keying) → broadcast-sized
# cohort dimension joined back → one (cohort, offset) agg. The
# retention matrix is weeks × weeks — always driver-tiny.
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("active_week")
    ).distinct()
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    return (
        active.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
                "retention"
            ),
        )
    )


COHORT_RETENTION_ORACLE = """
WITH first AS (
    SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY 1
),
active AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
    FROM events
),
sizes AS (
    SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
    FROM first GROUP BY 1
),
cells AS (
    SELECT f.cohort_week,
           CAST((a.active_week - f.cohort_week) // 7 AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM active a JOIN first f USING (user_id)
    GROUP BY 1, 2
)
SELECT CAST(c.cohort_week AS VARCHAR) AS cohort_week,
       c.week_offset, c.n_active, s.cohort_size,
       CAST(c.n_active AS DOUBLE) / s.cohort_size AS retention
FROM cells c JOIN sizes s USING (cohort_week)
"""


# --------------------------------------------------------------------------
# Trailing-7-day active users per day — the sliding-window DISTINCT
# aggregate (DAU/WAU board metric). Distinct counts don't decompose
# over overlapping windows, so the textbook distributed shape is:
# dedup to (user, day) FIRST (the event stream is the huge side; the
# pair table is bounded by users × days), then explode each pair to
# the <= 7 window-ends it serves, then a two-phase COUNT(DISTINCT)
# per window end. The explode factor equals the window length — fixed,
# never data-sized — and both aggs combine map-side. Window ends past
# the last active day are kept (they are real trailing windows); the
# series ends 6 days after the final event.
ROLLING_DAYS = 7


def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    exploded = pairs.select(
        "user_id",
        F.explode(
            F.expr(f"sequence(day, date_add(day, {ROLLING_DAYS - 1}))")
        ).alias("window_end"),
    )
    return (
        exploded.groupBy("window_end")
        .agg(F.count_distinct("user_id").cast("bigint").alias("active_users_7d"))
        .select(F.col("window_end").cast("string").alias("window_end"), "active_users_7d")
    )


ROLLING_ACTIVE_USERS_ORACLE = f"""
WITH pairs AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
exploded AS (
    SELECT user_id, day + CAST(i AS INTEGER) AS window_end
    FROM pairs, UNNEST(generate_series(0, {ROLLING_DAYS - 1})) AS u(i)
)
SELECT CAST(window_end AS VARCHAR) AS window_end,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users_7d
FROM exploded
GROUP BY 1
"""


# --------------------------------------------------------------------------
# SCD-2 point-in-time join: facts joined to the dimension VERSION that
# was valid at fact time. The versioned dimension is built from the
# event stream itself (each signup opens a new version for its user;
# valid_to = next signup's ts, half-open [from, to)), and every
# purchase resolves the version covering its timestamp — the
# slowly-changing-dimension staple of every warehouse. Scale shape:
# version intervals PER ENTITY are disjoint, so the lookup is an EQUI
# join on the entity key with an interval predicate as a post-join
# filter — never a blind range join; both sides key on user_id, one
# co-partitioned shuffle. Facts before the first version (or for users
# with no version) keep NULL version columns via the left join.
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", "ts", "event_id", "value")
        .withColumn("version", F.row_number().over(w))
        .withColumn("valid_from", F.col("ts"))
        .withColumn(
            "valid_to",
            F.lead("ts").over(w),  # NULL = current version, open-ended
        )
        .select(
            "user_id",
            "version",
            "valid_from",
            "valid_to",
            F.col("value").alias("version_value"),
        )
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    f, d = facts.alias("f"), dim.alias("d")
    in_window = (F.col("f.ts") >= F.col("d.valid_from")) & (
        F.col("d.valid_to").isNull() | (F.col("f.ts") < F.col("d.valid_to"))
    )
    return f.join(
        d, (F.col("f.user_id") == F.col("d.user_id")) & in_window, "left"
    ).select(
        F.col("f.event_id").alias("event_id"),
        F.col("f.user_id").alias("user_id"),
        F.unix_micros("f.ts").alias("ts_us"),
        F.col("f.value").alias("value"),
        F.col("d.version").alias("version"),
        F.unix_micros("d.valid_from").alias("valid_from_us"),
        (F.col("f.value") * F.col("d.version_value")).alias("version_weighted"),
    )


SCD2_POINT_IN_TIME_ORACLE = """
WITH dim AS (
    SELECT user_id,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS version,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
           value AS version_value
    FROM events WHERE event_type = 'signup'
),
facts AS (
    SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT f.event_id, f.user_id, epoch_us(f.ts) AS ts_us, f.value,
       d.version, epoch_us(d.valid_from) AS valid_from_us,
       f.value * d.version_value AS version_weighted
FROM facts f
LEFT JOIN dim d
  ON f.user_id = d.user_id
 AND f.ts >= d.valid_from
 AND (d.valid_to IS NULL OR f.ts < d.valid_to)
"""


# --------------------------------------------------------------------------
# Last-touch attribution: each purchase credits the user's most recent
# preceding touch (view or click) within the attribution window — the
# marketing-analytics staple. Same-table self-match, but never a
# range join: touches and purchases co-key on user_id, so the
# candidate join is EQUI on the user with the window as a residual,
# and the winner per purchase is ONE max_by hash aggregation over the
# padded (ts, event_id) order key — no per-purchase window function,
# no sort. Purchases with no touch in window survive as 'organic'
# (left join) — dropping them is the classic attribution
# over-counting bug.
ATTRIB_WINDOW_DAYS = 7


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    ordk = F.expr(
        "concat(lpad(cast(unix_micros(ts) as string), 20, '0'), ':',"
        " lpad(cast(event_id as string), 12, '0'))"
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
        ordk.alias("t_ord"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    window_ok = (F.col("t_ts") <= F.col("ts")) & (
        F.col("t_ts") >= F.col("ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW_DAYS} DAYS")
    )
    cand = purchases.join(
        touches, (F.col("user_id") == F.col("t_user")) & window_ok, "left"
    )
    return (
        cand.groupBy("event_id")
        .agg(
            F.first("user_id").alias("user_id"),
            F.unix_micros(F.first("ts")).alias("ts_us"),
            F.first("value").alias("value"),
            F.max_by("touch_type", "t_ord").alias("last_touch"),
            F.unix_micros(F.max_by("t_ts", "t_ord")).alias("touch_ts_us"),
        )
        .withColumn("last_touch", F.coalesce("last_touch", F.lit("organic")))
    )


PURCHASE_ATTRIBUTION_ORACLE = f"""
WITH touches AS (
    SELECT user_id AS t_user, ts AS t_ts, event_type AS touch_type,
           lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || ':' ||
           lpad(CAST(event_id AS VARCHAR), 12, '0') AS t_ord
    FROM events WHERE event_type IN ('view', 'click')
),
purchases AS (
    SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
),
cand AS (
    SELECT p.*, t.touch_type, t.t_ts, t.t_ord
    FROM purchases p
    LEFT JOIN touches t
      ON p.user_id = t.t_user
     AND t.t_ts <= p.ts
     AND t.t_ts >= p.ts - INTERVAL {ATTRIB_WINDOW_DAYS} DAYS
)
SELECT event_id,
       MIN(user_id) AS user_id,
       epoch_us(MIN(ts)) AS ts_us,
       MIN(value) AS value,
       COALESCE(arg_max(touch_type, t_ord), 'organic') AS last_touch,
       epoch_us(arg_max(t_ts, t_ord)) AS touch_ts_us
FROM cand
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Linear multi-touch attribution: every touch in the window shares the
# purchase's credit equally (last-touch's sibling; marketing teams run
# both and compare). Same equi-on-user candidate join; the credit
# denominator is the per-purchase touch count, so each (purchase,
# touch) row carries value / n_touches and the invariant Σcredit =
# purchase value holds by construction — pinned in the oracle by
# emitting both the per-touch credit AND the per-purchase touch count
# (a wrong denominator breaks the hash immediately). Organic
# purchases (no touch) keep one row with full self-credit.
def purchase_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").cast("decimal(18,4)").alias("value")
    )
    window_ok = (F.col("t_ts") <= F.col("ts")) & (
        F.col("t_ts") >= F.col("ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW_DAYS} DAYS")
    )
    cand = purchases.join(
        touches, (F.col("user_id") == F.col("t_user")) & window_ok, "left"
    )
    from pyspark.sql import Window

    n_touches = F.count("touch_id").over(Window.partitionBy("event_id"))
    return cand.select(
        "event_id",
        "user_id",
        F.coalesce(F.col("touch_id"), F.lit(-1)).cast("bigint").alias("touch_id"),
        F.coalesce(F.col("touch_type"), F.lit("organic")).alias("touch_type"),
        n_touches.cast("bigint").alias("n_touches"),
        (F.col("value").cast("double") / F.greatest(n_touches, F.lit(1)).cast("double"))
        .alias("credit"),
    )


PURCHASE_ATTRIBUTION_LINEAR_ORACLE = f"""
WITH touches AS (
    SELECT user_id AS t_user, ts AS t_ts, event_id AS touch_id,
           event_type AS touch_type
    FROM events WHERE event_type IN ('view', 'click')
),
purchases AS (
    SELECT event_id, user_id, ts, CAST(value AS DECIMAL(18,4)) AS value
    FROM events WHERE event_type = 'purchase'
),
cand AS (
    SELECT p.event_id, p.user_id, p.value, t.touch_id, t.touch_type
    FROM purchases p
    LEFT JOIN touches t
      ON p.user_id = t.t_user
     AND t.t_ts <= p.ts
     AND t.t_ts >= p.ts - INTERVAL {ATTRIB_WINDOW_DAYS} DAYS
)
SELECT event_id, user_id,
       CAST(COALESCE(touch_id, -1) AS BIGINT) AS touch_id,
       COALESCE(touch_type, 'organic') AS touch_type,
       CAST(COUNT(touch_id) OVER (PARTITION BY event_id) AS BIGINT) AS n_touches,
       CAST(value AS DOUBLE)
           / CAST(greatest(COUNT(touch_id) OVER (PARTITION BY event_id), 1) AS DOUBLE)
           AS credit
FROM cand
"""


# --------------------------------------------------------------------------
# Markov next-event transition matrix: for each user's event stream in
# strict (ts, event_id) order, count (event_type -> next_event_type)
# pairs and the per-source transition probability — the behavioral
# fingerprint table fraud models and session simulators both consume
# (the reference's LEAD-delta machinery, W9, pointed at event_type
# instead of value). Scale shape: ONE (user) window exchange — the
# same partitioning every other per-user family reuses — then a hash
# agg on a key space bounded by |event_type|^2 (tiny), so the
# transition matrix itself never shuffles meaningful data; the final
# probability is a window over that tiny aggregate.
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
    per_from = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        "n_users",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(per_from).cast("double"),
            6,
        ).alias("p_transition"),
    )


EVENT_TRANSITIONS_ORACLE = """
WITH pairs AS (
    SELECT user_id, event_type AS from_type,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
    FROM events
),
counts AS (
    SELECT from_type, to_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM pairs
    WHERE to_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions, n_users,
       ROUND(CAST(n_transitions AS DOUBLE)
             / CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE),
             6) AS p_transition
FROM counts
"""


# --------------------------------------------------------------------------
# Hour-of-day activity entropy — the behavioral-biometrics feature
# separating humans from schedulers: organic users concentrate
# activity in waking hours (low-to-mid entropy, a clear top hour);
# cron-driven bots spread uniformly (entropy → ln 24) or spike in one
# slot (entropy → 0). H = Σ −p_h·ln(p_h) over the user's 24-bucket
# hour histogram. Determinism recipe: counts are exact; each p_h is
# one exact-int double division; each ln(p_h) is QUANTIZED to the
# 1e-6 grid at birth (the BM25 cross-libm rule); and the sum runs as
# a FOLD over the hour-ASC-sorted count list (Spark ``aggregate`` /
# DuckDB ``list_reduce`` — the EWMA discipline), so float addition
# order is pinned by construction, never left to an aggregate. The
# top hour ties to the SMALLEST hour via ROW_NUMBER in both engines.
# Scale shape: one (user, hour) hash agg (≤24 rows per user by
# construction) + one per-user agg whose collected list is ≤24 long —
# per-group work is CONSTANT-bounded, immune to event-count skew.


def user_activity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    per_hour = ev.groupBy(
        "user_id", F.hour("ts").cast("int").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    top = Window.partitionBy("user_id").orderBy(
        F.col("c").desc(), F.col("h").asc()
    )
    staged = per_hour.withColumn("__rk", F.row_number().over(top))
    agg = staged.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_active_hours"),
        F.max(F.when(F.col("__rk") == 1, F.col("h"))).alias("top_hour"),
        F.expr(
            "transform(array_sort(collect_list(struct(h, c))), x -> x.c)"
        ).alias("cs"),
    )
    entropy = F.expr(
        "aggregate(cs, cast(0.0 as double), (acc, c) -> acc"
        " - (cast(c as double) / cast(n_events as double))"
        " * (round(ln(cast(c as double) / cast(n_events as double)) * 1e6)"
        "    / 1e6))"
    )
    return agg.select(
        "user_id",
        "n_events",
        "n_active_hours",
        "top_hour",
        F.round(entropy, 6).alias("hour_entropy"),
    )


USER_ACTIVITY_ENTROPY_ORACLE = """
WITH per_hour AS (
    SELECT user_id, CAST(hour(ts) AS INTEGER) AS h,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events
    GROUP BY 1, 2
),
ranked AS (
    SELECT user_id, h, c,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY c DESC, h ASC
           ) AS __rk
    FROM per_hour
),
agg AS (
    SELECT user_id,
           CAST(SUM(c) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_active_hours,
           MAX(CASE WHEN __rk = 1 THEN h END) AS top_hour,
           list(c ORDER BY h) AS cs
    FROM ranked
    GROUP BY 1
)
SELECT user_id, n_events, n_active_hours, top_hour,
       ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(cs, c -> -(CAST(c AS DOUBLE) / CAST(n_events AS DOUBLE))
                 * (round(ln(CAST(c AS DOUBLE) / CAST(n_events AS DOUBLE)) * 1e6)
                    / 1e6))),
             (acc, x) -> acc + x), 6) AS hour_entropy
FROM agg
"""


# --------------------------------------------------------------------------
# Session association rules — the market-basket classic (Agrawal
# et al.) on event types co-occurring within a session: support =
# P(a,b), confidence = P(b|a) and P(a|b), lift = P(a,b)/(P(a)P(b)).
# Deterministic WITHOUT quantization: there is no transcendental
# anywhere — every metric is one division (or one division of exact
# DECIMAL(38,0) products, for lift) of exact integers, correctly
# rounded IEEE in both engines. Scale shape: session membership is a
# DISTINCT on (user, session, type) — the type space is enum-bounded,
# so per-session membership is tiny; the pair self-join keys on the
# session (bounded fan-out ≤ |types|² per session, never row²); item
# and session totals ride as joins on the |types|-keyed table and a
# one-row broadcast. The min-support cut happens on the pair COUNTS,
# before any division.
ASSOC_MIN_SUPPORT_COUNT = 5


def session_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    membership = (
        sessioned_events(ev)
        .select("user_id", "session_id", "event_type")
        .distinct()
    )
    n_sessions = (
        membership.select("user_id", "session_id")
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
    )
    item = membership.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_item")
    )
    l = membership.select(
        "user_id", "session_id", F.col("event_type").alias("a")
    )
    r = membership.select(
        "user_id", "session_id", F.col("event_type").alias("b")
    )
    pairs = (
        l.join(r, ["user_id", "session_id"])
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= ASSOC_MIN_SUPPORT_COUNT)
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    joined = (
        pairs.join(item.select(F.col("event_type").alias("a"),
                               F.col("n_item").alias("n_a")), "a")
        .join(item.select(F.col("event_type").alias("b"),
                          F.col("n_item").alias("n_b")), "b")
        .crossJoin(F.broadcast(n_sessions))
    )
    return joined.select(
        "a",
        "b",
        "n_ab",
        "n_a",
        "n_b",
        F.round(
            F.col("n_ab").cast("double") / F.col("n_sessions").cast("double"), 6
        ).alias("support"),
        F.round(
            F.col("n_ab").cast("double") / F.col("n_a").cast("double"), 6
        ).alias("conf_a_to_b"),
        F.round(
            F.col("n_ab").cast("double") / F.col("n_b").cast("double"), 6
        ).alias("conf_b_to_a"),
        F.round(
            (dec("n_ab") * dec("n_sessions")).cast("double")
            / (dec("n_a") * dec("n_b")).cast("double"),
            6,
        ).alias("lift"),
    )


SESSION_ASSOCIATION_RULES_ORACLE = f"""
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
),
membership AS (
    SELECT DISTINCT user_id, session_id, event_type FROM sessioned
),
totals AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM (SELECT DISTINCT user_id, session_id FROM membership)
),
item AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_item
    FROM membership GROUP BY 1
),
pairs AS (
    SELECT l.a, l.b, CAST(COUNT(*) AS BIGINT) AS n_ab
    FROM (SELECT m1.user_id, m1.session_id,
                 m1.event_type AS a, m2.event_type AS b
          FROM membership m1
          JOIN membership m2
            ON m2.user_id = m1.user_id AND m2.session_id = m1.session_id
           AND m1.event_type < m2.event_type) l
    GROUP BY 1, 2
    HAVING COUNT(*) >= {ASSOC_MIN_SUPPORT_COUNT}
)
SELECT p.a, p.b, p.n_ab,
       ia.n_item AS n_a, ib.n_item AS n_b,
       ROUND(CAST(p.n_ab AS DOUBLE) / CAST(t.n_sessions AS DOUBLE), 6)
           AS support,
       ROUND(CAST(p.n_ab AS DOUBLE) / CAST(ia.n_item AS DOUBLE), 6)
           AS conf_a_to_b,
       ROUND(CAST(p.n_ab AS DOUBLE) / CAST(ib.n_item AS DOUBLE), 6)
           AS conf_b_to_a,
       ROUND(CAST(CAST(p.n_ab AS DECIMAL(38,0))
                  * CAST(t.n_sessions AS DECIMAL(38,0)) AS DOUBLE)
             / CAST(CAST(ia.n_item AS DECIMAL(38,0))
                    * CAST(ib.n_item AS DECIMAL(38,0)) AS DOUBLE), 6) AS lift
FROM pairs p
JOIN item ia ON ia.event_type = p.a
JOIN item ib ON ib.event_type = p.b
CROSS JOIN totals t
"""


def user_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third-order sequential patterns — the Markov-assumption TEST the
    first-order ``event_transitions`` matrix cannot run on itself: for
    every observed (t1, t2) → t3 continuation, compare the second-order
    conditional P(t3 | t1,t2) against the first-order P(t3 | t2); a
    large gap (``is_nonmarkov``) means the chain has memory and any
    model (or streaming mirror) built on the first-order matrix is
    structurally blind there.

    Both conditionals come from the SAME per-user (ts, event_id)-ordered
    pass: two LEAD windows (streaming, no frames), then hash aggs to the
    |types|³ and |types|² grains — both structurally bounded, the
    transitions family's exemption class. Probabilities are single IEEE
    divisions ROUND(,6); the verdict compares the two rounded grids
    (|p₂−p₁| > 0.1), deterministic cross-engine.
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    pairs = seq.filter(F.col("t2").isNotNull())
    pair_counts = pairs.groupBy(
        F.col("t1").alias("p_from"), F.col("t2").alias("p_to")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
    per_from = Window.partitionBy("p_from")
    first_order = pair_counts.select(
        "p_from",
        "p_to",
        F.round(
            F.col("n_pair").cast("double")
            / F.sum("n_pair").over(per_from).cast("double"),
            6,
        ).alias("p_pair"),
    )
    tris = seq.filter(F.col("t3").isNotNull())
    tri_counts = tris.groupBy("t1", "t2", "t3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sequences"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
    per_prefix = Window.partitionBy("t1", "t2")
    scored = tri_counts.select(
        "t1",
        "t2",
        "t3",
        "n_sequences",
        "n_users",
        F.round(
            F.col("n_sequences").cast("double")
            / F.sum("n_sequences").over(per_prefix).cast("double"),
            6,
        ).alias("p_next"),
    )
    return (
        scored.join(
            F.broadcast(first_order),
            (F.col("t2") == F.col("p_from")) & (F.col("t3") == F.col("p_to")),
        )
        .select(
            "t1",
            "t2",
            "t3",
            "n_sequences",
            "n_users",
            "p_next",
            "p_pair",
            (F.abs(F.col("p_next") - F.col("p_pair")) > F.lit(0.1)).alias(
                "is_nonmarkov"
            ),
        )
    )


USER_EVENT_TRIGRAMS_ORACLE = """
WITH seq AS (
    SELECT user_id,
           event_type AS t1,
           lead(event_type, 1) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS t2,
           lead(event_type, 2) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS t3
    FROM events
),
pair_counts AS (
    SELECT t1 AS p_from, t2 AS p_to, CAST(COUNT(*) AS BIGINT) AS n_pair
    FROM seq WHERE t2 IS NOT NULL GROUP BY 1, 2
),
first_order AS (
    SELECT p_from, p_to,
           round(CAST(n_pair AS DOUBLE)
                 / CAST(SUM(n_pair) OVER (PARTITION BY p_from) AS DOUBLE), 6)
               AS p_pair
    FROM pair_counts
),
tri_counts AS (
    SELECT t1, t2, t3,
           CAST(COUNT(*) AS BIGINT) AS n_sequences,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE t3 IS NOT NULL GROUP BY 1, 2, 3
),
scored AS (
    SELECT t1, t2, t3, n_sequences, n_users,
           round(CAST(n_sequences AS DOUBLE)
                 / CAST(SUM(n_sequences) OVER (PARTITION BY t1, t2) AS DOUBLE), 6)
               AS p_next
    FROM tri_counts
)
SELECT s.t1, s.t2, s.t3, s.n_sequences, s.n_users, s.p_next, f.p_pair,
       abs(s.p_next - f.p_pair) > 0.1 AS is_nonmarkov
FROM scored s
JOIN first_order f ON f.p_from = s.t2 AND f.p_to = s.t3
"""
