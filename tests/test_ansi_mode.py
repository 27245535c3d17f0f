"""ANSI-mode execution leg (r9): run every batch query to FULL
materialization with ``spark.sql.ansi.enabled=true`` so any silent
integer wrap / bad cast becomes a hard failure forever.

Why this exists: Spark's default (non-ANSI) arithmetic WRAPS on
BIGINT overflow with no error, so an sf0.01 oracle parity green
proves nothing about value-scale overflow (the r8 verdict's
wallet_counterparty_hhi Σv² finding — routine $30M exchange-bound
wallets would have produced silently wrong HHI). DuckDB raises on
overflow, so plan/oracle agreement under small data can mask a wrap
that only manifests at production value scales. Under ANSI the same
wrap is an immediate SparkArithmeticException.

Why ``noop`` write, not ``.count()``: count() lets Catalyst prune
every projected column, so the overflowing expression may never
execute. The noop sink materializes all output columns through the
whole plan — the cheapest action that cannot skip the arithmetic.

Streaming entries are excluded: they manage their own sessions,
checkpoints and sinks, and their state math is exact Python-int
(streaming/stream_jobs.py) — the batch oracles they are held to ARE
covered here.
"""

from __future__ import annotations

import pytest

from wallet_and_risky_features_data_pipeline_spark.plans.registry import QUERIES

from .conftest import SF_MEDIUM

_BATCH = sorted(n for n in QUERIES if not n.startswith("streaming_"))

# Driver-tier ANSI subset (r16): the FULL per-query sweep is a
# fullsuite-marked builder check (it alone ran ~100 s of the driver's
# pytest window); the default tier still executes the overflow-risk
# head under ANSI — every query whose arithmetic motivated this leg
# (value-scale moments, integer graph recurrences, decimal stitches)
# plus the flagship chain.
_ANSI_DRIVER_TIER = [
    n
    for n in (
        "wallet_counterparty_hhi",   # the r8 Σv² wrap finding
        "wallet_pagerank",           # 85·inc integer recurrence
        "wallet_auc_rollup",         # decimal time-integral
        "window_lead_auc",
        "wallet_features",
        "wallet_coin_balances",
        "window_running_balance",
        "window_running_balance_eth",
        "wallet_peel_depth",         # 4·c_in/5·c_out cross-multiplies
        "wallet_wash_cycles",
        "wallet_burstiness",
        "event_seasonal_outliers",
        "winsorized_values",
        "user_cusum_alerts",
        "rolling_zscore_outliers",
        "hourly_ohlc",
    )
    if n in QUERIES
]


@pytest.fixture(scope="module")
def ansi_spark(spark):
    # Dedicated child session (own SQLConf + own memo key), NOT a
    # set/restore on the shared session: an ANSI episode on the shared
    # session leaked into later tests — CAST(DECIMAL(38,9) AS STRING)
    # started rendering 0 as '0E-9' (BigDecimal.toString) instead of
    # '0.000000000' (toPlainString) even after the conf was restored,
    # hash-mismatching the AUC family's oracles. newSession() scopes
    # the mode to this module with nothing to restore (the
    # _stream_session rationale applied to a conf instead of shuffle
    # partitions); verified to leave the parent session's decimal
    # rendering untouched.
    ansi = spark.newSession()
    ansi.conf.set("spark.sql.ansi.enabled", "true")
    yield ansi


@pytest.mark.parametrize("name", _BATCH)
@pytest.mark.fullsuite
def test_query_executes_under_ansi(ansi_spark, name):
    # Build AND execute under ANSI: analysis-time cast resolution and
    # runtime arithmetic checks both apply.
    df = QUERIES[name](ansi_spark, SF_MEDIUM)
    df.write.format("noop").mode("overwrite").save()


@pytest.mark.parametrize("name", _ANSI_DRIVER_TIER)
def test_overflow_risk_head_executes_under_ansi(ansi_spark, name):
    """Driver-tier slice of the sweep above: the overflow-risk head
    stays hard-checked on every default run."""
    df = QUERIES[name](ansi_spark, SF_MEDIUM)
    df.write.format("noop").mode("overwrite").save()


def test_incremental_stitch_under_ansi(ansi_spark):
    """VERDICT r9 #6: the incremental seeding/stitch paths
    (streaming/incremental.py) run their DECIMAL prefix-sum, bridge-
    term, and time-integral arithmetic OUTSIDE the registered batch
    queries — execute the contract-state merge and the AUC stitch to
    full materialization under ANSI so a wrap anywhere in the stitch
    is a hard failure, and pin equality with the full recompute (the
    property the incremental suite states, now under ANSI)."""
    from pyspark.sql import functions as F

    from wallet_and_risky_features_data_pipeline_spark.plans.risk_features import (
        wallet_auc_rollup,
    )
    from wallet_and_risky_features_data_pipeline_spark.plans.wallet_features import (
        contract_state_from,
    )
    from wallet_and_risky_features_data_pipeline_spark.plans.wallet_model import (
        wallet_transactions,
    )
    from wallet_and_risky_features_data_pipeline_spark.streaming.incremental import (
        incremental_auc_rollup,
        incremental_contract_state,
        wallet_auc_state,
    )

    from .conftest import SF_SMALL

    def rows(df):
        cols = sorted(df.columns)
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    wt = wallet_transactions(ansi_spark, SF_SMALL)
    split = F.lit("2024-01-15").cast("timestamp")

    full_state = contract_state_from(wt)
    merged_state = incremental_contract_state(
        contract_state_from(wt.filter(F.col("ts") < split)),
        wt.filter(F.col("ts") >= split),
    )
    assert rows(merged_state) == rows(full_state)

    full_auc = wallet_auc_rollup(ansi_spark, SF_SMALL)
    merged_auc = incremental_auc_rollup(
        wallet_auc_state(wt.filter(F.col("ts") < split)),
        wt.filter(F.col("ts") >= split),
    )
    assert rows(merged_auc) == rows(full_auc)


def test_streaming_multibatch_under_ansi(ansi_spark, tmp_path):
    """VERDICT r9 #6: the stateful streaming jobs execute sink-side
    rollups and pre-state casts in their own child sessions, which
    previously dropped back to non-ANSI arithmetic regardless of the
    caller. _stream_session now inherits the caller's ANSI mode; this
    drives the contract-bound mirrors plus the running-totals job
    through a REAL multi-batch run (3 file splits) under ANSI — any
    wrap in their Spark-side math is a hard failure."""
    from pyspark.sql import functions as F

    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        stateful_user_totals,
        stream_cusum_monitor,
        stream_event_transitions,
        stream_rolling_zscore,
    )

    from .conftest import SF_SMALL

    src = ansi_spark.read.parquet(f"{SF_SMALL}/events.parquet")
    # 3 single-user-disjoint splits by user ranges keep each user's
    # rows inside ONE file → multibatch state handoff without ordering
    # violations clouding the leg's purpose (wrap detection)
    d = str(tmp_path)
    src.filter(F.col("user_id") % 3 == 0).coalesce(1).write.parquet(
        f"{d}/events.parquet"
    )
    for r in (1, 2):
        src.filter(F.col("user_id") % 3 == r).coalesce(1).write.mode(
            "append"
        ).parquet(f"{d}/events.parquet")

    for job in (
        stream_rolling_zscore,
        stream_event_transitions,
        stream_cusum_monitor,
        stateful_user_totals,
    ):
        got = job(ansi_spark, d, max_files_per_trigger=1).collect()
        assert got, job.__name__
