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
def test_query_executes_under_ansi(ansi_spark, name):
    # Build AND execute under ANSI: analysis-time cast resolution and
    # runtime arithmetic checks both apply.
    df = QUERIES[name](ansi_spark, SF_MEDIUM)
    df.write.format("noop").mode("overwrite").save()
