"""Reference-semantics parity tests (SURVEY.md §5.1): the behaviors the
reference's legacy unit tests pinned down — balance update signs, daily
flooring, snake-casing — plus Hypothesis property tests for the
operators whose correctness is an algebraic invariant.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from wallet_and_risky_features_data_pipeline_spark.functions.scalars import (
    floor_to_day,
    snake_case_columns,
    to_snake_case,
)
from wallet_and_risky_features_data_pipeline_spark.operators.skew import salted_running_sum
from wallet_and_risky_features_data_pipeline_spark.plans.wallet_model import (
    wallet_transactions,
)

from .conftest import SF_SMALL


def test_daily_flooring_reference_value(spark):
    """The reference's pinned example: 1671331850 → 1671321600."""
    df = spark.createDataFrame([(1671331850,), (1671321600,), (0,)], "ts long")
    out = [r[0] for r in df.select(floor_to_day(F.col("ts"))).collect()]
    assert out == [1671321600, 1671321600, 0]


def test_snake_case_renamer(spark):
    assert to_snake_case("walletAddress") == "wallet_address"
    assert to_snake_case("maxBalanceEverETH") == "max_balance_ever_eth"
    assert to_snake_case("already_snake") == "already_snake"
    df = spark.createDataFrame([(1, 2)], "walletAddress long, txCount long")
    assert snake_case_columns(df).columns == ["wallet_address", "tx_count"]


def test_balance_update_signs(spark):
    """Reference balance rule: sender pays value+fee, receiver gains
    value, error legs move nothing (is_error → value forced to 0)."""
    wt = wallet_transactions(spark, SF_SMALL)
    rows = wt.filter(
        (F.col("address_role") == "sender") & (F.col("transaction_type") == "normal")
    ).select("signed_value", "current_value", "tx_fee").limit(5).collect()
    for r in rows:
        assert r["signed_value"] == -(r["current_value"] + r["tx_fee"])  # exact Decimal
    err = wt.filter(F.col("transaction_type") == "internal").agg(
        F.max(F.abs(F.col("current_value")))
    ).first()[0]
    assert float(err) == 0.0  # error legs carry zero value


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # key
            st.integers(min_value=0, max_value=10**6),  # order/ts
            st.integers(min_value=-10**6, max_value=10**6),  # value (cents)
        ),
        min_size=1,
        max_size=60,
    )
)
def test_salted_running_sum_property(spark, rows):
    """For arbitrary inputs and an arbitrary coarse chunking of the
    order key, chunked two-phase == serial running sum."""
    data = [(k, o, i, v) for i, (k, o, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, o long, uid int, v long").withColumn(
        "v", F.col("v").cast("decimal(20,2)") / 100
    )
    serial = df.withColumn(
        "expected",
        F.sum("v").over(
            Window.partitionBy("k").orderBy("o", "uid")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    chunked = salted_running_sum(
        df, F.col("v"), ["k"], ["o", "uid"], out="got",
        chunk_expr=(F.col("o") / 1000).cast("int"),
    )
    m = serial.select("k", "uid", "expected").join(
        chunked.select("k", "uid", "got"), on=["k", "uid"]
    )
    assert m.filter(F.col("expected") != F.col("got")).count() == 0


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # key
            st.integers(min_value=0, max_value=10**6),  # order/ts
            st.integers(min_value=-10**6, max_value=10**6),  # value (cents)
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=0, max_value=20),             # hot threshold
)
@pytest.mark.fullsuite
def test_adaptive_running_sum_property(spark, rows, threshold):
    """For arbitrary inputs and an ARBITRARY hot-key threshold — from
    "everything routes through the chunked path" (0) to "nothing does"
    — the occupancy-routed union equals the serial running sum. The
    threshold is exactly the knob a production config would tune, so
    equivalence must hold at every setting, not just the default
    (VERDICT r8 #7)."""
    from wallet_and_risky_features_data_pipeline_spark.operators.skew import (
        adaptive_running_sum,
    )

    data = [(k, o, i, v) for i, (k, o, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, o long, uid int, v long").withColumn(
        "v", F.col("v").cast("decimal(20,2)") / 100
    )
    serial = df.withColumn(
        "expected",
        F.sum("v").over(
            Window.partitionBy("k").orderBy("o", "uid")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    routed = adaptive_running_sum(
        df, F.col("v"), ["k"], ["o", "uid"], out="got",
        chunk_expr=(F.col("o") / 1000).cast("int"),
        threshold=threshold,
    )
    m = serial.select("k", "uid", "expected").join(
        routed.select("k", "uid", "got"), on=["k", "uid"]
    )
    assert m.count() == len(rows)
    assert m.filter(F.col("expected") != F.col("got")).count() == 0


# --------------------------------------------------------------------------
# Day-bucketed as-of join ≡ plain band as-of join, for arbitrary
# microsecond timestamps — including exact-midnight events/quotes and
# gaps landing exactly on the tolerance boundary, the two places where
# a day-bucketing rewrite could silently diverge from band semantics.
_DAY_US = 86_400_000_000
_BASE_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC

_ts_us = st.tuples(
    st.integers(min_value=0, max_value=20),  # day
    st.one_of(  # intra-day offset: bias toward exact midnight + boundaries
        st.just(0),
        st.just(_DAY_US - 1),
        st.integers(min_value=0, max_value=_DAY_US - 1),
    ),
).map(lambda d: _BASE_US + d[0] * _DAY_US + d[1])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), _ts_us), min_size=1, max_size=8
    ),
    quotes=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), _ts_us), min_size=1, max_size=8
    ),
    direction=st.sampled_from(["backward", "nearest"]),
)
@pytest.mark.fullsuite
def test_bucketed_asof_equals_plain_property(spark, events, quotes, direction):
    from wallet_and_risky_features_data_pipeline_spark.operators.joins import asof_join

    ev = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(events)],
        "event_id long, key string, ts_us long",
    ).select("event_id", "key", F.timestamp_micros("ts_us").alias("ts"))
    # dedupe (key, ts): two quotes at the identical timestamp tie on the
    # (distance, ts) ordering, which no deterministic as-of can resolve
    uniq = {(k, t): float(i) for i, (k, t) in enumerate(quotes)}
    qt = spark.createDataFrame(
        [(k, t, p) for (k, t), p in uniq.items()],
        "key string, ts_us long, price double",
    ).select("key", F.timestamp_micros("ts_us").alias("qts"), "price")

    args = (ev, qt, ["key"], ["event_id"], "ts", "qts", "INTERVAL 7 DAYS", direction)
    plain = asof_join(*args)
    bucketed = asof_join(*args, bucket_days=7, broadcast_quotes=True)
    canon = lambda df: sorted(
        (r["event_id"], r["price"], r["qts"]) for r in df.collect()
    )
    assert canon(bucketed) == canon(plain)
