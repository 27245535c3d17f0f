"""Risk-feature plans mirroring the reference's rugpull_features and
AUC rollup shapes (queries/rugpull_features.sql,
ethereum_wallet_features_with_auc.sql).

- ``risk_flag_features`` — FILTER-clause aggregates split by role (A3),
  value caps (the reference caps rugpull amounts at 1.3e7 and balances
  at 700,000 — semantics, not optimizations, SURVEY.md §4), and the
  exact all-zero-min detection CASE (A2:
  ``CASE WHEN COUNT(*) = COUNT(CASE WHEN min=0...)``).
- ``wallet_auc_rollup`` — max-of-running-AUC per wallet (A8) plus the
  FIRST_VALUE boundary value (W11's stitch input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.windows import lead_delta, running_sum
from .wallet_model import (
    ORACLE_ORDER,
    ORDER_COLS,
    WALLET_TX_ORACLE_CTE,
    by_wallet,
    wallet_transactions,
)

VALUE_CAP = 13_000_000.0  # rugpull_features.sql:75
BALANCE_CAP = 700_000.0  # ethereum_wallet_features.sql:286-289


def risk_flag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    wt = wallet_transactions(spark, sf_dir)
    # 'internal' legs stand in for risky/rugpull-flagged interactions
    risky = F.col("transaction_type") == "internal"
    capped = F.when(F.col("current_value").cast("double") > VALUE_CAP, F.lit(0.0)).otherwise(
        F.col("current_value").cast("double")
    )
    sent = F.col("address_role") == "sender"
    per_wallet = wt.groupBy("wallet_address").agg(
        F.sum(F.when(sent, F.col("current_value"))).cast("double").alias("sent_value"),
        F.sum(F.when(~sent, F.col("current_value"))).cast("double").alias("received_value"),
        F.count(F.when(sent & risky, F.lit(1))).alias("risky_sends"),
        F.count(F.when(~sent & risky, F.lit(1))).alias("risky_receives"),
        F.sum(F.when(risky, F.col("current_value").cast("decimal(18,6)")))
        .cast("double")
        .alias("risky_value"),
        F.max(capped).alias("max_capped_value"),
        # A2 exact form: 0 if every leg value is 0, else MIN of positives
        F.when(
            F.count("*") == F.count(F.when(F.col("current_value") == 0, F.lit(1))),
            F.lit(0.0),
        )
        .otherwise(
            F.min(F.when(F.col("current_value") > 0, F.col("current_value"))).cast("double")
        )
        .alias("min_nonzero_value"),
        # balance-cap guard applied to the whole-wallet net flow
        F.when(
            F.abs(F.sum("signed_value").cast("double")) > BALANCE_CAP, F.lit(0.0)
        )
        .otherwise(F.sum("signed_value").cast("double"))
        .alias("net_flow_capped"),
    )
    return per_wallet


RISK_FLAG_FEATURES_ORACLE = f"""
WITH {WALLET_TX_ORACLE_CTE}
SELECT
    wallet_address,
    CAST(SUM(current_value) FILTER (WHERE address_role = 'sender') AS DOUBLE) AS sent_value,
    CAST(SUM(current_value) FILTER (WHERE address_role <> 'sender') AS DOUBLE) AS received_value,
    CAST(COUNT(*) FILTER (WHERE address_role = 'sender'
                          AND transaction_type = 'internal') AS BIGINT) AS risky_sends,
    CAST(COUNT(*) FILTER (WHERE address_role <> 'sender'
                          AND transaction_type = 'internal') AS BIGINT) AS risky_receives,
    CAST(SUM(CAST(current_value AS DECIMAL(18,6)))
         FILTER (WHERE transaction_type = 'internal') AS DOUBLE) AS risky_value,
    MAX(CASE WHEN CAST(current_value AS DOUBLE) > {VALUE_CAP}
             THEN 0.0 ELSE CAST(current_value AS DOUBLE) END) AS max_capped_value,
    CASE WHEN COUNT(*) = COUNT(CASE WHEN current_value = 0 THEN 1 END)
         THEN 0.0
         ELSE CAST(MIN(CASE WHEN current_value > 0 THEN current_value END) AS DOUBLE)
    END AS min_nonzero_value,
    CASE WHEN abs(CAST(SUM(signed_value) AS DOUBLE)) > {BALANCE_CAP}
         THEN 0.0 ELSE CAST(SUM(signed_value) AS DOUBLE) END AS net_flow_capped
FROM wallet_tx
GROUP BY 1
"""


def wallet_auc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 + W11: per wallet, the max running AUC, total time above a
    zero balance, and the FIRST_VALUE of the ordered series (the
    boundary value an incremental batch would stitch against)."""
    wt = by_wallet(wallet_transactions(spark, sf_dir))
    df = running_sum(wt, F.col("signed_value"), ("wallet_address",), ORDER_COLS, out="bal")
    df = lead_delta(df, F.unix_micros("ts"), ("wallet_address",), ORDER_COLS, out="dt_us")
    auc_term = F.col("bal").cast("decimal(20,9)") * F.col("dt_us").cast("decimal(16,0)")
    df = running_sum(df, auc_term, ("wallet_address",), ORDER_COLS, out="auc_us")
    w = Window.partitionBy("wallet_address").orderBy(*ORDER_COLS)
    df = df.withColumn("first_signed", F.first("signed_value").over(w))
    return df.groupBy("wallet_address").agg(
        F.max("auc_us").cast("decimal(38,9)").cast("string").alias("max_auc_us"),
        (
            F.sum(F.when(F.col("bal") > 0, F.col("dt_us")).otherwise(F.lit(0)))
            / F.lit(86_400_000_000)
        ).alias("days_above_zero"),
        F.max("first_signed").cast("double").alias("first_signed_value"),
    )


WALLET_AUC_ROLLUP_ORACLE = f"""
WITH {WALLET_TX_ORACLE_CTE},
balanced AS (
    SELECT *,
        SUM(signed_value) OVER (
            PARTITION BY wallet_address ORDER BY {ORACLE_ORDER}
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal,
        FIRST_VALUE(signed_value) OVER (
            PARTITION BY wallet_address ORDER BY {ORACLE_ORDER}) AS first_signed
    FROM wallet_tx
),
with_lead AS (
    SELECT *,
        COALESCE(LEAD(epoch_us(ts)) OVER (
            PARTITION BY wallet_address ORDER BY {ORACLE_ORDER}) - epoch_us(ts), 0) AS dt_us
    FROM balanced
),
with_auc AS (
    SELECT *,
        SUM(CAST(bal AS DECIMAL(20,9)) * CAST(dt_us AS DECIMAL(16,0))) OVER (
            PARTITION BY wallet_address ORDER BY {ORACLE_ORDER}
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS auc_us
    FROM with_lead
)
SELECT
    wallet_address,
    CAST(CAST(MAX(auc_us) AS DECIMAL(38,9)) AS VARCHAR) AS max_auc_us,
    SUM(CASE WHEN bal > 0 THEN dt_us ELSE 0 END) / 86400000000 AS days_above_zero,
    CAST(MAX(first_signed) AS DOUBLE) AS first_signed_value
FROM with_auc
GROUP BY 1
"""
