"""Window-function plans (SURVEY.md §2.5) at event-row granularity.

These expose the reference's window machinery as directly verifiable
queries: each emits the window columns themselves (not just final
rollups) so the oracle comparison checks every intermediate value the
feature engine depends on — the strongest possible determinism test
for SURVEY.md §7.5's watch list.

All share the (wallet, contract) or (wallet) partitioning of the
canonical wallet-transactions model; at scale each window is one
exchange + in-partition sort, and running frames are ROWS (streaming)
never RANGE (peer-group scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_running_sum
from ..operators.windows import (
    dedup_rank,
    deterministic_order,
    lead_delta,
    partition_totals,
    running_sum,
)
from .wallet_features import WALLET_FEATURES_ORACLE, contract_state
from .wallet_model import (
    ORACLE_ORDER,
    ORDER_COLS,
    WALLET_TX_ORACLE_CTE,
    by_wallet,
    wallet_transactions,
)

_KEY = ("wallet_address", "contract_address")


# --------------------------------------------------------------------------
# W1 + W2 — deterministic ordering and canonical-leg dedup rank
def window_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    wt = by_wallet(wallet_transactions(spark, sf_dir))
    df = deterministic_order(wt, _KEY, ORDER_COLS, out="row_num_by_contract")
    df = deterministic_order(df, ("wallet_address",), ORDER_COLS, out="row_num_by_wallet")
    df = dedup_rank(df, ("wallet_address", "event_id"), ("priority",), out="hash_rank")
    return df.select(
        "event_id",
        "wallet_address",
        "contract_address",
        "address_role",
        "row_num_by_contract",
        "row_num_by_wallet",
        "hash_rank",
    )


WINDOW_ORDERING_ORACLE = f"""
WITH {WALLET_TX_ORACLE_CTE}
SELECT
    event_id,
    wallet_address,
    contract_address,
    address_role,
    CAST(ROW_NUMBER() OVER (
        PARTITION BY wallet_address, contract_address
        ORDER BY {ORACLE_ORDER}) AS INT) AS row_num_by_contract,
    CAST(ROW_NUMBER() OVER (
        PARTITION BY wallet_address
        ORDER BY {ORACLE_ORDER}) AS INT) AS row_num_by_wallet,
    CAST(DENSE_RANK() OVER (
        PARTITION BY wallet_address, event_id
        ORDER BY priority) AS INT) AS hash_rank
FROM wallet_tx
"""


# --------------------------------------------------------------------------
# W3 — running balance per (wallet, contract), every row
def window_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    wt = by_wallet(wallet_transactions(spark, sf_dir))
    df = running_sum(wt, F.col("signed_value"), _KEY, ORDER_COLS, out="balance")
    return df.select(
        "event_id",
        "wallet_address",
        "contract_address",
        "address_role",
        F.col("signed_value").cast("double").alias("delta"),
        F.col("balance").cast("double").alias("running_balance"),
    )


WINDOW_RUNNING_BALANCE_ORACLE = f"""
WITH {WALLET_TX_ORACLE_CTE}
SELECT
    event_id,
    wallet_address,
    contract_address,
    address_role,
    CAST(signed_value AS DOUBLE) AS delta,
    CAST(SUM(signed_value) OVER (
        PARTITION BY wallet_address, contract_address
        ORDER BY {ORACLE_ORDER}
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_balance
FROM wallet_tx
"""


# --------------------------------------------------------------------------
# W5 + W6 — whole-partition totals and lifetime min/max balance
def window_partition_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    wt = by_wallet(wallet_transactions(spark, sf_dir))
    df = running_sum(wt, F.col("signed_value"), _KEY, ORDER_COLS, out="balance")
    df = partition_totals(
        df,
        _KEY,
        {
            "partition_total": F.sum("signed_value"),
            "partition_events": F.count(F.lit(1)),
            "first_ts": F.min("ts"),
            "last_ts": F.max("ts"),
            "max_balance_ever": F.max("balance"),
            "min_pos_balance_ever": F.min(F.when(F.col("balance") > 0, F.col("balance"))),
        },
    )
    return df.select(
        "wallet_address",
        "contract_address",
        F.col("partition_total").cast("double").alias("partition_total"),
        "partition_events",
        F.unix_micros("first_ts").alias("first_ts_us"),
        F.unix_micros("last_ts").alias("last_ts_us"),
        F.col("max_balance_ever").cast("double").alias("max_balance_ever"),
        F.col("min_pos_balance_ever").cast("double").alias("min_pos_balance_ever"),
    ).distinct()


WINDOW_PARTITION_TOTALS_ORACLE = f"""
WITH {WALLET_TX_ORACLE_CTE},
balanced AS (
    SELECT *,
        SUM(signed_value) OVER (
            PARTITION BY wallet_address, contract_address
            ORDER BY {ORACLE_ORDER}
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS balance
    FROM wallet_tx
)
SELECT
    wallet_address,
    contract_address,
    CAST(SUM(signed_value) AS DOUBLE) AS partition_total,
    CAST(COUNT(*) AS BIGINT) AS partition_events,
    epoch_us(MIN(ts)) AS first_ts_us,
    epoch_us(MAX(ts)) AS last_ts_us,
    CAST(MAX(balance) AS DOUBLE) AS max_balance_ever,
    CAST(MIN(CASE WHEN balance > 0 THEN balance END) AS DOUBLE) AS min_pos_balance_ever
FROM balanced
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# W9 + W10 — LEAD time-to-next-event and running time-weighted AUC
def window_lead_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    wt = by_wallet(wallet_transactions(spark, sf_dir))
    df = running_sum(wt, F.col("signed_value"), ("wallet_address",), ORDER_COLS, out="wallet_balance")
    df = lead_delta(
        df,
        F.unix_micros("ts"),
        ("wallet_address",),
        ORDER_COLS,
        out="dt_us",
    )
    # balance·time integral in exact decimal: balance fits (20,9),
    # dt_us fits (16,0) → product precision ≤ 37 on both engines.
    auc_term = F.col("wallet_balance").cast("decimal(20,9)") * F.col("dt_us").cast("decimal(16,0)")
    df = running_sum(df, auc_term, ("wallet_address",), ORDER_COLS, out="auc_us")
    # The AUC integral exceeds 2^53 in scaled units, where DuckDB's
    # decimal→double (int128→double, then ×10⁻ⁿ) double-rounds vs
    # Java's correctly-rounded conversion — so emit the exact decimal
    # as a string (both engines format DECIMAL(38,9) identically).
    return df.select(
        "event_id",
        "wallet_address",
        "address_role",
        F.col("wallet_balance").cast("double").alias("wallet_balance"),
        "dt_us",
        F.col("auc_us").cast("decimal(38,9)").cast("string").alias("auc_us"),
    )


WINDOW_LEAD_AUC_ORACLE = f"""
WITH {WALLET_TX_ORACLE_CTE},
balanced AS (
    SELECT *,
        SUM(signed_value) OVER (
            PARTITION BY wallet_address
            ORDER BY {ORACLE_ORDER}
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wallet_balance
    FROM wallet_tx
),
with_lead AS (
    SELECT *,
        COALESCE(LEAD(epoch_us(ts)) OVER (
            PARTITION BY wallet_address
            ORDER BY {ORACLE_ORDER}) - epoch_us(ts), 0) AS dt_us
    FROM balanced
)
SELECT
    event_id,
    wallet_address,
    address_role,
    CAST(wallet_balance AS DOUBLE) AS wallet_balance,
    dt_us,
    CAST(CAST(SUM(CAST(wallet_balance AS DECIMAL(20,9)) * CAST(dt_us AS DECIMAL(16,0))) OVER (
        PARTITION BY wallet_address
        ORDER BY {ORACLE_ORDER}
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,9)) AS VARCHAR)
        AS auc_us
FROM with_lead
"""


# --------------------------------------------------------------------------
# W7/W8 — final-state pick per (wallet, contract): the coin-balances table
def wallet_coin_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    cs = contract_state(spark, sf_dir)
    return cs.select(
        "wallet_address",
        "contract_address",
        F.col("final_balance").cast("double").alias("final_balance"),
        F.col("incoming_value").cast("double").alias("incoming_value"),
        F.col("outgoing_value").cast("double").alias("outgoing_value"),
        "contract_tx",
        F.unix_micros("first_ts").alias("first_ts_us"),
        F.unix_micros("last_ts").alias("last_ts_us"),
    )


WALLET_COIN_BALANCES_ORACLE = f"""
WITH {WALLET_TX_ORACLE_CTE},
ordered AS (
    SELECT *,
        ROW_NUMBER() OVER (
            PARTITION BY wallet_address, contract_address
            ORDER BY {ORACLE_ORDER}) AS row_num,
        DENSE_RANK() OVER (
            PARTITION BY wallet_address, event_id
            ORDER BY priority) AS hash_rank
    FROM wallet_tx
),
balanced AS (
    SELECT *,
        SUM(signed_value) OVER (
            PARTITION BY wallet_address, contract_address
            ORDER BY {ORACLE_ORDER}
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS balance
    FROM ordered
)
SELECT
    wallet_address,
    contract_address,
    CAST(arg_max(balance, row_num) AS DOUBLE) AS final_balance,
    CAST(SUM(CASE WHEN address_role = 'receiver' THEN current_value
                  ELSE CAST(0 AS DECIMAL(38,9)) END) AS DOUBLE) AS incoming_value,
    CAST(SUM(CASE WHEN address_role = 'sender' THEN current_value
                  ELSE CAST(0 AS DECIMAL(38,9)) END) AS DOUBLE) AS outgoing_value,
    CAST(SUM(CASE WHEN hash_rank = 1 THEN 1 ELSE 0 END) AS BIGINT) AS contract_tx,
    epoch_us(MIN(ts)) AS first_ts_us,
    epoch_us(MAX(ts)) AS last_ts_us
FROM balanced
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# U3 — role double-entry explosion sanity view
def union_role_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    wt = wallet_transactions(spark, sf_dir)
    return wt.groupBy("address_role", "transaction_type").agg(
        F.count("*").alias("legs"),
        F.sum("signed_value").cast("double").alias("net_flow"),
        F.sum("tx_fee").cast("double").alias("fees"),
    )


UNION_ROLE_ORACLE = f"""
WITH {WALLET_TX_ORACLE_CTE}
SELECT
    address_role,
    transaction_type,
    CAST(COUNT(*) AS BIGINT) AS legs,
    CAST(SUM(signed_value) AS DOUBLE) AS net_flow,
    CAST(SUM(tx_fee) AS DOUBLE) AS fees
FROM wallet_tx
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Skew path: the chunked two-phase running sum must produce the exact
# per-row balances of the serial window — registered against the same
# oracle as window_running_balance (per (wallet, contract), chunked by
# day bucket of the event time).
def window_running_balance_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    wt = by_wallet(wallet_transactions(spark, sf_dir))
    df = salted_running_sum(
        wt,
        F.col("signed_value"),
        list(_KEY),
        list(ORDER_COLS),
        out="balance",
        chunk_expr=F.date_trunc("day", F.col("ts")),
    )
    return df.select(
        "event_id",
        "wallet_address",
        "contract_address",
        "address_role",
        F.col("signed_value").cast("double").alias("delta"),
        F.col("balance").cast("double").alias("running_balance"),
    )


WINDOW_RUNNING_BALANCE_SALTED_ORACLE = WINDOW_RUNNING_BALANCE_ORACLE
