"""Incremental-path plans: the incremental engine's output must equal
the full recompute — so its oracle IS the full-computation SQL.

``wallet_coin_balances_incremental`` splits the event stream at a fixed
date, computes the prior snapshot from batch 1, then applies
``incremental_contract_state`` with batch 2 — and is checked against
the same DuckDB oracle as the full ``wallet_coin_balances`` query. This
verifies, through the driver's own gate, the invariant the reference
never tests mechanically (SURVEY.md §5):
incremental(b1) + b2 ≡ full(b1 ∪ b2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.incremental import (
    incremental_auc_rollup,
    incremental_contract_state,
    wallet_auc_state,
)
from .risk_features import WALLET_AUC_ROLLUP_ORACLE
from .wallet_features import contract_state_from
from .wallet_model import wallet_transactions
from .windows_plans import WALLET_COIN_BALANCES_ORACLE

SPLIT_AT = "2024-01-15"


def wallet_coin_balances_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    wt = wallet_transactions(spark, sf_dir)
    split = F.lit(SPLIT_AT).cast("timestamp")
    prior = contract_state_from(wt.filter(F.col("ts") < split))
    merged = incremental_contract_state(prior, wt.filter(F.col("ts") >= split))
    return merged.select(
        "wallet_address",
        "contract_address",
        F.col("final_balance").cast("double").alias("final_balance"),
        F.col("incoming_value").cast("double").alias("incoming_value"),
        F.col("outgoing_value").cast("double").alias("outgoing_value"),
        "contract_tx",
        F.unix_micros("first_ts").alias("first_ts_us"),
        F.unix_micros("last_ts").alias("last_ts_us"),
    )


# identical result contract as the full computation → same oracle
WALLET_COIN_BALANCES_INCR_ORACLE = WALLET_COIN_BALANCES_ORACLE


def wallet_auc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11 — the incremental time-integral (AUC) stitch as a verified
    query: snapshot the AUC state at ``SPLIT_AT``, stitch the remaining
    events with the ``prior_balance × (first_ts − prior_last_ts)``
    bridge term (reference
    ethereum_wallet_features_with_auc.sql:627-637), and check the
    result against the FULL-recompute oracle — the driver's gate itself
    proves incremental ≡ full."""
    wt = wallet_transactions(spark, sf_dir)
    split = F.lit(SPLIT_AT).cast("timestamp")
    prior = wallet_auc_state(wt.filter(F.col("ts") < split))
    return incremental_auc_rollup(prior, wt.filter(F.col("ts") >= split))


# incremental must equal the full AUC rollup → same oracle
WALLET_AUC_INCR_ORACLE = WALLET_AUC_ROLLUP_ORACLE
