"""Data-quality plans: the reference's feature-constraint gate
(queries/data_quality_ethereum_wallet_features.sql) as an
oracle-verified query — a UNION of check rows (U6) over the flagship
feature output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.quality import feature_constraints
from .wallet_features import WALLET_FEATURES_ORACLE, wallet_features


def dq_feature_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return feature_constraints(wallet_features(spark, sf_dir))


DQ_FEATURE_CONSTRAINTS_ORACLE = f"""
WITH feat AS ({WALLET_FEATURES_ORACLE}),
agg AS (
    SELECT
        CAST(COUNT(CASE WHEN n_tx < 0 THEN 1 END) AS DOUBLE) AS neg_tx,
        CAST(COUNT(CASE WHEN total_fees < 0 THEN 1 END) AS DOUBLE) AS neg_fees,
        CAST(COUNT(CASE WHEN last_tx_us < first_tx_us THEN 1 END) AS DOUBLE) AS time_travel,
        CAST(COUNT(CASE WHEN min_pos_balance = 0 THEN 1 END) AS DOUBLE)
            / COUNT(*) * 100.0 AS zero_pct
    FROM feat
)
SELECT 'negative_tx_count' AS check_name, neg_tx AS observed, neg_tx > 0 AS is_fail FROM agg
UNION ALL
SELECT 'negative_fees', neg_fees, neg_fees > 0 FROM agg
UNION ALL
SELECT 'time_travel_wallets', time_travel, time_travel > 0 FROM agg
UNION ALL
SELECT 'zero_min_balance_pct', zero_pct, zero_pct > 95.0 FROM agg
"""


# --------------------------------------------------------------------------
# Ledger reconciliation: the double-entry invariant as a corpus-wide
# DQ query — every event's two legs must net to exactly −tx_fee
# (sender pays value+fee, receiver gets value), so Σlegs + fee = 0 per
# event, in EXACT decimals. An accounting close would run this nightly;
# any violation count > 0 means the role explosion or a downstream
# rewrite corrupted a leg. One hash agg on event_id (co-located legs)
# + a tiny per-type rollup.
def ledger_reconciliation(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from .wallet_model import wallet_transactions

    wt = wallet_transactions(spark, sf_dir)
    per_event = wt.groupBy("event_id", "transaction_type").agg(
        F.sum("signed_value").alias("net"),
        F.max("tx_fee").alias("fee"),
        F.count(F.lit(1)).alias("n_legs"),
    )
    return (
        per_event.groupBy("transaction_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                ((F.col("net") + F.col("fee")) != 0).cast("int")
            )
            .cast("bigint")
            .alias("net_violations"),
            F.sum((F.col("n_legs") != 2).cast("int"))
            .cast("bigint")
            .alias("leg_violations"),
            F.sum("fee").cast("double").alias("total_fees"),
        )
        .orderBy("transaction_type")
    )


from .wallet_model import WALLET_TX_ORACLE_CTE as _WT_CTE

LEDGER_RECONCILIATION_ORACLE = f"""
WITH {_WT_CTE},
per_event AS (
    SELECT event_id, transaction_type,
           SUM(signed_value) AS net,
           MAX(tx_fee) AS fee,
           COUNT(*) AS n_legs
    FROM wallet_tx
    GROUP BY 1, 2
)
SELECT transaction_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN net + fee <> 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS net_violations,
       CAST(SUM(CASE WHEN n_legs <> 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS leg_violations,
       CAST(SUM(fee) AS DOUBLE) AS total_fees
FROM per_event
GROUP BY 1
ORDER BY 1
"""


# --------------------------------------------------------------------------
# k-anonymity audit — the privacy gate a training-data pipeline runs
# before release: every quasi-identifier combination must be shared
# by >= K individuals, else those rows re-identify and must be
# generalized or suppressed. Quasi-identifiers here: (nation,
# market segment) over customers, with account-balance sign as the
# sensitive-adjacent attribute summarized per cell. ONE hash agg on
# the QI key (map-side combinable); the suppression candidate list is
# the < K tail, tiny by construction. At 100 TB the same plan holds:
# cell cardinality is |QI-space|-bounded, never row-bounded.
K_ANONYMITY_K = 5


def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..sources.readers import read_table

    cust = read_table(spark, sf_dir, "customer")
    cells = cust.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_individuals"),
        F.sum((F.col("c_acctbal") < 0).cast("bigint")).alias("n_negative_bal"),
    )
    return cells.select(
        "nationkey",
        "mktsegment",
        "n_individuals",
        "n_negative_bal",
        (F.col("n_individuals") >= K_ANONYMITY_K).cast("int").alias("meets_k"),
    )


DQ_K_ANONYMITY_ORACLE = f"""
SELECT c_nationkey AS nationkey,
       c_mktsegment AS mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_individuals,
       CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_negative_bal,
       CAST(COUNT(*) >= {K_ANONYMITY_K} AS INTEGER) AS meets_k
FROM customer
GROUP BY 1, 2
"""
