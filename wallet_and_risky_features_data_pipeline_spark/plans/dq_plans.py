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
