"""Data-quality gates (SURVEY.md §5.4 — the reference's real
correctness mechanism in production).

Three families, mirrored from the reference:

- ``missing_sequence``     — generated-sequence anti-join detecting
  gaps in a dense key (missing-blocks check,
  raw_data_ingestion_pipeline.py:715-756).
- ``count_reconciliation`` — per-group count compare between a fact
  table and its rollup (per-block transaction-count check,
  raw_data_ingestion_pipeline.py:758-831).
- ``feature_constraints``  — assertion rows over the feature output
  (non-negative counts, bounded zero-min-balance rate —
  queries/data_quality_ethereum_wallet_features.sql:1-32), returned as
  a UNION of check rows (U6) with ``is_fail`` flags; ``enforce``
  raises on any failure like features_data_quality_pipeline.py:17-58.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .joins import anti_dedup


class DataQualityError(RuntimeError):
    pass


def missing_sequence(df: DataFrame, key_col: str) -> DataFrame:
    """Keys absent from the dense [min, max] range of ``key_col``."""
    spark = df.sparkSession
    lo, hi = df.agg(F.min(key_col), F.max(key_col)).first()
    expected = spark.range(lo, hi + 1).withColumnRenamed("id", key_col)
    return anti_dedup(expected, df.select(key_col), [key_col])


def count_reconciliation(
    facts: DataFrame, rollup: DataFrame, key: str, expected_count_col: str
) -> DataFrame:
    """Groups whose fact row count disagrees with the rollup's claim."""
    actual = facts.groupBy(key).agg(F.count("*").alias("__actual"))
    return (
        rollup.join(actual, key, "left")
        .withColumn("__actual", F.coalesce(F.col("__actual"), F.lit(0)))
        .filter(F.col("__actual") != F.col(expected_count_col))
        .select(key, expected_count_col, F.col("__actual").alias("actual_count"))
    )


def feature_constraints(features: DataFrame) -> DataFrame:
    """Constraint rows over the wallet-features output — fully lazy:
    one aggregation pass, then ``stack`` pivots the single row into
    check rows (no driver round-trip; the reference runs one DQ SQL the
    same way)."""
    agg = features.agg(
        F.count(F.when(F.col("n_tx") < 0, 1)).cast("double").alias("neg_tx"),
        F.count(F.when(F.col("total_fees") < 0, 1)).cast("double").alias("neg_fees"),
        F.count(F.when(F.col("last_tx_us") < F.col("first_tx_us"), 1))
        .cast("double")
        .alias("time_travel"),
        (
            F.count(F.when(F.col("min_pos_balance") == 0, 1)).cast("double")
            / F.count("*")
            * 100.0
        ).alias("zero_pct"),
    )
    # the reference flags excessive zero-minimum-balance rates
    return agg.select(
        F.expr(
            "stack(4,"
            " 'negative_tx_count', neg_tx, neg_tx > 0,"
            " 'negative_fees', neg_fees, neg_fees > 0,"
            " 'time_travel_wallets', time_travel, time_travel > 0,"
            " 'zero_min_balance_pct', zero_pct, zero_pct > 95.0"
            ") AS (check_name, observed, is_fail)"
        )
    )


def enforce(dq: DataFrame) -> None:
    """Raise if any check row failed (DAG-gating behavior)."""
    failed = [r["check_name"] for r in dq.filter("is_fail").collect()]
    if failed:
        raise DataQualityError(f"data-quality checks failed: {failed}")
