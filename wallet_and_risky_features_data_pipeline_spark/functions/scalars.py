"""Scalar expression library (SURVEY.md §2.8, §2.10).

Native Column expressions only — no Python UDFs — so every helper stays
inside whole-stage codegen. Each replicates a reference semantic:

- ``date_partition``       — ``strftime('%Y-%m')`` partition key
  (reference src/helpers/data_transformations.py:29-56).
- ``bucket_key``           — 256-way address bucket; the reference uses
  ``substr(address, 3, 2)`` on 0x-prefixed hex addresses
  (stage/transformations/ethereum_contracts.sql:16). Synthetic wallet
  ids aren't hex, so we bucket on the first two hex chars of md5(id) —
  same cardinality and distribution properties.
- ``norm_round``           — ``ROUND(x, 5)`` with ``-0.0 → 0.0``
  normalization (queries/ethereum_wallet_features.sql:102-107).
- ``safe_high_precision``  — truncate string numerics whose magnitude
  exceeds 1e38 before casting, with try_cast + coalesce(0)
  (raw_data_ingestion_pipeline.py:655-670;
  stage/transformations/ethereum_token_transfers.sql:13).
- ``split_pow10``          — POWER(10,d/2)*POWER(10,d/2) decimal-safe
  token scaling (analytics/transformations/ethereum_normal_transactions.sql:53).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DECIMAL(38,9) used for all value arithmetic, like the reference's
# wei/token columns (src/schemas/stage_layer.py:26,65,146).
VALUE_DECIMAL = "decimal(38,9)"


def date_partition(ts: Column) -> Column:
    """yyyy-MM partition key from a timestamp column."""
    return F.date_format(ts, "yyyy-MM")


def bucket_key(addr: Column) -> Column:
    """Two-hex-char (256-way) bucket key for join co-location / pruning."""
    return F.substring(F.md5(addr.cast("string")), 1, 2)


def norm_round(x: Column, scale: int = 5) -> Column:
    """round(x, 5) with negative-zero normalized to positive zero."""
    r = F.round(x, scale)
    return F.when(r == 0.0, F.lit(0.0)).otherwise(r)


def safe_high_precision(
    raw: Column, max_chars: int = 28, target: str = VALUE_DECIMAL
) -> Column:
    """String numeric → decimal with the reference's two guards:
    values too wide for the target decimal are truncated to their first
    ``max_chars`` characters before the cast
    (raw_data_ingestion_pipeline.py:655-670
    ``change_precision_for_high_numbers``: ``abs(int(value)) > 1e38 →
    value[:28]``), and anything that still can't cast becomes 0
    (stage/transformations/ethereum_token_transfers.sql:13 COALESCE
    posture). The trigger is the *magnitude* measured against the
    target's integer capacity (precision − scale), not the string
    length — a 30-digit wei value fits DECIMAL(38,0) exactly and must
    pass through undamaged, while the same value against DECIMAL(38,9)
    (29 integer digits) must be truncated, not silently zeroed by an
    overflowing try_cast. (The reference hard-codes the 1e38 boundary
    because its guarded column is an integer-wei string; scaling the
    boundary to the target generalizes the same intent.)
    """
    import re as _re

    m = _re.fullmatch(r"decimal\((\d+)\s*,\s*(\d+)\)", target.strip().lower())
    int_capacity = (int(m.group(1)) - int(m.group(2))) if m else 29
    s = F.trim(raw.cast("string"))
    # Integer-part digit count: strip sign, fraction, and leading zeros.
    int_digits = F.length(
        F.regexp_replace(F.regexp_replace(s, r"^[+-]|\..*$", ""), r"^0+", "")
    )
    truncated = F.when(
        int_digits > int_capacity, F.substring(s, 1, min(max_chars, int_capacity))
    ).otherwise(s)
    return F.coalesce(truncated.try_cast(target), F.lit(0).cast(target))


def floor_to_day(unix_seconds: Column) -> Column:
    """Floor a unix-seconds timestamp to its UTC day start — the
    reference's gold-layer daily flooring (its legacy test pins
    1671331850 → 1671321600, tests/wallet/test_gold_wallet.py:192-196).
    """
    return (unix_seconds - (unix_seconds % F.lit(86400))).cast("long")


def to_snake_case(name: str) -> str:
    """camelCase/PascalCase → snake_case column renamer (the reference
    snake-cases every serving document key,
    tests/wallet/test_silver_wallet.py:137-161)."""
    out = []
    for i, ch in enumerate(name):
        if ch.isupper() and i > 0 and (name[i - 1].islower() or name[i - 1].isdigit()):
            out.append("_")
        out.append(ch.lower())
    return "".join(out)


def snake_case_columns(df):
    """Rename every column of a DataFrame to snake_case."""
    for c in df.columns:
        df = df.withColumnRenamed(c, to_snake_case(c))
    return df


def split_pow10(decimals: Column) -> Column:
    """10^d computed as 10^(d/2) * 10^(d/2) — the reference's trick to
    keep DECIMAL token scaling inside precision bounds for d up to 38.
    """
    half = (decimals.cast("double") / 2.0)
    return F.pow(F.lit(10.0), half) * F.pow(F.lit(10.0), half)
