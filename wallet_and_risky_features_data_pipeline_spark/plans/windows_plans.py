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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import asof_join
from ..operators.skew import adaptive_running_sum, salted_running_sum
from ..operators.windows import (
    dedup_rank,
    deterministic_order,
    lead_delta,
    running_sum,
)
from ..sources.readers import read_table
from .wallet_features import WALLET_FEATURES_ORACLE, contract_state
from .wallet_model import (
    ORACLE_ORDER,
    ORDER_COLS,
    WALLET_TX_ORACLE_CTE,
    by_wallet,
    wallet_transactions,
    wallet_transactions_lazy,
    wallet_transactions_shared_or_lazy,
)

_KEY = ("wallet_address", "contract_address")


# --------------------------------------------------------------------------
# W1 + W2 — deterministic ordering and canonical-leg dedup rank
def window_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    wt = by_wallet(wallet_transactions_lazy(spark, sf_dir))
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
# W3 — running balance per (wallet, contract), every row.
# Occupancy-triggered skew routing (VERDICT r8 #7): keys above
# HOT_KEY_THRESHOLD rows (the reference's 9 blacklisted >20M-tx
# wallets, ethereum_wallet_features.sql:381-390) are detected by one
# cheap count agg and routed through the chunked two-phase sum, which
# parallelizes the otherwise-serial partition across its day chunks;
# everything else takes the plain single-pass window. Oracle
# unchanged — salted ≡ plain is property-tested, and the two branches
# partition the rows disjointly.
HOT_KEY_THRESHOLD = int(os.environ.get("SPARK_GRAFT_HOT_KEY_THRESHOLD", "20000000"))


def window_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r16: lazy wt build + persist the PROJECTED frame AFTER the
    # by-wallet repartition — the adaptive router's three consumers
    # (hot-key occupancy agg + both branches) read a narrow
    # wallet-partitioned cache instead of the full-width explosion
    # memo, and the windows/aggregate above all reuse that one
    # exchange's layout. Equivalence-gated interleaved A/B:
    # 2.41 → 1.38 s median (0.59×).
    from ..caching import persist_tracked

    wt = persist_tracked(
        by_wallet(
            wallet_transactions_shared_or_lazy(spark, sf_dir).select(
                "event_id", "ts", "priority", "transaction_index", "role_rank",
                "wallet_address", "contract_address", "address_role",
                "signed_value",
            )
        )
    )
    df = adaptive_running_sum(
        wt,
        F.col("signed_value"),
        list(_KEY),
        list(ORDER_COLS),
        out="balance",
        chunk_expr=F.date_trunc("day", F.col("ts")),
        threshold=HOT_KEY_THRESHOLD,
    )
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
# W4 — ETH-converted running balances: the reference's defining output
# (queries/ethereum_wallet_features.sql:109-121): every leg's value is
# converted through the as-of token price, with the native coin fixed
# at price 1 and unpriced tokens at 0 —
# COALESCE(price, CASE contract = 'ETH' THEN 1 ELSE 0 END) — then run
# through the same deterministic running window per (wallet, contract)
# AND per wallet. ``value_in_eth`` deliberately mirrors the reference's
# asymmetric convention (COALESCE(price, 0) WITHOUT the native-coin
# case, ethereum_wallet_features.sql:103) while the balances use the
# full convention.
#
# Synthetic mapping: contract = event_type; 'purchase' (the 'normal'
# transaction type) plays the native coin — absent from the price feed,
# so the →1 branch is live; 'signup' has no feed either (→0 branch
# live); 'click'/'error'/'view' carry real daily prices. The daily
# price is MAX(value) per (type, day) in exact DECIMAL — no division,
# so Spark and DuckDB agree to the last digit. All conversion
# arithmetic is decimal ((20,9)×(12,4)→(33,13), running sums at
# (38,13)); the reference's ROUND(·, 5) is applied in decimal and the
# result emitted as a DECIMAL(38,5) string (decimal→double would
# double-round in DuckDB — same rationale as window_lead_auc). The
# reference's -0.0→0.0 CASE is a float artifact with no decimal
# equivalent (decimal has no signed zero), so it is intentionally
# absent.
#
# Scale shape: price feed is tokens × days at any corpus scale → the
# day-bucketed as-of join collapses it to per-(contract, day) candidate
# arrays and broadcasts those; the price attaches DIRECTLY to each leg
# row on (contract_address, day) with an in-row argmin (each leg
# carries its event's ts and contract, so the per-leg best quote is by
# construction the per-event best quote — no event_id join, and the
# leg table is never shuffled before the single by_wallet exchange).
_PRICED_CONTRACTS = ("click", "error", "view")
_NATIVE_CONTRACT = "purchase"  # the reference's literal-'ETH' analog


def window_running_balance_eth(spark: SparkSession, sf_dir: str) -> DataFrame:
    prices = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(*_PRICED_CONTRACTS))
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("price_day"))
        .agg(F.max(F.col("value").cast("decimal(12,4)")).alias("price"))
    )
    priced_legs = asof_join(
        wallet_transactions_lazy(spark, sf_dir),
        prices.withColumnRenamed("event_type", "contract_address"),
        key=["contract_address"],
        event_id=["event_id"],
        event_ts="ts",
        quote_ts="price_day",
        tolerance_expr="INTERVAL 7 DAYS",
        direction="backward",
        bucket_days=7,
        broadcast_quotes=True,
    ).drop("price_day")

    wt = by_wallet(priced_legs)
    price_eff = F.coalesce(
        F.col("price"),
        F.when(F.col("contract_address") == _NATIVE_CONTRACT, F.lit(1))
        .otherwise(F.lit(0))
        .cast("decimal(12,4)"),
    )
    prod = F.col("current_value").cast("decimal(20,9)") * price_eff
    eth_signed = (
        F.when(
            F.col("address_role") == "sender",
            -prod - F.col("tx_fee").cast("decimal(20,13)"),
        )
        .otherwise(prod)
        .cast("decimal(34,13)")
    )
    df = wt.withColumn("__price_eff", price_eff).withColumn("__eth_signed", eth_signed)
    df = running_sum(df, F.col("__eth_signed"), _KEY, ORDER_COLS, out="__bal_c")
    df = running_sum(df, F.col("__eth_signed"), ("wallet_address",), ORDER_COLS, out="__bal_w")
    return df.select(
        "event_id",
        "wallet_address",
        "contract_address",
        "address_role",
        F.col("__price_eff").cast("double").alias("eth_price"),
        (
            F.col("current_value").cast("decimal(20,9)")
            * F.coalesce(F.col("price"), F.lit(0).cast("decimal(12,4)"))
        )
        .cast("double")
        .alias("value_in_eth"),
        F.round(F.col("__bal_c"), 5).cast("decimal(38,5)").cast("string").alias("bal_eth_by_contract"),
        F.round(F.col("__bal_w"), 5).cast("decimal(38,5)").cast("string").alias("bal_eth_wallet"),
    )


WINDOW_RUNNING_BALANCE_ETH_ORACLE = f"""
WITH {WALLET_TX_ORACLE_CTE},
prices AS (
    SELECT event_type, date_trunc('day', ts) AS price_day,
           MAX(CAST(value AS DECIMAL(12,4))) AS price
    FROM events
    WHERE event_type IN ('click', 'error', 'view')
    GROUP BY 1, 2
),
best AS (
    SELECT e.event_id, p.price,
           ROW_NUMBER() OVER (PARTITION BY e.event_id
                              ORDER BY abs(epoch_us(e.ts) - epoch_us(p.price_day)) ASC,
                                       p.price_day DESC) AS rk
    FROM events e
    JOIN prices p ON p.event_type = e.event_type
       AND p.price_day BETWEEN e.ts - INTERVAL 7 DAY AND e.ts
),
priced AS (
    SELECT w.*, b.price,
           COALESCE(b.price,
                    CAST(CASE WHEN w.contract_address = 'purchase' THEN 1 ELSE 0 END
                         AS DECIMAL(12,4))) AS price_eff
    FROM wallet_tx w
    LEFT JOIN (SELECT event_id, price FROM best WHERE rk = 1) b ON w.event_id = b.event_id
),
signed AS (
    SELECT *,
        CAST(CASE WHEN address_role = 'sender'
             THEN -(CAST(current_value AS DECIMAL(20,9)) * price_eff)
                  - CAST(tx_fee AS DECIMAL(20,13))
             ELSE CAST(current_value AS DECIMAL(20,9)) * price_eff
             END AS DECIMAL(34,13)) AS eth_signed
    FROM priced
)
SELECT
    event_id,
    wallet_address,
    contract_address,
    address_role,
    CAST(price_eff AS DOUBLE) AS eth_price,
    CAST(CAST(current_value AS DECIMAL(20,9))
         * COALESCE(price, CAST(0 AS DECIMAL(12,4))) AS DOUBLE) AS value_in_eth,
    CAST(CAST(ROUND(SUM(eth_signed) OVER (
        PARTITION BY wallet_address, contract_address
        ORDER BY {ORACLE_ORDER}
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 5) AS DECIMAL(38,5))
        AS VARCHAR) AS bal_eth_by_contract,
    CAST(CAST(ROUND(SUM(eth_signed) OVER (
        PARTITION BY wallet_address
        ORDER BY {ORACLE_ORDER}
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 5) AS DECIMAL(38,5))
        AS VARCHAR) AS bal_eth_wallet
FROM signed
"""


# --------------------------------------------------------------------------
# W5 + W6 — whole-partition totals and lifetime min/max balance.
# The lifetime extrema need the running-balance window, but the
# reduction to one row per key is a hash aggregate, NOT six
# whole-partition window columns + .distinct() (which costs an extra
# full-width exchange for the dedup — VERDICT r02 #4). The groupBy
# clusters on the same (wallet, contract) key the window sorted by, so
# no additional exchange is needed after the window stage.
def window_partition_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    wt = by_wallet(wallet_transactions_lazy(spark, sf_dir))
    df = running_sum(wt, F.col("signed_value"), _KEY, ORDER_COLS, out="balance")
    return df.groupBy(*_KEY).agg(
        F.sum("signed_value").cast("double").alias("partition_total"),
        F.count(F.lit(1)).alias("partition_events"),
        F.unix_micros(F.min("ts")).alias("first_ts_us"),
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
        F.max("balance").cast("double").alias("max_balance_ever"),
        F.min(F.when(F.col("balance") > 0, F.col("balance")))
        .cast("double")
        .alias("min_pos_balance_ever"),
    )


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
    wt = by_wallet(wallet_transactions_lazy(spark, sf_dir))
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
    wt = wallet_transactions_shared_or_lazy(spark, sf_dir)
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
# U4 — literal-row whitelist union: the reference restricts wallet
# transactions to tokens present in its metadata table with
# ``decimals > 0``, UNION ALL a single literal 'ETH' row ("we don't
# have the ETH contract on tokens_metadata" —
# queries/ethereum_wallet_features.sql:47-52), and inner-joins that
# whitelist to the fact legs. Synthetic mapping: the metadata table is
# the distinct non-native contracts with a derived ``decimals``
# attribute (length - 4: 'view' gets 0 and is genuinely excluded, so
# the whitelist filter is live); the native coin 'purchase' enters
# ONLY through the literal row, exactly like 'ETH'. The whitelist is
# a handful of rows at any scale → broadcast to the fact side.
def union_whitelist_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    metadata = (
        ev.filter(F.col("event_type") != "purchase")
        .select(F.col("event_type").alias("contract_address"))
        .distinct()
        .withColumn("decimals", F.length("contract_address") - F.lit(4))
    )
    whitelist = (
        metadata.filter(F.col("decimals") > 0)
        .select("contract_address")
        .unionByName(spark.range(1).select(F.lit("purchase").alias("contract_address")))
    )
    wt = wallet_transactions_shared_or_lazy(spark, sf_dir)
    joined = wt.join(F.broadcast(whitelist), "contract_address")
    return joined.groupBy("contract_address", "transaction_type").agg(
        F.count(F.lit(1)).alias("legs"),
        F.sum("signed_value").cast("double").alias("net_flow"),
        F.countDistinct("wallet_address").alias("n_wallets"),
    )


UNION_WHITELIST_ORACLE = f"""
WITH {WALLET_TX_ORACLE_CTE},
metadata AS (
    SELECT DISTINCT event_type AS contract_address,
           length(event_type) - 4 AS decimals
    FROM events
    WHERE event_type <> 'purchase'
),
whitelist AS (
    SELECT contract_address FROM metadata WHERE decimals > 0
    UNION ALL
    SELECT 'purchase' AS contract_address
)
SELECT
    w.contract_address,
    w.transaction_type,
    CAST(COUNT(*) AS BIGINT) AS legs,
    CAST(SUM(signed_value) AS DOUBLE) AS net_flow,
    CAST(COUNT(DISTINCT wallet_address) AS BIGINT) AS n_wallets
FROM wallet_tx w
JOIN whitelist t ON t.contract_address = w.contract_address
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Skew path: the chunked two-phase running sum must produce the exact
# per-row balances of the serial window — registered against the same
# oracle as window_running_balance (per (wallet, contract), chunked by
# day bucket of the event time).
def window_running_balance_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r16: salted_running_sum consumes its input TWICE (chunk windows +
    # the per-chunk totals it joins back) — persist the projected frame
    # after the by-wallet exchange, the window_running_balance rule.
    from ..caching import persist_tracked

    wt = persist_tracked(
        by_wallet(
            wallet_transactions_shared_or_lazy(spark, sf_dir).select(
                "event_id", "ts", "priority", "transaction_index", "role_rank",
                "wallet_address", "contract_address", "address_role",
                "signed_value",
            )
        )
    )
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


# --------------------------------------------------------------------------
# Event-time RANGE-frame rolling window: per user, the trailing-7-day
# event count and value sum at every event. This is the window family
# the ROWS-frame balance engine doesn't cover — the frame is bounded
# by the ORDER value (microseconds), not a row count, so ties at the
# same timestamp are frame peers in both engines by SQL semantics.
# Scale shape: identical to the running balance — one exchange on the
# partition key, one sort, single pass; the frame bound adds no extra
# shuffle. Decimal-exact sums, cast to double at the edge.
_ROLLING_BAND_US = 7 * 24 * 3600 * 1_000_000


def window_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_ROLLING_BAND_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("sum_7d"),
    )


WINDOW_ROLLING_7D_ORACLE = f"""
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_7d
FROM events
WINDOW w AS (
    PARTITION BY user_id ORDER BY epoch_us(ts)
    RANGE BETWEEN {_ROLLING_BAND_US} PRECEDING AND CURRENT ROW
)
"""
