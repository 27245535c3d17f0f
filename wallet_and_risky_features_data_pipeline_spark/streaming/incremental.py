"""Incremental (watermark) engine — SURVEY.md §3 EP2/EP3 semantics.

The reference's incremental loop is: probe MAX(watermark column) on the
target, substitute it into a SQL template's ``-- incremental load``
half, execute INSERT-with-NOT-EXISTS or Iceberg MERGE
(stage_data_ingestion_pipeline.py:44-108; features_pipeline.py:78-126).
Here the same contract is a small library:

- ``WatermarkStore``        — durable watermark metadata (JSON file;
  a Delta/Iceberg table in production). Replaces the reference's
  MAX()-probe + string substitution.
- ``incremental_append``    — watermark filter → anti-join dedup →
  partitioned append (J9 + S7).
- ``incremental_contract_state`` — seed running aggregates with prior
  state and stitch lifetime min/max — the reference's hardest block
  (queries/ethereum_wallet_features.sql:481-612: COALESCE(prior,0)
  seeding, min/max-ever merge with the 0-vs-NULL convention).
  Guarantees incremental(b1)+incremental(b2) ≡ full(b1∪b2); the
  property test in tests/test_incremental.py enforces it exactly.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import anti_dedup
from ..sources.writers import write_partitioned


class WatermarkStore:
    """File-backed watermark metadata, one value per table key."""

    def __init__(self, path: str) -> None:
        self.path = path

    def _load(self) -> dict:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return {}

    def get(self, table: str, default=None):
        return self._load().get(table, default)

    def set(self, table: str, value) -> None:
        state = self._load()
        state[table] = value
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(state, f)


def incremental_append(
    spark: SparkSession,
    source: DataFrame,
    target_path: str,
    table: str,
    natural_key: Sequence[str],
    watermark_col: str,
    store: WatermarkStore,
    partition_cols: Sequence[str] = ("date_partition",),
) -> int:
    """Watermark-filtered, anti-join-deduped partitioned append.

    Returns the number of rows appended and advances the watermark to
    the batch max. The anti-join makes replays idempotent even when the
    watermark write is lost (at-least-once → effectively-once), exactly
    like the reference's NOT EXISTS guard on top of its MAX() probe.
    """
    wm = store.get(table)
    batch = source if wm is None else source.filter(F.col(watermark_col) > F.lit(wm))
    try:
        existing = spark.read.parquet(target_path).select(*natural_key)
        fresh = anti_dedup(batch, existing, natural_key)
    except Exception:
        fresh = batch
    fresh = fresh.persist()
    n = fresh.count()
    if n:
        write_partitioned(fresh, target_path, partition_cols, mode="append")
        new_wm = batch.agg(F.max(watermark_col)).first()[0]
        if new_wm is not None:
            store.set(table, new_wm if not hasattr(new_wm, "isoformat") else new_wm.isoformat())
    fresh.unpersist()
    return n


_NUM = "decimal(38,9)"


def incremental_contract_state(prior: DataFrame, new_wt: DataFrame) -> DataFrame:
    """Exact incremental update of the per-(wallet, contract) state.

    The reference seeds the new batch's running balance with the stored
    prior balance *inside* the window computation
    (queries/ethereum_wallet_features.sql:481-541), because lifetime
    extrema are over the absolute series — a post-hoc shift of
    locally-computed extrema is wrong for min-of-positives (the
    positivity filter must see shifted values). Steps:

    1. left-join prior final balance as the seed per key (0 if new);
    2. run the standard deterministic-order + running-sum windows over
       the new events, with ``balance = seed + local running sum``;
    3. reduce the segment to per-key state over absolute balances;
    4. stitch lifetime stats with the prior snapshot (min/max-ever
       merge, NULL-skipping MIN convention —
       ethereum_wallet_features.sql:549-612);
    5. union untouched prior rows (U5 anti-join carry-over).

    Invariant (tests/test_incremental.py): for any split b1∪b2,
    ``incremental(contract_state(b1), b2) == contract_state(b1∪b2)``
    to the last decimal digit.
    """
    from ..operators.windows import (
        dedup_rank,
        deterministic_order,
        latest_per_key,
        partition_totals,
        running_sum,
    )
    from ..plans.wallet_model import ORDER_COLS, by_wallet

    key = ["wallet_address", "contract_address"]
    zero = F.lit(0).cast(_NUM)
    seeds = prior.select(*key, F.col("final_balance").alias("__seed"))

    df = deterministic_order(by_wallet(new_wt), key, ORDER_COLS, out="row_num")
    df = dedup_rank(df, ("wallet_address", "event_id"), ("priority",), out="hash_rank")
    df = running_sum(df, F.col("signed_value"), key, ORDER_COLS, out="__local_bal")
    df = df.join(seeds, on=key, how="left").withColumn(
        "balance", (F.coalesce(F.col("__seed"), zero) + F.col("__local_bal")).cast(_NUM)
    )
    df = partition_totals(
        df,
        key,
        {
            "incoming_value": F.sum(
                F.when(F.col("address_role") == "receiver", F.col("current_value")).otherwise(zero)
            ),
            "outgoing_value": F.sum(
                F.when(F.col("address_role") == "sender", F.col("current_value")).otherwise(zero)
            ),
            "contract_fees": F.sum("tx_fee"),
            "contract_tx": F.count(F.when(F.col("hash_rank") == 1, F.lit(1))),
            "first_ts": F.min("ts"),
            "last_ts": F.max("ts"),
            "max_balance": F.max("balance"),
            "min_pos_balance": F.min(F.when(F.col("balance") > 0, F.col("balance"))),
        },
    )
    seg = latest_per_key(df, key, order_desc=("row_num",)).select(
        *key,
        F.col("balance").alias("final_balance"),
        "incoming_value",
        "outgoing_value",
        "contract_fees",
        "contract_tx",
        "first_ts",
        "last_ts",
        "max_balance",
        "min_pos_balance",
    )

    p = prior.select(*key, *[F.col(c).alias(f"p_{c}") for c in prior.columns if c not in key])
    joined = seg.join(p, on=key, how="left")
    stitched = joined.select(
        *key,
        F.col("final_balance").cast(_NUM).alias("final_balance"),
        (F.coalesce(F.col("p_incoming_value"), zero) + F.col("incoming_value"))
        .cast(_NUM)
        .alias("incoming_value"),
        (F.coalesce(F.col("p_outgoing_value"), zero) + F.col("outgoing_value"))
        .cast(_NUM)
        .alias("outgoing_value"),
        (F.coalesce(F.col("p_contract_fees"), zero) + F.col("contract_fees"))
        .cast(_NUM)
        .alias("contract_fees"),
        (F.coalesce(F.col("p_contract_tx"), F.lit(0)) + F.col("contract_tx")).alias("contract_tx"),
        F.least(F.coalesce(F.col("p_first_ts"), F.col("first_ts")), F.col("first_ts")).alias(
            "first_ts"
        ),
        F.greatest(F.coalesce(F.col("p_last_ts"), F.col("last_ts")), F.col("last_ts")).alias(
            "last_ts"
        ),
        F.greatest(F.coalesce(F.col("p_max_balance"), F.col("max_balance")), F.col("max_balance"))
        .cast(_NUM)
        .alias("max_balance"),
        F.when(
            F.col("p_min_pos_balance").isNotNull() & F.col("min_pos_balance").isNotNull(),
            F.least(F.col("p_min_pos_balance"), F.col("min_pos_balance")),
        )
        .otherwise(F.coalesce(F.col("p_min_pos_balance"), F.col("min_pos_balance")))
        .cast(_NUM)
        .alias("min_pos_balance"),
    )
    untouched = anti_dedup(prior, seg.select(*key), key)
    return stitched.unionByName(untouched.select(*stitched.columns))
