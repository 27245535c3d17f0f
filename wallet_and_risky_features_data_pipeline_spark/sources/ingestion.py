"""Raw-layer ingestion adapters (SURVEY.md §2.1 S1-S3, S11).

The reference's raw layer shells out to the ``ethereum-etl`` CLI per
entity (blocks+transactions, receipts+logs, contracts, tokens, traces,
token_transfers — raw_data_ingestion_pipeline.py:47-59,208-215,306-313,
389-397,468-473,620-626), stages the resulting CSVs through pandas, and
appends month-partitioned parquet. Token metadata arrives through a
REST limit/offset paging loop (get_token_metadata_transpose.py:22-65,
96-127).

Here the *fetch* stays driver-side — it is I/O against one node/API,
not a relational operator — but everything after the fetch is a
distributed Spark plan: declared-schema CSV scan (never inferred),
epoch→timestamp derivation and the ``date_partition=YYYY-MM`` key as
codegen expressions, and the partitioned-append sink. Transports are
injectable callables so the staging path is fully testable without a
node: tests inject a fake runner/pager, production passes the real
subprocess/HTTP ones.

Scale note: one fetched CSV batch is small (a block range); the append
sink partitions by month so a 100 TB lake accretes through the same
code path, and re-staging is idempotent through the incremental-append
guard (streaming/incremental.py) rather than this module.
"""

from __future__ import annotations

import shutil
import subprocess
from collections.abc import Callable, Iterable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DecimalType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.scalars import safe_high_precision
from .readers import read_csv
from .writers import write_partitioned

# ---------------------------------------------------------------------------
# Entity schemas — the columns the ethereum-etl CSV exports produce
# (public CLI format), typed as the reference's stage-layer registry
# types them (src/schemas/stage_layer.py: LongType ids/gas, DecimalType
# (38,9)-class numerics for wei values, StringType addresses/hashes).
# Declared, never inferred — a schema drift in a fetched CSV must fail
# loudly at scan time, not corrupt a lake partition silently.
# ---------------------------------------------------------------------------


def _schema(fields: Sequence[tuple[str, object]]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


_WEI = DecimalType(38, 0)

ENTITY_SCHEMAS: dict[str, StructType] = {
    "blocks": _schema(
        [
            ("number", LongType()),
            ("hash", StringType()),
            ("parent_hash", StringType()),
            ("nonce", StringType()),
            ("sha3_uncles", StringType()),
            ("logs_bloom", StringType()),
            ("transactions_root", StringType()),
            ("state_root", StringType()),
            ("receipts_root", StringType()),
            ("miner", StringType()),
            ("difficulty", DecimalType(38, 9)),
            ("total_difficulty", DecimalType(38, 9)),
            ("size", LongType()),
            ("extra_data", StringType()),
            ("gas_limit", LongType()),
            ("gas_used", LongType()),
            ("timestamp", LongType()),
            ("transaction_count", LongType()),
            ("base_fee_per_gas", LongType()),
        ]
    ),
    "transactions": _schema(
        [
            ("hash", StringType()),
            ("nonce", LongType()),
            ("block_hash", StringType()),
            ("block_number", LongType()),
            ("transaction_index", LongType()),
            ("from_address", StringType()),
            ("to_address", StringType()),
            ("value", _WEI),
            ("gas", LongType()),
            ("gas_price", LongType()),
            ("input", StringType()),
            ("block_timestamp", LongType()),
            ("max_fee_per_gas", LongType()),
            ("max_priority_fee_per_gas", LongType()),
            ("transaction_type", LongType()),
        ]
    ),
    "receipts": _schema(
        [
            ("transaction_hash", StringType()),
            ("transaction_index", LongType()),
            ("block_hash", StringType()),
            ("block_number", LongType()),
            ("cumulative_gas_used", LongType()),
            ("gas_used", LongType()),
            ("contract_address", StringType()),
            ("root", StringType()),
            ("status", LongType()),
            ("effective_gas_price", LongType()),
        ]
    ),
    "logs": _schema(
        [
            ("log_index", LongType()),
            ("transaction_hash", StringType()),
            ("transaction_index", LongType()),
            ("block_hash", StringType()),
            ("block_number", LongType()),
            ("address", StringType()),
            ("data", StringType()),
            ("topics", StringType()),
        ]
    ),
    "token_transfers": _schema(
        [
            ("token_address", StringType()),
            ("from_address", StringType()),
            ("to_address", StringType()),
            ("value", _WEI),
            ("transaction_hash", StringType()),
            ("log_index", LongType()),
            ("block_number", LongType()),
        ]
    ),
    "contracts": _schema(
        [
            ("address", StringType()),
            ("bytecode", StringType()),
            ("function_sighashes", StringType()),
            ("is_erc20", BooleanType()),
            ("is_erc721", BooleanType()),
            ("block_number", LongType()),
        ]
    ),
    "tokens": _schema(
        [
            ("address", StringType()),
            ("symbol", StringType()),
            ("name", StringType()),
            ("decimals", LongType()),
            ("total_supply", _WEI),
            ("block_number", LongType()),
        ]
    ),
    "traces": _schema(
        [
            ("block_number", LongType()),
            ("transaction_hash", StringType()),
            ("transaction_index", LongType()),
            ("from_address", StringType()),
            ("to_address", StringType()),
            ("value", _WEI),
            ("input", StringType()),
            ("output", StringType()),
            ("trace_type", StringType()),
            ("call_type", StringType()),
            ("reward_type", StringType()),
            ("gas", LongType()),
            ("gas_used", LongType()),
            ("subtraces", LongType()),
            ("trace_address", StringType()),
            ("error", StringType()),
            ("status", LongType()),
            ("trace_id", StringType()),
        ]
    ),
}

# Which ethereum-etl subcommand exports which entity, and the CLI flag
# naming each entity's output file (S1: export_blocks_and_transactions,
# S2: export_receipts_and_logs, S3: the rest —
# raw_data_ingestion_pipeline.py:47-59,208-215,306-313,389-397,
# 468-473,620-626).
ETL_COMMANDS: dict[str, tuple[str, dict[str, str]]] = {
    "blocks_and_transactions": (
        "export_blocks_and_transactions",
        {"blocks": "--blocks-output", "transactions": "--transactions-output"},
    ),
    "receipts_and_logs": (
        "export_receipts_and_logs",
        {"receipts": "--receipts-output", "logs": "--logs-output"},
    ),
    "contracts": ("export_contracts", {"contracts": "--output"}),
    "tokens": ("export_tokens", {"tokens": "--output"}),
    "traces": ("export_traces", {"traces": "--output"}),
    "token_transfers": ("extract_token_transfers", {"token_transfers": "--output"}),
}

Runner = Callable[[list[str]], None]


def _subprocess_runner(timeout_s: int = 600) -> Runner:
    """Production transport: run the ethereum-etl CLI (same 600 s
    timeout as the reference, raw_data_ingestion_pipeline.py:29).
    Raises if the CLI is not installed — callers that want a fake
    inject their own runner instead."""
    if shutil.which("ethereumetl") is None:
        raise RuntimeError(
            "ethereumetl CLI not found on PATH; inject a runner= callable "
            "or install ethereum-etl to fetch live data"
        )

    def run(argv: list[str]) -> None:
        subprocess.run(argv, check=True, timeout=timeout_s)

    return run


def fetch_export(
    export: str,
    start_block: int,
    end_block: int,
    node_rpc_urls: Sequence[str],
    out_paths: Mapping[str, str],
    runner: Runner | None = None,
) -> None:
    """S1-S3 fetch: one ethereum-etl export over a block range, with
    the reference's failover semantics — on any failure, retry on the
    next RPC url until the list is exhausted
    (raw_data_ingestion_pipeline.py:62-90 retries down node_rpc_urls).

    ``runner`` executes the argv (injectable; defaults to the real
    subprocess transport, which requires the CLI to be installed)."""
    subcommand, flag_by_entity = ETL_COMMANDS[export]
    run = runner or _subprocess_runner()
    last_err: Exception | None = None
    for url in node_rpc_urls:
        argv = [
            "ethereumetl",
            subcommand,
            "--start-block",
            str(start_block),
            "--end-block",
            str(end_block),
            "--provider-uri",
            url,
        ]
        for entity, flag in flag_by_entity.items():
            argv += [flag, out_paths[entity]]
        try:
            run(argv)
            return
        except Exception as e:  # noqa: BLE001 — any node failure → failover
            last_err = e
    raise RuntimeError(
        f"all RPC nodes failed for {subcommand} [{start_block}, {end_block}]"
    ) from last_err


def stage_entity(
    spark: SparkSession,
    entity: str,
    csv_path: str,
    target_path: str | None = None,
    ts_col: str | None = "timestamp",
) -> DataFrame:
    """Distributed staging of one fetched CSV: declared-schema scan →
    ``timestamp_readable`` + ``date_partition=YYYY-MM`` derivation →
    (optionally) month-partitioned parquet append.

    Replaces the reference's pandas hop (pd.read_csv →
    convert_timestamp_to_datetime → add_partition_column →
    write_parquet_table, raw_data_ingestion_pipeline.py:104-118) with
    codegen expressions; entities without an epoch column (contracts,
    tokens, …) partition by block bucket instead, matching how the
    reference backfills them from the joined block timestamp later in
    the stage layer."""
    declared = ENTITY_SCHEMAS[entity]
    # Decimal (wei-scale) columns scan as strings, then pass through the
    # reference's precision guard before the cast
    # (raw_data_ingestion_pipeline.py:655-670 truncates >1e38 magnitudes
    # to 28 chars BEFORE Decimal conversion). Scanning them as
    # DecimalType directly would let one absurd on-chain value abort the
    # whole FAILFAST scan — the exact failure the reference guards.
    scan_schema = StructType(
        [
            StructField(f.name, StringType() if isinstance(f.dataType, DecimalType) else f.dataType)
            for f in declared.fields
        ]
    )
    df = read_csv(spark, csv_path, scan_schema)
    for f in declared.fields:
        if isinstance(f.dataType, DecimalType):
            # Missing fields stay typed NULLs (like the direct decimal
            # scan produced); the guard's garbage→0 applies only to
            # values that were present.
            df = df.withColumn(
                f.name,
                F.when(
                    F.col(f.name).isNull(), F.lit(None).cast(f.dataType)
                ).otherwise(
                    safe_high_precision(F.col(f.name), target=f.dataType.simpleString())
                ),
            )
    if ts_col and ts_col in df.columns:
        df = df.withColumn(
            "timestamp_readable", F.timestamp_seconds(F.col(ts_col))
        ).withColumn("date_partition", F.date_format("timestamp_readable", "yyyy-MM"))
    else:
        df = df.withColumn(
            "date_partition",
            F.format_string("block_%d", (F.col("block_number") / 100000).cast("long")),
        )
    if target_path is not None:
        write_partitioned(df, target_path, partition_cols=["date_partition"])
    return df


# ---------------------------------------------------------------------------
# S11 — REST metadata source (limit/offset paging → DataFrame)
# ---------------------------------------------------------------------------

TOKEN_METADATA_SCHEMA = _schema(
    [
        ("contract_address", StringType()),
        ("symbol", StringType()),
        ("name", StringType()),
        ("decimals", LongType()),
        ("created_timestamp", LongType()),
        ("last_refreshed", LongType()),
    ]
)

FetchPage = Callable[[int, int], Mapping | None]


def rest_paged_source(
    spark: SparkSession,
    fetch_page: FetchPage,
    schema: StructType = TOKEN_METADATA_SCHEMA,
    limit: int = 50_000,
    epoch_cols: Iterable[str] = ("created_timestamp", "last_refreshed"),
    fill_from: tuple[str, str] | None = ("last_refreshed", "created_timestamp"),
    max_pages: int = 1_000,
) -> DataFrame:
    """S11: drain a limit/offset-paged REST API into one DataFrame.

    Mirrors the reference's Transpose paging loop
    (get_token_metadata_transpose.py:96-127): fetch pages of ``limit``
    rows until an empty/None page, accumulate driver-side (the payload
    is dimension-sized metadata, not event volume), then hand off to a
    declared-schema DataFrame. Epoch columns become timestamps and
    missing ``last_refreshed`` backfills from ``created_timestamp`` —
    both as Spark expressions, not pandas (the reference's
    convert_timestamp_to_datetime / fill_missing_last_refreshed).

    ``fetch_page(limit, offset)`` is the injectable transport: tests
    pass a closure over fixture pages; production wraps requests/urllib
    with its own retry policy (the reference retries 2× per page).

    ``max_pages`` bounds the drain (mirroring the reference's bounded
    retry posture): a misbehaving API that never returns an empty page
    — or one that ignores ``offset`` and replays page 1 forever —
    would otherwise hang the job while accumulating rows driver-side
    until the driver OOMs. Exceeding the bound raises rather than
    silently truncating: a partial dimension table is corrupt input
    for every downstream join."""
    rows: list[Mapping] = []
    offset = 0
    for _ in range(max_pages):
        page = fetch_page(limit, offset)
        results = (page or {}).get("results") or []
        if not results:
            break
        rows.extend(results)
        offset += limit
        if len(results) < limit:
            break  # short page: the API itself says this was the last
    else:
        # max_pages full pages: a table of exactly max_pages*limit rows
        # is still legal — one extra probe fetch distinguishes it from
        # a runaway (offset-ignoring) API before raising.
        probe = (fetch_page(limit, offset) or {}).get("results") or []
        if probe:
            raise RuntimeError(
                f"rest_paged_source: no empty page after {max_pages} pages "
                f"({len(rows)} rows accumulated) — API paging is misbehaving "
                "(offset ignored?) or the table is larger than the bound; "
                "raise max_pages only if the latter"
            )
    names = [f.name for f in schema.fields]
    df = spark.createDataFrame(
        [tuple(r.get(n) for n in names) for r in rows], schema
    )
    for c in epoch_cols:
        df = df.withColumn(c, F.timestamp_seconds(F.col(c)))
    if fill_from is not None:
        tgt, src = fill_from
        df = df.withColumn(tgt, F.coalesce(F.col(tgt), F.col(src)))
    return df
