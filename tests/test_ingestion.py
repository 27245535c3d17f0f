"""Raw-layer ingestion adapters (SURVEY.md §2.1 S1-S3, S11): fetch
transports are injected fakes; everything Spark-side — declared-schema
scan, timestamp/partition derivation, partitioned append, REST paging
drain — is exercised for real."""

from __future__ import annotations

import csv

import pytest
from pyspark.sql import functions as F

from wallet_and_risky_features_data_pipeline_spark.sources.ingestion import (
    ENTITY_SCHEMAS,
    ETL_COMMANDS,
    fetch_export,
    rest_paged_source,
    stage_entity,
)


def _write_csv(path, header, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


BLOCK_TS = 1_700_000_000  # 2023-11-14 UTC


def _fake_blocks_csv(path, n=3):
    cols = [f.name for f in ENTITY_SCHEMAS["blocks"].fields]
    rows = []
    for i in range(n):
        row = {c: "" for c in cols}
        row.update(
            number=100 + i,
            hash=f"0xb{i:02d}",
            miner=f"0xm{i % 2}",
            gas_used=21000 * (i + 1),
            timestamp=BLOCK_TS + i * 86400 * 40,  # spans two months
        )
        rows.append([row[c] for c in cols])
    _write_csv(path, cols, rows)


def test_fetch_export_failover_and_argv(tmp_path):
    """S1: the CLI argv matches the ethereum-etl contract and failure
    on one RPC url fails over to the next (the reference's retry walk
    down node_rpc_urls)."""
    calls = []

    def flaky_runner(argv):
        calls.append(argv)
        if len(calls) == 1:
            raise RuntimeError("node down")
        _fake_blocks_csv(tmp_path / "blocks.csv")
        _write_csv(
            tmp_path / "tx.csv",
            [f.name for f in ENTITY_SCHEMAS["transactions"].fields],
            [],
        )

    fetch_export(
        "blocks_and_transactions",
        100,
        102,
        ["http://node-a", "http://node-b"],
        {"blocks": str(tmp_path / "blocks.csv"), "transactions": str(tmp_path / "tx.csv")},
        runner=flaky_runner,
    )
    assert len(calls) == 2
    assert calls[0][:2] == ["ethereumetl", "export_blocks_and_transactions"]
    assert calls[0][calls[0].index("--provider-uri") + 1] == "http://node-a"
    assert calls[1][calls[1].index("--provider-uri") + 1] == "http://node-b"
    assert "--blocks-output" in calls[1] and "--transactions-output" in calls[1]


def test_fetch_export_all_nodes_down():
    def dead(argv):
        raise RuntimeError("down")

    with pytest.raises(RuntimeError, match="all RPC nodes failed"):
        fetch_export("tokens", 0, 1, ["a", "b"], {"tokens": "t.csv"}, runner=dead)


def test_stage_entity_blocks_partitioned_append(spark, tmp_path):
    """Declared-schema scan + epoch→timestamp + date_partition, written
    as month-partitioned parquet — the raw layer's S4/S5 path applied
    to a fetched batch."""
    _fake_blocks_csv(tmp_path / "blocks.csv")
    target = str(tmp_path / "lake" / "ethereum_blocks")
    df = stage_entity(spark, "blocks", str(tmp_path / "blocks.csv"), target)
    assert dict(df.dtypes)["timestamp_readable"] == "timestamp"
    back = spark.read.parquet(target)
    assert back.count() == 3
    parts = {r[0] for r in back.select("date_partition").distinct().collect()}
    assert parts == {"2023-11", "2023-12", "2024-02"}
    # appending the same batch again doubles rows (append semantics;
    # idempotency lives in incremental_append, not the sink)
    stage_entity(spark, "blocks", str(tmp_path / "blocks.csv"), target)
    assert spark.read.parquet(target).count() == 6


def test_stage_entity_no_epoch_column(spark, tmp_path):
    """Entities without an epoch column (tokens/contracts) partition by
    block bucket."""
    cols = [f.name for f in ENTITY_SCHEMAS["tokens"].fields]
    _write_csv(
        tmp_path / "tokens.csv",
        cols,
        [
            ["0xt1", "TOK", "Token", 18, 1000000, 123456],
            ["0xt2", "TUK", "Tuken", 6, 5, 456789],
        ],
    )
    df = stage_entity(spark, "tokens", str(tmp_path / "tokens.csv"))
    parts = {r["date_partition"] for r in df.collect()}
    assert parts == {"block_1", "block_4"}
    assert dict(df.dtypes)["total_supply"] == "decimal(38,0)"


def test_every_export_covers_known_entities():
    exported = {e for _, flags in ETL_COMMANDS.values() for e in flags}
    assert exported == set(ENTITY_SCHEMAS)


def test_rest_paged_source_drains_and_normalizes(spark):
    """S11: pages drain until empty, epoch cols become timestamps, and
    missing last_refreshed backfills from created_timestamp."""
    pages = [
        {"results": [
            {"contract_address": "0xa", "symbol": "A", "name": "Alpha",
             "decimals": 18, "created_timestamp": BLOCK_TS, "last_refreshed": None},
            {"contract_address": "0xb", "symbol": "B", "name": "Beta",
             "decimals": 6, "created_timestamp": BLOCK_TS, "last_refreshed": BLOCK_TS + 5},
        ]},
        {"results": [
            {"contract_address": "0xc", "symbol": "C", "name": "Gamma",
             "decimals": 8, "created_timestamp": BLOCK_TS + 10, "last_refreshed": None},
        ]},
        {"results": []},
    ]
    seen = []

    def fetch_page(limit, offset):
        seen.append((limit, offset))
        i = offset // limit
        return pages[i] if i < len(pages) else None

    df = rest_paged_source(spark, fetch_page, limit=2)
    rows = {r["contract_address"]: r for r in df.collect()}
    assert set(rows) == {"0xa", "0xb", "0xc"}
    # the short second page (1 row < limit 2) ends the drain — the
    # empty third fetch the old loop made is no longer needed
    assert seen == [(2, 0), (2, 2)]
    assert dict(df.dtypes)["created_timestamp"] == "timestamp"
    # backfill: 0xa's last_refreshed == its created_timestamp
    assert rows["0xa"]["last_refreshed"] == rows["0xa"]["created_timestamp"]
    assert rows["0xb"]["last_refreshed"] != rows["0xb"]["created_timestamp"]


def test_rest_paged_source_empty_api(spark):
    df = rest_paged_source(spark, lambda limit, offset: None)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields][:2] == ["contract_address", "symbol"]


def test_read_csv_failfast_on_malformed(spark, tmp_path):
    """A value that can't parse into the declared schema aborts the
    scan (FAILFAST) instead of silently becoming NULL; empty fields
    are still typed NULLs."""
    import pytest as _pytest

    from wallet_and_risky_features_data_pipeline_spark.sources.readers import read_csv
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("a", LongType()), StructField("b", LongType())])
    ok = tmp_path / "ok.csv"
    ok.write_text("a,b\n1,\n2,5\n")
    rows = {r["a"]: r["b"] for r in read_csv(spark, str(ok), schema).collect()}
    assert rows == {1: None, 2: 5}

    bad = tmp_path / "bad.csv"
    bad.write_text("a,b\n1,2\nnot_a_number,3\n")
    with _pytest.raises(Exception, match="Malformed|FAILFAST"):
        read_csv(spark, str(bad), schema).collect()


def test_rest_paged_source_bounds_runaway_paging(spark):
    """An API that ignores offset and replays a FULL page forever must
    raise at max_pages instead of hanging while accumulating rows
    driver-side. A short page is the API's own end-of-table signal and
    must not trip the guard, and neither must a healthy table of
    exactly max_pages*limit rows (the probe fetch sees its empty page)."""
    row = {"contract_address": "0xa", "symbol": "A", "name": "Alpha",
           "decimals": 18, "created_timestamp": BLOCK_TS, "last_refreshed": None}
    full = {"results": [row, row]}
    with pytest.raises(RuntimeError, match="misbehaving"):
        rest_paged_source(spark, lambda limit, offset: full, limit=2, max_pages=5)

    # exactly max_pages full pages then empty: accepted via the probe
    def exact(limit, offset):
        return full if offset < 10 else {"results": []}

    df = rest_paged_source(spark, exact, limit=2, max_pages=5)
    assert df.count() == 10

    # short page ends the drain without raising
    def short(limit, offset):
        return full if offset == 0 else {"results": [row]}

    assert rest_paged_source(spark, short, limit=2, max_pages=5).count() == 3


def test_stage_traces_precision_guard_fuzz(spark, tmp_path):
    """S3 + the reference's precision guard
    (raw_data_ingestion_pipeline.py:655-670): wei values whose magnitude
    exceeds 1e38 are truncated to their first 28 chars BEFORE the
    Decimal cast, so a FAILFAST staging scan never aborts on them and
    nothing silently nulls. Fuzzes 1e36..1e41-scale signed integer
    strings through the real CSV staging path."""
    from decimal import Decimal

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    cols = [f.name for f in ENTITY_SCHEMAS["traces"].fields]

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=36, max_value=41),  # digit count
                st.integers(min_value=0, max_value=10**41),
                st.booleans(),  # negate
            ),
            min_size=1,
            max_size=12,
        )
    )
    def run(specs):
        values = []
        for digits, seed, neg in specs:
            v = 10 ** (digits - 1) + seed % (9 * 10 ** (digits - 1))
            values.append(-v if neg else v)
        rows = []
        for i, v in enumerate(values):
            row = {c: "" for c in cols}
            row.update(block_number=1, trace_id=f"t{i}", value=str(v))
            rows.append([row[c] for c in cols])
        path = tmp_path / "traces.csv"
        _write_csv(path, cols, rows)
        out = {
            r["trace_id"]: r["value"]
            for r in stage_entity(spark, "traces", str(path)).collect()
        }
        for i, v in enumerate(values):
            got = out[f"t{i}"]
            assert got is not None, f"value {v} silently nulled"
            s = str(v)
            expect = Decimal(s if len(s.lstrip("-")) <= 38 else s[:28])
            assert got == expect, f"{v}: got {got}, want {expect}"

    run()


def test_stage_traces_missing_value_stays_null(spark, tmp_path):
    """The guard's garbage→0 must not convert genuinely missing CSV
    fields: an empty value cell stages as a typed NULL."""
    cols = [f.name for f in ENTITY_SCHEMAS["traces"].fields]
    row = {c: "" for c in cols}
    row.update(block_number=1, trace_id="t0")
    path = tmp_path / "traces.csv"
    _write_csv(path, cols, [[row[c] for c in cols]])
    out = stage_entity(spark, "traces", str(path)).collect()[0]
    assert out["value"] is None


def test_stage_blocks_difficulty_wide_value_truncates_not_zeroes(spark, tmp_path):
    """blocks.difficulty is DECIMAL(38,9) — only 29 integer digits fit.
    A 30-digit difficulty must come through TRUNCATED (the guard scales
    the reference's 1e38 boundary to the target's integer capacity),
    never silently coalesced to 0 by an overflowing try_cast."""
    from decimal import Decimal

    cols = [f.name for f in ENTITY_SCHEMAS["blocks"].fields]
    wide = "9" * 30
    row = {c: "" for c in cols}
    row.update(number=1, hash="0xb", timestamp=BLOCK_TS, difficulty=wide)
    path = tmp_path / "blocks.csv"
    _write_csv(path, cols, [[row[c] for c in cols]])
    out = stage_entity(spark, "blocks", str(path)).collect()[0]
    assert out["difficulty"] == Decimal(wide[:28])
    assert out["difficulty"] != 0
