"""Catalog surface (SURVEY.md §2.1 S6/S13): CREATE TABLE AS SELECT into
the session catalog, existence probe, INSERT INTO append — the
reference's CTAS/INSERT template pair as catalog operations."""

from __future__ import annotations

from pyspark.sql import functions as F

from wallet_and_risky_features_data_pipeline_spark.sources.readers import read_table

from .conftest import SF_SMALL


def test_ctas_insert_and_existence_probe(spark):
    # default warehouse dir (./spark-warehouse, gitignored) — the
    # warehouse location is a static conf and can't move per-test
    spark.sql("DROP TABLE IF EXISTS stage_nation")
    assert not spark.catalog.tableExists("stage_nation")  # S13 probe → CTAS branch

    nation = read_table(spark, SF_SMALL, "nation")
    nation.filter(F.col("n_regionkey") < 2).write.format("parquet").saveAsTable("stage_nation")
    assert spark.catalog.tableExists("stage_nation")
    n1 = spark.table("stage_nation").count()
    assert n1 > 0

    # INSERT INTO half (S7): append the remaining rows
    nation.filter(F.col("n_regionkey") >= 2).write.insertInto("stage_nation")
    assert spark.table("stage_nation").count() == nation.count()
    spark.sql("DROP TABLE stage_nation")


def test_bucketed_join_has_no_exchange(spark):
    """The reference carries a derived hash_partition key on both sides
    of its contract joins so Athena co-partitions them (SURVEY.md §4).
    Spark's native form is bucketBy: two tables bucketed on the join
    key join with NO Exchange at all."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders = read_table(spark, SF_SMALL, "orders")
    customer = read_table(spark, SF_SMALL, "customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "Exchange" not in plan, "bucketed join must be shuffle-free"
        assert joined.count() == orders.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE b_orders")
        spark.sql("DROP TABLE b_customer")


def test_read_table_normalizes_mixed_ts_encodings(spark, tmp_path):
    """Regression for the r4 outage: ``events.ts`` has shipped as both
    parquet TIMESTAMP(NANOS) (read as a nanos BIGINT under
    ``nanosAsLong``) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (read
    as TIMESTAMP_NTZ). ``read_table`` must branch on the observed dtype
    and yield identical schema + values for both encodings — a real
    lake has mixed-writer files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    us = [1_700_000_000_000_000, 1_700_000_123_456_789]
    ids = [1, 2]
    for sub, typ, vals in (
        ("micros", pa.timestamp("us"), us),
        ("nanos", pa.timestamp("ns"), [v * 1000 for v in us]),
    ):
        d = tmp_path / sub
        d.mkdir()
        pq.write_table(
            pa.table(
                {"event_id": pa.array(ids, pa.int64()), "ts": pa.array(vals, typ)}
            ),
            str(d / "events.parquet"),
            use_deprecated_int96_timestamps=False,
            coerce_timestamps=None,
        )
    micros = read_table(spark, str(tmp_path / "micros"), "events")
    nanos = read_table(spark, str(tmp_path / "nanos"), "events")
    assert [f.dataType.simpleString() for f in micros.schema.fields] == [
        f.dataType.simpleString() for f in nanos.schema.fields
    ]
    assert dict(micros.dtypes)["ts"] == "timestamp"
    assert micros.orderBy("event_id").collect() == nanos.orderBy("event_id").collect()


def _lakehouse_format_available(spark):
    """True iff a Delta Lake or Iceberg runtime is on the session's
    classpath — neither ships in this container, so the interop smoke
    below is skip-gated (VERDICT r8 #8) and activates the day the
    jars appear."""
    try:
        jvm = spark._jvm
        jvm.Class.forName("org.apache.spark.sql.delta.DeltaLog")
        return "delta"
    except Exception:
        pass
    try:
        jvm = spark._jvm
        jvm.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return "iceberg"
    except Exception:
        return None


def test_lakehouse_interop_smoke(spark, tmp_path):
    """Engine-interop smoke (skip-gated): write a table through a real
    lakehouse format (Delta/Iceberg), read it back with that engine's
    reader, commit the rows as a generation of the store API, and
    verify store reads round-trip — the inverse of the codec-seam
    pattern. Skips unless the jars are present; the test body is the
    contract waiting for them."""
    import pytest as _pytest

    fmt = _lakehouse_format_available(spark)
    if fmt is None:
        _pytest.skip("no Delta/Iceberg runtime on the classpath (expected in this sandbox)")

    from pyspark.sql import functions as F

    from wallet_and_risky_features_data_pipeline_spark.sources.writers import (
        commit_generation,
        read_store,
    )

    src = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    if fmt == "delta":
        lake_path = str(tmp_path / "delta_tbl")
        src.write.format("delta").save(lake_path)
        back = spark.read.format("delta").load(lake_path)
    else:
        spark.sql("CREATE NAMESPACE IF NOT EXISTS local.interop")
        src.writeTo("local.interop.smoke").create()
        back = spark.table("local.interop.smoke")

    store = str(tmp_path / "store")
    commit_generation(back, store)
    got = read_store(spark, store)
    assert got.count() == 100
    assert {r.k for r in got.collect()} == set(range(100))

    if fmt == "iceberg":
        # the OTHER direction (VERDICT r9 #8): a real Iceberg reader
        # consumes the store's exported metadata as a path-based
        # (HadoopTables) table — the export is validated structurally
        # jar-free in test_iceberg_export_structural; here it meets an
        # actual runtime
        from wallet_and_risky_features_data_pipeline_spark.sources.iceberg_export import (
            export_iceberg_metadata,
        )

        export_iceberg_metadata(store)
        ice = spark.read.format("iceberg").load(store)
        assert ice.count() == 100
        assert {r.k for r in ice.collect()} == set(range(100))
    if fmt == "delta":
        # same upgrade for the Delta side: a real Delta reader consumes
        # the store's exported _delta_log (validated structurally
        # jar-free in test_delta_export_structural)
        from wallet_and_risky_features_data_pipeline_spark.sources.delta_export import (
            export_delta_log,
        )

        export_delta_log(store)
        dl = spark.read.format("delta").load(store)
        assert dl.count() == 100
        assert {r.k for r in dl.collect()} == set(range(100))


def test_iceberg_export_structural(spark, tmp_path):
    """VERDICT r9 #8: export Iceberg v2 metadata for a committed
    generation and validate it against the spec STRUCTURALLY (no jar):
    required table-metadata keys, unique schema field ids, spec field
    ids ≥ 1000, the Avro manifest list / manifest round-tripped through
    an INDEPENDENT decoder, per-file record counts matching the parquet
    footers, and partition values matching the hive dirs. The jar-gated
    interop smoke upgrades to reading this export when a runtime
    appears."""
    import json
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from wallet_and_risky_features_data_pipeline_spark.sources.iceberg_export import (
        export_iceberg_metadata,
        read_avro_ocf,
    )
    from wallet_and_risky_features_data_pipeline_spark.sources.writers import (
        commit_generation,
        resolve_store,
    )

    store = str(tmp_path / "ice_store")
    df = spark.range(60).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("bucket"),
        (F.col("id") * 1.5).alias("v"),
    )
    # partitioned layout inside the generation (hive dirs)
    gen_df = df.repartition(2)
    commit_generation(gen_df, store)
    # re-write the live generation partitioned to exercise dir parsing
    live = resolve_store(store)
    part_store = str(tmp_path / "ice_store_part")
    commit_generation(df, part_store)  # placeholder commit for layout
    import shutil

    gen2 = resolve_store(part_store)
    shutil.rmtree(gen2)
    df.write.partitionBy("bucket").parquet(gen2)

    for s, has_parts in ((store, False), (part_store, True)):
        summary = export_iceberg_metadata(s)
        assert summary["n_rows"] == 60
        meta = json.load(open(summary["metadata_json"]))
        for key in (
            "format-version", "table-uuid", "location",
            "last-sequence-number", "last-updated-ms", "last-column-id",
            "schemas", "current-schema-id", "partition-specs",
            "default-spec-id", "last-partition-id", "sort-orders",
            "default-sort-order-id", "current-snapshot-id", "snapshots",
            "refs",
        ):
            assert key in meta, key
        assert meta["format-version"] == 2
        fields = meta["schemas"][0]["fields"]
        ids = [f["id"] for f in fields]
        assert len(ids) == len(set(ids)) and meta["last-column-id"] >= max(ids)
        snap = meta["snapshots"][0]
        assert snap["snapshot-id"] == meta["current-snapshot-id"]
        assert meta["refs"]["main"]["snapshot-id"] == snap["snapshot-id"]
        # HadoopTables layout: integer hint resolving to v<N>.metadata.json
        hint = open(
            os.path.join(s, "metadata", "version-hint.text")
        ).read().strip()
        assert os.path.basename(summary["metadata_json"]) == f"v{hint}.metadata.json"

        # manifest list round-trips through the independent decoder
        _, list_meta, lists = read_avro_ocf(snap["manifest-list"])
        assert list_meta["format-version"] == "2"
        (mf,) = lists
        assert mf["added_rows_count"] == 60
        assert mf["added_snapshot_id"] == snap["snapshot-id"]
        assert os.path.getsize(mf["manifest_path"]) == mf["manifest_length"]

        # manifest entries: counts match parquet footers, partitions
        # match the hive dirs
        _, m_meta, entries = read_avro_ocf(mf["manifest_path"])
        assert m_meta["content"] == "data"
        assert len(entries) == mf["added_files_count"]
        total = 0
        for e in entries:
            dfile = e["data_file"]
            assert e["status"] == 1 and dfile["content"] == 0
            assert dfile["file_format"] == "PARQUET"
            assert os.path.getsize(dfile["file_path"]) == dfile["file_size_in_bytes"]
            assert pq.read_metadata(dfile["file_path"]).num_rows == dfile["record_count"]
            total += dfile["record_count"]
            if has_parts:
                want = [
                    c.split("=", 1)[1]
                    for c in dfile["file_path"].split(os.sep)
                    if c.startswith("bucket=")
                ]
                assert [dfile["partition"]["bucket"]] == want
            else:
                assert dfile["partition"] == {}
        assert total == 60
        if has_parts:
            spec = meta["partition-specs"][0]["fields"]
            assert [f["transform"] for f in spec] == ["identity"]
            assert all(f["field-id"] >= 1000 for f in spec)
            src_ids = {f["id"]: f["name"] for f in fields}
            assert [src_ids[f["source-id"]] for f in spec] == ["bucket"]


def test_delta_export_structural(spark, tmp_path):
    """Delta-log export (the Iceberg export's sibling): map the store's
    generation history onto Delta versions and validate the log against
    the public protocol STRUCTURALLY (no jar): contiguous version
    files, protocol/metaData placement, schemaString parsing through
    Spark's own StructType.fromJson, and a full log REPLAY whose
    reconstructed file state must equal the live generation exactly
    (paths, sizes, partition values). The jar-gated interop smoke
    upgrades to reading this export when a Delta runtime appears."""
    import json
    import os
    from urllib.parse import unquote

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from wallet_and_risky_features_data_pipeline_spark.sources.delta_export import (
        export_delta_log,
    )
    from wallet_and_risky_features_data_pipeline_spark.sources.writers import (
        commit_generation,
        resolve_store,
    )

    store = str(tmp_path / "delta_store")
    for n in (40, 60, 50):  # three generations: grow, then shrink
        df = spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("bucket"),
            (F.col("id") * 1.5).alias("v"),
        )
        commit_generation(df.repartition(2), store)

    summary = export_delta_log(store)
    assert summary["n_versions"] == 3
    log_dir = summary["log_dir"]
    names = sorted(f for f in os.listdir(log_dir) if f.endswith(".json"))
    assert names == [f"{v:020d}.json" for v in range(3)]

    state: dict[str, dict] = {}
    for v, name in enumerate(names):
        actions = [
            json.loads(line)
            for line in open(os.path.join(log_dir, name))
            if line.strip()
        ]
        kinds = [next(iter(a)) for a in actions]
        assert kinds[0] == "commitInfo"
        if v == 0:
            assert "protocol" in kinds and "metaData" in kinds
            proto = next(a["protocol"] for a in actions if "protocol" in a)
            assert proto["minReaderVersion"] == 1
            meta = next(a["metaData"] for a in actions if "metaData" in a)
            assert meta["format"]["provider"] == "parquet"
            schema = StructType.fromJson(json.loads(meta["schemaString"]))
            assert {f.name for f in schema.fields} >= {"k", "bucket", "v"}
        else:
            # overwrite commits: every prior file removed before adds
            assert "remove" in kinds
        for a in actions:
            if "add" in a:
                state[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                assert a["remove"]["path"] in state, "remove of unknown file"
                del state[a["remove"]["path"]]

    live = resolve_store(store)
    expect = set()
    for dirpath, dirnames, filenames in os.walk(live):
        dirnames[:] = [d for d in dirnames if not d.startswith((".", "_"))]
        for fn in filenames:
            if fn.endswith(".parquet"):
                expect.add(os.path.relpath(os.path.join(dirpath, fn), store))
    assert {unquote(p) for p in state} == expect
    for rel, add in state.items():
        assert add["size"] == os.path.getsize(os.path.join(store, unquote(rel)))
        assert add["dataChange"] is True

    # replayed final state must hold exactly the last commit's rows
    total = sum(
        spark.read.parquet(os.path.join(store, unquote(p))).count() for p in state
    )
    assert total == 50


def test_delta_export_partitioned_values(spark, tmp_path):
    """Partition dirs become add.partitionValues and partitionColumns —
    the hive-layout mapping a Delta reader needs to prune on."""
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    from wallet_and_risky_features_data_pipeline_spark.sources.delta_export import (
        export_delta_log,
    )
    from wallet_and_risky_features_data_pipeline_spark.sources.writers import (
        commit_generation,
        resolve_store,
    )

    store = str(tmp_path / "delta_part")
    df = spark.range(30).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("bucket")
    )
    commit_generation(df, store)
    gen = resolve_store(store)
    shutil.rmtree(gen)
    df.write.partitionBy("bucket").parquet(gen)

    summary = export_delta_log(store)
    assert summary["partition_columns"] == ["bucket"]
    actions = [
        json.loads(line)
        for line in open(os.path.join(summary["log_dir"], f"{0:020d}.json"))
        if line.strip()
    ]
    adds = [a["add"] for a in actions if "add" in a]
    assert adds and all(a["partitionValues"].get("bucket") in {"0", "1", "2"} for a in adds)
    seen = {a["partitionValues"]["bucket"] for a in adds}
    assert seen == {"0", "1", "2"}
