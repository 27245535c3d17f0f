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
