

def test_stream_session_applies_rocksdb_state_store(spark):
    """Stateful jobs must run on the RocksDB provider whenever it is on
    the classpath (heap-backed state is an OOM at a 100 TB keyspace),
    and honor the SPARK_GRAFT_STATE_STORE=hdfs escape hatch."""
    import os

    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        _ROCKSDB_PROVIDER,
        _rocksdb_available,
        _stream_session,
    )

    s = _stream_session(spark)
    if _rocksdb_available(spark):
        assert (
            s.conf.get("spark.sql.streaming.stateStore.providerClass")
            == _ROCKSDB_PROVIDER
        )
    prev = os.environ.get("SPARK_GRAFT_STATE_STORE")
    os.environ["SPARK_GRAFT_STATE_STORE"] = "hdfs"
    try:
        s2 = _stream_session(spark)
        assert (
            s2.conf.get(
                "spark.sql.streaming.stateStore.providerClass",
                "default",
            )
            != _ROCKSDB_PROVIDER
        )
    finally:
        if prev is None:
            del os.environ["SPARK_GRAFT_STATE_STORE"]
        else:
            os.environ["SPARK_GRAFT_STATE_STORE"] = prev


def test_stateful_stream_reports_state_metrics(spark):
    """state_store_metrics surfaces per-batch state rows/bytes from the
    progress feed — nonzero for a keyed aggregation, so state growth is
    a measured number, not a heap surprise."""
    import tempfile

    from pyspark.sql import functions as F

    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        _stream_session,
        state_store_metrics,
    )

    s = _stream_session(spark, shuffle_partitions=2)
    src = tempfile.mkdtemp(prefix="wrf_state_src_")
    ck = tempfile.mkdtemp(prefix="wrf_state_ck_")
    s.range(200).select((F.col("id") % 7).alias("k")).write.parquet(f"{src}/d")
    q = (
        s.readStream.schema("k long")
        .parquet(f"{src}/d")
        .groupBy("k")
        .count()
        .writeStream.outputMode("complete")
        .format("noop")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    metrics = state_store_metrics(q)
    assert metrics, "no state operator metrics captured"
    assert any(m["state_rows"] == 7 for m in metrics)
    assert all(m["state_bytes"] is not None for m in metrics)
