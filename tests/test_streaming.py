

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


def test_vocab_merge_replay_fence_prevents_double_count(spark):
    """At-least-once redelivery of an already-committed epoch must be a
    no-op: additive count merges are NOT idempotent, so without the
    epoch fence a crash between commit and checkpoint ack would double
    every redelivered token count."""
    import tempfile

    from wallet_and_risky_features_data_pipeline_spark.sources.writers import (
        list_generations,
        read_store,
    )
    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        vocab_merge_batch,
    )

    store = tempfile.mkdtemp(prefix="wrf_fence_") + "/token_freqs"
    b0 = spark.createDataFrame([(0, "alpha beta alpha")], "doc_id long, text string")
    b1 = spark.createDataFrame([(1, "beta gamma")], "doc_id long, text string")

    assert vocab_merge_batch(spark, store, b0, epoch=0) is True
    assert vocab_merge_batch(spark, store, b1, epoch=1) is True
    counts = {r.token: r.freq for r in read_store(spark, store).collect()}
    assert counts == {"alpha": 2, "beta": 2, "gamma": 1}
    gens = list_generations(store)

    # the crash replay: same epoch, same batch — must be skipped
    assert vocab_merge_batch(spark, store, b1, epoch=1) is False
    assert {r.token: r.freq for r in read_store(spark, store).collect()} == counts
    assert list_generations(store) == gens

    # the stream moves on: a genuinely new epoch still applies
    b2 = spark.createDataFrame([(2, "gamma")], "doc_id long, text string")
    assert vocab_merge_batch(spark, store, b2, epoch=2) is True
    assert {r.token: r.freq for r in read_store(spark, store).collect()} == {
        "alpha": 2,
        "beta": 2,
        "gamma": 2,
    }


def test_vocab_stream_crash_restart_is_exactly_once(spark):
    """Kill the vocab-maintenance stream AFTER an epoch's store commit
    but BEFORE its checkpoint acknowledgment — the worst-case crash
    window — then restart from the same checkpoint. Structured
    Streaming replays the unacknowledged epoch; the fence skips it;
    the final store must equal the one-pass recompute exactly."""
    import tempfile

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from wallet_and_risky_features_data_pipeline_spark.plans.llm_ops import token_freqs
    from wallet_and_risky_features_data_pipeline_spark.sources.writers import read_store
    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        _stream_session,
        vocab_merge_batch,
    )

    ss = _stream_session(spark)
    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} tok{i % 3} common") for i in range(40)],
        "doc_id long, text string",
    )
    land = tempfile.mkdtemp(prefix="wrf_crash_land_")
    docs.repartition(4).write.mode("overwrite").parquet(land)
    ckpt = tempfile.mkdtemp(prefix="wrf_crash_ckpt_")
    store = tempfile.mkdtemp(prefix="wrf_crash_store_") + "/token_freqs"

    def crashing(batch, epoch):
        vocab_merge_batch(ss, store, batch, epoch)
        if epoch == 2:
            raise RuntimeError("injected crash after commit, before ack")

    def run(fn):
        return (
            ss.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(land)
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .foreachBatch(fn)
            .start()
        )

    with pytest.raises(StreamingQueryException):
        run(crashing).awaitTermination()

    # restart from the SAME checkpoint with the healthy merge: epoch 2
    # is redelivered (its offsets were never committed), fenced out,
    # and the remaining files process normally
    q = run(lambda b, e: vocab_merge_batch(ss, store, b, e))
    q.awaitTermination()

    merged = {r.token: r.freq for r in read_store(spark, store).collect()}
    expected = {r.token: r.freq for r in token_freqs(docs).collect()}
    assert merged == expected


def test_stream_zscore_matches_batch_on_negative_values(spark, tmp_path):
    """The half-cent rounding seam the review flagged: value = -0.125
    rounds to -13 cents under round-half-away-from-zero (both engines'
    round()) but to -12 under floor(x+0.5). The streaming state
    machine must agree with the batch plan on signed values — run both
    over a synthetic series with negative ticks and compare exactly."""
    from pyspark.sql import functions as F


    from wallet_and_risky_features_data_pipeline_spark.plans.sketch_plans import (
        rolling_zscore_outliers,
    )
    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        stream_rolling_zscore,
    )

    rows = []
    vals = [1.0, -0.125, 2.5, -0.125, 3.0, -1.005, 0.415, -0.125, 2.0, -3.5, 9.0, -0.125]
    for i, v in enumerate(vals):
        rows.append((i + 1, f"2024-01-01 00:{i:02d}:00", 7, "view", v, "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        str(tmp_path / "events.parquet")
    )

    batch = {
        (r["event_id"]): (r["cents"], r["n_baseline"], r["z"], r["is_outlier"])
        for r in rolling_zscore_outliers(spark, str(tmp_path)).collect()
    }
    stream = {
        (r["event_id"]): (r["cents"], r["n_baseline"], r["z"], r["is_outlier"])
        for r in stream_rolling_zscore(spark, str(tmp_path)).collect()
    }
    assert batch == stream and len(batch) == len(vals)
    # the seam case itself: -0.125 must be -13 cents, not -12
    assert batch[2][0] == -13


def test_stream_zscore_exact_fallback_on_huge_values(spark, tmp_path):
    """Values past the int64 fast-path bound (~$4.8M single events —
    num² would exceed 2⁶³) must take the exact arbitrary-precision
    fallback and still agree with the batch plan, whose moments are
    DECIMAL since r9. A silent int64 wrap here is exactly the overflow
    class the ANSI leg kills on the batch side."""
    from pyspark.sql import functions as F

    from wallet_and_risky_features_data_pipeline_spark.plans.sketch_plans import (
        rolling_zscore_outliers,
    )
    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        stream_rolling_zscore,
    )

    vals = [9e6, 1.25, 8.5e6, -7e6, 2.0, 9.9e6, -0.125, 6e6, 7.77e6, 3.0, -9e6, 5e6]
    rows = [
        (i + 1, f"2024-01-01 00:{i:02d}:00", 3, "purchase", v, "{}")
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        str(tmp_path / "events.parquet")
    )

    batch = {
        r["event_id"]: (r["cents"], r["n_baseline"], r["z"], r["is_outlier"])
        for r in rolling_zscore_outliers(spark, str(tmp_path)).collect()
    }
    stream = {
        r["event_id"]: (r["cents"], r["n_baseline"], r["z"], r["is_outlier"])
        for r in stream_rolling_zscore(spark, str(tmp_path)).collect()
    }
    assert batch == stream and len(batch) == len(vals)
    # sanity: the data really is past the fast-path bound (~4.8e8)
    assert abs(batch[1][0]) == 900_000_000  # $9M -> 9e8 cents


def test_stream_zscore_fast_path_guard_covers_outlier_predicate(spark, tmp_path):
    """Regression (ADVICE r9): the fast-path guard must bound the
    LARGEST intermediate, which is the outlier predicate's 9·var_n2
    (9·W²·max²), not num² (4·W²·max²). Alternating ±$1,073,741.81
    events sit just under the old num²-sized bound: they used to take
    the int64 fast path, where 9·var_n2 ≈ 1.04e19 wraps negative and
    flags a spurious outlier, silently diverging from the batch
    oracle. With the 9·W²-sized guard they route to the exact path."""
    from pyspark.sql import functions as F

    from wallet_and_risky_features_data_pipeline_spark.plans.sketch_plans import (
        rolling_zscore_outliers,
    )
    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        stream_rolling_zscore,
    )

    # cents = ±107_374_181: below the old (4·W²) guard, above the new
    # (9·W²) one — the exact window where the wrap used to happen
    v = 1_073_741.81
    vals = [v if i % 2 == 0 else -v for i in range(12)]
    rows = [
        (i + 1, f"2024-01-01 00:{i:02d}:00", 11, "purchase", x, "{}")
        for i, x in enumerate(vals)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        str(tmp_path / "events.parquet")
    )

    batch = {
        r["event_id"]: (r["cents"], r["n_baseline"], r["z"], r["is_outlier"])
        for r in rolling_zscore_outliers(spark, str(tmp_path)).collect()
    }
    stream = {
        r["event_id"]: (r["cents"], r["n_baseline"], r["z"], r["is_outlier"])
        for r in stream_rolling_zscore(spark, str(tmp_path)).collect()
    }
    assert batch == stream and len(batch) == len(vals)
    # an alternating series is NOT an outlier anywhere — the old wrap
    # flagged exactly these full-window rows
    assert all(t[3] == 0 for t in batch.values())
    assert abs(batch[1][0]) == 107_374_181


def test_rolling_zscore_multibatch_ts_ordered_splits(spark, tmp_path):
    """ORDERING CONTRACT pin (ADVICE r8): with a multi-file source
    consumed one file per micro-batch, batch equivalence holds as long
    as the file splits are event-time ordered (the append-only event
    log shape). Two ts-ordered files + maxFilesPerTrigger=1 → two
    real micro-batches crossing the trailing-deque state — the config
    the single-batch registered query never exercises."""
    import os
    import time

    from pyspark.sql import functions as F

    from wallet_and_risky_features_data_pipeline_spark.plans.sketch_plans import (
        rolling_zscore_outliers,
    )
    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        stream_rolling_zscore,
    )

    table = tmp_path / "events.parquet"
    schema = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )

    def chunk(rows):
        return (
            spark.createDataFrame(rows, schema)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
        )

    vals = [1.0, 2.5, 0.4, 3.0, 1.7, 9.0, 0.2, 4.4, 2.2, 0.9, 6.5, 1.1]
    rows = [
        (i + 1, f"2024-01-01 00:{i:02d}:00", 5, "view", v, "{}")
        for i, v in enumerate(vals)
    ]
    chunk(rows[:6]).write.parquet(str(table))
    chunk(rows[6:]).write.mode("append").parquet(str(table))
    # FileStreamSource orders files by modification time: force the
    # first-half parts strictly older so batch 1 = early ts, batch 2 =
    # late ts (the event-time-ordered arrival the contract requires)
    now = time.time()
    for name in os.listdir(table):
        if name.startswith("part-"):
            full = str(table / name)
        else:
            continue
        # the append write's parts are the lexicographically LATER
        # job UUIDs, but mtime is what the source sorts by — restamp
        # deterministically from each part's max event ts
        mx = spark.read.parquet(full).agg(F.max("event_id")).first()[0]
        os.utime(full, (now + mx, now + mx))

    batch = {
        r["event_id"]: (r["cents"], r["n_baseline"], r["z"], r["is_outlier"])
        for r in rolling_zscore_outliers(spark, str(tmp_path)).collect()
    }
    stream = {
        r["event_id"]: (r["cents"], r["n_baseline"], r["z"], r["is_outlier"])
        for r in stream_rolling_zscore(
            spark, str(tmp_path), max_files_per_trigger=1
        ).collect()
    }
    assert batch == stream and len(batch) == len(vals)
    # contract-compliant delivery must report ZERO violations
    from wallet_and_risky_features_data_pipeline_spark.streaming import stream_jobs

    assert stream_jobs.LAST_OOO_VIOLATIONS["stream_rolling_zscore"] == 0


def test_out_of_order_arrival_is_loud_not_silent(spark, tmp_path):
    """VERDICT r9 #2: the contract-bound mirrors (z-score,
    transitions, CUSUM) must ENFORCE their ordered-arrival contract —
    a late file delivered out of ts order used to silently diverge
    them from the batch oracle. Two files with the LATER-consumed one
    carrying EARLIER timestamps (maxFilesPerTrigger=1 → two real
    micro-batches) must surface a NONZERO violation count on every
    mirror, while the entropy mirror (order-invariant state) still
    matches its batch oracle exactly under the same hostile arrival."""
    import os
    import time

    from pyspark.sql import functions as F

    from wallet_and_risky_features_data_pipeline_spark.plans.sessionization import (
        user_activity_entropy,
    )
    from wallet_and_risky_features_data_pipeline_spark.streaming import stream_jobs
    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        stream_activity_entropy,
        stream_cusum_monitor,
        stream_event_transitions,
        stream_rolling_zscore,
    )

    table = tmp_path / "events.parquet"
    schema = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )

    def chunk(rows):
        return (
            spark.createDataFrame(rows, schema)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
        )

    vals = [1.0, 2.5, 0.4, 3.0, 1.7, 9.0, 0.2, 4.4, 2.2, 0.9, 6.5, 1.1]
    types = ["view", "purchase", "view", "error", "view", "purchase"] * 2
    rows = [
        (i + 1, f"2024-01-01 00:{i:02d}:00", 5, types[i], v, "{}")
        for i, v in enumerate(vals)
    ]
    # LATE half written first, EARLY half appended — then mtimes force
    # consumption order (late ts first, early ts second): out-of-order
    chunk(rows[6:]).write.parquet(str(table))
    chunk(rows[:6]).write.mode("append").parquet(str(table))
    now = time.time()
    for name in os.listdir(table):
        if not name.startswith("part-"):
            continue
        full = str(table / name)
        mx = spark.read.parquet(full).agg(F.max("event_id")).first()[0]
        # INVERT: the part holding the LATEST event ids gets the
        # OLDEST mtime, so it is consumed first
        os.utime(full, (now - mx, now - mx))

    for job, key in (
        (stream_rolling_zscore, "stream_rolling_zscore"),
        (stream_event_transitions, "stream_event_transitions"),
        (stream_cusum_monitor, "stream_cusum_monitor"),
    ):
        stream_jobs.LAST_OOO_VIOLATIONS.pop(key, None)
        job(spark, str(tmp_path), max_files_per_trigger=1).collect()
        got = stream_jobs.LAST_OOO_VIOLATIONS[key]
        assert got == 6, f"{key}: want all 6 behind-the-mark rows flagged, got {got}"

    # the order-invariant mirror stays EXACT under the same arrival
    batch = {
        r["user_id"]: tuple(r)
        for r in user_activity_entropy(spark, str(tmp_path)).collect()
    }
    stream = {
        r["user_id"]: tuple(r)
        for r in stream_activity_entropy(
            spark, str(tmp_path), max_files_per_trigger=1
        ).collect()
    }
    assert batch == stream and len(batch) == 1


def test_stream_dedup_cross_batch_redelivery(spark, tmp_path):
    """Exactly-once under CROSS-BATCH redelivery (ADVICE r8): the
    first copy of every event arrives in batch 1 and the duplicate
    copy in batch 2. dropDuplicatesWithinWatermark keys dedup state to
    the inter-arrival gap (≤ the 1-day delay), so the second copy is
    collapsed even though it lands after the watermark advanced past
    batch 1 — the case where plain dropDuplicates' state eviction can
    leak a double count."""
    import os
    import time

    from pyspark.sql import functions as F

    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        stream_dedup_counts_from_dir,
    )

    table = tmp_path / "events.parquet"
    schema = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )
    rows = [
        (i + 1, f"2024-01-01 00:{i:02d}:00", 5, "purchase" if i % 2 else "view",
         float(i) + 0.5, "{}")
        for i in range(10)
    ]

    def chunk():
        return (
            spark.createDataFrame(rows, schema)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
        )

    chunk().write.parquet(str(table))
    chunk().write.mode("append").parquet(str(table))
    parts = sorted(p for p in os.listdir(table) if p.startswith("part-"))
    assert len(parts) == 2
    now = time.time()
    for off, name in enumerate(parts):
        os.utime(str(table / name), (now + off * 10, now + off * 10))

    got = {
        r["event_type"]: (r["n_events"], r["total_cents"])
        for r in stream_dedup_counts_from_dir(spark, str(tmp_path)).collect()
    }
    single = (
        spark.createDataFrame(rows, schema)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).alias("c"),
        )
    )
    want = {r["event_type"]: (r["n"], r["c"]) for r in single.collect()}
    assert got == want


def test_stream_transitions_multibatch_matches_batch(spark, tmp_path):
    """streaming ≡ batch for the Markov pair log across TWO real
    micro-batches: the cross-batch transition (last event of batch 1
    → first event of batch 2, per user) exists ONLY in the remembered
    group state — a stateless per-batch LEAD would drop it, so this
    pins exactly the rows the state machinery is for."""
    import os
    import time

    from pyspark.sql import functions as F

    from wallet_and_risky_features_data_pipeline_spark.plans.sessionization import (
        event_transitions,
    )
    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        stream_event_transitions,
    )

    table = tmp_path / "events.parquet"
    schema = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )

    def chunk(rows):
        return (
            spark.createDataFrame(rows, schema)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
        )

    seq = ["view", "view", "click", "purchase", "view", "click",
           "click", "purchase", "view", "error", "view", "view"]
    rows = [
        (i + 1, f"2024-01-01 00:{i:02d}:00", 100 + (i % 2), t, 1.0, "{}")
        for i, t in enumerate(seq)
    ]
    chunk(rows[:6]).write.parquet(str(table))
    chunk(rows[6:]).write.mode("append").parquet(str(table))
    now = time.time()
    for name in os.listdir(table):
        if not name.startswith("part-"):
            continue
        full = str(table / name)
        mx = spark.read.parquet(full).agg(F.max("event_id")).first()[0]
        os.utime(full, (now + mx, now + mx))

    key = lambda df: {
        (r["from_type"], r["to_type"]): (
            r["n_transitions"], r["n_users"], r["p_transition"]
        )
        for r in df.collect()
    }
    batch = key(event_transitions(spark, str(tmp_path)))
    stream = key(
        stream_event_transitions(spark, str(tmp_path), max_files_per_trigger=1)
    )
    assert batch == stream
    # the cross-batch boundary pairs must be present: per user, the
    # (batch-1 last → batch-2 first) transition
    total_pairs = sum(n for n, _, _ in batch.values())
    assert total_pairs == len(seq) - 2  # 12 events, 2 users → 10 pairs


def test_stream_cusum_multibatch_matches_batch(spark, tmp_path):
    """streaming ≡ batch for the CUSUM monitor across TWO real
    micro-batches: the remembered (P, min P) pair is the ONLY carrier
    of pre-boundary history, so agreement with the batch windows on a
    multi-batch source pins exactly the closed-form state design."""
    import os
    import time

    from pyspark.sql import functions as F

    from wallet_and_risky_features_data_pipeline_spark.plans.sketch_plans import (
        user_cusum_alerts,
    )
    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        stream_cusum_monitor,
    )

    table = tmp_path / "events.parquet"
    schema = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )

    def chunk(rows):
        return (
            spark.createDataFrame(rows, schema)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
        )

    # values chosen so s crosses the alarm line, resets to 0, and the
    # final day differs from the max — every output column does work;
    # user 101 stays negative (s pinned at 0) to cover the floor
    vals = [900.0, 5200.0, -300.0, 80.0, 7000.0, -9000.0,
            640.0, 1200.0, 30.0, -50.0, 9800.0, 10.0]
    rows = [
        (i + 1, f"2024-01-01 00:{i:02d}:00", 100 + (i % 2), "swap", v, "{}")
        for i, v in enumerate(vals)
    ]
    chunk(rows[:6]).write.parquet(str(table))
    chunk(rows[6:]).write.mode("append").parquet(str(table))
    now = time.time()
    for name in os.listdir(table):
        if not name.startswith("part-"):
            continue
        full = str(table / name)
        mx = spark.read.parquet(full).agg(F.max("event_id")).first()[0]
        os.utime(full, (now + mx, now + mx))

    key = lambda df: {
        r["user_id"]: (
            r["n_events"], r["max_cusum_c"], r["final_cusum_c"], r["n_alarms"]
        )
        for r in df.collect()
    }
    batch = key(user_cusum_alerts(spark, str(tmp_path)))
    stream = key(stream_cusum_monitor(spark, str(tmp_path), max_files_per_trigger=1))
    assert batch == stream
    assert len(batch) == 2
    # the floor must have engaged for at least one user (max > final
    # or an alarm fired) — guards against a degenerate all-zero case
    assert any(mx > 0 for _, mx, _, _ in batch.values())


def test_stream_entropy_multibatch_matches_batch(spark, tmp_path):
    """streaming ≡ batch for the entropy profile across TWO real
    micro-batches — and because a histogram is order-invariant, the
    equality must hold even though the split point is arbitrary; the
    cross-batch accumulation lives only in the 24-slot state."""
    import os
    import time

    from pyspark.sql import functions as F

    from wallet_and_risky_features_data_pipeline_spark.plans.sessionization import (
        user_activity_entropy,
    )
    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        stream_activity_entropy,
    )

    table = tmp_path / "events.parquet"
    schema = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )

    def chunk(rows):
        return (
            spark.createDataFrame(rows, schema)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
        )

    hours = [0, 0, 3, 7, 7, 7, 12, 23, 23, 5, 5, 9]
    rows = [
        (i + 1, f"2024-01-0{1 + i % 2} {h:02d}:15:00", 100 + (i % 3), "view", 1.0, "{}")
        for i, h in enumerate(hours)
    ]
    chunk(rows[:7]).write.parquet(str(table))
    chunk(rows[7:]).write.mode("append").parquet(str(table))
    now = time.time()
    for name in os.listdir(table):
        if not name.startswith("part-"):
            continue
        full = str(table / name)
        mx = spark.read.parquet(full).agg(F.max("event_id")).first()[0]
        os.utime(full, (now + mx, now + mx))

    key = lambda df: {
        r["user_id"]: (r["n_events"], r["n_active_hours"],
                       r["top_hour"], r["hour_entropy"])
        for r in df.collect()
    }
    batch = key(user_activity_entropy(spark, str(tmp_path)))
    stream = key(stream_activity_entropy(spark, str(tmp_path), max_files_per_trigger=1))
    assert batch == stream
    assert len(batch) == 3


def test_transitions_reorder_exact_under_hostile_arrival(spark, tmp_path):
    """The order-invariant transitions mirror (VERDICT r9 #3's
    designed alternative, built): under the SAME inverted-mtime
    delivery that trips the contract-bound mirror's dead-letter
    counter, the reorder-buffer mirror reproduces the batch rollup
    EXACTLY with zero dead-letters (arrival delay < window). Shrinking
    the window below the disorder turns the stragglers into a NONZERO
    dead count — beyond-window loss is loud, never silent."""
    import os
    import time

    from pyspark.sql import functions as F

    from wallet_and_risky_features_data_pipeline_spark.plans.sessionization import (
        event_transitions,
    )
    from wallet_and_risky_features_data_pipeline_spark.streaming import stream_jobs
    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        stream_transitions_reorder,
    )

    table = tmp_path / "events.parquet"
    schema = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )

    def chunk(rows):
        return (
            spark.createDataFrame(rows, schema)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
        )

    types = ["view", "purchase", "view", "error", "view", "purchase"] * 2
    rows = [
        (i + 1, f"2024-01-01 00:{i:02d}:00", 9, types[i], 1.0 + i, "{}")
        for i in range(12)
    ]
    # LATE half consumed FIRST (inverted mtimes): hostile arrival
    chunk(rows[6:]).write.parquet(str(table))
    chunk(rows[:6]).write.mode("append").parquet(str(table))
    now = time.time()
    for name in os.listdir(table):
        if not name.startswith("part-"):
            continue
        full = str(table / name)
        mx = spark.read.parquet(full).agg(F.max("event_id")).first()[0]
        os.utime(full, (now - mx, now - mx))

    batch = {
        (r["from_type"], r["to_type"]): tuple(r)
        for r in event_transitions(spark, str(tmp_path)).collect()
    }
    stream = {
        (r["from_type"], r["to_type"]): tuple(r)
        for r in stream_transitions_reorder(
            spark, str(tmp_path), max_files_per_trigger=1
        ).collect()
    }
    assert batch == stream and batch
    assert stream_jobs.LAST_OOO_VIOLATIONS["stream_transitions_reorder"] == 0

    # window below the disorder: the 6 early-ts stragglers dead-letter
    import wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs as sj

    orig = sj.TRANSITIONS_REORDER_WINDOW_US
    sj.TRANSITIONS_REORDER_WINDOW_US = 0
    try:
        stream_transitions_reorder(
            spark, str(tmp_path), max_files_per_trigger=1
        ).collect()
        assert sj.LAST_OOO_VIOLATIONS["stream_transitions_reorder"] == 6
    finally:
        sj.TRANSITIONS_REORDER_WINDOW_US = orig


def test_stream_source_psi_multibatch_matches_batch(spark, tmp_path):
    """streaming ≡ batch for the PSI drift monitor across four real
    micro-batches (the job lands the corpus as 4 files and streams
    maxFilesPerTrigger=1). A count histogram is order-invariant, so
    equality must hold bit-for-bit regardless of how rows land in
    batches — and the rollup computes PSI through the SAME
    psi_from_histogram as the batch plan, so the whole comparison
    (grid smoothing, quantized ln, bin-ASC fold) runs one code path."""
    import random

    from wallet_and_risky_features_data_pipeline_spark.plans.llm_ops import (
        corpus_source_psi,
    )
    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        stream_source_psi,
    )

    rng = random.Random(7)
    rows = [
        (
            i,
            "x" * (1 + i % 5),
            "en",
            rng.choice(["web", "books", "code"]),
            rng.randrange(1, 1400),
        )
        for i in range(300)
    ]
    rng.shuffle(rows)  # hostile landing order — must not matter
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    key = lambda df: {r["source"]: (r["n_docs"], r["psi"]) for r in df.collect()}
    batch = key(corpus_source_psi(spark, str(tmp_path)))
    stream = key(stream_source_psi(spark, str(tmp_path)))
    assert batch == stream
    assert len(batch) == 3


def test_stream_embedding_drift_multibatch_matches_batch(spark, tmp_path):
    """streaming ≡ batch for the embedding-drift monitor across four
    real micro-batches under a seeded hostile arrival shuffle — integer
    component sums are commutative, so the mirror must be exact under
    ANY order; the rollup replays the batch plan's exact moment
    discipline, so values are equal, not approximately equal."""
    import random

    from wallet_and_risky_features_data_pipeline_spark.plans.llm_ops import (
        embedding_label_drift,
    )
    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        stream_embedding_drift,
    )

    rng = random.Random(11)
    rows = [
        (
            i,
            [rng.uniform(-1, 1) for _ in range(8)],
            rng.randrange(4),
        )
        for i in range(200)
    ]
    rng.shuffle(rows)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))

    key = lambda df: {
        r["label"]: (r["n_vectors"], r["cosine_to_global"], r["is_drifted"])
        for r in df.collect()
    }
    batch = key(embedding_label_drift(spark, str(tmp_path)))
    stream = key(stream_embedding_drift(spark, str(tmp_path)))
    assert batch == stream
    assert len(batch) == 4


def test_stream_value_freq_mad_multibatch_and_fence(spark, tmp_path):
    """streaming ≡ batch for the MAD profile across four real store
    merges under a seeded hostile arrival shuffle (counts commute →
    order-invariant), and the additive merge is replay-PROOF: a
    redelivered epoch ≤ the live generation tag is skipped, so counts
    can never double."""
    import random

    from pyspark.sql import functions as F

    from wallet_and_risky_features_data_pipeline_spark.plans.sketch_plans import (
        event_mad_outliers,
    )
    from wallet_and_risky_features_data_pipeline_spark.streaming.stream_jobs import (
        stream_value_freq_mad,
        value_freq_merge_batch,
    )
    from wallet_and_risky_features_data_pipeline_spark.sources.writers import (
        read_store,
    )

    rng = random.Random(23)
    rows = [
        (
            i,
            f"2024-01-{1 + i % 9:02d} 10:00:00",
            100 + i % 7,
            rng.choice(["view", "click", "purchase"]),
            round(rng.uniform(1, 200), 2),
            "{}",
        )
        for i in range(400)
    ]
    rng.shuffle(rows)
    schema = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )
    df = spark.createDataFrame(rows, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    key = lambda d: {tuple(r) for r in d.collect()}
    batch = key(event_mad_outliers(spark, str(tmp_path)))
    stream = key(stream_value_freq_mad(spark, str(tmp_path)))
    assert batch == stream and len(batch) == 3

    # replay fence: same epoch delivered twice applies exactly once
    store = str(tmp_path / "fence_store") + "/value_freqs"
    assert value_freq_merge_batch(spark, store, df, 1) is True
    before = {tuple(r) for r in read_store(spark, store).collect()}
    assert value_freq_merge_batch(spark, store, df, 1) is False
    after = {tuple(r) for r in read_store(spark, store).collect()}
    assert before == after


def test_stream_temp_dirs_tracked_and_reaped():
    """Every stream sink/checkpoint dir registers with the atexit
    reaper (ADVICE r11: unbounded /tmp growth in a long session), and
    the reaper removes them."""
    import os

    from wallet_and_risky_features_data_pipeline_spark.streaming import stream_jobs as sj

    saved = sj._TEMP_DIRS[:]
    sj._TEMP_DIRS.clear()  # other tests' dirs must survive this reap
    try:
        d = sj._tracked_mkdtemp("wrf_test_reap_")
        assert os.path.isdir(d) and sj._TEMP_DIRS == [d]
        sj._reap_temp_dirs()
        assert not os.path.exists(d)
        assert not sj._TEMP_DIRS
    finally:
        sj._TEMP_DIRS.extend(saved)
