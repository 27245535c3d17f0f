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
    for dirpath, dirnames, filenames in os.walk(path):
        # hidden/underscore dirs are invisible to Spark's file index
        # (and hold our own rewrite staging) — never treat them as data
        dirnames[:] = [d for d in dirnames if not d.startswith((".", "_"))]
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
        # The scan is confined to this partition; the partition-column
        # values live in the directory name, not the files, so the
        # rewrite round-trips them untouched. _swap_in stages OUTSIDE
        # the table root — a tmp dir named part=X__compact_tmp inside it
        # would be parsed as a bogus partition value by any concurrent
        # (or post-crash) partition discovery.
        _swap_in(spark.read.parquet(part_dir).coalesce(want), part_dir, path)
        after = len([f for f in os.listdir(part_dir) if f.endswith(".parquet")])
        rewritten[part_dir] = (n_files, after)
    return rewritten


def _swap_in(new_df, part_dir: str, table_root: str) -> None:
    """Write ``new_df`` and swap it in place of ``part_dir``.

    Staging lives INSIDE the table root under a dot-prefixed dir: the
    same filesystem as the partition (renames can't fail with EXDEV and
    no write access outside the table is needed), and invisible to both
    Spark's file index and ``_list_partitions`` (hidden-path filtering)
    — so a half-finished rewrite can never be parsed as a bogus
    partition or double-count rows for a concurrent reader. The swap is
    two renames; if anything fails after the first, the staging dir is
    LEFT IN PLACE with BOTH copies (``old`` = the original partition,
    ``new`` = the rewrite) and the raised error names it — recovery is
    a rename, never forensics. Only a fully successful swap cleans up.
    (True multi-file atomicity is a table format's job — the documented
    Iceberg gap.)"""
    import tempfile

    staging = tempfile.mkdtemp(
        prefix=".wrf_rewrite_", dir=os.path.abspath(table_root.rstrip("/"))
    )
    tmp = os.path.join(staging, "new")
    try:
        new_df.write.mode("overwrite").parquet(tmp)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)  # no rename happened yet
        raise
    old = os.path.join(staging, "old")
    try:
        if os.path.abspath(part_dir.rstrip("/")) == os.path.abspath(
            table_root.rstrip("/")
        ):
            # Rewriting the table ROOT itself (unpartitioned store):
            # the root can't be renamed into its own staging subdir, so
            # swap its entries instead — each move is a rename, and a
            # crash mid-way still leaves every original entry either in
            # place or in old/ (weaker than the single-rename swap, but
            # the root dir inode stays stable, which mountpoints need).
            os.makedirs(old)
            for entry in os.listdir(part_dir):
                if entry.startswith(".wrf_rewrite_"):
                    continue
                os.replace(os.path.join(part_dir, entry), os.path.join(old, entry))
            for entry in os.listdir(tmp):
                os.replace(os.path.join(tmp, entry), os.path.join(part_dir, entry))
        else:
            os.replace(part_dir, old)
            os.replace(tmp, part_dir)
    except BaseException as e:
        raise RuntimeError(
            f"partition swap interrupted for {part_dir}; both the original "
            f"(old/) and rewritten (new/) copies are preserved in {staging}"
        ) from e
    shutil.rmtree(staging)


def _partition_kv(leaf: str, root: str) -> dict[str, str]:
    """key=value partition pairs encoded in a leaf dir's relative path."""
    rel = os.path.relpath(os.path.abspath(leaf), os.path.abspath(root))
    return dict(s.split("=", 1) for s in rel.split(os.sep) if "=" in s)


def propagate_deletes(
    spark: SparkSession,
    path: str,
    keys,  # DataFrame of keys to erase
    key_col: str,
) -> dict[str, int]:
    """Right-to-erasure rewrite: remove every row whose ``key_col``
    appears in ``keys`` from a (possibly partitioned) parquet store,
    touching only the partitions that actually contain such rows.

    The lakehouse analog of Iceberg's ``DELETE FROM`` (the reference's
    Athena tables get this from the table format; plain parquet needs
    the rewrite spelled out). ONE probe job over the whole table — a
    broadcast semi join against the (dimension-sized) key set,
    aggregated per partition — finds the touched partitions and their
    doomed-row counts; Catalyst partition-prunes the probe when
    ``key_col`` IS the partition column. Partition values are read with
    type inference DISABLED and matched back to the on-disk directory
    names (inference would turn a stored ``part=07`` into int 7 and the
    rewrite would miss or crash on the real dir — silent incomplete
    erasure is the one unacceptable failure here). Each touched
    partition is rewritten with a broadcast ANTI join and swapped in
    via the crash-safe in-root staging of ``_swap_in``; when the erased
    key is the partition key itself, the directory is simply removed —
    no scan at all. Re-running is idempotent (deletion is). Returns
    ``{partition_dir: rows_deleted}``.
    """
    from urllib.parse import unquote

    from pyspark.sql import functions as F

    if not os.path.exists(path):
        raise FileNotFoundError(f"parquet store not found at {path}")

    keys_b = F.broadcast(keys.select(F.col(key_col)).distinct())
    leaves = sorted(_list_partitions(path))
    kvs = {leaf: _partition_kv(leaf, path) for leaf in leaves}
    pcols = list(next(iter(kvs.values()))) if leaves and kvs[leaves[0]] else []

    def disk_value(raw: str):
        # on-disk partition token → the string Spark yields for it
        return None if raw == "__HIVE_DEFAULT_PARTITION__" else unquote(raw)

    touched: dict[str, int] = {}
    if pcols:
        conf = "spark.sql.sources.partitionColumnTypeInference.enabled"
        prev = spark.conf.get(conf, "true")
        spark.conf.set(conf, "false")
        try:
            probe = {
                tuple(r[col] for col in pcols): r["n"]
                for r in spark.read.parquet(path)
                .join(keys_b, key_col, "left_semi")
                .groupBy(*pcols)
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
        finally:
            spark.conf.set(conf, prev)
        for leaf, kv in kvs.items():
            n = probe.get(tuple(disk_value(kv[col]) for col in pcols))
            if n:
                touched[leaf] = n
    else:
        n = spark.read.parquet(path).join(keys_b, key_col, "left_semi").count()
        if n:
            touched[path.rstrip("/")] = n

    results: dict[str, int] = {}
    for part_dir, n_del in sorted(touched.items()):
        if key_col in kvs.get(part_dir, {}):
            shutil.rmtree(part_dir)  # erasing the partition key: whole dir
        else:
            df = spark.read.parquet(part_dir)
            _swap_in(df.join(keys_b, key_col, "left_anti"), part_dir, path)
        results[part_dir] = n_del
    return results
