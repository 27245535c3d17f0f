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


def zorder_column(df, cols, bits: int = 16):
    """Append a Morton (Z-order) key column ``__z`` interleaving the
    rank-quantized values of ``cols``: each column is ntile'd into
    2^bits rank buckets (value-distribution-proof — skew and outliers
    cost nothing, exactly why Delta's OPTIMIZE ZORDER ranks before
    interleaving), then the bucket ids' bits are interleaved so rows
    close in __z are close in EVERY clustered column at once. Sorting
    files by __z gives each file a bounded hyper-rectangle of the key
    space — parquet min/max row-group stats then prune scans on ANY of
    the clustered columns, not just the first of a lexicographic sort.

    The ntile windows are unpartitioned (a global rank per column):
    correct ONLY because callers apply this to one partition directory
    at a time, where the data is bounded — a cluster external-sorts it,
    and the rewrite below is already a per-partition job."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    n = len(cols)
    for c in cols:
        df = df.withColumn(
            f"__zb_{c}",
            (F.ntile(2**bits).over(Window.orderBy(F.col(c))) - 1).cast("long"),
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(F.col(f"__zb_{c}"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return df.withColumn("__z", z).drop(*[f"__zb_{c}" for c in cols])


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_mb: float = 128,
    zorder: tuple[str, ...] = (),
) -> dict[str, tuple[int, int]]:
    """Bin-pack compaction: rewrite fragmented partition directories of
    a Hive-partitioned parquet table to ``ceil(bytes / target_mb)``
    files each. Returns ``{partition_dir: (files_before, files_after)}``
    for the partitions actually rewritten; already-compact partitions
    are untouched (their data files keep their identity, like Iceberg's
    bin-pack skipping well-sized files).

    ``zorder``: when set, EVERY partition is rewritten (a re-clustering
    pass, like ``OPTIMIZE ... ZORDER BY`` — schedule it deliberately,
    not weekly) with rows range-partitioned and sorted by the Morton
    key of these columns, so each output file covers a bounded
    rectangle of the clustered key space and parquet min/max stats
    prune scans on any of them (``zorder_column``)."""
    target_bytes = int(target_mb * 1024 * 1024)
    rewritten: dict[str, tuple[int, int]] = {}
    for part_dir, (n_files, size) in sorted(_list_partitions(path).items()):
        want = max(1, math.ceil(size / target_bytes))
        if n_files <= want and not zorder:
            continue
        # The scan is confined to this partition; the partition-column
        # values live in the directory name, not the files, so the
        # rewrite round-trips them untouched. _swap_in stages in a
        # dot-prefixed dir INSIDE the table root (hidden from partition
        # discovery; see its docstring for the crash-recovery contract).
        df = spark.read.parquet(part_dir)
        if zorder:
            df = zorder_column(df, list(zorder))
            if want > 1:
                df = df.repartitionByRange(want, "__z")
            else:
                df = df.coalesce(1)
            df = df.sortWithinPartitions("__z").drop("__z")
        else:
            df = df.coalesce(want)
        _swap_in(df, part_dir, path)
        after = len([f for f in os.listdir(part_dir) if f.endswith(".parquet")])
        rewritten[part_dir] = (n_files, after)
    return rewritten


def _exchange_dirs(a: str, b: str) -> bool:
    """Atomically EXCHANGE two directories via Linux
    ``renameat2(RENAME_EXCHANGE)`` (kernel ≥3.15). Returns False when
    the libc or the filesystem can't do it, so callers can fall back to
    the two-rename dance. The exchange closes the only non-atomic
    window in the partition swap: with two plain renames there is an
    instant where the partition dir does not exist at all, and a reader
    listing the table at that instant sees a missing partition."""
    import ctypes
    import ctypes.util
    import errno

    try:
        libc = ctypes.CDLL(
            ctypes.util.find_library("c") or "libc.so.6", use_errno=True
        )
    except OSError:
        return False
    AT_FDCWD = -100
    RENAME_EXCHANGE = 2
    try:
        rc = libc.renameat2(
            AT_FDCWD, os.fsencode(a), AT_FDCWD, os.fsencode(b), RENAME_EXCHANGE
        )
    except AttributeError:
        try:  # pre-2.28 glibc: raw syscall (x86_64: 316, aarch64: 276)
            import platform

            nr = {"x86_64": 316, "aarch64": 276}.get(platform.machine())
            if nr is None:
                return False
            rc = libc.syscall(
                nr, AT_FDCWD, os.fsencode(a), AT_FDCWD, os.fsencode(b),
                RENAME_EXCHANGE,
            )
        except Exception:
            return False
    if rc != 0:
        err = ctypes.get_errno()
        if err in (errno.EINVAL, errno.ENOSYS, getattr(errno, "EOPNOTSUPP", 95)):
            return False  # fs without RENAME_EXCHANGE → caller falls back
        raise OSError(err, os.strerror(err), a)
    return True


def _swap_in(
    new_df, part_dir: str, table_root: str, strict_cleanup: bool = False
) -> None:
    """Write ``new_df`` and swap it in place of ``part_dir``.

    Staging lives INSIDE the table root under a dot-prefixed dir: the
    same filesystem as the partition (renames can't fail with EXDEV and
    no write access outside the table is needed), and invisible to both
    Spark's file index and ``_list_partitions`` (hidden-path filtering)
    — so a half-finished rewrite can never be parsed as a bogus
    partition or double-count rows for a concurrent reader. The swap is
    a single atomic ``renameat2(RENAME_EXCHANGE)`` where the kernel/fs
    supports it (the partition dir never goes missing, even for a
    nanosecond), else two renames; if anything fails mid-swap, the
    staging dir is LEFT IN PLACE and the raised error names it.
    RECOVERY CONTRACT — which copy is which is self-describing, never
    positional: the rewrite's data dir carries a ``_REWRITE`` tag file
    (underscore-prefixed, invisible to Spark) from before the first
    rename until the swap completes. A staging dir whose copy CONTAINS
    ``_REWRITE`` is the un-swapped rewrite (the partition still holds
    the original — nothing happened); a copy WITHOUT it is the
    displaced ORIGINAL (the swap landed — on an erasure path that copy
    must be destroyed, never renamed back). Directory names alone
    (``old``/``new``) are NOT trustworthy after a kill: the atomic
    exchange necessarily passes through a state where the displaced
    original still sits under the rewrite's staging name. Only a fully
    successful swap cleans up. (True multi-file atomicity is a table
    format's job — the documented Iceberg gap.)"""
    import tempfile

    staging = tempfile.mkdtemp(
        prefix=".wrf_rewrite_", dir=os.path.abspath(table_root.rstrip("/"))
    )
    tmp = os.path.join(staging, "new")
    try:
        new_df.write.mode("overwrite").parquet(tmp)
        # self-describing state tag (see docstring): rides inside the
        # rewrite until the swap completes
        open(os.path.join(tmp, "_REWRITE"), "w").close()
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
            # CONTRACT: this branch is NOT reader-atomic — between the
            # drain into old/ and the refill, a concurrent reader sees
            # an empty (or mixed) table. Callers rewriting an
            # UNPARTITIONED store must quiesce readers first; the
            # partitioned path (else-branch, two renames) has no such
            # window. On a real lakehouse this is the table format's
            # snapshot commit — the documented Iceberg gap.
            os.makedirs(old)
            for entry in os.listdir(part_dir):
                if entry.startswith(".wrf_rewrite_"):
                    continue
                os.replace(os.path.join(part_dir, entry), os.path.join(old, entry))
            for entry in os.listdir(tmp):
                os.replace(os.path.join(tmp, entry), os.path.join(part_dir, entry))
        elif _exchange_dirs(tmp, part_dir):
            # atomic exchange: the partition dir NEVER goes missing —
            # a concurrent reader sees the old files or the new files,
            # nothing else. tmp now holds the original partition; park
            # it under the recovery name the docstring promises.
            os.replace(tmp, old)
        else:
            # fs without RENAME_EXCHANGE: two renames, with a
            # sub-millisecond window where the partition is absent
            os.replace(part_dir, old)
            os.replace(tmp, part_dir)
    except BaseException as e:
        raise RuntimeError(
            f"partition swap interrupted for {part_dir}; staging {staging} "
            "preserves the copies — identify them by the _REWRITE tag "
            "(present = un-swapped rewrite, absent = displaced original), "
            "not by directory name"
        ) from e
    # the swap landed: drop the state tag from the live partition
    try:
        os.unlink(os.path.join(part_dir, "_REWRITE"))
    except FileNotFoundError:
        pass
    # Cleanup policy is caller-dependent. Compaction (strict_cleanup
    # False): a cleanup failure (NFS silly-renames, a scanner holding
    # old/ open) must not fail a swap that already succeeded; leftover
    # staging is dot-prefixed and invisible to discovery, so warn and
    # move on. ERASURE (strict_cleanup True): the staging dir still
    # holds the PRE-ERASURE copy — residual subject data on disk is an
    # erasure failure, so retry once and then RAISE rather than warn.
    shutil.rmtree(staging, ignore_errors=True)
    if os.path.exists(staging):
        shutil.rmtree(staging, ignore_errors=True)  # one retry
    if os.path.exists(staging):
        msg = (
            f"could not fully remove rewrite staging {staging} — it "
            "contains the pre-rewrite partition copy; remove it manually"
        )
        if strict_cleanup:
            raise RuntimeError(
                f"erasure incomplete: {msg} (the swapped-in partition is "
                "already erased; only the staging residue remains)"
            )
        print(f"WARNING: {msg}")


def _partition_kv(leaf: str, root: str) -> dict[str, str]:
    """key=value partition pairs encoded in a leaf dir's relative path."""
    rel = os.path.relpath(os.path.abspath(leaf), os.path.abspath(root))
    return dict(s.split("=", 1) for s in rel.split(os.sep) if "=" in s)


def _probe_touched(spark, path: str, doom_factory):
    """Shared partition probe for the rewrite family.

    Lists leaf partitions, derives the partition columns, and runs ONE
    job over the whole table — ``doom_factory(pcols)`` returns a
    ``df → df`` transform selecting the doomed rows — aggregated per
    partition. Partition columns are declared STRING in an explicit
    read schema and the values matched back to the ON-DISK directory
    names (type inference would turn a stored ``part=07`` into int 7
    and the rewrite would miss or crash on the real dir — silent
    incomplete erasure is the one unacceptable failure here; an
    explicit schema also avoids flipping any session-global conf under
    concurrent readers). Returns ``(touched: {leaf_dir: n_rows}, kvs)``.
    """
    from urllib.parse import unquote

    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    if not os.path.exists(path):
        raise FileNotFoundError(f"parquet store not found at {path}")
    leaves = sorted(_list_partitions(path))
    kvs = {leaf: _partition_kv(leaf, path) for leaf in leaves}
    pcols = list(kvs[leaves[0]]) if leaves and kvs[leaves[0]] else []
    doom = doom_factory(pcols)

    touched: dict[str, int] = {}
    if pcols:
        data_schema = spark.read.parquet(leaves[0]).schema
        probe_schema = StructType(
            list(data_schema.fields)
            + [StructField(col, StringType()) for col in pcols]
        )
        probe = {
            tuple(r[col] for col in pcols): r["n"]
            for r in doom(spark.read.schema(probe_schema).parquet(path))
            .groupBy(*pcols)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for leaf, kv in kvs.items():
            vals = tuple(
                None if kv[col] == "__HIVE_DEFAULT_PARTITION__" else unquote(kv[col])
                for col in pcols
            )
            if probe.get(vals):
                touched[leaf] = probe[vals]
    else:
        n = doom(spark.read.parquet(path)).count()
        if n:
            touched[path.rstrip("/")] = n
    return touched, kvs


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
    the rewrite spelled out). One ``_probe_touched`` job — a broadcast
    semi join against the (dimension-sized) key set — finds the touched
    partitions; when ``key_col`` IS the partition column the keys are
    cast to string so the join is exact string equality (two
    snowflake-scale ids must never collapse into one double and rmtree
    an innocent partition), and matched directories are simply removed
    with no scan. Data-column keys get a broadcast ANTI-join rewrite
    swapped in via the crash-safe in-root staging of ``_swap_in``.
    Re-running is idempotent (deletion is). Returns
    ``{partition_dir: rows_deleted}``.
    """
    from pyspark.sql import functions as F

    keys_b = F.broadcast(keys.select(F.col(key_col)).distinct())

    def doom_factory(pcols):
        probe_keys = keys_b
        if key_col in pcols:
            probe_keys = F.broadcast(
                keys_b.select(F.col(key_col).cast("string").alias(key_col))
            )
        return lambda df: df.join(probe_keys, key_col, "left_semi")

    touched, kvs = _probe_touched(spark, path, doom_factory)
    results: dict[str, int] = {}
    for part_dir, n_del in sorted(touched.items()):
        if key_col in kvs.get(part_dir, {}):
            shutil.rmtree(part_dir)  # erasing the partition key: whole dir
        else:
            df = spark.read.parquet(part_dir)
            _swap_in(
                df.join(keys_b, key_col, "left_anti"),
                part_dir,
                path,
                strict_cleanup=True,
            )
        results[part_dir] = n_del
    return results


def _json_scrub(json_col: str, field: str):
    """Expression dropping ``field`` from a flat JSON document.

    KNOWN LIMITATION (documented, latent for this engine's flat
    ``props`` payloads): the map<string,string> round-trip re-types the
    hit row's surviving scalar values as strings, flattens nested
    objects into embedded JSON strings, and drops null-valued fields.
    A store with nested/typed JSON needs a real JSON surgeon here.
    """
    from pyspark.sql import functions as F

    return F.to_json(
        F.map_filter(
            F.from_json(F.col(json_col), "map<string,string>"),
            lambda k, _v: k != F.lit(field),
        )
    )


def redact_json_field(
    spark, path: str, doomed, json_col: str, field: str
) -> dict[str, int]:
    """Erasure's second half: rows owned by OTHER subjects that merely
    reference the erased one (counterparty legs) must keep their
    owners' data and lose only the reference — deleting them would
    destroy someone else's records, keeping them intact would leave the
    erased subject recoverable. Removes ``field`` from the ``json_col``
    document wherever its value is in ``doomed``. Only hit rows are
    re-serialized (see ``_json_scrub`` for the flat-JSON limitation);
    untouched rows keep their original bytes. Returns
    ``{partition_dir: rows_redacted}``.
    """
    from pyspark.sql import functions as F

    doomed = [str(k) for k in doomed]
    if not doomed:
        return {}
    hit = F.get_json_object(F.col(json_col), f"$.{field}").isin(doomed)

    touched, _ = _probe_touched(spark, path, lambda pcols: lambda df: df.filter(hit))
    results: dict[str, int] = {}
    for part_dir, n_hit in sorted(touched.items()):
        df = spark.read.parquet(part_dir)
        redacted = df.withColumn(
            json_col,
            F.when(hit, _json_scrub(json_col, field)).otherwise(F.col(json_col)),
        )
        _swap_in(redacted, part_dir, path, strict_cleanup=True)
        results[part_dir] = n_hit
    return results


def erase_and_redact(
    spark,
    path: str,
    owned_keys,
    key_col: str,
    ref_keys,
    json_col: str,
    field: str,
) -> dict[str, tuple[int, int]]:
    """Combined erasure pass for a store holding BOTH rows the subject
    owns and rows that reference it: one probe job (OR of both
    predicates) and ONE rewrite per touched partition that deletes the
    owned rows and redacts the references — running the delete and
    redact passes separately would probe the store twice and rewrite
    every overlapping partition twice. Returns
    ``{partition_dir: (rows_deleted, rows_redacted)}``.
    """
    from pyspark.sql import functions as F

    ref_keys = [str(k) for k in ref_keys]
    # NULL-safety: ``isin`` is three-valued — a NULL key yields NULL, and
    # ``~NULL`` is still NULL, so the ``kept = df.filter(~owned)`` below
    # would silently DROP every NULL-keyed row in a touched partition
    # (and never count it in the returned stats). Erasure must delete
    # exactly the named subjects, so both predicates are pinned to
    # two-valued logic: NULL key → not owned, not hit.
    owned = (
        F.coalesce(F.col(key_col).isin(list(owned_keys)), F.lit(False))
        if owned_keys
        else F.lit(False)
    )
    hit = (
        F.coalesce(
            F.get_json_object(F.col(json_col), f"$.{field}").isin(ref_keys),
            F.lit(False),
        )
        if ref_keys
        else F.lit(False)
    )
    if not owned_keys and not ref_keys:
        return {}

    touched, _ = _probe_touched(
        spark, path, lambda pcols: lambda df: df.filter(owned | hit)
    )
    if not touched:
        return {}
    # one extra tiny aggregate splits the affected counts for reporting
    counts = {}
    for part_dir in touched:
        df = spark.read.parquet(part_dir)
        row = df.agg(
            F.sum(owned.cast("int")).alias("d"),
            F.sum((hit & ~owned).cast("int")).alias("r"),
        ).first()
        counts[part_dir] = (row["d"] or 0, row["r"] or 0)
        kept = df.filter(~owned).withColumn(
            json_col,
            F.when(hit, _json_scrub(json_col, field)).otherwise(F.col(json_col)),
        )
        _swap_in(kept, part_dir, path, strict_cleanup=True)
    return counts
