"""Sinks (SURVEY.md §2.1 S5-S9).

The reference appends Hive-partitioned parquet (raw layer), does
CTAS/INSERT through Athena (stage/analytics), and upserts Iceberg
tables with MERGE INTO (features). Spark equivalents:

- ``write_partitioned``  → ``df.write.partitionBy(...).mode(...)``
  (reference raw_data_ingestion_pipeline.py:110-118).
- ``insert_incremental`` → anti-join dedup then append — the
  ``INSERT INTO ... WHERE NOT EXISTS`` half of every stage template
  (reference stage/transformations/ethereum_transactions.sql:40-77).
- ``merge_upsert``       → join-based MERGE fallback in plain parquet
  using dynamic partition overwrite; stands in for Iceberg
  ``MERGE INTO`` (reference queries/ethereum_wallet_features.sql:760-833)
  without a Delta/Iceberg runtime dependency. Only partitions present
  in the incoming batch are rewritten, so write cost is bounded by the
  batch's partition fan-out, not table size — the same bounded-scope
  property the reference gets from 20-chunk sequential Iceberg MERGEs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("date_partition",),
    mode: str = "append",
) -> None:
    """Hive-partitioned parquet append/overwrite sink.

    Session-wide assumption (ADVICE r02): the engine self-provisions
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` (see
    ``readers._ensure_session_confs``), so ``mode="overwrite"`` here
    means *replace only the partitions present in df*, never a full
    table truncate. Callers needing a true full-table replace must
    set the conf to ``static`` around the call explicitly.
    """
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def insert_incremental(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    natural_key: Sequence[str],
    partition_cols: Sequence[str] = ("date_partition",),
) -> None:
    """Append only rows whose natural key is absent from the target
    (anti-join dedup, SURVEY.md §2.3 J9). First write degrades to a
    plain partitioned write (table-existence probe, §2.1 S13).
    """
    from pyspark.errors import AnalysisException

    try:
        existing = spark.read.parquet(path).select(*natural_key)
    except AnalysisException:
        # table-absent first write only; transient IO errors propagate
        write_partitioned(df, path, partition_cols, mode="append")
        return
    fresh = df.join(existing, on=list(natural_key), how="left_anti")
    write_partitioned(fresh, path, partition_cols, mode="append")


def merge_upsert(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key: Sequence[str],
    partition_cols: Sequence[str] = ("address_partition",),
) -> int:
    """MERGE INTO stand-in: within each partition touched by ``updates``,
    keep target rows whose key doesn't collide, union the updates, and
    dynamically overwrite just those partitions. Requires
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set by
    ``session.get_spark``). Returns the number of rows written.

    The merged plan reads the very files the overwrite replaces, so the
    lineage is cut with an eager ``localCheckpoint`` before writing —
    the self-overwrite hazard Delta/Iceberg solve with snapshots; this
    is the plain-parquet equivalent (write cost still bounded by the
    touched partitions, like the reference's chunk-scoped Iceberg
    MERGE, features_pipeline.py:96-126).
    """
    from pyspark.errors import AnalysisException

    from .readers import _ensure_session_confs

    # Materialize the updates plan ONCE: it is consumed by the isEmpty
    # probe, the touched-partition projection, the anti-join and the
    # final union — for monotone upserts that plan embeds a join against
    # the whole store and would otherwise re-execute per consumer
    # (ADVICE r02). The checkpoint also cuts lineage from any store
    # files the overwrite below replaces.
    updates = updates.localCheckpoint(eager=True)
    # Defense in depth: an empty batch (e.g. the trailing availableNow
    # micro-batch of a stream) must be a no-op, never an overwrite.
    if updates.isEmpty():
        return 0
    # The dynamic-overwrite conf is load-bearing (static mode truncates
    # the whole table); self-provision it rather than trusting the
    # caller's session.
    _ensure_session_confs(spark)
    try:
        target = spark.read.parquet(path)
    except AnalysisException:
        # Store-absent first write only; transient IO errors propagate
        # (treating them as "no store" would overwrite the full table
        # with just this batch — ADVICE r02).
        write_partitioned(updates, path, partition_cols, mode="overwrite")
        return updates.count()
    parts = updates.select(*partition_cols).distinct()
    # Restrict the rewrite to touched partitions (partition pruning on
    # the scan side; broadcast the partition list — it is tiny).
    touched = target.join(parts.hint("broadcast"), on=list(partition_cols), how="left_semi")
    kept = touched.join(updates.select(*key), on=list(key), how="left_anti")
    merged = kept.unionByName(updates.select(*kept.columns)).localCheckpoint(eager=True)
    merged.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)
    return merged.count()
