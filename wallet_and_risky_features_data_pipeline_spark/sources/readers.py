"""Table readers (SURVEY.md §2.1 S4/S10).

The reference reads raw CSVs with pandas and queries parquet through
Athena; here every source is a Spark scan so predicate pushdown and
column pruning reach the parquet reader (check with
``df.explain`` → ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Self-provision the runtime confs correctness depends on, so the
    engine behaves identically under a caller-provided SparkSession
    (e.g. the verification driver's): nanos-parquet reading and UTC
    timestamp semantics. Both are dynamic SQL confs.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # merge_upsert rewrites only the partitions present in the incoming
    # batch; under the default static mode the same write TRUNCATES the
    # whole table first. Any entry point that may reach the MERGE writer
    # must therefore carry dynamic overwrite semantics.
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan for one synthetic table (columnar, prunable).

    ``events.ts`` is TIMESTAMP(NANOS) on disk; Spark reads it as a
    nanos long (``spark.sql.legacy.parquet.nanosAsLong``) and we
    truncate to microseconds — exactly what DuckDB's reader does — so
    both engines see identical timestamps.
    """
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Spark 4 infers parquet TIMESTAMP(isAdjustedToUTC=false) as
    # TIMESTAMP_NTZ; normalize to session-UTC TIMESTAMP so epoch
    # functions work and semantics match DuckDB's naive timestamps.
    for field in df.schema.fields:
        if field.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough partitions for CPU-heavy per-row work.

    A small table often arrives as one parquet split, which would pin
    expensive expression work (md5 signatures, decimal dot products,
    decode UDFs) to a single core. At 100 TB inputs arrive pre-split
    and this is a no-op; locally it round-robins once.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` plans."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """CSV scan with declared schema — replaces the reference's
    ``pd.read_csv`` raw-layer staging (raw_data_ingestion_pipeline.py:104)
    with a distributed scan; schema is enforced, never inferred, matching
    the reference's fixed per-table schema registry (src/schemas/*.py).
    """
    return spark.read.option("header", True).schema(schema).csv(path)
