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
