"""Local replica of the driver's Spark-vs-DuckDB comparison so every
query/oracle pair is validated in CI before the driver ever sees it:
row count, column names/order-insensitive values, NaN/None-safe.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from wallet_and_risky_features_data_pipeline_spark.sources.readers import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, int):
        return v
    return v


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    if sorted(sp.columns) != sorted(du.columns):
        return False, f"columns differ: spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    if len(sp) != len(du):
        return False, f"row counts differ: spark={len(sp)} duck={len(du)}"
    cols = sorted(sp.columns)
    sp_rows = Counter(
        tuple(_norm(v) for v in row) for row in sp[cols].itertuples(index=False, name=None)
    )
    du_rows = Counter(
        tuple(_norm(v) for v in row) for row in du[cols].itertuples(index=False, name=None)
    )
    if sp_rows != du_rows:
        sp_only = list((sp_rows - du_rows).keys())[:3]
        du_only = list((du_rows - sp_rows).keys())[:3]
        return False, f"values differ; spark-only: {sp_only} duck-only: {du_only}"
    return True, "ok"
