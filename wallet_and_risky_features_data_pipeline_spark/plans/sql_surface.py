"""Spark SQL surface: the engine's tables are also queryable as plain
SQL over registered views — the interface the reference's users
actually write (its whole stage/analytics/features layer is SQL text).

``pricing_summary_sql`` is the Spark-SQL-dialect rendering of the
pricing_summary plan, registered against the SAME DuckDB oracle as the
DataFrame version — proving the SQL entry point produces identical
results and goes through the same Catalyst pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import register_views
from .relational import PRICING_SUMMARY_ORACLE


def pricing_summary_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, tables=("lineitem",))
    return spark.sql(
        """
        SELECT
            l_returnflag,
            l_linestatus,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                     * CAST(1.0d - l_discount AS DECIMAL(18,8))) AS DOUBLE) AS sum_disc_price,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                     * CAST((1.0d - l_discount) * (1.0d + l_tax) AS DECIMAL(18,8)))
                 AS DOUBLE) AS sum_charge,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
            COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS returned_count,
            COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
        """
    )


PRICING_SUMMARY_SQL_ORACLE = PRICING_SUMMARY_ORACLE
