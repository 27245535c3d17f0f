"""Sketch / statistics plans: deterministic HyperLogLog distinct
counts and exact distributed quantiles, each with a bit-exact DuckDB
oracle (see operators/sketches.py for why an approximate sketch can
carry an exact oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.sketches import HLL_M, HLL_NUMERATOR, _RANK_CAP, hll_register_sums, hll_rank_expr
from ..sources.readers import read_table


# --------------------------------------------------------------------------
# HLL distinct users per event type + exact count side-by-side (the
# exact column doubles as an in-query accuracy witness).
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    sketch = hll_register_sums(ev, F.col("user_id"), ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return sketch.join(exact, "event_type").select(
        "event_type",
        "register_sum",
        "zero_registers",
        "hll_estimate",
        "exact_distinct",
    )


HLL_DISTINCT_ORACLE = f"""
WITH hashed AS (
    SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h
    FROM events
),
ranked AS (
    SELECT event_type,
           substr(h, 1, 2) AS reg,
           {hll_rank_expr("h")} AS rho
    FROM hashed
),
regs AS (
    SELECT event_type, reg, MAX(rho) AS max_rho
    FROM ranked GROUP BY 1, 2
),
grouped AS (
    SELECT event_type,
           SUM(CAST(1 AS BIGINT) << ({_RANK_CAP} - max_rho)) AS observed_sum,
           COUNT(*) AS observed_regs
    FROM regs GROUP BY 1
),
sketch AS (
    SELECT event_type,
           CAST(observed_sum
                + ({HLL_M} - observed_regs) * (CAST(1 AS BIGINT) << {_RANK_CAP})
                AS BIGINT) AS register_sum,
           CAST({HLL_M} - observed_regs AS BIGINT) AS zero_registers
    FROM grouped
)
SELECT s.event_type,
       s.register_sum,
       s.zero_registers,
       {HLL_NUMERATOR!r} / CAST(s.register_sum AS DOUBLE) AS hll_estimate,
       e.exact_distinct
FROM sketch s
JOIN (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events GROUP BY 1) e
  ON e.event_type = s.event_type
"""


# --------------------------------------------------------------------------
# Exact distributed quantiles: value at rank floor((n-1)·p) + 1 of the
# (value, event_id)-sorted series per group. The rank formula is spelled
# out in both engines rather than trusting builtin quantile functions,
# whose discrete-percentile index conventions differ; (n−1)·p is a
# single correctly-rounded IEEE multiply, so the target rank is
# cross-engine deterministic. One window over one exchange; at scale
# this is the exact-quantile plan you run when sketches (above) aren't
# enough — cost is the per-group sort, not a driver collect.
_QUANTILES = (0.5, 0.9, 0.99)


def quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    with_p = ranked.withColumn(
        "p", F.explode(F.array(*[F.lit(p) for p in _QUANTILES]))
    )
    hit = with_p.filter(
        F.col("rn") == (F.floor((F.col("n") - 1) * F.col("p")) + 1)
    )
    return hit.select("event_type", "p", F.col("value").alias("quantile"))


QUANTILES_EXACT_ORACLE = f"""
WITH ranked AS (
    SELECT event_type, event_id, value,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events
)
SELECT event_type, p, value AS quantile
FROM ranked, UNNEST([{", ".join(str(p) for p in _QUANTILES)}]) AS t(p)
WHERE rn = floor((n - 1) * p) + 1
"""
