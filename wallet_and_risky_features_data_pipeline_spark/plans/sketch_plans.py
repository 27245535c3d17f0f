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
    # per-type totals via AGG + broadcast join, never an
    # unbounded-both-sides window: WindowExec buffers the ENTIRE
    # row-scaled type partition per task for full-partition frames —
    # the exact shape the weighted-median 100× probe OOMed on
    # (PLANS.md §probe-caught OOM). row_number's running frame streams.
    totals = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ranked = ev.withColumn("rn", F.row_number().over(w)).join(
        F.broadcast(totals), "event_type"
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


# --------------------------------------------------------------------------
# Count-min frequency estimates, probed for every distinct user and
# laid beside the exact count (overestimate witness: est >= exact
# always; equality unless the key collided in all d rows). At scale
# the sketch is <= d*w rows built in one shuffle; the probe side is a
# broadcast join, so estimating frequencies for billions of candidate
# keys never shuffles the candidates.
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import cms_counters, cms_estimate

    ev = read_table(spark, sf_dir, "events")
    sketch = cms_counters(ev, F.col("user_id"))
    keys = ev.select("user_id").distinct()
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    return (
        cms_estimate(sketch, keys, "user_id")
        .join(exact, "user_id")
        .select("user_id", "cms_estimate", "exact_n")
    )


_CMS_IDX_SQL = "CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || k), 1, 2)) AS INT)"

CMS_HEAVY_HITTERS_ORACLE = f"""
WITH js AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(j)),
ex AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
cnt AS (
    SELECT j, {_CMS_IDX_SQL} AS c, COUNT(*) AS n
    FROM ex, js GROUP BY 1, 2
),
keys AS (
    SELECT user_id, CAST(user_id AS VARCHAR) AS k
    FROM (SELECT DISTINCT user_id FROM events)
),
probe AS (
    SELECT user_id, j, {_CMS_IDX_SQL} AS c FROM keys, js
),
est AS (
    SELECT p.user_id, MIN(COALESCE(cnt.n, 0)) AS cms_estimate
    FROM probe p LEFT JOIN cnt ON cnt.j = p.j AND cnt.c = p.c
    GROUP BY 1
)
SELECT est.user_id, est.cms_estimate, e.exact_n
FROM est JOIN (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n FROM events GROUP BY 1
) e USING (user_id)
"""


# --------------------------------------------------------------------------
# Bloom-filter membership prune: build a one-word bloom over the
# high-value-purchaser set (decimal-exact sum so the member predicate
# is cross-engine deterministic), probe every user. bloom_member is
# the broadcastable map-side pre-filter a 100 TB join uses to drop
# non-matching rows before the shuffle; exact_member sits beside it as
# the no-false-negative witness (bloom_member >= exact_member, with
# deterministic false positives from 64-bit saturation).
_BLOOM_VALUE_MIN = 900


def bloom_membership_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import bloom_build, bloom_probe

    ev = read_table(spark, sf_dir, "events")
    purchase_total = ev.filter(F.col("event_type") == "purchase").groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s")
    )
    members = purchase_total.filter(F.col("s") > _BLOOM_VALUE_MIN).select("user_id")
    bloom = bloom_build(members, F.col("user_id"))
    probes = ev.select("user_id").distinct()
    return (
        bloom_probe(bloom, probes, "user_id")
        .join(
            members.withColumn("exact_member", F.lit(True)),
            "user_id",
            "left",
        )
        .select(
            "user_id",
            "bloom_member",
            F.coalesce(F.col("exact_member"), F.lit(False)).alias("exact_member"),
        )
    )


_BLOOM_POS_SQL = "(CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || k), 1, 2)) AS INT) % 63)"

BLOOM_MEMBERSHIP_ORACLE = f"""
WITH js AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(j)),
members AS (
    SELECT user_id FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    HAVING SUM(CAST(value AS DECIMAL(18,6))) > {_BLOOM_VALUE_MIN}
),
bloom AS (
    SELECT bit_or(CAST(1 AS BIGINT) << {_BLOOM_POS_SQL}) AS bloom_word
    FROM (SELECT CAST(user_id AS VARCHAR) AS k FROM members), js
),
probe AS (
    SELECT user_id, j, CAST(user_id AS VARCHAR) AS k
    FROM (SELECT DISTINCT user_id FROM events), js
),
tested AS (
    SELECT p.user_id,
           bool_and((b.bloom_word & (CAST(1 AS BIGINT) << {_BLOOM_POS_SQL})) <> 0)
             AS bloom_member
    FROM probe p CROSS JOIN bloom b
    GROUP BY 1
)
SELECT t.user_id, t.bloom_member,
       (m.user_id IS NOT NULL) AS exact_member
FROM tested t LEFT JOIN members m ON m.user_id = t.user_id
"""


# --------------------------------------------------------------------------
# ANALYZE-style table profiling: per-column row/null/NDV stats with
# the HLL estimate beside the exact NDV. Each column's pass is a
# column-pruned scan + one global aggregate (embarrassingly parallel;
# at 100 TB this is the stats-collection job every optimizer feeds
# on). The HLL column is NULL for DOUBLE columns on purpose: register
# assignment hashes the key's STRING form, and double→string
# formatting is engine-specific (JVM shortest-repr vs C++ printf), so
# a double-keyed register map would not replay cross-engine — the
# exact NDV has no such cast and stays verified.
#
# ``hll_small_range`` flags the regime where the RAW estimate is
# known-biased (E <= 2.5·m — the standard linear-counting switchover;
# the correction itself needs ln and is deliberately not applied, see
# operators/sketches.py). The flag is one double comparison, so it
# replays exactly; consumers treat flagged estimates as upper noise
# and read ndv_exact instead.
_STATS_COLS = (("user_id", True, True), ("event_type", False, True), ("value", True, False))
_HLL_SMALL_RANGE_MAX = 2.5 * 256


def table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_register_sums

    ev = read_table(spark, sf_dir, "events")
    out = None
    for col, is_num, do_hll in _STATS_COLS:
        base = ev.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast("bigint").alias("n_nulls"),
            F.countDistinct(col).alias("ndv_exact"),
            (
                F.min(F.col(col).cast("double"))
                if is_num
                else F.min(F.lit(None).cast("double"))
            ).alias("min_num"),
            (
                F.max(F.col(col).cast("double"))
                if is_num
                else F.max(F.lit(None).cast("double"))
            ).alias("max_num"),
        )
        if do_hll:
            hll = hll_register_sums(
                ev.filter(F.col(col).isNotNull()), F.col(col), []
            ).select(
                F.col("hll_estimate").alias("hll_ndv"),
                # int, not boolean: a NULL boolean round-trips through
                # pandas as None on the Spark side but NaN on the DuckDB
                # side, so the oracle compare would flag a phantom diff.
                (F.col("hll_estimate") <= F.lit(_HLL_SMALL_RANGE_MAX))
                .cast("int")
                .alias("hll_small_range"),
            )
            row = base.crossJoin(hll)
        else:
            row = base.withColumn("hll_ndv", F.lit(None).cast("double")).withColumn(
                "hll_small_range", F.lit(None).cast("int")
            )
        row = row.select(
            F.lit(col).alias("col_name"),
            "n_rows",
            "n_nulls",
            "ndv_exact",
            "hll_ndv",
            "hll_small_range",
            "min_num",
            "max_num",
        )
        out = row if out is None else out.unionByName(row)
    return out


def _global_hll_sql(key_sql: str) -> str:
    from ..operators.sketches import HLL_M, HLL_NUMERATOR, _RANK_CAP, hll_rank_expr

    return f"""(
    WITH hashed AS (
        SELECT md5({key_sql}) AS h FROM events WHERE {key_sql} IS NOT NULL
    ),
    regs AS (
        SELECT substr(h, 1, 2) AS reg, MAX({hll_rank_expr("h")}) AS max_rho
        FROM hashed GROUP BY 1
    ),
    grouped AS (
        SELECT SUM(CAST(1 AS BIGINT) << ({_RANK_CAP} - max_rho)) AS observed_sum,
               COUNT(*) AS observed_regs
        FROM regs
    )
    SELECT {HLL_NUMERATOR!r} / CAST(observed_sum
           + ({HLL_M} - observed_regs) * (CAST(1 AS BIGINT) << {_RANK_CAP})
           AS DOUBLE)
    FROM grouped
)"""


def _table_stats_oracle() -> str:
    parts = []
    for col, is_num, do_hll in _STATS_COLS:
        key_sql = f"CAST({col} AS VARCHAR)" if col != "event_type" else col
        hll = _global_hll_sql(key_sql) if do_hll else "CAST(NULL AS DOUBLE)"
        small = (
            f"CAST(({_global_hll_sql(key_sql)} <= {_HLL_SMALL_RANGE_MAX!r}) AS INTEGER)"
            if do_hll
            else "CAST(NULL AS INTEGER)"
        )
        mn = f"MIN(CAST({col} AS DOUBLE))" if is_num else "CAST(NULL AS DOUBLE)"
        mx = f"MAX(CAST({col} AS DOUBLE))" if is_num else "CAST(NULL AS DOUBLE)"
        parts.append(f"""SELECT '{col}' AS col_name,
    CAST(COUNT(*) AS BIGINT) AS n_rows,
    CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
    CAST(COUNT(DISTINCT {col}) AS BIGINT) AS ndv_exact,
    {hll} AS hll_ndv,
    {small} AS hll_small_range,
    {mn} AS min_num,
    {mx} AS max_num
FROM events""")
    return "\nUNION ALL\n".join(parts)


TABLE_STATS_ORACLE = _table_stats_oracle()


# --------------------------------------------------------------------------
# Histogram-based approximate quantiles — the single-pass SCALE path
# beside ``quantiles_exact``'s per-group sort: bucket values by
# floor(value) (deterministic IEEE floor), cumulative-sum the <= |range|
# bucket counts, and read the bucket where the cumsum crosses the same
# explicit rank the exact query uses. Error is bounded by one bucket
# width BY CONSTRUCTION (the true rank-target value lies in the
# reported bucket); ``quantiles_exact`` is the witness query. Plan
# shape: one hash agg on (group, bucket) with map-side combine, then a
# window over the tiny bucket table — no full sort of the input ever
# happens, which is what makes this the 100 TB quantile plan.
def quantiles_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    b = ev.groupBy(
        "event_type", F.floor("value").cast("bigint").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = b.withColumn("cum", F.sum("n").over(w_cum)).withColumn(
        "n_total", F.sum("n").over(Window.partitionBy("event_type"))
    )
    with_p = cum.withColumn(
        "p", F.explode(F.array(*[F.lit(p) for p in _QUANTILES]))
    )
    hits = with_p.filter(
        F.col("cum") >= (F.floor((F.col("n_total") - 1) * F.col("p")) + 1)
    )
    return hits.groupBy("event_type", "p").agg(
        F.min("bucket").cast("double").alias("q_est")
    )


QUANTILES_HISTOGRAM_ORACLE = f"""
WITH b AS (
    SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS bucket, COUNT(*) AS n
    FROM events GROUP BY 1, 2
),
c AS (
    SELECT *,
        SUM(n) OVER (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        SUM(n) OVER (PARTITION BY event_type) AS n_total
    FROM b
)
SELECT event_type, p, CAST(MIN(bucket) AS DOUBLE) AS q_est
FROM c, UNNEST([{", ".join(str(p) for p in _QUANTILES)}]) AS t(p)
WHERE cum >= FLOOR((n_total - 1) * p) + 1
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Incremental NDV maintenance: the stored per-group register
# accumulator (here the even event_ids stand in for the persisted
# store) merges with the new batch's registers by per-register MAX —
# associative, commutative AND idempotent, so batch boundaries can
# never drift the estimate and replaying an already-merged batch is a
# no-op (at-least-once delivery needs no dedup fence, unlike additive
# counters). Held to the FULL-recompute oracle: the merged sketch must
# be BIT-IDENTICAL to sketching all events in one pass — the property
# that lets a 100 TB rolling NDV ("distinct users per event type, all
# time") be maintained at per-batch cost with the history never
# re-scanned. Same maintenance shape as corpus_vocab_incremental; the
# vocab store merges by SUM (additive, NOT idempotent), this one by
# MAX — the two sketch-store merge disciplines, both oracle-pinned.
def hll_distinct_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_finalize, hll_merge, hll_registers

    ev = read_table(spark, sf_dir, "events")
    prior = hll_registers(
        ev.filter(F.col("event_id") % 2 == 0), F.col("user_id"), ["event_type"]
    )
    batch = hll_registers(
        ev.filter(F.col("event_id") % 2 == 1), F.col("user_id"), ["event_type"]
    )
    return hll_finalize(hll_merge(prior, batch, ["event_type"]), ["event_type"])


HLL_DISTINCT_INCREMENTAL_ORACLE = f"""
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
)
SELECT event_type,
       CAST(observed_sum
            + ({HLL_M} - observed_regs) * (CAST(1 AS BIGINT) << {_RANK_CAP})
            AS BIGINT) AS register_sum,
       CAST({HLL_M} - observed_regs AS BIGINT) AS zero_registers,
       {HLL_NUMERATOR!r} / CAST(observed_sum
            + ({HLL_M} - observed_regs) * (CAST(1 AS BIGINT) << {_RANK_CAP})
            AS DOUBLE) AS hll_estimate
FROM grouped
"""


# --------------------------------------------------------------------------
# Group-wise winsorization: clip each event's value to its group's
# exact [p01, p99] band — the outlier-capping step of feature
# engineering (the reference caps feature values with fixed literals;
# this is the data-driven version). The thresholds come from the same
# exact-rank formula quantiles_exact pins (rank = floor((n−1)p) + 1 on
# the strict (value, event_id) order — no builtin percentile
# convention drift), computed in ONE window pass and aggregated to a
# groups-sized threshold table that broadcasts back onto the scan.
# At 100 TB: one sort-based window per group for the ranks, a tiny
# broadcast, and a codegen clip projection — the clip never reshuffles
# the fact table.
WINSOR_LO = 0.01
WINSOR_HI = 0.99


def winsorized_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    # per-type n via AGG + broadcast join (quantiles_exact's rationale:
    # full-partition window frames buffer row-scaled partitions)
    totals = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ranked = ev.withColumn("rn", F.row_number().over(w)).join(
        F.broadcast(totals), "event_type"
    )
    lo_rn = F.floor((F.col("n") - 1) * F.lit(WINSOR_LO)) + 1
    hi_rn = F.floor((F.col("n") - 1) * F.lit(WINSOR_HI)) + 1
    bounds = (
        ranked.filter((F.col("rn") == lo_rn) | (F.col("rn") == hi_rn))
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return ev.join(F.broadcast(bounds), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "lo",
        "hi",
        clipped.alias("clipped_value"),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
        .cast("int")
        .alias("was_clipped"),
    )


WINSORIZED_VALUES_ORACLE = f"""
WITH ranked AS (
    SELECT event_id, event_type, value,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events
),
bounds AS (
    SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
    FROM ranked
    WHERE rn = floor((n - 1) * {WINSOR_LO}) + 1
       OR rn = floor((n - 1) * {WINSOR_HI}) + 1
    GROUP BY 1
)
SELECT e.event_id, e.event_type, e.value, b.lo, b.hi,
       least(greatest(e.value, b.lo), b.hi) AS clipped_value,
       CAST(e.value < b.lo OR e.value > b.hi AS INTEGER) AS was_clipped
FROM events e JOIN bounds b USING (event_type)
"""


# --------------------------------------------------------------------------
# Grouped Pearson correlation from exact sums: r(x, y) per group via
# the one-pass moment identities (Σx, Σy, Σxy, Σx², Σy², n) kept in
# DECIMAL until ONE final double expression — the builtin corr() would
# accumulate doubles in engine-specific order and never cross-match.
# One map-side-combinable hash agg per group; the moment tuple is the
# mergeable state (partial sums from any partitioning combine), i.e.
# the same partial-aggregate discipline as the sketch tier, applied to
# second-order statistics. The feature-engineering consumer: detect
# collinear features (|r| → 1) before they destabilize a linear model.
def feature_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact INTEGER units (×10⁴): Pearson r is invariant under linear
    # scaling, so integer moments lose nothing — and sidestep both
    # engines' decimal-product precision rules (DuckDB's int64 decimal
    # storage overflows on (18,4)×(18,4) products). DECIMAL(38,0)
    # keeps the squared sums exact (≤1e23 here, far under 1e38).
    unit = lambda c: F.expr(f"cast(round({c} * 10000) as decimal(38,0))")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        unit("l_quantity").alias("x"),
        unit("l_extendedprice").alias("y"),
        unit("l_discount").alias("z"),
    )
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )

    def pearson(sa, sb, sab, saa, sbb):
        n = F.col("n").cast("double")
        num = F.col(sab).cast("double") - F.col(sa).cast("double") * F.col(
            sb
        ).cast("double") / n
        da = F.col(saa).cast("double") - F.col(sa).cast("double") * F.col(
            sa
        ).cast("double") / n
        db = F.col(sbb).cast("double") - F.col(sb).cast("double") * F.col(
            sb
        ).cast("double") / n
        return F.round(num / F.sqrt(da * db), 6)

    return sums.select(
        "l_returnflag",
        "n",
        pearson("sx", "sy", "sxy", "sxx", "syy").alias("corr_qty_price"),
        pearson("sx", "sz", "sxz", "sxx", "szz").alias("corr_qty_discount"),
    )


FEATURE_CORRELATIONS_ORACLE = """
WITH u AS (
    SELECT l_returnflag,
           CAST(round(l_quantity * 10000) AS DECIMAL(38,0)) AS x,
           CAST(round(l_extendedprice * 10000) AS DECIMAL(38,0)) AS y,
           CAST(round(l_discount * 10000) AS DECIMAL(38,0)) AS z
    FROM lineitem
),
sums AS (
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(x) AS sx, SUM(y) AS sy, SUM(z) AS sz,
           SUM(x * y) AS sxy, SUM(x * z) AS sxz,
           SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(z * z) AS szz
    FROM u GROUP BY 1
)
SELECT l_returnflag, n,
       ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))), 6)
           AS corr_qty_price,
       ROUND((CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE) / CAST(n AS DOUBLE))
             / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / CAST(n AS DOUBLE))), 6)
           AS corr_qty_discount
FROM sums
"""


# --------------------------------------------------------------------------
# Rolling z-score outlier flags: each event scored against its user's
# TRAILING window of prior events (rows frame, never the current row —
# the score must not contaminate its own baseline). The monitoring /
# anomaly-detection feature every risk pipeline runs on value streams.
# Numerics follow feature_correlations' discipline: the frame keeps
# EXACT integer moments (Σcents, Σcents², n), then
# z = (n·x − S) / sqrt(n·Q − S²) is ONE double expression from exact
# integers — and the outlier DECISION never touches floats at all:
# |z| > 3  ⇔  (n·x − S)² > 9·(n·Q − S²), an all-integer predicate, so
# the flag is boundary-proof cross-engine. Windows under
# ZSCORE_MIN_BASELINE rows (cold start) or with zero variance score
# NULL and never flag. One window pass over the (user, ts, id) order —
# per-partition linear, the same shape as every running-balance plan.
ZSCORE_WINDOW = 10
ZSCORE_MIN_BASELINE = 5


def rolling_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZSCORE_WINDOW, -1)
    )
    # cents² (and (n·x−S)² below) overflow BIGINT at ~$3M single
    # events — realistic for on-chain value streams. Moments are kept
    # in DECIMAL (exact; the oracle mirrors with HUGEINT/int128), so
    # under ANSI mode an out-of-range value errors instead of wrapping.
    cents_d = F.col("cents").cast("decimal(19,0)")
    stats = ev.select(
        "user_id",
        "event_id",
        "ts",
        "cents",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(cents_d).over(w).alias("s"),
        F.sum(cents_d * cents_d).over(w).alias("q"),
    )
    num = F.col("n") * F.col("cents").cast("decimal(19,0)") - F.col("s")
    var_n2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    usable = (F.col("n") >= ZSCORE_MIN_BASELINE) & (var_n2 > 0)
    return stats.select(
        "user_id",
        "event_id",
        "ts",
        "cents",
        F.col("n").alias("n_baseline"),
        F.when(usable, num / F.sqrt(var_n2.cast("double"))).alias("z"),
        F.when(usable & (num * num > 9 * var_n2), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_outlier"),
    )


ROLLING_ZSCORE_ORACLE = f"""
WITH ev AS (
    SELECT user_id, event_id, ts,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
stats AS (
    SELECT user_id, event_id, ts, cents,
           CAST(COUNT(*) OVER w AS BIGINT) AS n,
           SUM(CAST(cents AS HUGEINT)) OVER w AS s,
           SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) OVER w AS q
    FROM ev
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN {ZSCORE_WINDOW} PRECEDING AND 1 PRECEDING
    )
)
SELECT user_id, event_id, ts, cents,
       n AS n_baseline,
       CASE WHEN n >= {ZSCORE_MIN_BASELINE} AND n * q - s * s > 0
            THEN CAST(n * CAST(cents AS HUGEINT) - s AS DOUBLE)
                 / sqrt(CAST(n * q - s * s AS DOUBLE))
       END AS z,
       CAST(CASE WHEN n >= {ZSCORE_MIN_BASELINE} AND n * q - s * s > 0
                  AND (n * CAST(cents AS HUGEINT) - s) * (n * CAST(cents AS HUGEINT) - s) > 9 * (n * q - s * s)
            THEN 1 ELSE 0 END AS INTEGER) AS is_outlier
FROM stats
"""


# --------------------------------------------------------------------------
# Event-grain CUSUM alert rollup — the per-user change-point monitor
# at TRANSACTION grain (wallet_cusum_drift's daily cousin): s_t =
# max(0, s_{t-1} + cents_t - k) climbs while a user's event values
# run above the k-per-event allowance, alarms at s > h. Same exact
# closed form — prefix sum + running min, TWO windows, no recurrence:
#   s_t = P_t - least(0, min_{j<=t} P_j),  P = Σ(cents - k)
# which is also why the STREAMING mirror needs only O(1) state per
# user (the pair (P, min P) — see streaming.stream_jobs.
# stream_cusum_monitor, registered against THIS oracle). Numerics:
# cents exact, prefix sums in DECIMAL(38,0) (lifetime sums never ride
# BIGINT), alarm predicate exact-integer; final row selected by a
# ROW_NUMBER in BOTH engines (DuckDB's max_by takes no composite
# key). Scale shape: one (user, ts, id)-ordered window pass —
# per-partition linear, the running-balance family's shape.
CUSUM_EVENT_ALLOWANCE_C = 50_000  # k: $500/event, in cents
CUSUM_EVENT_ALARM_C = 500_000  # h: $5,000 cumulative, in cents


def user_cusum_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(round(value * 100) AS DECIMAL(38,0))").alias("cents"),
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    d = F.col("cents") - F.lit(CUSUM_EVENT_ALLOWANCE_C).cast("decimal(38,0)")
    staged = (
        ev.select("user_id", "ts", "event_id", F.sum(d).over(run).alias("p"))
        .select(
            "user_id",
            "ts",
            "event_id",
            (
                F.col("p")
                - F.least(
                    F.lit(0).cast("decimal(38,0)"), F.min("p").over(run)
                )
            ).alias("s_c"),
        )
        .withColumn("__rn", F.row_number().over(last))
    )
    return staged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("s_c").cast("bigint").alias("max_cusum_c"),
        F.max(F.when(F.col("__rn") == 1, F.col("s_c")))
        .cast("bigint")
        .alias("final_cusum_c"),
        F.sum(
            (F.col("s_c") > CUSUM_EVENT_ALARM_C).cast("bigint")
        ).alias("n_alarms"),
    )


USER_CUSUM_ALERTS_ORACLE = f"""
WITH ev AS (
    SELECT user_id, event_id, ts,
           CAST(round(value * 100) AS DECIMAL(38,0)) AS cents
    FROM events
),
prefixed AS (
    SELECT user_id, ts, event_id,
           SUM(cents - {CUSUM_EVENT_ALLOWANCE_C}) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS p
    FROM ev
),
cusum AS (
    SELECT user_id, ts, event_id,
           p - LEAST(CAST(0 AS DECIMAL(38,0)), MIN(p) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )) AS s_c,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS __rn
    FROM prefixed
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(s_c) AS BIGINT) AS max_cusum_c,
       CAST(MAX(CASE WHEN __rn = 1 THEN s_c END) AS BIGINT) AS final_cusum_c,
       CAST(SUM(CASE WHEN s_c > {CUSUM_EVENT_ALARM_C} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_alarms
FROM cusum
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Weighted median per brand — the robust price statistic a pricing
# desk trusts over means (one fat-fingered order can't move it) and
# the canonical "cumulative weight crossing" window op: the weighted
# lower median is the smallest value whose cumulative weight reaches
# half the total. Exactness end-to-end: prices are exact integer
# cents, weights exact integer quantities (DECIMAL(15,2) but
# integral-valued in TPC-H — CAST is exact), cumulative sums in
# DECIMAL(38,0), and the crossing DECISION is the all-integer
# predicate 2·cum_w ≥ total_w (boundary-proof — no /2, no doubles,
# the z-score outlier-flag discipline). Scale shape: one fact→dim
# equi join, then ONE ordered window pass per brand partition (the
# running-balance family's shape) and a |brands|-keyed agg.


def brand_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.expr("CAST(l_extendedprice * 100 AS BIGINT)").alias("cents"),
        F.expr("CAST(l_quantity AS DECIMAL(38,0))").alias("w"),
    )
    part = read_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = li.join(part, "l_partkey")
    run = (
        Window.partitionBy("p_brand")
        .orderBy("cents", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # total_w via a tiny |brands|-keyed AGG joined back broadcast — NOT
    # an unbounded-both-sides window, which buffers the entire brand
    # partition per task (WindowExec's whole-partition frame) and
    # OOMed the 100× probe (60M rows / 25 brands = 2.4M-row buffers
    # × 32 tasks; PLANS.md §weighted-median OOM). The running frame
    # below streams row-by-row and is safe at any partition size.
    totals = joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("w").alias("total_w"),
    )
    staged = joined.select(
        "p_brand",
        "cents",
        F.sum("w").over(run).alias("cum_w"),
    ).join(F.broadcast(totals), "p_brand")
    return staged.groupBy("p_brand").agg(
        F.max("n_items").alias("n_items"),
        F.max("total_w").cast("bigint").alias("total_weight"),
        F.min(
            F.when(
                F.lit(2).cast("decimal(38,0)") * F.col("cum_w")
                >= F.col("total_w"),
                F.col("cents"),
            )
        ).alias("median_price_c"),
    )


BRAND_WEIGHTED_MEDIAN_ORACLE = """
WITH joined AS (
    SELECT p.p_brand,
           CAST(l.l_extendedprice * 100 AS BIGINT) AS cents,
           CAST(l.l_quantity AS DECIMAL(38,0)) AS w,
           l.l_orderkey, l.l_linenumber
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
staged AS (
    SELECT p_brand, cents, w,
           SUM(w) OVER (
               PARTITION BY p_brand
               ORDER BY cents, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum_w,
           SUM(w) OVER (PARTITION BY p_brand) AS total_w
    FROM joined
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(MAX(total_w) AS BIGINT) AS total_weight,
       MIN(CASE WHEN 2 * cum_w >= total_w THEN cents END) AS median_price_c
FROM staged
GROUP BY 1
"""


# --------------------------------------------------------------------------
# MAD outlier gate: median-absolute-deviation outlier counts per
# event_type — the robust sibling of rolling_zscore_outliers (mean/σ
# break down exactly when the data needs an outlier gate; median/MAD
# have a 50% breakdown point). Reference's DQ gate family
# (data_quality_ethereum_wallet_features.sql) stops at constraint
# counts; this is the engine-extension robust-stats member.
#
# Exactness: both medians are LOWER order statistics picked by the
# all-integer predicate 2·cum ≥ n over exact cents (the
# brand_weighted_median discipline) — no float summation, no averaged
# midpoints, so Spark ≡ DuckDB bit-for-bit. The outlier rule
# |x − med| > 3·MAD is likewise an integer comparison (MAD = 0
# degenerates to "any deviation flags", the standard MAD caveat).
#
# 100 TB shape: every window here runs over the VALUE-FREQUENCY table
# (event_type, cents) → cnt — partition size is the number of DISTINCT
# values per group, not the row count (prices cluster; the freq table
# is orders of magnitude smaller than the event log). The row-scaled
# work is two map-side-combinable hash aggs; medians/MAD/outlier
# counts all come off the freq table, and the per-type joins broadcast
# a ≤|event_type|-row dim. No full-partition frames anywhere (the r9
# window-sweep rule).
def event_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    freq = ev.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    return mad_from_freq(freq)


def mad_from_freq(freq: DataFrame) -> DataFrame:
    """MAD-outlier tail over an (event_type, cents, cnt) value-frequency
    table — ONE definition shared by the batch plan and the streaming
    value-frequency store's rollup (the psi_from_histogram pattern), so
    the two can never drift: both medians are the all-integer
    2·cum ≥ n lower order statistics, |x−med| > 3·MAD is an integer
    comparison, and the only double is the final ROUND(,6) share."""
    totals = freq.groupBy("event_type").agg(
        F.sum("cnt").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_values"),
    )
    run_c = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    med = (
        freq.select("event_type", "cents", F.sum("cnt").over(run_c).alias("cum"))
        .join(F.broadcast(totals.select("event_type", "n")), "event_type")
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(F.lit(2) * F.col("cum") >= F.col("n"), F.col("cents"))
            ).alias("median_c")
        )
    )
    dev = (
        freq.join(F.broadcast(med), "event_type")
        .groupBy("event_type", F.abs(F.col("cents") - F.col("median_c")).alias("dev"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    run_d = (
        Window.partitionBy("event_type")
        .orderBy("dev")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mad = (
        dev.select("event_type", "dev", F.sum("cnt").over(run_d).alias("cum"))
        .join(F.broadcast(totals.select("event_type", "n")), "event_type")
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(F.lit(2) * F.col("cum") >= F.col("n"), F.col("dev"))
            ).alias("mad_c")
        )
    )
    outliers = (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("dev") > F.lit(3) * F.col("mad_c"), F.col("cnt")).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("n_outliers")
        )
    )
    return (
        totals.join(med, "event_type")
        .join(mad, "event_type")
        .join(outliers, "event_type")
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_events"),
            "n_distinct_values",
            "median_c",
            "mad_c",
            "n_outliers",
            F.round(
                F.col("n_outliers").cast("double") / F.col("n").cast("double"), 6
            ).alias("outlier_share"),
        )
    )


EVENT_MAD_OUTLIERS_ORACLE = """
WITH ev AS (
    SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
    FROM events WHERE value IS NOT NULL
),
freq AS (
    SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM ev GROUP BY 1, 2
),
totals AS (
    SELECT event_type, SUM(cnt) AS n, CAST(COUNT(*) AS BIGINT) AS n_distinct_values
    FROM freq GROUP BY 1
),
med_stage AS (
    SELECT f.event_type, f.cents, t.n,
           SUM(f.cnt) OVER (
               PARTITION BY f.event_type ORDER BY f.cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum
    FROM freq f JOIN totals t USING (event_type)
),
med AS (
    SELECT event_type, MIN(CASE WHEN 2 * cum >= n THEN cents END) AS median_c
    FROM med_stage GROUP BY 1
),
dev AS (
    SELECT f.event_type, abs(f.cents - m.median_c) AS dev, SUM(f.cnt) AS cnt
    FROM freq f JOIN med m USING (event_type) GROUP BY 1, 2
),
mad_stage AS (
    SELECT d.event_type, d.dev, t.n,
           SUM(d.cnt) OVER (
               PARTITION BY d.event_type ORDER BY d.dev
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum
    FROM dev d JOIN totals t USING (event_type)
),
mad AS (
    SELECT event_type, MIN(CASE WHEN 2 * cum >= n THEN dev END) AS mad_c
    FROM mad_stage GROUP BY 1
),
outliers AS (
    SELECT d.event_type,
           CAST(SUM(CASE WHEN d.dev > 3 * a.mad_c THEN d.cnt ELSE 0 END) AS BIGINT)
               AS n_outliers
    FROM dev d JOIN mad a USING (event_type) GROUP BY 1
)
SELECT t.event_type,
       CAST(t.n AS BIGINT) AS n_events,
       t.n_distinct_values,
       m.median_c,
       a.mad_c,
       o.n_outliers,
       round(CAST(o.n_outliers AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS outlier_share
FROM totals t
JOIN med m USING (event_type)
JOIN mad a USING (event_type)
JOIN outliers o USING (event_type)
"""


def event_spearman_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type Spearman rank correlation between arrival order and
    value — the robust monotone-drift screen (is this event type's
    value systematically creeping up or down over time?) that Pearson
    on raw cents misses under heavy tails and that the MAD/CUSUM
    family doesn't answer (they find level shifts, not monotone
    association).

    Exactness: both rankings are ROW_NUMBER over strict total orders
    ((ts, event_id) and (cents, event_id)) — the engine's standard
    deterministic untying, identical in both engines, equal to
    textbook Spearman whenever values are tie-free. Ranks are then
    permutations of 1..n, so ρ = 1 − 6·Σd²/(n(n²−1)) is exact:
    Σd² is an all-integer DECIMAL(19,0)²→DECIMAL(38,0) sum (d ≤ n,
    Σd² ≤ n³ — holds to n ≈ 3·10¹² rows/type), the ρ report is ONE
    fixed double expression tree over exact integers (bit-equal
    cross-engine after ROUND(,6)), and the ``is_trending`` verdict
    (|ρ| > 0.5) never touches floats: ρ > ½ ⇔ 12·Σd² < n(n²−1) and
    ρ < −½ ⇔ 4·Σd² > n(n²−1), both DECIMAL(38,0) cross-
    multiplications, ANSI-safe.

    Scale shape (r11 de-skew — VERDICT r10 #2): partitioning a rank
    window by the low-cardinality ``event_type`` alone puts one hot
    type's ENTIRE sort on one task (the round's only near-linear 100×
    probe, 16.2×). Both ranks now use the banded distributed rank
    discipline of ``corpus_token_budget``: band each sort key into
    ~256 per-type integer buckets (band widths derived from a tiny
    per-type min/max aggregate, so the layout adapts to any value
    domain), rank within (event_type, band) in parallel, and add the
    broadcast prefix-sum of per-band counts as the band offset. Band
    = monotone function of the sort key and equal keys share a band,
    so band-major order ≡ the global (key, event_id) order and the
    composed rank is IDENTICAL to the single-partition ROW_NUMBER —
    the banding never surfaces (oracle unchanged). Parallelism scales
    with types×bands instead of types; per-task memory scales with
    rows/band. Guarded by
    test_spearman_windows_partitioned_by_band.
    """
    from ..caching import persist_tracked

    BANDS = 256
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "event_id",
            # full-precision epoch micros: ordering by ts_s must be
            # EXACTLY the timestamp order (a seconds cast would merge
            # sub-second ties and diverge from the oracle's ORDER BY ts)
            F.unix_micros(F.col("ts")).alias("ts_s"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    # tiny per-type stats → integer band widths (≥1, so degenerate
    # all-equal domains collapse to one band instead of dividing by 0)
    stats = ev.groupBy("event_type").agg(
        F.min("ts_s").alias("min_t"),
        F.max("ts_s").alias("max_t"),
        F.min("cents").alias("min_c"),
        F.max("cents").alias("max_c"),
    )
    w_t = F.greatest(
        F.lit(1).cast("bigint"),
        ((F.col("max_t") - F.col("min_t")) / BANDS + 1).cast("bigint"),
    )
    w_c = F.greatest(
        F.lit(1).cast("bigint"),
        ((F.col("max_c") - F.col("min_c")) / BANDS + 1).cast("bigint"),
    )
    banded = persist_tracked(
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "event_id",
            "ts_s",
            "cents",
            F.floor((F.col("ts_s") - F.col("min_t")) / w_t).alias("band_t"),
            F.floor((F.col("cents") - F.col("min_c")) / w_c).alias("band_v"),
        )
    )

    def banded_rank(df: DataFrame, band: str, key: str, out: str) -> DataFrame:
        # per-(type, band) counts → prefix-sum offsets over the tiny
        # aggregate (rows = types×bands, one light exchange), broadcast
        # back; rank = offset + ROW_NUMBER inside the band partition.
        counts = df.groupBy("event_type", band).agg(
            F.count(F.lit(1)).alias("_n")
        )
        wo = (
            Window.partitionBy("event_type")
            .orderBy(F.col(band).asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = counts.select(
            "event_type",
            band,
            F.coalesce(F.sum("_n").over(wo), F.lit(0)).alias("_off"),
        )
        wr = Window.partitionBy("event_type", band).orderBy(
            F.col(key).asc(), F.col("event_id").asc()
        )
        return (
            df.join(F.broadcast(offsets), ["event_type", band])
            .withColumn(out, (F.col("_off") + F.row_number().over(wr)).cast("bigint"))
            .drop("_off")
        )

    ranked = banded_rank(
        banded_rank(banded, "band_t", "ts_s", "r_t"), "band_v", "cents", "r_v"
    ).select("event_type", "r_t", "r_v")
    d = (F.col("r_t") - F.col("r_v")).cast("decimal(19,0)")
    agg = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(d * d).cast("decimal(38,0)").alias("s_d2"),
    )
    n19 = F.col("n_events").cast("decimal(19,0)")
    denom = (n19 * n19 - F.lit(1).cast("decimal(19,0)")) * n19
    nd = F.col("n_events").cast("double")
    rho = F.round(
        F.lit(1.0)
        - F.lit(6.0) * F.col("s_d2").cast("double") / (nd * (nd * nd - F.lit(1.0))),
        6,
    )
    return agg.filter(F.col("n_events") >= 2).select(
        "event_type",
        "n_events",
        "s_d2",
        rho.alias("spearman_rho"),
        (
            (F.lit(12).cast("decimal(38,0)") * F.col("s_d2") < denom)
            | (F.lit(4).cast("decimal(38,0)") * F.col("s_d2") > denom)
        ).alias("is_trending"),
    )


EVENT_SPEARMAN_ORACLE = """
WITH ev AS (
    SELECT event_type, event_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
    FROM events WHERE value IS NOT NULL
),
ranked AS (
    SELECT event_type,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY ts ASC, event_id ASC) AS r_t,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY cents ASC, event_id ASC) AS r_v
    FROM ev
),
agg AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(r_t - r_v AS DECIMAL(19,0))
                    * CAST(r_t - r_v AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s_d2
    FROM ranked GROUP BY 1
)
SELECT event_type, n_events, s_d2,
       round(1.0 - 6.0 * CAST(s_d2 AS DOUBLE)
             / (CAST(n_events AS DOUBLE)
                * (CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE) - 1.0)),
             6) AS spearman_rho,
       12 * s_d2 < (CAST(n_events AS DECIMAL(19,0)) * CAST(n_events AS DECIMAL(19,0)) - 1)
                   * CAST(n_events AS DECIMAL(19,0))
       OR 4 * s_d2 > (CAST(n_events AS DECIMAL(19,0)) * CAST(n_events AS DECIMAL(19,0)) - 1)
                     * CAST(n_events AS DECIMAL(19,0)) AS is_trending
FROM agg WHERE n_events >= 2
"""


def event_seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted robust outliers — the screen
    ``event_mad_outliers`` structurally misses: a $500 purchase at 3am
    Sunday can be wildly anomalous while unremarkable against the
    GLOBAL median. Baseline = the exact median per (event_type,
    day-of-week, hour) cell; an event is a seasonal outlier when its
    deviation from ITS CELL's median exceeds 3× the type's global MAD
    (the robust scale already computed by the MAD family).

    All-integer throughout: cell medians are 2·cum ≥ n lower order
    statistics over the (cell × cents) VALUE-FREQUENCY table (windows
    scale with distinct values per cell, not rows — the MAD
    discipline), the global MAD rides in from ``mad_from_freq`` (one
    code path with the registered MAD query), and the outlier predicate
    |c − med_cell| > 3·MAD is an integer comparison. Day-of-week/hour
    labels never leave the plan (the chisq rule — Spark's 1=Sunday vs
    DuckDB's 0=Sunday is a bijective cell relabeling, invisible to
    per-cell medians).
    """
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("dayofweek(ts)").alias("dow"),
            F.expr("hour(ts)").alias("hr"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    freq4 = ev.groupBy("event_type", "dow", "hr", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    cell_tot = freq4.groupBy("event_type", "dow", "hr").agg(
        F.sum("cnt").alias("cell_n")
    )
    run = (
        Window.partitionBy("event_type", "dow", "hr")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    med_cell = (
        freq4.select(
            "event_type", "dow", "hr", "cents", F.sum("cnt").over(run).alias("cum")
        )
        .join(cell_tot, ["event_type", "dow", "hr"])
        .groupBy("event_type", "dow", "hr")
        .agg(
            F.min(
                F.when(F.lit(2) * F.col("cum") >= F.col("cell_n"), F.col("cents"))
            ).alias("med_cell")
        )
    )
    # global robust scale — the SAME code path as the registered MAD
    # query (mad_from_freq), so the two screens can never drift
    global_freq = ev.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    mad = mad_from_freq(global_freq).select("event_type", "mad_c")
    flagged = (
        freq4.join(med_cell, ["event_type", "dow", "hr"])
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_value_cells"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("med_cell"))
                    > F.lit(3) * F.col("mad_c"),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_seasonal_outliers"),
        )
    )
    return flagged.select(
        "event_type",
        "n_events",
        "n_value_cells",
        "n_seasonal_outliers",
        F.round(
            F.col("n_seasonal_outliers").cast("double")
            / F.col("n_events").cast("double"),
            6,
        ).alias("seasonal_outlier_share"),
    )


EVENT_SEASONAL_OUTLIERS_ORACLE = """
WITH ev AS (
    SELECT event_type, dayofweek(ts) AS dow, hour(ts) AS hr,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events WHERE value IS NOT NULL
),
freq4 AS (
    SELECT event_type, dow, hr, cents, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM ev GROUP BY 1, 2, 3, 4
),
cell_tot AS (
    SELECT event_type, dow, hr, SUM(cnt) AS cell_n
    FROM freq4 GROUP BY 1, 2, 3
),
med_cell AS (
    SELECT f.event_type, f.dow, f.hr,
           MIN(CASE WHEN 2 * f.cum >= t.cell_n THEN f.cents END) AS med_cell
    FROM (
        SELECT event_type, dow, hr, cents,
               SUM(cnt) OVER (PARTITION BY event_type, dow, hr ORDER BY cents
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM freq4
    ) f
    JOIN cell_tot t ON t.event_type = f.event_type AND t.dow = f.dow
                   AND t.hr = f.hr
    GROUP BY 1, 2, 3
),
gfreq AS (
    SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM ev GROUP BY 1, 2
),
gtot AS (SELECT event_type, SUM(cnt) AS n FROM gfreq GROUP BY 1),
gmed AS (
    SELECT f.event_type,
           MIN(CASE WHEN 2 * f.cum >= t.n THEN f.cents END) AS median_c
    FROM (
        SELECT event_type, cents,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM gfreq
    ) f JOIN gtot t USING (event_type)
    GROUP BY 1
),
gdev AS (
    SELECT g.event_type, abs(g.cents - m.median_c) AS dev, SUM(g.cnt) AS cnt
    FROM gfreq g JOIN gmed m USING (event_type)
    GROUP BY 1, 2
),
gmad AS (
    SELECT d.event_type,
           MIN(CASE WHEN 2 * d.cum >= t.n THEN d.dev END) AS mad_c
    FROM (
        SELECT event_type, dev,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY dev
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM gdev
    ) d JOIN gtot t USING (event_type)
    GROUP BY 1
)
SELECT f.event_type,
       CAST(SUM(f.cnt) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_value_cells,
       CAST(SUM(CASE WHEN abs(f.cents - m.med_cell) > 3 * g.mad_c
                     THEN f.cnt ELSE 0 END) AS BIGINT) AS n_seasonal_outliers,
       round(CAST(SUM(CASE WHEN abs(f.cents - m.med_cell) > 3 * g.mad_c
                           THEN f.cnt ELSE 0 END) AS DOUBLE)
             / CAST(SUM(f.cnt) AS DOUBLE), 6) AS seasonal_outlier_share
FROM freq4 f
JOIN med_cell m ON m.event_type = f.event_type AND m.dow = f.dow AND m.hr = f.hr
JOIN gmad g ON g.event_type = f.event_type
GROUP BY 1
"""
