"""Core relational plans (SURVEY.md §2.2-2.4, §2.7, §2.8) over the
synthetic TPC-H-style tables.

Each plan is the Spark-first rendering of one operator family from the
reference, paired with a DuckDB oracle. Cross-engine determinism rules
used throughout:

- money math in DECIMAL until the final projection casts to DOUBLE
  (sum order then can't matter);
- double→int conversions always via explicit FLOOR (Spark truncates,
  DuckDB rounds — never rely on implicit cast);
- timestamps leave the plan as epoch microseconds (unix_micros /
  epoch_us) or formatted strings, never raw timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import anti_dedup, asof_join, band_join, semi_filter
from ..operators.windows import latest_per_key
from ..sources.readers import read_table

DEC = "decimal(18,4)"


# --------------------------------------------------------------------------
# A1/A3 — grouped aggregation with conditional aggregates (TPC-H Q1 shape;
# reference wallet_balances rollup, queries/ethereum_wallet_features.sql:278-325)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp")
    )
    qty = F.col("l_quantity").cast(DEC)
    price = F.col("l_extendedprice").cast(DEC)
    # (1-disc) and (1-disc)*(1+tax) are computed in double then fixed to
    # 8 decimal digits so the decimal multiply stays within precision 38
    # on both engines (no engine-specific precision-loss rounding).
    disc_f = (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,8)")
    charge_f = ((F.lit(1.0) - F.col("l_discount")) * (F.lit(1.0) + F.col("l_tax"))).cast(
        "decimal(18,8)"
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * disc_f).cast("double").alias("sum_disc_price"),
            F.sum(price * charge_f).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.when(F.col("l_returnflag") == "R", F.lit(1))).alias("returned_count"),
            F.count("*").alias("count_order"),
        )
    )


PRICING_SUMMARY_ORACLE = """
SELECT
    l_returnflag,
    l_linestatus,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * CAST(1.0 - l_discount AS DECIMAL(18,8))) AS DOUBLE) AS sum_disc_price,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * CAST((1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,8))) AS DOUBLE) AS sum_charge,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_count,
    CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# P2-P5 + §2.8 scalars — watermark filter, projection, derived bucket key
def filter_project_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_quantity") < 24)
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 2).alias("bucket"),
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        F.concat(F.col("l_returnflag"), F.lit("_"), F.col("l_linestatus")).alias("flag_status"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        (F.col("l_extendedprice").cast(DEC) * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,8)"))
        .cast("double")
        .alias("disc_price"),
    )


FILTER_PROJECT_ORACLE = """
SELECT
    l_orderkey,
    l_linenumber,
    substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 2) AS bucket,
    strftime(l_shipdate, '%Y-%m') AS ship_month,
    l_returnflag || '_' || l_linestatus AS flag_status,
    CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
    CAST(CAST(l_extendedprice AS DECIMAL(18,4))
         * CAST(1.0 - l_discount AS DECIMAL(18,8)) AS DOUBLE) AS disc_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# J3/J6 — chained equi joins with broadcast dimensions
def join_equi_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    # nation/region are tiny dimensions → explicit broadcast; customer is
    # left to AQE (could be 15M rows at full scale).
    dims = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        orders.join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("order_count"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_revenue"),
            F.countDistinct("o_custkey").alias("active_customers"),
        )
    )


JOIN_EQUI_CHAIN_ORACLE = """
SELECT
    r_name,
    n_name,
    CAST(COUNT(*) AS BIGINT) AS order_count,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS active_customers
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --------------------------------------------------------------------------
# J4 — left join with NULL-aware aggregation (is_error backfill shape)
def join_left_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("f_order_count"),
            F.coalesce(F.sum(F.col("o_totalprice").cast(DEC)), F.lit(0))
            .cast("double")
            .alias("f_total"),
        )
    )


JOIN_LEFT_AGG_ORACLE = """
SELECT
    c_custkey,
    c_name,
    CAST(COUNT(o_orderkey) AS BIGINT) AS f_order_count,
    CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 0) AS DOUBLE) AS f_total
FROM customer
LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


# --------------------------------------------------------------------------
# J9 — anti-join (NOT EXISTS incremental dedup)
def join_anti_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return anti_dedup(customer, orders, ["c_custkey"]).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


JOIN_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --------------------------------------------------------------------------
# J10 — semi-join (EXISTS restriction)
def join_semi_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    urgent = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_custkey").alias("c_custkey"))
    return (
        semi_filter(customer, urgent, ["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("urgent_customers"))
    )


JOIN_SEMI_ORACLE = """
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS urgent_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


# --------------------------------------------------------------------------
# Shared: deterministic daily price dimension derived from events
# (stands in for features_daily_token_prices, FIXTURES.md A8).
def _daily_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("price_day")
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(18,4)")).cast("double") / F.count(F.lit(1))).alias(
                "price"
            )
        )
    )


_DAILY_PRICES_CTE = """
daily_prices AS (
    SELECT
        event_type,
        date_trunc('day', ts) AS price_day,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS price
    FROM events
    GROUP BY 1, 2
)
"""


# --------------------------------------------------------------------------
# J7 — theta/band join (rugpull market-data date window)
def theta_band_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.date_trunc("day", F.col("ts")).alias("ev_day")
    )
    prices = _daily_prices(spark, sf_dir)
    # Day-bucketed: the 5-value event_type key alone would fan out to
    # |events| × |price days|; bucketing joins on (event_type, day)
    # with the tiny price side exploded ×2 and broadcast.
    joined = band_join(
        ev,
        prices,
        key=["event_type"],
        fact_ts=F.col("ev_day"),
        dim_ts=F.col("price_day"),
        lower=F.expr("INTERVAL 1 DAY"),
        upper=F.expr("INTERVAL 0 DAY"),
        how="inner",
        bucket_days=(1, 0),
        broadcast_dim=True,
    )
    return joined.groupBy("event_id").agg(
        F.count("*").alias("n_prices"),
        F.sum(F.col("price").cast("decimal(18,8)")).cast("double").alias("price_sum"),
    )


THETA_BAND_ORACLE = f"""
WITH {_DAILY_PRICES_CTE.strip().rstrip()}
SELECT
    e.event_id,
    CAST(COUNT(*) AS BIGINT) AS n_prices,
    CAST(SUM(CAST(p.price AS DECIMAL(18,8))) AS DOUBLE) AS price_sum
FROM events e
JOIN daily_prices p
  ON e.event_type = p.event_type
 AND p.price_day BETWEEN date_trunc('day', e.ts) - INTERVAL 1 DAY
                     AND date_trunc('day', e.ts)
GROUP BY e.event_id
"""


# --------------------------------------------------------------------------
# J8/W12 — as-of nearest price join within 7-day backward tolerance
def asof_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    prices = _daily_prices(spark, sf_dir).withColumnRenamed("event_type", "p_type")
    # Day-bucketed + broadcast: price dim is tokens × days at any scale;
    # the (event_type, day) equi key bounds fan-out at ≤8 quotes/event
    # instead of the full per-type price history (VERDICT r02 #2).
    out = asof_join(
        ev,
        prices.withColumnRenamed("p_type", "event_type"),
        key=["event_type"],
        event_id=["event_id"],
        event_ts="ts",
        quote_ts="price_day",
        tolerance_expr="INTERVAL 7 DAYS",
        direction="backward",
        bucket_days=7,
        broadcast_quotes=True,
    )
    return out.select(
        "event_id",
        F.coalesce(F.col("price"), F.lit(0.0)).alias("asof_price"),
        F.unix_micros("price_day").alias("price_day_us"),
    )


ASOF_PRICE_ORACLE = f"""
WITH {_DAILY_PRICES_CTE.strip().rstrip()},
cand AS (
    SELECT e.event_id, p.price_day, p.price,
           abs(epoch_us(e.ts) - epoch_us(p.price_day)) AS dist
    FROM events e
    JOIN daily_prices p
      ON e.event_type = p.event_type
     AND p.price_day BETWEEN e.ts - INTERVAL 7 DAY AND e.ts
),
best AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_id ORDER BY dist ASC, price_day DESC) AS rk
    FROM cand
)
SELECT
    e.event_id,
    COALESCE(b.price, 0.0) AS asof_price,
    epoch_us(b.price_day) AS price_day_us
FROM events e
LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON e.event_id = b.event_id
"""


# --------------------------------------------------------------------------
# A7/W7 — dedup-to-latest (rank-and-filter)
def dedup_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    latest = latest_per_key(
        orders, ["o_custkey"], order_desc=["o_orderdate", "o_orderkey"]
    )
    return latest.select(
        "o_custkey",
        "o_orderkey",
        F.unix_micros("o_orderdate").alias("order_date_us"),
        F.col("o_totalprice").alias("total_price"),
    )


DEDUP_LATEST_ORACLE = """
SELECT o_custkey, o_orderkey,
       epoch_us(o_orderdate) AS order_date_us,
       o_totalprice AS total_price
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# A10 — SELECT DISTINCT dedup
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").distinct()


DISTINCT_ORACLE = "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"


# --------------------------------------------------------------------------
# A5/J16 — watermark MAX restricted to the latest partition, via a
# scalar-subquery cross join (the reference's incremental probe)
def watermark_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").withColumn(
        "month_partition", F.date_format("ts", "yyyy-MM")
    )
    latest = ev.agg(F.max("month_partition").alias("latest_month"))
    return (
        ev.crossJoin(F.broadcast(latest))
        .filter(F.col("month_partition") == F.col("latest_month"))
        .agg(
            F.max("event_id").alias("wm_event_id"),
            F.unix_micros(F.max("ts")).alias("wm_ts_us"),
        )
    )


WATERMARK_MAX_ORACLE = """
SELECT CAST(MAX(event_id) AS BIGINT) AS wm_event_id,
       epoch_us(MAX(ts)) AS wm_ts_us
FROM events
WHERE strftime(ts, '%Y-%m') = (SELECT MAX(strftime(ts, '%Y-%m')) FROM events)
"""


# --------------------------------------------------------------------------
# A6 — COUNT(DISTINCT) data-quality reconciliation
def count_distinct_dq(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("distinct_customers"),
        F.count("*").alias("order_rows"),
    )


COUNT_DISTINCT_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS distinct_customers,
       CAST(COUNT(*) AS BIGINT) AS order_rows
FROM orders
GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# J13 + DQ — missing-key detection via generated sequence anti-join
# (reference missing-blocks check, raw_data_ingestion_pipeline.py:715-756)
def sequence_missing_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    expected = spark.range(lo, hi + 1).withColumnRenamed("id", "o_orderkey")
    missing = anti_dedup(expected, orders.select("o_orderkey"), ["o_orderkey"])
    return missing.groupBy(
        (F.col("o_orderkey") - (F.col("o_orderkey") % 10000)).alias("key_bucket")
    ).agg(F.count("*").alias("missing_count"))


SEQUENCE_MISSING_ORACLE = """
WITH bounds AS (SELECT MIN(o_orderkey) lo, MAX(o_orderkey) hi FROM orders),
expected AS (
    SELECT UNNEST(generate_series(lo, hi)) AS o_orderkey FROM bounds
),
missing AS (
    SELECT e.o_orderkey FROM expected e
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = e.o_orderkey)
)
SELECT o_orderkey - (o_orderkey % 10000) AS key_bucket,
       CAST(COUNT(*) AS BIGINT) AS missing_count
FROM missing
GROUP BY 1
"""


# --------------------------------------------------------------------------
# A3 — FILTER-clause conditional aggregates per month
def conditional_agg_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast(DEC)
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", price)).cast("double").alias("f_total"),
            F.sum(F.when(F.col("o_orderstatus") == "O", price)).cast("double").alias("o_total"),
            F.count(F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))).alias("urgent_count"),
            F.count("*").alias("n_orders"),
        )
    )


CONDITIONAL_AGG_ORACLE = """
SELECT
    strftime(o_orderdate, '%Y-%m') AS order_month,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS f_total,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS o_total,
    CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS urgent_count,
    CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY 1
"""


# --------------------------------------------------------------------------
# A4 + J14 — map-building aggregate then explode back to rows
# (contracts_aggregations round-trip, queries/ethereum_wallet_features.sql:268-274,429-431)
def map_aggregate_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value")
    )
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_arrays(
            F.collect_list("event_type"), F.collect_list("total_value")
        ).alias("type_totals")
    )
    return as_map.select(
        "user_id", F.explode("type_totals").alias("event_type", "total_value")
    )


MAP_ROUNDTRIP_ORACLE = """
SELECT user_id, event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# A4 nested — MAP<string, MAP<string, double>> aggregate + JSON round
# trip. The reference builds ``contracts_aggregations`` as a map of
# per-contract metric maps via MAP(ARRAY_AGG(k), ARRAY_AGG(MAP(...)))
# (queries/ethereum_wallet_features.sql:268-274), serializes it to
# JSON, and downstream consumers re-extract scalars from it with
# json_extract_scalar and explode it back to rows
# (ethereum_wallet_features.sql:403-416,429-431). This plan exercises
# that full path: nested build → to_json → from_json (schema-checked
# parse) → outer-map explode → per-inner-map JSON scalar extraction by
# literal path. The oracle computes the same values directly, so any
# precision or key loss in the JSON hop breaks the hash.
def map_nested_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        F.count(F.lit(1)).cast("double").alias("n_events"),
        F.max(F.col("value")).alias("max_value"),
    )
    nested = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col("event_type"),
                    F.create_map(
                        F.lit("total_value"), F.col("total_value"),
                        F.lit("n_events"), F.col("n_events"),
                        F.lit("max_value"), F.col("max_value"),
                    ),
                )
            )
        ).alias("type_metrics")
    )
    roundtripped = nested.select(
        "user_id",
        F.from_json(
            F.to_json(F.col("type_metrics")), "map<string,map<string,double>>"
        ).alias("parsed"),
    )
    exploded = roundtripped.select(
        "user_id", F.explode("parsed").alias("event_type", "metrics")
    ).withColumn("metrics_json", F.to_json(F.col("metrics")))
    return exploded.select(
        "user_id",
        "event_type",
        F.get_json_object("metrics_json", "$.total_value").cast("double").alias("total_value"),
        F.get_json_object("metrics_json", "$.n_events").cast("double").alias("n_events"),
        F.get_json_object("metrics_json", "$.max_value").cast("double").alias("max_value"),
    )


MAP_NESTED_JSON_ORACLE = """
SELECT user_id, event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
       CAST(COUNT(*) AS DOUBLE) AS n_events,
       MAX(value) AS max_value
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# §2.8 string/array scalar suite over nation
def scalar_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_table(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.lower("n_name").alias("name_lower"),
        F.substring("n_name", 1, 3).alias("name_prefix"),
        F.length("n_name").alias("name_len"),
        F.concat(F.lit("NATION_"), F.col("n_name")).alias("name_tagged"),
        F.array_join(F.split(F.col("n_name"), "A"), "-").alias("name_split_join"),
        F.coalesce(F.nullif(F.col("n_name"), F.lit("FRANCE")), F.lit("REDACTED")).alias(
            "name_redacted"
        ),
    )


SCALAR_STRING_ORACLE = """
SELECT
    n_nationkey,
    lower(n_name) AS name_lower,
    substr(n_name, 1, 3) AS name_prefix,
    CAST(length(n_name) AS INT) AS name_len,
    'NATION_' || n_name AS name_tagged,
    array_to_string(string_split(n_name, 'A'), '-') AS name_split_join,
    COALESCE(NULLIF(n_name, 'FRANCE'), 'REDACTED') AS name_redacted
FROM nation
"""


# --------------------------------------------------------------------------
# §2.6 — global sort + limit (top-k; rank-free ORDER BY ... LIMIT with a
# deterministic unique tie-break). Spark plans this as TakeOrderedAndProject
# — a per-partition top-k then a driver merge, never a full global sort.
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").alias("total_price"),
            "o_orderstatus",
        )
    )


TOP_REVENUE_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice AS total_price, o_orderstatus
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# Multi-grain ROLLUP (grouping sets): month×type detail, month subtotals,
# grand total in ONE pass. The reference has no grouping sets (SURVEY.md
# §2.4 notes the absence); a warehouse engine needs them — Spark expands
# the sets via a single Expand node feeding one hash aggregate, so the
# input is scanned once regardless of how many grains are requested.
# Subtotal rows are disambiguated by grouping_id (bit-identical across
# engines), with NULL group keys coalesced to 'ALL' for stable hashing.
def rollup_multi_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        F.date_format("ts", "yyyy-MM").alias("month"),
        "event_type",
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    rolled = base.rollup("month", "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("v").cast("double").alias("total_value"),
        F.grouping_id().cast("int").alias("grain"),
    )
    return rolled.select(
        F.coalesce("month", F.lit("ALL")).alias("month"),
        F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
        "grain",
        "n_events",
        "total_value",
    )


ROLLUP_MULTI_GRAIN_ORACLE = """
SELECT COALESCE(month, 'ALL') AS month,
       COALESCE(event_type, 'ALL') AS event_type,
       CAST(GROUPING(month, event_type) AS INT) AS grain,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(v) AS DOUBLE) AS total_value
FROM (
    SELECT strftime(ts, '%Y-%m') AS month, event_type,
           CAST(value AS DECIMAL(18,4)) AS v
    FROM events
)
GROUP BY ROLLUP(month, event_type)
"""


# --------------------------------------------------------------------------
# Pivot to a wide per-user event-type matrix. The explicit value list
# matters at scale: pivot without it runs a distinct-discovery job
# (a full extra scan) over the input first. The physical plan is two
# hash-agg layers — partial counts on (user, type), then pivotfirst on
# user — so the second exchange moves at most one pre-aggregated row
# per (user, type), never raw events; map-side combine does the heavy
# reduction. (A single-exchange alternative is hand-written FILTER
# aggregates, as in conditional_agg_monthly; the pivot API is the
# surface under test here.)
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").pivot("event_type", list(EVENT_TYPES)).count()
    return wide.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


PIVOT_EVENT_MATRIX_ORACLE = f"""
SELECT user_id,
       {", ".join(
           f"CAST(COUNT(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
           for t in EVENT_TYPES
       )}
FROM events
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Unpivot the wide matrix back to long form — DataFrame.unpivot is an
# Expand (each input row emits |value columns| rows) fused map-side:
# no shuffle, no join, and the zero cells survive the round trip.
def unpivot_user_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = pivot_event_matrix(spark, sf_dir)
    long = wide.unpivot(
        ["user_id"],
        [f"n_{t}" for t in EVENT_TYPES],
        "event_type",
        "n_events",
    )
    return long.select(
        "user_id",
        F.expr("substr(event_type, 3)").alias("event_type"),
        "n_events",
    )


UNPIVOT_USER_MATRIX_ORACLE = """
SELECT u.user_id, t.event_type,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM (SELECT DISTINCT user_id FROM events) u
CROSS JOIN (
    SELECT unnest(['click', 'error', 'purchase', 'signup', 'view']) AS event_type
) t
LEFT JOIN (
    SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
) c ON c.user_id = u.user_id AND c.event_type = t.event_type
"""


# --------------------------------------------------------------------------
# Set operations: EXCEPT / INTERSECT segment split. Spark plans both
# as aggregate-free left-anti / left-semi joins over distinct inputs —
# the same shuffle shape as the J9/J10 anti/semi family, so the cost
# model is one hash exchange per side, no row-by-row set state.
def except_intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    click_only = clickers.subtract(purchasers).select(
        "user_id", F.lit("click_only").alias("segment")
    )
    both = clickers.intersect(purchasers).select(
        "user_id", F.lit("both").alias("segment")
    )
    return click_only.unionByName(both)


EXCEPT_INTERSECT_ORACLE = """
WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
purchasers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT user_id, 'click_only' AS segment FROM (
    SELECT user_id FROM clickers EXCEPT SELECT user_id FROM purchasers
)
UNION ALL
SELECT user_id, 'both' AS segment FROM (
    SELECT user_id FROM clickers INTERSECT SELECT user_id FROM purchasers
)
"""


# --------------------------------------------------------------------------
# NTILE decile assignment over per-user spend — the bucketed-rank
# window the quantile engine doesn't cover (NTILE distributes the
# remainder to the leading buckets by SQL definition, identically in
# both engines given the same total order; the (total, user_id)
# tie-break makes that order strict).
def window_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    totals = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("total")
    )
    w = Window.orderBy(F.col("total"), F.col("user_id"))
    return totals.select(
        "user_id",
        F.col("total").cast("double").alias("total_value"),
        F.ntile(10).over(w).alias("decile"),
    )


WINDOW_NTILE_ORACLE = """
WITH totals AS (
    SELECT user_id, SUM(CAST(value AS DECIMAL(18,6))) AS total
    FROM events GROUP BY 1
)
SELECT user_id,
       CAST(total AS DOUBLE) AS total_value,
       CAST(NTILE(10) OVER (ORDER BY total, user_id) AS INT) AS decile
FROM totals
"""


# --------------------------------------------------------------------------
# CUBE over (status, priority): all four grains in ONE Expand + one
# hash aggregation (same physical strategy as ROLLUP with 4 instead of
# 3 grouping sets) — completes the grouping-sets family next to
# rollup_multi_grain.
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").cast(DEC).alias("v"),
    )
    cubed = base.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum("v").cast("double").alias("total_price"),
        F.grouping_id().cast("int").alias("grain"),
    )
    return cubed.select(
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
        "grain",
        "n_orders",
        "total_price",
    )


CUBE_STATUS_PRIORITY_ORACLE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS grain,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(v) AS DOUBLE) AS total_price
FROM (
    SELECT o_orderstatus, o_orderpriority,
           CAST(o_totalprice AS DECIMAL(18,4)) AS v
    FROM orders
)
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM): a NULL key
# matches a NULL key — the join semantic plain equality silently drops
# (the one member of the join family not exercised elsewhere). Planned
# as an ordinary hash join: NULL hashes like any other value under
# null-safe equality, so no skew/fallback caveats.
def join_null_safe_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    key = F.when(
        F.col("o_orderpriority") == "3-MEDIUM", F.lit(None).cast("string")
    ).otherwise(F.col("o_orderpriority"))
    all_counts = orders.select(key.alias("pkey")).groupBy("pkey").agg(
        F.count(F.lit(1)).alias("n_all")
    )
    f_counts = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(key.alias("pkey"))
        .groupBy("pkey")
        .agg(F.count(F.lit(1)).alias("n_f"))
    )
    joined = all_counts.alias("a").join(
        f_counts.alias("f"), F.col("a.pkey").eqNullSafe(F.col("f.pkey"))
    )
    return joined.select(
        F.coalesce(F.col("a.pkey"), F.lit("UNKNOWN")).alias("priority_key"),
        "n_all",
        "n_f",
    )


JOIN_NULL_SAFE_ORACLE = """
WITH keyed AS (
    SELECT CASE WHEN o_orderpriority = '3-MEDIUM' THEN NULL
                ELSE o_orderpriority END AS pkey,
           o_orderstatus
    FROM orders
),
all_counts AS (SELECT pkey, CAST(COUNT(*) AS BIGINT) AS n_all FROM keyed GROUP BY 1),
f_counts AS (
    SELECT pkey, CAST(COUNT(*) AS BIGINT) AS n_f
    FROM keyed WHERE o_orderstatus = 'F' GROUP BY 1
)
SELECT COALESCE(a.pkey, 'UNKNOWN') AS priority_key, a.n_all, f.n_f
FROM all_counts a
JOIN f_counts f ON a.pkey IS NOT DISTINCT FROM f.pkey
"""


# --------------------------------------------------------------------------
# Structured entity resolution: blocked pairwise matching over the
# customer dimension — the data-integration workload (MDM / record
# linkage) that complements the text-dedup family: blocking keys cut
# the O(n²) pair space to within-block pairs (the same
# candidate-bounding idea as LSH buckets, on structured attributes),
# then cheap field similarities (edit distance on the name, absolute
# balance delta) score each candidate, and a conjunctive threshold
# keeps likely duplicates. Blocking is LAYERED: (nation, segment)
# alone left block size ∝ customers-per-segment — the 10× replica
# probe measured the resulting pair quadratic at 6 s → 63 s — so the
# balance-band key tightens it LOSSLESSLY: a match needs
# |Δbal| < ENTITY_BAL_DELTA, so both sides of any true pair live in
# the same or adjacent ENTITY_BAL_DELTA-wide band; one side explodes
# its probe window {b−1, b, b+1} (the as-of day-bucket trick) and the
# join stays pure EQUI on (nation, segment, band). Each pair matches
# in exactly one band, so no dedup pass is needed.
ENTITY_NAME_DIST = 2
ENTITY_BAL_DELTA = 100.0


def _entity_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse exact-duplicate customer records into one representative
    per DISTINCT entity (all match-relevant fields identical), carrying
    the sorted member-key list. The hot-block defense made mechanical:
    the fuzzy (levenshtein) stage only ever sees one row per entity, so
    a block holding N identical copies costs O(distinct²) candidate
    work instead of O(N²) — the standard collapse-before-compare move
    in record linkage. Lossless by construction: identical records
    match trivially (dist 0, Δbal 0) and are expanded combinatorially."""
    return (
        read_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .groupBy("c_name", "c_acctbal", "c_nationkey", "c_mktsegment")
        .agg(F.sort_array(F.collect_list("c_custkey")).alias("members"))
        .withColumn("gid", F.col("members").getItem(0))
        .withColumn("band", F.floor(F.col("c_acctbal") / F.lit(ENTITY_BAL_DELTA)))
    )


def entity_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked entity resolution, collapse-then-expand.

    Phase 1 collapses exact duplicates (``_entity_groups``); phase 2
    emits within-group pairs by pure array expansion (no comparison —
    identical records always match); phase 3 runs the banded equi-join
    candidate generation BETWEEN representatives only, scores each
    group pair ONCE (levenshtein + balance delta are constant across a
    group's members), and expands the passing group pairs to member
    pairs with a codegen array transform. Group order (``a.gid <
    b.gid``) makes each group pair unique; ``least/greatest`` orients
    each member pair as (low key, high key), matching the oracle's
    ``a.c_custkey < b.c_custkey`` — valid because every scored field
    is symmetric and block fields are equal within a pair. On real data
    (unique names) every group is a singleton and the plan degenerates
    to exactly the r6 shape; on a pathological block of N copies the
    quadratic moves out of the join into output expansion, which is
    the answer's own size."""
    grouped = _entity_groups(spark, sf_dir)

    within = (
        grouped.filter(F.size("members") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(members, (x, i) -> "
                    "transform(slice(members, i + 2, size(members)), "
                    "y -> struct(x AS a_key, y AS b_key))))"
                )
            ).alias("p"),
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .select(
            "p.a_key",
            "p.b_key",
            "nationkey",
            "mktsegment",
            F.lit(0).cast("bigint").alias("name_dist"),
            F.lit(0.0).alias("bal_delta"),
        )
    )

    probe = grouped.withColumn(
        "band", F.explode(F.expr("array(band - 1, band, band + 1)"))
    )
    a, b = probe.alias("a"), grouped.alias("b")
    name_dist = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
    bal_delta = F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal"))
    cross = (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.gid") < F.col("b.gid")),
        )
        .filter((name_dist <= ENTITY_NAME_DIST) & (bal_delta < ENTITY_BAL_DELTA))
        .select(
            F.col("a.members").alias("a_members"),
            F.col("b.members").alias("b_members"),
            F.col("a.c_nationkey").alias("nationkey"),
            F.col("a.c_mktsegment").alias("mktsegment"),
            name_dist.cast("bigint").alias("name_dist"),
            F.round(bal_delta, 2).alias("bal_delta"),
        )
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(a_members, x -> transform(b_members, "
                    "y -> struct(least(x, y) AS a_key, greatest(x, y) AS b_key))))"
                )
            ).alias("p"),
            "nationkey",
            "mktsegment",
            "name_dist",
            "bal_delta",
        )
        .select("p.a_key", "p.b_key", "nationkey", "mktsegment", "name_dist", "bal_delta")
    )
    return within.unionByName(cross)


def entity_block_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mechanical block-occupancy audit for ``entity_match_pairs``:
    per (nation, segment, band) block, raw row count vs DISTINCT-entity
    count. ``n_entities`` is what the banded rep-level join is
    quadratic in — the number an operator alerts on (LSH's
    ``max_bucket`` analog, but observable instead of lossy); a block
    where ``n_rows >> n_entities`` is exactly the replica hot case the
    collapse phase absorbs."""
    cust = read_table(spark, sf_dir, "customer").withColumn(
        "band", F.floor(F.col("c_acctbal") / F.lit(ENTITY_BAL_DELTA))
    )
    return cust.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        "band",
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("c_name", "c_acctbal").alias("n_entities"),
    )


ENTITY_OCCUPANCY_ORACLE = f"""
SELECT c_nationkey AS nationkey,
       c_mktsegment AS mktsegment,
       CAST(FLOOR(c_acctbal / {ENTITY_BAL_DELTA}) AS BIGINT) AS band,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT (c_name, c_acctbal)) AS n_entities
FROM customer
GROUP BY 1, 2, 3
"""


ENTITY_MATCH_ORACLE = f"""
SELECT a.c_custkey AS a_key,
       b.c_custkey AS b_key,
       a.c_nationkey AS nationkey,
       a.c_mktsegment AS mktsegment,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS name_dist,
       ROUND(abs(a.c_acctbal - b.c_acctbal), 2) AS bal_delta
FROM customer a
JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_mktsegment = b.c_mktsegment
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= {ENTITY_NAME_DIST}
  AND abs(a.c_acctbal - b.c_acctbal) < {ENTITY_BAL_DELTA}
"""


def order_shipping_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ship-delay distribution per order priority — the fulfillment
    SLA view over the orders ⋈ lineitem join: integer day gaps
    (datediff never leaves the integer domain), with the median and
    p90 as LOWER order statistics over the per-(priority, delay)
    frequency table via the engine's all-integer 2·cum ≥ n /
    10·cum ≥ 9·n predicates — the MAD/quantile family's discipline on
    the relational side, so Spark ≡ DuckDB bit-for-bit with no float
    anywhere but the final ROUND(,6) mean.

    Scale shape: the join shuffles on orderkey once; everything after
    is the (priority × distinct-delay) frequency grain — bounded by
    the delay domain (days), not by row count — and the running-sum
    windows over it are streaming frames on that bounded grain.
    """
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    gaps = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("delay_days"),
    )
    freq = gaps.groupBy("priority", "delay_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    totals = freq.groupBy("priority").agg(
        F.sum("cnt").cast("bigint").alias("n_lines"),
        F.min("delay_days").alias("min_delay"),
        F.max("delay_days").alias("max_delay"),
        F.sum(F.col("delay_days") * F.col("cnt")).cast("bigint").alias("__sum_d"),
    )
    from pyspark.sql import Window

    run = (
        Window.partitionBy("priority")
        .orderBy("delay_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = freq.select(
        "priority", "delay_days", F.sum("cnt").over(run).alias("cum")
    ).join(F.broadcast(totals.select("priority", "n_lines")), "priority")
    quants = cum.groupBy("priority").agg(
        F.min(
            F.when(F.lit(2) * F.col("cum") >= F.col("n_lines"), F.col("delay_days"))
        ).alias("median_delay"),
        F.min(
            F.when(
                F.lit(10) * F.col("cum") >= F.lit(9) * F.col("n_lines"),
                F.col("delay_days"),
            )
        ).alias("p90_delay"),
    )
    return totals.join(quants, "priority").select(
        "priority",
        "n_lines",
        "min_delay",
        "median_delay",
        "p90_delay",
        "max_delay",
        F.round(
            F.col("__sum_d").cast("double") / F.col("n_lines").cast("double"), 6
        ).alias("mean_delay"),
    )


ORDER_SHIPPING_LATENCY_ORACLE = """
WITH gaps AS (
    SELECT o.o_orderpriority AS priority,
           CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS delay_days
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
freq AS (
    SELECT priority, delay_days, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM gaps GROUP BY 1, 2
),
totals AS (
    SELECT priority,
           CAST(SUM(cnt) AS BIGINT) AS n_lines,
           MIN(delay_days) AS min_delay,
           MAX(delay_days) AS max_delay,
           CAST(SUM(delay_days * cnt) AS BIGINT) AS sum_d
    FROM freq GROUP BY 1
),
cum AS (
    SELECT f.priority, f.delay_days, t.n_lines,
           SUM(f.cnt) OVER (PARTITION BY f.priority ORDER BY f.delay_days
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM freq f JOIN totals t USING (priority)
),
quants AS (
    SELECT priority,
           MIN(CASE WHEN 2 * cum >= n_lines THEN delay_days END) AS median_delay,
           MIN(CASE WHEN 10 * cum >= 9 * n_lines THEN delay_days END) AS p90_delay
    FROM cum GROUP BY 1
)
SELECT t.priority, t.n_lines, t.min_delay, q.median_delay, q.p90_delay, t.max_delay,
       round(CAST(t.sum_d AS DOUBLE) / CAST(t.n_lines AS DOUBLE), 6) AS mean_delay
FROM totals t JOIN quants q USING (priority)
"""
