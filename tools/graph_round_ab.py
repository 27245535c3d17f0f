"""Round-shape A/B for the iterative graph family (VERDICT r14 #3).

Times, isolated (cache_scope + memo reset + noop sink, min-of-N — the
bench's isolated-tier methodology), the registry plans for
wallet_taint_hops / wallet_peel_depth / wallet_wash_cycles against
hand-built variants of the per-round shape:

- taint_union:   drop the per-round anti-join; expand the FULL frontier
                 each hop and take MIN(hop) once at the end (2 shuffles
                 per round instead of 3; frontier no longer shrinks).
- taint_unroll2: two BFS hops per round via an edges ⋈ edges pair
                 (round-unroll — halves the round count, pays |E²|
                 pair materialization).
- peel_union:    per-round left-join + greatest → union + one MAX agg
                 (2 shuffles per round instead of 3).

Equivalence is asserted against the registry plan's collected output
before timing — a variant that changes results is disqualified, not
timed.

Usage: python tools/graph_round_ab.py [variant ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wallet_and_risky_features_data_pipeline_spark.caching import (
    cache_scope,
    persist_tracked,
)
from wallet_and_risky_features_data_pipeline_spark.plans import risk_features as R
from wallet_and_risky_features_data_pipeline_spark.plans.llm_ops import (
    reset_session_memos,
)
from wallet_and_risky_features_data_pipeline_spark.plans.registry import QUERIES
from wallet_and_risky_features_data_pipeline_spark.plans.wallet_model import (
    wallet_transactions,
)
from wallet_and_risky_features_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("GRAPH_AB_RUNS", "3"))


def _taint_edges_seeds(spark: SparkSession):
    wt = wallet_transactions(spark, SF_DIR)
    legs = wt.filter(
        (F.col("address_role") == "sender") & F.col("interacted_with").isNotNull()
    )
    edges = legs.select(
        F.col("wallet_address").alias("src"),
        F.col("interacted_with").alias("dst"),
    ).distinct()
    seeds = (
        wt.select("wallet_address")
        .distinct()
        .filter(F.col("wallet_address").cast("bigint") % R.TAINT_SEED_MOD == 0)
        .select("wallet_address", F.lit(0).cast("bigint").alias("hop"))
    )
    return edges, seeds


def taint_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No per-round anti-join: expand the full frontier each hop,
    MIN(hop) once at the end."""
    edges, seeds = _taint_edges_seeds(spark)
    edges = persist_tracked(edges)
    levels = [seeds]
    frontier = seeds.select("wallet_address")
    for h in range(1, R.TAINT_MAX_HOPS + 1):
        frontier = (
            edges.join(frontier.withColumnRenamed("wallet_address", "src"), "src")
            .select(F.col("dst").alias("wallet_address"))
            .distinct()
        )
        if h < R.TAINT_MAX_HOPS:
            frontier = persist_tracked(frontier)
        levels.append(
            frontier.select("wallet_address", F.lit(h).cast("bigint").alias("hop"))
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return (
        out.groupBy("wallet_address")
        .agg(F.min("hop").alias("taint_hops"))
    )


def taint_unroll2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two hops per round: one edges ⋈ edges pair table covers hops
    (1,2); hop 3 is a single extra expansion."""
    edges, seeds = _taint_edges_seeds(spark)
    edges = persist_tracked(edges)
    e2 = (
        edges.alias("x")
        .join(edges.alias("y"), F.col("x.dst") == F.col("y.src"))
        .select(F.col("x.src").alias("src"), F.col("y.dst").alias("dst"))
        .distinct()
    )
    f0 = seeds.select(F.col("wallet_address").alias("src"))
    hop1 = (
        edges.join(f0, "src").select(F.col("dst").alias("wallet_address")).distinct()
    )
    hop2 = e2.join(f0, "src").select(F.col("dst").alias("wallet_address")).distinct()
    hop2 = persist_tracked(hop2)
    hop3 = (
        edges.join(hop2.withColumnRenamed("wallet_address", "src"), "src")
        .select(F.col("dst").alias("wallet_address"))
        .distinct()
    )
    out = seeds
    for h, lv in ((1, hop1), (2, hop2), (3, hop3)):
        out = out.unionByName(
            lv.select("wallet_address", F.lit(h).cast("bigint").alias("hop"))
        )
    return out.groupBy("wallet_address").agg(F.min("hop").alias("taint_hops"))


def peel_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-round union + MAX agg instead of groupBy + left join +
    greatest — same fixpoint arithmetic, one fewer shuffle per round."""
    legs, in_busy, out_busy = R._flow_legs_and_fences(spark, sf_dir)
    hop_in = (
        legs.join(
            in_busy,
            (F.col("dst") == F.col("ib_b")) & (F.col("day") == F.col("ib_day")),
        )
        .filter(F.col("n_in") <= R.FLOW_MAX_DAILY_LEGS)
        .select(
            F.col("event_id").alias("e_id"),
            F.col("dst").alias("mid"),
            F.col("us").alias("us_in"),
            F.col("cents").alias("c_in"),
            F.explode(F.array(F.col("day"), F.date_add(F.col("day"), 1))).alias(
                "match_day"
            ),
        )
    )
    hop_out = (
        legs.join(
            out_busy,
            (F.col("src") == F.col("ob_b")) & (F.col("day") == F.col("ob_day")),
        )
        .filter(F.col("n_out") <= R.FLOW_MAX_DAILY_LEGS)
        .select(
            F.col("event_id").alias("f_id"),
            F.col("src").alias("mid2"),
            F.col("us").alias("us_out"),
            F.col("cents").alias("c_out"),
            F.col("day").alias("out_day"),
        )
    )
    P = persist_tracked(
        hop_in.join(
            hop_out,
            (F.col("mid") == F.col("mid2")) & (F.col("match_day") == F.col("out_day")),
        )
        .filter(
            (F.col("us_out") > F.col("us_in"))
            & (F.col("us_out") - F.col("us_in") <= F.lit(R.FLOW_WINDOW_US))
            & (F.lit(4) * F.col("c_in") <= F.lit(5) * F.col("c_out"))
            & (F.col("c_out") <= F.col("c_in"))
        )
        .select("e_id", "f_id")
    )
    depth = legs.select(F.col("event_id").alias("e_id")).withColumn(
        "d", F.lit(1).cast("bigint")
    )
    for i in range(R.PEEL_MAX_DEPTH - 1):
        contrib = P.join(
            depth.select(F.col("e_id").alias("f_id"), F.col("d").alias("fd")),
            "f_id",
        ).select("e_id", (F.col("fd") + F.lit(1)).alias("d"))
        depth = (
            depth.unionByName(contrib).groupBy("e_id").agg(F.max("d").alias("d"))
        )
        if i < R.PEEL_MAX_DEPTH - 2:
            depth = persist_tracked(depth)
    return (
        legs.select(F.col("event_id").alias("e_id"), "src")
        .join(depth, "e_id")
        .groupBy(F.col("src").alias("wallet_address"))
        .agg(
            F.max("d").cast("bigint").alias("max_peel_depth"),
            F.sum(F.when(F.col("d") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_peel_edges"),
        )
        .select(
            "wallet_address",
            "max_peel_depth",
            "n_peel_edges",
            (F.col("max_peel_depth") >= 3).alias("is_peeling"),
        )
    )


VARIANTS = {
    "taint_union": ("wallet_taint_hops", taint_union),
    "taint_unroll2": ("wallet_taint_hops", taint_unroll2),
    "peel_union": ("wallet_peel_depth", peel_union),
}


def _timed(spark, fn, runs: int) -> float:
    best = None
    for _ in range(runs):
        reset_session_memos(spark)
        t0 = time.perf_counter()
        with cache_scope():
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        took = time.perf_counter() - t0
        best = took if best is None else min(best, took)
    return best


def main() -> None:
    wanted = sys.argv[1:] or list(VARIANTS)
    spark = get_spark("wrf-graph-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for v in wanted:
        base_name, var_fn = VARIANTS[v]
        base_fn = QUERIES[base_name]
        # equivalence gate before any timing
        reset_session_memos(spark)
        with cache_scope():
            exp = sorted(tuple(r) for r in base_fn(spark, SF_DIR).collect())
        with cache_scope():
            got = sorted(tuple(r) for r in var_fn(spark, SF_DIR).collect())
        if exp != got:
            print(f"{v}: NOT EQUIVALENT ({len(exp)} vs {len(got)} rows) — skipped")
            continue
        # interleaved timing, base first then variant, min-of-N
        b = _timed(spark, base_fn, RUNS)
        x = _timed(spark, var_fn, RUNS)
        print(
            f"{v}: base({base_name})={b:.3f}s variant={x:.3f}s "
            f"ratio={x / b:.3f}"
        )


if __name__ == "__main__":
    main()
