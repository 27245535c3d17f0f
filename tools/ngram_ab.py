"""Interleaved A/B for the r16 n-gram capped-stream layout change:
persist the df-capped (doc, shingle) stream hash-partitioned on
``shingle`` (the registry shape) vs the r15 unpartitioned persist (the
'before' arm, inlined here). Equivalence-gated like graph_round_ab.

Usage: python tools/ngram_ab.py [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wallet_and_risky_features_data_pipeline_spark.caching import (
    cache_scope,
    persist_tracked,
)
from wallet_and_risky_features_data_pipeline_spark.operators.dedup import (
    jaccard_pairs_from_capped,
    word_shingles,
)
from wallet_and_risky_features_data_pipeline_spark.plans.llm_ops import (
    _ngram_dims_broadcastable,
    reset_session_memos,
)
from wallet_and_risky_features_data_pipeline_spark.plans.registry import QUERIES
from wallet_and_risky_features_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def jaccard_oldlayout(spark, sf_dir):
    """r15 shape: capped stream persisted UNPARTITIONED (the pair
    self-join then exchanges it twice)."""
    from wallet_and_risky_features_data_pipeline_spark.plans.llm_ops import (
        fan_out,
        read_table,
    )

    docs = fan_out(read_table(spark, sf_dir, "documents"))
    bcast = _ngram_dims_broadcastable(sf_dir)
    shingled = docs.select(
        F.col("doc_id").alias("doc"),
        F.explode(F.array_distinct(word_shingles("text", 3))).alias("shingle"),
    )
    hot = (
        shingled.groupBy("shingle")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") > 100)
        .select("shingle")
    )
    if bcast:
        hot = F.broadcast(hot)
    capped = persist_tracked(shingled.join(hot, "shingle", "left_anti"))
    return jaccard_pairs_from_capped(capped, broadcast_dims=bcast)


def jaccard_shingled_persist(spark, sf_dir):
    """Variant B: persist the PRE-cap shingled stream instead of the
    capped one — one tokenize pass cold (hot list and capped both read
    the cache) at the price of caching the slightly larger pre-cap
    rows and re-running the cheap broadcast anti join per consumer."""
    from wallet_and_risky_features_data_pipeline_spark.plans.llm_ops import (
        fan_out,
        read_table,
    )

    docs = fan_out(read_table(spark, sf_dir, "documents"))
    bcast = _ngram_dims_broadcastable(sf_dir)
    shingled = persist_tracked(
        docs.select(
            F.col("doc_id").alias("doc"),
            F.explode(F.array_distinct(word_shingles("text", 3))).alias("shingle"),
        )
    )
    hot = (
        shingled.groupBy("shingle")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") > 100)
        .select("shingle")
    )
    if bcast:
        hot = F.broadcast(hot)
    capped = shingled.join(hot, "shingle", "left_anti")
    return jaccard_pairs_from_capped(capped, broadcast_dims=bcast)


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("wrf-ngram-ab")
    spark.sparkContext.setLogLevel("ERROR")
    base_fn = QUERIES["dedup_ngram_jaccard"]

    reset_session_memos(spark)
    with cache_scope():
        exp = sorted(tuple(r) for r in base_fn(spark, SF_DIR).collect())
    with cache_scope():
        got = sorted(tuple(r) for r in jaccard_shingled_persist(spark, SF_DIR).collect())
    if exp != got:
        print(f"NOT EQUIVALENT ({len(exp)} vs {len(got)} rows)")
        return

    def timed(fn):
        reset_session_memos(spark)
        t0 = time.perf_counter()
        with cache_scope():
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    new_runs, old_runs, ratios = [], [], []
    for p in range(runs):
        order = [("new", jaccard_shingled_persist), ("old", base_fn)]
        if p % 2:
            order.reverse()
        t = {}
        for tag, fn in order:
            t[tag] = timed(fn)
        new_runs.append(t["new"])
        old_runs.append(t["old"])
        ratios.append(t["new"] / t["old"])
    print(
        f"new(shingled-persist) median={statistics.median(new_runs):.3f}s "
        f"old(registry capped-persist) median={statistics.median(old_runs):.3f}s "
        f"median_ratio(new/old)={statistics.median(ratios):.3f} "
        f"new={[round(x,3) for x in new_runs]} old={[round(x,3) for x in old_runs]}"
    )


if __name__ == "__main__":
    main()
