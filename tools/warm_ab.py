"""Isolated min-of-N A/B timer for the warm-tier movers.

Mirrors bench.py's isolated tier exactly (cache_scope + session-memo
reset + noop sink) for a hand-picked query list, so a builder-box run
can compare warm vs full on the SAME box without paying the whole
208-query suite. Usage:

    python tools/warm_ab.py [query ...]   # default: the warm movers
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wallet_and_risky_features_data_pipeline_spark.caching import cache_scope
from wallet_and_risky_features_data_pipeline_spark.plans.llm_ops import (
    reset_session_memos,
)
from wallet_and_risky_features_data_pipeline_spark.plans.registry import QUERIES
from wallet_and_risky_features_data_pipeline_spark.session import get_spark

DEFAULT = [
    "wallet_flow_motifs",
    "wallet_flow_motifs_warm",
    "wallet_label_propagation",
    "wallet_label_propagation_warm",
    "wallet_pagerank",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    runs = int(os.environ.get("WARM_AB_RUNS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("wrf-warm-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # untimed pass: state builds + codegen warmup
    for n in names:
        reset_session_memos(spark)
        with cache_scope():
            QUERIES[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out: dict[str, float] = {}
    for n in names:
        best = None
        for _ in range(runs):
            reset_session_memos(spark)
            t0 = time.perf_counter()
            with cache_scope():
                QUERIES[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            took = time.perf_counter() - t0
            best = took if best is None else min(best, took)
        out[n] = round(best, 3)
        print(f"{n:45s} {best:7.3f}", flush=True)
    print({"load": os.getloadavg()[0], **out})


if __name__ == "__main__":
    main()
