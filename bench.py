"""Benchmark harness: runs every registered headline query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": ..., "value": wall_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Execution model: queries are submitted through a small thread pool
(Spark's scheduler is built for concurrent jobs — a cluster runs many
at once), so ``value`` is the wall-clock for the whole suite and the
per-query figures are individual latencies under that concurrency.
Each query materializes fully through the ``noop`` batch sink — every
row is computed by executors, nothing funnels through the driver (a
cluster job writes to object storage, not collect).
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wallet_and_risky_features_data_pipeline_spark.plans.registry import QUERIES
from wallet_and_risky_features_data_pipeline_spark.session import get_spark

CONCURRENCY = int(os.environ.get("SPARK_GRAFT_BENCH_CONCURRENCY", "4"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("wrf-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so the numbers measure the
    # plans, not session startup.
    QUERIES["wallet_features"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    def run(item: tuple[str, object]) -> tuple[str, float]:
        name, fn = item
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return name, round(time.perf_counter() - start, 4)

    start = time.perf_counter()
    with ThreadPoolExecutor(CONCURRENCY) as pool:
        timings = dict(pool.map(run, sorted(QUERIES.items())))
    wall = round(time.perf_counter() - start, 4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": wall,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "concurrency": CONCURRENCY,
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
