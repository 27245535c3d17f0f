"""The verification driver builds its OWN SparkSession — none of the
engine's session.py confs are guaranteed. The readers self-provision
the confs correctness depends on (_ensure_session_confs); this test
proves that end-to-end by driving the __spark_entry__ contract from a
bare SparkSession in a clean subprocess (a conf leaking from the
shared test fixture can't mask a regression)."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import importlib.util, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla-driver")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

rows = mod.entry(spark).collect()
assert len(rows) > 0, "entry() returned no rows"

qs = mod.queries()
# one events-reading batch plan, one streaming plan, one documents plan
for name in ("watermark_max", "streaming_threshold_alerts", "dedup_exact"):
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    assert n >= 0, name
print("VANILLA_OK", len(rows))
"""


def test_driver_contract_under_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "VANILLA_OK" in proc.stdout


def test_ensure_session_confs_pins_aqe(spark):
    """The LSH persist-without-eager-count pattern depends on AQE's
    stage-wise materialization (broadcast guard fills the cache before
    the join stages scan it); a caller-provided session with AQE off
    must be flipped on by the readers' self-provisioning."""
    from wallet_and_risky_features_data_pipeline_spark.sources.readers import (
        _ensure_session_confs,
    )

    clone = spark.newSession()
    clone.conf.set("spark.sql.adaptive.enabled", "false")
    _ensure_session_confs(clone)
    assert clone.conf.get("spark.sql.adaptive.enabled") == "true"
    # the shared fixture session must be untouched by the clone's flip
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
