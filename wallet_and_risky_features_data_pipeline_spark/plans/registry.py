"""Query registry: name → (Spark plan, DuckDB oracle SQL).

This is the engine's public query surface — one entry per operator
family from SURVEY.md §2 — and the contract consumed by
``__spark_entry__.py``. Oracle SQL strings are ANSI/DuckDB; entries
whose semantics aren't SQL-expressible register ``None`` and get the
driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import wallet_features as wf

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


register("wallet_features", wf.wallet_features, wf.WALLET_FEATURES_ORACLE)
