"""Query-scoped cache tracking.

Several operators ``persist()`` an intermediate that feeds two or more
consumers inside one query plan (the LSH exploded band table, the
n-gram inverted index, the contamination bench index). Spark's
``CacheManager`` holds those entries by logical plan, so they are
never garbage-collected: under a long-lived session running many
queries (the 84-query bench, a notebook, a service) each run would
permanently accumulate executor storage memory.

``persist_tracked`` is a drop-in replacement for ``DataFrame.persist``
that registers the cache with the innermost active ``cache_scope``;
the scope unpersists everything it collected when it exits. Scoping is
per-thread (``threading.local``) so concurrently-benched queries never
release each other's live caches. With no scope active the behavior
is identical to a plain ``persist()`` — library callers who manage
their own lifecycle see no change.

Usage (the bench wraps every query run):

    with cache_scope():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    # all persists taken during the run are released here
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

_scopes = threading.local()


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()`` registered with the active cache scope (if any)."""
    df = df.persist()
    stack = getattr(_scopes, "stack", None)
    if stack:
        stack[-1].append(df)
    return df


@contextmanager
def cache_scope() -> Iterator[None]:
    """Unpersist every ``persist_tracked`` cache taken inside the block.

    ``blocking=False``: release is async block-dropping on the
    executors — the caller doesn't wait, and in-flight tasks holding a
    block finish from the partially-dropped cache or recompute.
    """
    stack = getattr(_scopes, "stack", None)
    if stack is None:
        stack = _scopes.stack = []
    scope: list[DataFrame] = []
    stack.append(scope)
    try:
        yield
    finally:
        stack.pop()
        for df in scope:
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass  # session already stopped — nothing to release
