"""Stage-layer cleansing operators (SURVEY.md stage templates).

The reference's stage SQL does, per table: SELECT DISTINCT → type
casts with try_cast/overflow guards → derived partition keys → a
uuid() surrogate → CTAS/INSERT (stage/transformations/*.sql). Library
form:

- ``stage_clean``    — dedup + partition keys + surrogate id in one
  transform.
- ``repair_topics``  — the log-topics repair chain (length/split/
  replace/array_join, stage/transformations/ethereum_logs.sql:15-19):
  malformed single-string topic blobs are split back into the typed
  array column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import bucket_key, date_partition


def stage_clean(
    df: DataFrame,
    natural_key: Sequence[str],
    ts_col: str,
    address_col: str | None = None,
) -> DataFrame:
    """DISTINCT on the natural key (A10), derived ``date_partition``
    (yyyy-MM) and optional 256-way ``hash_partition``, plus a uuid()
    surrogate key (ethereum_transactions.sql:37)."""
    out = df.dropDuplicates(list(natural_key)).withColumn(
        "date_partition", date_partition(F.col(ts_col))
    )
    if address_col is not None:
        out = out.withColumn("hash_partition", bucket_key(F.col(address_col)))
    return out.withColumn("uuid", F.expr("uuid()"))


def repair_topics(raw_topics: Column) -> Column:
    """Rebuild ARRAY<STRING> topics from either a proper array or a
    malformed '[t1, t2]'-style blob (the reference repairs rows whose
    array arrived as one bracketed string)."""
    blob = F.array_join(raw_topics, ",")
    cleaned = F.regexp_replace(F.regexp_replace(blob, r"[\[\]\s]", ""), "'", "")
    return F.when(F.size(raw_topics) <= 1, F.split(cleaned, ",")).otherwise(raw_topics)
