"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference wallet-risk-features pipeline
(Spectral-Finance/wallet-and-risky-features-data-pipeline).

The reference delegates all relational execution to Athena (Presto SQL
templates orchestrated by Python); this engine re-expresses the same
semantics as idiomatic PySpark DataFrame plans so Catalyst/Tungsten pick
the physical strategy. Layout:

- ``session``    — tuned SparkSession factory (AQE, shuffle sizing, UTC).
- ``sources``    — readers/writers: parquet partitioned append, CSV with
                   declared schema, join-based MERGE upsert fallback.
- ``functions``  — scalar expression library (date partitions, bucket
                   keys, overflow guards) + text analysis.
- ``operators``  — reusable DataFrame->DataFrame operators: deterministic
                   windows, as-of/band joins, anti-join dedup, minhash /
                   simhash dedup, similarity search.
- ``plans``      — named end-to-end queries (the SURVEY.md §2 inventory)
                   over the synthetic test tables.
- ``streaming``  — incremental/watermark engine and structured-streaming
                   equivalents of the batch dedup pattern.
"""

__version__ = "0.1.0"
