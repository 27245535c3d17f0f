"""MLlib plans: the model-training tier on top of the feature engine.

The reference's feature tables exist to feed credit-risk models (its
README positions the pipeline as the feature source for Spectral's
scoring models); this module closes that loop inside the engine with
Spark MLlib so features never leave the cluster:

- ``similarity_ivf_kmeans_topk`` — ANN search with a k-means-trained
  IVF coarse quantizer (``operators.similarity.train_ivf_centroids``),
  the production counterpart of the seed-centroid ``similarity_ivf_topk``.
- ``risk_score_lr`` — multinomial logistic regression over the
  ``embeddings`` table (features = embedding vector, label = the
  table's label column): assemble → fit → score, all distributed.
- ``doc_quality_lr`` — the curation DAG's quality-classifier filter:
  LR distilling the heuristic gate into a calibrated keep score over
  every document (CCNet-style rule-label training).

All are registered rows-only: a trained model is not SQL-expressible,
so the driver applies the weaker row-count check and the unit tests pin
the mechanics (row preservation, prediction domain, determinism under a
fixed seed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import ivf_topk, train_ivf_centroids
from ..sources.readers import fan_out, read_table, table_row_count


def similarity_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN with a TRAINED coarse quantizer. k = max(16, ⌊√n⌋) — the
    canonical IVF sizing that balances the n·k assignment sweep
    against the n·(n/k) within-cell scan at O(n^1.5) each (the same
    rule dedup_semantic ships, and the documented scale knob from the
    RRF-fusion probe: the fixed-16 coarse index is what made candidate
    generation linear in corpus size there). n comes from the parquet
    footer metadata (``table_row_count``), not ``df.count()`` — plan
    construction launches no job."""
    import math

    emb = fan_out(read_table(spark, sf_dir, "embeddings"))
    n_cells = max(16, math.isqrt(table_row_count(sf_dir, "embeddings")))
    centroids = train_ivf_centroids(emb, n_cells=n_cells, seed=42)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return ivf_topk(queries, emb, centroids, k=5, n_probe=4)


def risk_score_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train + score in one plan: LR over embedding features.

    ``elasticNetParam=0`` (pure L2) keeps the LBFGS fit convex and
    stable; predictions (argmax class) are deterministic under the
    fixed data. Output: one row per vector with its predicted class.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    emb = fan_out(read_table(spark, sf_dir, "embeddings"))
    train = emb.select(
        "vec_id",
        F.col("label").cast("double").alias("label"),
        array_to_vector(F.col("embedding")).alias("features"),
    )
    lr = LogisticRegression(maxIter=10, regParam=0.01, elasticNetParam=0.0)
    model = lr.fit(train)
    scored = model.transform(train)
    return scored.select(
        "vec_id",
        F.col("label").cast("int").alias("label"),
        F.col("prediction").cast("int").alias("predicted_label"),
    )


def doc_quality_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style quality-classifier filter (Brown et al. 2020
    Appendix A): train a classifier to distinguish a curated reference
    slice from the rest of the crawl, score EVERY doc with the
    reference-class probability, keep docs above the threshold. This
    sandbox corpus carries no real "WebText-like" signal (every lang's
    text is the same synthetic word soup), so the reference label is
    the heuristic quality gate itself (n_tokens >= 20 AND stop_ratio
    <= 0.25, corpus_curation's predicates) and the model DISTILLS the
    hard rule into a calibrated score — the CCNet move (Wenzek et al.
    2020: train on rule labels, filter on the smooth score). Features
    are the engine's own text-quality signals — token count, stopword
    ratio, mean token length, distinct-token ratio, per-lang marker
    ratios — assembled JVM-side (no Python row loop), fit with convex
    L2 logistic regression, scored distributed; with a real curated
    reference set, only the label expression changes.

    Rows-only entry: the trained model isn't SQL-expressible. The
    mechanics are pinned by a stored golden (integer keep decisions in
    doc_id order) like the other two MLlib entries.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    from ..functions.text import LANG_MARKERS, STOPWORDS, marker_count, token_count

    docs = fan_out(read_table(spark, sf_dir, "documents"))
    toks = token_count("text").cast("double")
    denom = F.greatest(toks, F.lit(1.0))
    marker_feats = {
        f"{code}_marker_ratio": (marker_count("text", words).cast("double") / denom)
        for code, words in LANG_MARKERS.items()
    }
    feats = docs.select(
        "doc_id",
        "source",
        toks.alias("n_tokens"),
        (marker_count("text", STOPWORDS).cast("double") / denom).alias("stop_ratio"),
        (F.length("text").cast("double") / denom).alias("avg_token_len"),
        (
            F.expr(r"size(array_distinct(split(trim(lower(text)), '\\s+')))").cast(
                "double"
            )
            / denom
        ).alias("distinct_ratio"),
        *[c.alias(name) for name, c in marker_feats.items()],
        (
            (toks >= 20)
            & (marker_count("text", STOPWORDS).cast("double") / denom <= 0.25)
        )
        .cast("double")
        .alias("is_reference"),
    )
    assembled = VectorAssembler(
        inputCols=[
            "n_tokens",
            "stop_ratio",
            "avg_token_len",
            "distinct_ratio",
            *marker_feats,
        ],
        outputCol="features",
    ).transform(feats)
    lr = LogisticRegression(
        maxIter=10, regParam=0.01, elasticNetParam=0.0, labelCol="is_reference"
    )
    model = lr.fit(assembled)
    scored = model.transform(assembled)
    return scored.select(
        "doc_id",
        "source",
        F.col("is_reference").cast("int").alias("is_reference"),
        vector_to_array(F.col("probability")).getItem(1).alias("quality_score"),
        (vector_to_array(F.col("probability")).getItem(1) >= 0.5)
        .cast("int")
        .alias("keep"),
    )
