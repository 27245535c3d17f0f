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

Both are registered rows-only: a trained model is not SQL-expressible,
so the driver applies the weaker row-count check and the unit tests pin
the mechanics (row preservation, prediction domain, determinism under a
fixed seed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import ivf_topk, train_ivf_centroids
from ..sources.readers import fan_out, read_table


def similarity_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(read_table(spark, sf_dir, "embeddings"))
    centroids = train_ivf_centroids(emb, n_cells=16, seed=42)
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
