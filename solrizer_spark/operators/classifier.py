"""Quality-classifier training: learn the weights that
``text_stats.hashed_linear_score`` applies at scan time
(engine-original; closes the fastText-style filter loop — reference
has no learned filtering).

The contract that makes this work at 10^12 docs: featurization and
deployment share ONE hash function (``md5_hash60(token) % dim``).
Training featurizes each doc into a ``dim``-bucket token-count vector
(explode → count → dense array, all JVM-side; ``array_to_vector`` is
the only ml-specific step), fits ``pyspark.ml`` LogisticRegression
(distributed L-BFGS), and exports ``(weights, bias)``. Deployment is
then the existing scan-time Column expression — zero Python, zero
shuffle, the model shipped as a plan literal — because for count
features the LR margin ``intercept + Σ_b coef_b · count_b`` equals
``bias + Σ_tokens coef[bucket(token)]`` exactly.

Scale notes: training data for quality filters is a SAMPLE (10^5-10^7
labeled docs), not the corpus — ``stratified_sample`` feeds this; the
explode/count featurization is one map-side-combinable shuffle; the
dense ``dim``-length vectors (default 256) are small, so the L-BFGS
treeAggregate per iteration moves ``O(dim)`` doubles per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_hash60


def hashed_count_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
) -> DataFrame:
    """Add a ``features`` array<double>: token counts per hash bucket,
    same ``md5_hash60 % dim`` bucketing as ``hashed_linear_score``.
    Docs with null text get the zero vector."""
    bucketed = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).select(id_col, (md5_hash60(F.col("tok")) % dim).cast("int").alias("b"))
    per_bucket = bucketed.groupBy(id_col, "b").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    dense = per_bucket.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("b", "c"))).alias("m")
    ).select(
        id_col,
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(F.try_element_at(F.col("m"), i), F.lit(0.0)),
        ).alias("features"),
    )
    zeros = F.array_repeat(F.lit(0.0), dim)
    return (
        df.join(dense, id_col, "left")
        .withColumn("features", F.coalesce(F.col("features"), zeros))
    )


def train_hashed_linear(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    max_iter: int = 50,
    reg_param: float = 0.0,
) -> tuple[list[float], float]:
    """Fit logistic regression on hashed token counts; return
    ``(weights, bias)`` ready for ``hashed_linear_score`` — the
    deployed Column expression reproduces the model's decision margin
    (sign and ranking) at scan time with no ml dependency."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    # null-text docs are excluded from training: the deployed
    # hashed_linear_score returns NULL for null text (F.split(null)),
    # so a zero-vector training row would teach the model a margin it
    # can never produce at scan time — keep train and deploy domains
    # identical instead
    df = df.where(F.col(text_col).isNotNull())
    feats = hashed_count_features(df, text_col, id_col, dim).select(
        F.col(label_col).cast("double").alias("label"),
        array_to_vector("features").alias("features"),
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    )
    model = lr.fit(feats)
    return [float(w) for w in model.coefficients], float(model.intercept)
