"""Quality-classifier training → scan-time deployment loop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solrizer_spark.operators.classifier import (
    hashed_count_features,
    train_hashed_linear,
)

GOOD = "the report presents a thorough and careful analysis of results"
BAD = "zzspam qqjunk winbig clickhere zzspam qqjunk freemoney clicknow"


@pytest.fixture()
def labeled(spark):
    rows = [(i, GOOD + f" v{i % 3}", 1.0) for i in range(20)] + [
        (100 + i, BAD + f" v{i % 3}", 0.0) for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_features_shape_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["features"]
           for r in hashed_count_features(df, dim=16).collect()}
    assert len(out[1]) == 16 and sum(out[1]) == 3.0  # 3 tokens counted
    assert out[2] == [0.0] * 16  # null text -> zero vector


def test_train_separates_and_deploys_at_scan_time(spark, labeled):
    from solrizer_spark.functions.text_stats import hashed_linear_score

    weights, bias = train_hashed_linear(labeled, dim=64, max_iter=30)
    assert len(weights) == 64
    # deploy through the existing scan-time Column expression
    scored = labeled.select(
        "label", hashed_linear_score("text", weights, bias).alias("s")
    ).collect()
    assert all((r["s"] > 0) == (r["label"] == 1.0) for r in scored)


def test_scan_time_score_equals_feature_dot_product(spark, labeled):
    """The deployment identity: bias + Σ_tokens w[bucket] equals the
    trained model's margin intercept + Σ_b coef_b·count_b."""
    from solrizer_spark.functions.text_stats import hashed_linear_score

    weights, bias = train_hashed_linear(labeled, dim=32, max_iter=20)
    feats = hashed_count_features(labeled, dim=32)
    rows = feats.select(
        "features", hashed_linear_score("text", weights, bias).alias("s")
    ).collect()
    for r in rows:
        margin = bias + sum(c * w for c, w in zip(r["features"], weights))
        assert r["s"] == pytest.approx(margin, abs=1e-4)


def test_null_text_excluded_from_training(spark, labeled):
    """Review regression: null-text docs train as nothing (excluded),
    matching deployment where hashed_linear_score(null) is NULL."""
    from solrizer_spark.functions.text_stats import hashed_linear_score

    with_nulls = labeled.unionByName(
        spark.createDataFrame(
            [(900, None, 1.0), (901, None, 0.0)],
            "doc_id long, text string, label double",
        )
    )
    weights, bias = train_hashed_linear(with_nulls, dim=64, max_iter=30)
    base_w, base_b = train_hashed_linear(labeled, dim=64, max_iter=30)
    assert weights == base_w and bias == base_b
    scored = with_nulls.select(
        "doc_id", hashed_linear_score("text", weights, bias).alias("s")
    ).collect()
    assert all(r["s"] is None for r in scored if r["doc_id"] >= 900)
