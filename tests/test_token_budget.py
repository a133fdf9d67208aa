"""token_budget_mix — sampling to a TOKEN budget with mixture weights
(engine-original; the unit LLM data recipes are written in)."""

import pyspark.sql.functions as F
import pytest

from solrizer_spark.operators.sampling import token_budget_mix


@pytest.fixture(scope="module")
def corpus(spark):
    # 3 sources with distinct doc lengths: a (5 tokens/doc × 100),
    # b (20 × 50), c (50 × 10) — 500/1000/500 tokens
    rows = []
    i = 0
    for src, n_docs, tok in (("a", 100, 5), ("b", 50, 20), ("c", 10, 50)):
        for _ in range(n_docs):
            rows.append((i, str(i), src, tok))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, key string, source string, toks int"
    ).cache()


def _mass(df):
    return {
        r["source"]: r["m"]
        for r in df.groupBy("source").agg(F.sum("toks").alias("m")).collect()
    }


def test_exact_mode_hits_target_with_minimal_overshoot(corpus):
    out = token_budget_mix(
        corpus, 1000, "source", "key", "toks",
        weights={"a": 0.3, "b": 0.5, "c": 0.2}, exact=True,
    )
    mass = _mass(out)
    # targets: a=300, b=500, c=200; overshoot < one doc's tokens
    assert 300 <= mass["a"] < 300 + 5
    assert 500 <= mass["b"] < 500 + 20
    assert 200 <= mass["c"] < 200 + 50


def test_exact_mode_short_source_kept_whole(corpus):
    # source c holds 500 tokens; a 10k-token target keeps all of it
    out = token_budget_mix(
        corpus, 20_000, "source", "key", "toks",
        weights={"c": 0.5, "a": 0.5}, exact=True,
    )
    mass = _mass(out)
    assert mass["c"] == 500 and mass["a"] == 500
    assert "b" not in mass, "sources absent from weights are dropped"


def test_approx_mode_rate_and_determinism(corpus):
    kw = dict(weights={"a": 0.3, "b": 0.5, "c": 0.2})
    out1 = token_budget_mix(corpus, 1000, "source", "key", "toks", **kw)
    out2 = token_budget_mix(corpus, 1000, "source", "key", "toks", **kw)
    got1 = sorted(r["doc_id"] for r in out1.collect())
    assert got1 == sorted(r["doc_id"] for r in out2.collect())
    # uniform doc lengths per source → sampled mass ≈ target
    # (hash-threshold keep rate target/stok; tolerance = a few docs)
    mass = _mass(out1)
    assert abs(mass["a"] - 300) <= 50
    assert abs(mass["b"] - 500) <= 100


def test_natural_weights_are_global_downscale(corpus):
    # weights=None: target_s = floor(budget * stok/total): 250/500/250
    out = token_budget_mix(corpus, 1000, "source", "key", "toks", exact=True)
    targets = {
        r["source"]: r["_target_tokens"]
        for r in out.select("source", "_target_tokens").distinct().collect()
    }
    assert targets == {"a": 250, "b": 500, "c": 250}


def test_budget_must_be_positive(corpus):
    with pytest.raises(ValueError, match="positive"):
        token_budget_mix(corpus, 0, "source", "key", "toks")


def test_null_source_rows_excluded(spark):
    df = spark.createDataFrame(
        [(1, "1", "a", 10), (2, "2", None, 10)],
        "doc_id long, key string, source string, toks int",
    )
    out = token_budget_mix(df, 100, "source", "key", "toks", exact=True)
    assert [r["doc_id"] for r in out.collect()] == [1]


# ---------------------------------------------------------------------------
# score_buckets (CCNet head/middle/tail quantile tiers)
# ---------------------------------------------------------------------------

def _scored(spark, n=90, groups=("en",)):
    rows = []
    i = 0
    for g in groups:
        for _ in range(n // len(groups)):
            rows.append((i, g, float(i)))  # score == id → known order
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, s double")


def test_score_buckets_tertiles_exact(spark):
    from solrizer_spark.operators.sampling import score_buckets

    df = _scored(spark, 90)
    out = score_buckets(df, "s", n_buckets=3, key_col="doc_id").collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["score_bucket"], []).append(r["s"])
    # 90 scores 0..89 desc: head = top 30 (60..89), tail = 0..29
    assert sorted(by_bucket[0]) == [float(x) for x in range(60, 90)]
    assert sorted(by_bucket[1]) == [float(x) for x in range(30, 60)]
    assert sorted(by_bucket[2]) == [float(x) for x in range(0, 30)]


def test_score_buckets_per_group_and_null_scores(spark):
    from solrizer_spark.operators.sampling import score_buckets

    rows = [(0, "a", 1.0), (1, "a", 2.0), (2, "a", 3.0), (3, "a", 4.0),
            (4, "b", 10.0), (5, "b", 20.0), (6, "b", None)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
    out = {
        r["doc_id"]: r["score_bucket"]
        for r in score_buckets(
            df, "s", n_buckets=2, group_col="lang", key_col="doc_id"
        ).collect()
    }
    # group a: top-2 (4.0, 3.0) head; group b ranked independently
    assert out[3] == 0 and out[2] == 0 and out[1] == 1 and out[0] == 1
    assert out[5] == 0 and out[4] == 1
    assert out[6] is None, "unscorable docs get NULL, not worst tier"


def test_score_buckets_boundary_tie_goes_to_better_tier(spark):
    from solrizer_spark.operators.sampling import score_buckets

    # 6 rows, scores [5,5,5,1,1,1]: t1 = score at rank 2 = 5 → all
    # three 5s (>= t1) are head even though rank 3 crosses n/2
    rows = [(i, 5.0 if i < 3 else 1.0) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, s double")
    out = {
        r["doc_id"]: r["score_bucket"]
        for r in score_buckets(df, "s", n_buckets=2, key_col="doc_id").collect()
    }
    assert [out[i] for i in range(6)] == [0, 0, 0, 1, 1, 1]


def test_score_buckets_sampled_thresholds_deterministic(spark):
    from solrizer_spark.operators.sampling import score_buckets

    df = _scored(spark, 300)
    a = score_buckets(df, "s", key_col="doc_id", sample_fraction=0.3)
    b = score_buckets(df, "s", key_col="doc_id", sample_fraction=0.3)
    assert a.collect() == b.collect()
    # every row still gets a bucket; tiers are roughly balanced
    counts = {r["score_bucket"]: r["c"] for r in
              a.groupBy("score_bucket").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert set(counts) == {0, 1, 2} and all(c > 50 for c in counts.values())
