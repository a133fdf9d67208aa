"""Bigram-LM fluency scoring (CCNet-style signal, rational-arithmetic
variant — see operators/lm.py docstring for the no-ln rationale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solrizer_spark.operators.lm import lm_score, train_bigram_model

DOCS = [
    (1, "a b a b c"),   # bigrams: (a,b) (b,a) (a,b) (b,c)
    (2, "a b"),         # (a,b)
    (3, "x"),           # no bigram
]


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_train_bigram_model_hand_computed(corpus):
    model = {(r["w1"], r["w2"]): r["p"] for r in
             train_bigram_model(corpus, min_count=2).collect()}
    # (a,b) seen 3x, prefix a seen 3x -> p=1.0; (b,a),(b,c) dropped
    assert model == {("a", "b"): 1.0}


def test_train_prefix_count_includes_dropped_transitions(spark):
    # (b,a) x2 and (b,c) x1: c1(b)=3 counts the dropped (b,c) too
    df = spark.createDataFrame([(1, "b a"), (2, "b a"), (3, "b c")],
                               ["doc_id", "text"])
    model = {(r["w1"], r["w2"]): r["p"] for r in
             train_bigram_model(df, min_count=2).collect()}
    assert model == {("b", "a"): 2 / 3}


def test_lm_score_hand_computed(corpus):
    model = train_bigram_model(corpus, min_count=2)
    got = {r["doc_id"]: r for r in lm_score(corpus, model).collect()}
    assert got[1]["n_bigrams"] == 4
    assert got[1]["oov_rate"] == 0.5          # (b,a) and (b,c) unseen
    assert got[1]["mean_p"] == (1.0 + 1e-6 + 1.0 + 1e-6) / 4
    assert got[2]["n_bigrams"] == 1 and got[2]["mean_p"] == 1.0
    # doc 3 has no bigram: present with null rates
    assert got[3]["n_bigrams"] == 0
    assert got[3]["oov_rate"] is None and got[3]["mean_p"] is None


def test_lm_score_partitioning_invariance(spark, corpus):
    """The order-pinned fold makes mean_p bit-identical regardless of
    input partitioning."""
    model = train_bigram_model(corpus, min_count=1)
    one = {r["doc_id"]: r["mean_p"]
           for r in lm_score(corpus, model).collect()}
    many = {r["doc_id"]: r["mean_p"]
            for r in lm_score(corpus.repartition(7), model).collect()}
    assert one == many


def test_lm_score_fluent_beats_shuffled(spark):
    """The point of the signal: natural repetition of learned
    transitions outscores scrambled text."""
    fluent = "the cat sat on the mat " * 10
    shuffled = "mat the on sat cat mat the sat on cat " * 6
    train = spark.createDataFrame(
        [(i, fluent) for i in range(5)], ["doc_id", "text"]
    )
    model = train_bigram_model(train, min_count=2)
    test = spark.createDataFrame(
        [(100, fluent.strip()), (200, shuffled.strip())], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in lm_score(test, model).collect()}
    assert got[100]["mean_p"] > got[200]["mean_p"]
    assert got[100]["oov_rate"] < got[200]["oov_rate"]


def test_backoff_scores_rare_real_word_above_oov(spark):
    """A transition into a corpus-frequent word scores its unigram
    mass under backoff instead of the 1e-6 floor."""
    from solrizer_spark.operators.lm import (
        lm_score_backoff,
        train_unigram_model,
    )

    corpus = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bi = train_bigram_model(corpus, min_count=2)   # only (a,b) kept
    uni = train_unigram_model(corpus)
    got = {r["doc_id"]: r for r in lm_score_backoff(corpus, bi, uni).collect()}
    # doc1 bigrams: (a,b) seen; (b,a),(b,c) unseen bigrams but a and c
    # are corpus words -> unigram backoff, NOT oov
    assert got[1]["oov_rate"] == 0.0
    lam = 7 / 10
    # unigrams over "a b a b c a b x": tokens total 8: a:3 b:3 c:1 x:1
    p_ab = lam * 1.0 + (1 - lam) * (3 / 8)
    p_ba = lam * 0.0 + (1 - lam) * (3 / 8)
    p_bc = lam * 0.0 + (1 - lam) * (1 / 8)
    assert got[1]["mean_p"] == (p_ab + p_ba + p_ab + p_bc) / 4
    assert got[3]["n_bigrams"] == 0 and got[3]["mean_p"] is None


def test_backoff_bad_interp(spark):
    from solrizer_spark.operators.lm import lm_score_backoff

    corpus = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        lm_score_backoff(corpus, corpus, corpus, interp=(11, 10))
