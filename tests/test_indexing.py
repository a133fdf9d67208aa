"""Index-side operators: inverted postings + TF-IDF keywords."""

from __future__ import annotations

from solrizer_spark.operators.indexing import (
    IDF_SCALE,
    doc_terms,
    inverted_postings,
    tfidf_keywords,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "cat cat cat"),
            (4, ""),
            (5, None),
        ],
        "doc_id bigint, text string",
    )


def test_doc_terms(spark):
    rows = {
        (r["doc_id"], r["term"]): (r["tf"], r["first_pos"])
        for r in doc_terms(_corpus(spark)).collect()
    }
    assert rows[(1, "the")] == (2, 0)
    assert rows[(1, "mat")] == (1, 5)
    assert rows[(3, "cat")] == (3, 0)
    # empty and null texts produce no rows
    assert not any(doc_id in (4, 5) for doc_id, _ in rows)


def test_inverted_postings_impact_order_and_df(spark):
    out = inverted_postings(_corpus(spark), max_postings_per_term=2)
    cat = [r for r in out.collect() if r["term"] == "cat"]
    # impact order: doc 3 (tf=3) ranks before doc 1 (tf=1)
    assert [(r["doc_id"], r["tf"], r["posting_rank"]) for r in
            sorted(cat, key=lambda r: r["posting_rank"])] == [
        (3, 3, 1), (1, 1, 2)]
    assert all(r["df"] == 2 for r in cat)
    # 'the' appears in docs 1 and 2; cap=2 keeps both; 'sat' too
    the = [r for r in out.collect() if r["term"] == "the"]
    assert {r["doc_id"] for r in the} == {1, 2}


def test_inverted_postings_cap_keeps_df_uncapped(spark):
    df = spark.createDataFrame(
        [(i, "common") for i in range(10)], "doc_id bigint, text string"
    )
    out = inverted_postings(df, max_postings_per_term=3).collect()
    assert len(out) == 3  # capped postings
    assert all(r["df"] == 10 for r in out)  # true document frequency
    # deterministic: tf ties broken by doc_id asc
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["posting_rank"])] == [0, 1, 2]


def test_salted_postings_identical_to_direct(spark):
    """The two-phase salted cap (stopword-skew path) is
    output-identical to the direct single-window rank — incl. exact
    uncapped df — on a corpus where several terms exceed the cap."""
    rows = []
    for i in range(40):
        words = ["common"]
        if i % 2 == 0:
            words.append("even even")
        if i % 3 == 0:
            words.append("third")
        rows.append((i, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = sorted(
        map(tuple, inverted_postings(df, max_postings_per_term=5).collect())
    )
    for s in (2, 4, 7):
        salted = inverted_postings(df, max_postings_per_term=5,
                                   salt_partitions=s)
        b = sorted(map(tuple, salted.collect()))
        assert a == b, f"salt_partitions={s} diverged"


def test_tfidf_keywords_exact_scores(spark):
    out = tfidf_keywords(_corpus(spark), k=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    d3 = sorted(by_doc[3], key=lambda r: r["keyword_rank"])
    # doc 3: only 'cat' (tf=3, df=2) -> score = 3*SCALE // 2
    assert [(r["term"], r["score"]) for r in d3] == [
        ("cat", 3 * IDF_SCALE // 2)
    ]
    d2 = sorted(by_doc[2], key=lambda r: r["keyword_rank"])
    # doc 2: dog (1, df=1) score=SCALE; sat (1, df=2) and the (1, df=2)
    # tie at SCALE//2 -> 'sat' wins the tie lexically
    assert [(r["term"], r["score"]) for r in d2] == [
        ("dog", IDF_SCALE), ("sat", IDF_SCALE // 2)
    ]
    assert 4 not in by_doc and 5 not in by_doc


def test_search_postings_conjunctive_first(spark):
    """A doc matching MORE query terms outranks a doc with a higher
    single-term score; ties broken deterministically."""
    from solrizer_spark.operators.indexing import (
        inverted_postings,
        search_postings,
    )

    df = spark.createDataFrame(
        [
            (1, "spark window"),            # matches 2 terms
            (2, "spark spark spark spark"), # 1 term, big tf
            (3, "window"),
            (4, "noise only"),
        ],
        "doc_id bigint, text string",
    )
    postings = inverted_postings(df)
    out = search_postings(postings, ["spark", "window"], k=3).collect()
    assert [r["doc_id"] for r in out] == [1, 2, 3]
    assert out[0]["n_matched"] == 2
    # absent query terms match nothing
    assert search_postings(postings, ["absent"], k=3).count() == 0


def test_tfidf_rank_window_is_per_doc(spark):
    out = tfidf_keywords(_corpus(spark), k=1)
    rows = out.collect()
    assert {r["doc_id"] for r in rows} == {1, 2, 3}
    assert all(r["keyword_rank"] == 1 for r in rows)
