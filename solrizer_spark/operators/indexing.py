"""Index-side operators: distributed inverted-index (postings)
construction and TF-IDF keyword extraction.

The reference feeds Solr — a search index — one JSON doc at a time
(src/solrizer/web.py:405 hands the field map to Solr's update
handler, which builds postings internally). At 10^12 documents the
index build itself becomes a Spark job: these operators produce the
posting lists / per-doc keyword signals directly from the corpus, as
relations, so an index (or a retrieval-training pipeline: BM25
negatives, keyword-based routing, sparse features) can consume them.

Scale notes (100 TB):

* The per-(doc, term) count shuffles once with map-side partial
  aggregation; the term-keyed rank adds one window shuffle (direct
  form), or two bounded ones on the salted stopword-skew path the
  oracle pins (`salt_partitions > 1`) — skew immunity traded for one
  extra exchange over already-compacted rows.
* Posting lists are CAPPED with the same pre-aggregation
  `row_number` pattern as the LSH bucket caps (dedup.py): the window
  runs per term partition, so no term — however common — materializes
  an unbounded list on one executor. Stop-word-like terms simply
  truncate (ranked by tf desc, so the cap keeps the most relevant
  postings, as an impact-ordered index would).
* TF-IDF uses exact integer arithmetic (scaled ratio with floor
  division) rather than `ln`: reproducible across engines and
  partitionings (JVM `Math.log` differs from libm in the last ulp on
  ~7% of inputs — an oracle-gated engine cannot ship that), and
  rank-equivalent to `tf·log(N/df)` within a document when comparing
  terms of equal tf is not required (ties broken lexically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "doc_terms",
    "inverted_postings",
    "search_postings",
    "tfidf_keywords",
]

#: Scale factor for the integer idf ratio (6 decimal digits).
IDF_SCALE = 1_000_000


def doc_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, term, tf, first_pos)`` — whitespace terms per document
    with occurrence count and first position (0-based). One narrow
    map + one ``groupBy(id, term)`` whose partials combine map-side.
    Empty/null texts produce no rows."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    ).where(F.col("term") != "")
    return (
        toks.groupBy("_id", "term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.min("pos").alias("first_pos"),
        )
        .withColumnRenamed("_id", id_col)
    )


def inverted_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings_per_term: int = 1000,
    salt_partitions: int = 1,
) -> DataFrame:
    """Flat inverted index: one row per (term, document) posting —
    ``(term, df, doc_id, tf, first_pos, posting_rank)`` — capped at
    ``max_postings_per_term`` postings per term, ranked tf-descending
    (impact order; rank ties broken by doc id for determinism).

    ``df`` is the UNCAPPED document frequency, so downstream scoring
    sees true corpus statistics even where the posting list
    truncates. The flat relation shape (not ``array<struct>``) keeps
    every column scalar — partition-friendly for a bucketed-by-term
    index table, and directly joinable against query terms.

    ``salt_partitions`` is the stopword-skew valve: with the direct
    single-window rank, a term appearing in every document drags one
    row per containing doc into ONE window partition (the cap bounds
    the output, not the sort). ``salt_partitions = S > 1`` switches
    to the standard two-phase capped rank — partial top-cap per
    ``(term, hash(doc) % S)`` (any global top-cap row is in its
    salt's top-cap, so this is output-IDENTICAL, pinned by test and
    by the oracle running against the salted path), then the exact
    final rank over ≤ S·cap survivors per term. Exact ``df`` is kept
    by summing each salt group's pre-cap count once (on its rank-1
    row). At 10^12 docs pick S ≈ executors so no partition exceeds
    ``corpus_df(term)/S`` rows."""
    terms = doc_terms(df, id_col, text_col)
    if salt_partitions <= 1:
        w = Window.partitionBy("term").orderBy(
            F.col("tf").desc(), F.col(id_col).asc()
        )
        return (
            terms.withColumn("posting_rank", F.row_number().over(w))
            .withColumn(
                "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
            )
            .where(F.col("posting_rank") <= max_postings_per_term)
            .select("term", "df", id_col, "tf", "first_pos", "posting_rank")
        )
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_partitions))
    w1 = Window.partitionBy("term", "_salt").orderBy(
        F.col("tf").desc(), F.col(id_col).asc()
    )
    phase1 = (
        terms.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .withColumn(
            "_salt_cnt",
            # share w1's partition+order spec (unbounded frame) so
            # CollapseWindow evaluates both in ONE Window pass
            F.count(F.lit(1)).over(
                w1.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .where(F.col("_r1") <= max_postings_per_term)
    )
    w2 = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col(id_col).asc()
    )
    return (
        phase1.withColumn("posting_rank", F.row_number().over(w2))
        .withColumn(
            "df",
            F.sum(
                F.when(F.col("_r1") == 1, F.col("_salt_cnt"))
            ).over(Window.partitionBy("term")),
        )
        .where(F.col("posting_rank") <= max_postings_per_term)
        .select("term", "df", id_col, "tf", "first_pos", "posting_rank")
    )


def search_postings(
    postings: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Keyword-search top-``k`` over an :func:`inverted_postings`
    relation: ``(id, n_matched, score)`` for the ``k`` best documents
    matching any query term — OR semantics ranked
    conjunctive-first (terms matched desc, then integer ratio-TF-IDF
    score desc, then id asc for a deterministic total order).

    The query-term filter is an ``isin`` literal predicate, so it
    PUSHES DOWN into the postings scan (a stored index table bucketed
    by term prunes to the touched buckets — the point of building the
    index); the per-doc aggregation then runs over only the matched
    postings (≤ |query| · cap rows), and the top-k compiles to
    TakeOrderedAndProject — no global sort. Scoring is exact integer
    arithmetic (``tf · IDF_SCALE div df`` summed), same
    reproducibility rationale as :func:`tfidf_keywords`."""
    matched = postings.where(F.col("term").isin(list(query_terms)))
    scored = matched.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum(F.expr(f"(tf * CAST({IDF_SCALE} AS BIGINT)) div df")).alias(
            "score"
        ),
    )
    return scored.orderBy(
        F.col("n_matched").desc(), F.col("score").desc(), F.col(id_col).asc()
    ).limit(k)


def tfidf_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` keywords per document by integer ratio-TF-IDF:
    ``score = (tf * IDF_SCALE) div df`` — the ratio-idf variant
    (``idf = N/df`` without the log; the constant corpus size ``N``
    drops out of within-document ranking, keeping every value inside
    BIGINT at any corpus scale — ``tf ≤ 10^6`` × ``10^6`` scale ≪
    2^63 — where ``tf·N·scale`` would overflow at 10^12 docs). Exact
    integer arithmetic (floor division), reproducible across engines
    and partitionings; log-idf is deliberately avoided (JVM
    ``Math.log`` ≠ libm in the last ulp on ~7% of inputs). Rank ties
    broken by term asc. Returns ``(id, term, tf, df, score,
    keyword_rank)``.

    Two shuffles total: the shared ``(id, term)`` count and the
    term-keyed ``df`` aggregation; the per-term df table joins back
    on term (shuffle hash join — the term dictionary is Zipf-shaped
    but the join key is the term itself, so AQE's skew splitting
    applies where one term dominates)."""
    terms = doc_terms(df, id_col, text_col)
    dfreq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = terms.join(dfreq, "term").withColumn(
        "score",
        F.expr(f"(tf * CAST({IDF_SCALE} AS BIGINT)) div df"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("keyword_rank", F.row_number().over(w))
        .where(F.col("keyword_rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "keyword_rank")
    )
