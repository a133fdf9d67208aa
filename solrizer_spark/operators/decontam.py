"""Benchmark decontamination — flag training documents that contain
verbatim n-grams from an evaluation/benchmark set (the standard
pre-training hygiene step; no reference analog — solrizer serves a
repository, this engine feeds training corpora).

Scale design: the benchmark side is SMALL by definition (eval sets are
thousands of passages), so its distinct n-gram hash set broadcasts;
the corpus side streams through one explode + broadcast hash join +
per-doc count — no shuffle of document text, no all-pairs anything.
The n-gram hash is the oracle-reproducible 60-bit md5 prefix
(dedup.md5_hash60).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solrizer_spark.operators.dedup import md5_hash60, word_shingles


def ngram_hash_set(text: Column | str, n: int = 8) -> Column:
    """Distinct word n-gram hashes of a text column."""
    return F.transform(word_shingles(text, n), md5_hash60)


def flag_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark overlap: ``n_matched`` distinct doc
    n-grams that appear in the benchmark set, and a ``contaminated``
    flag (any overlap). Docs with no overlap keep ``n_matched = 0``.
    """
    bench_hashes = (
        benchmark.select(F.explode(ngram_hash_set(bench_text_col, n)).alias("h"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(ngram_hash_set(text_col, n)).alias("h")
    )
    matches = (
        doc_grams.join(F.broadcast(bench_hashes), "h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return (
        docs.join(matches, id_col, "left")
        .withColumn("n_matched", F.coalesce(F.col("n_matched"), F.lit(0)).cast("long"))
        .withColumn("contaminated", F.col("n_matched") > 0)
    )
