"""Salted url-hash repartitioning — the skew defuse required by the
north rule (SURVEY.md §2.12).

Why: Common-Crawl corpora are domain-skewed (a few domains own a large
share of pages, and crawl files arrive grouped by domain), so
file-order partitions feed some executors giant pages/domains while
others idle. AQE rebalances *joins*, not a skewed ``mapInPandas`` /
pandas-UDF stage, so the extraction stage needs an explicit uniform
redistribution.

How: hash the full url with ``xxhash64`` (64-bit, JVM-side, cheap) and
add a run-scoped salt before taking the partition modulus. Distinct
urls already spread uniformly under the hash; the salt decorrelates
the layout from any previous run's bucketing (adversarial alignment,
stragglers from sticky partition→executor maps) and gives deterministic
re-bucketing knobs for resume (see ``manifests.partition_key``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_bucket(url: Column | str, n_buckets: int, salt: int = 0) -> Column:
    """Stable bucket id in [0, n_buckets) for a url — pure function of
    (url, n_buckets, salt), independent of Spark's runtime partitioning,
    so it can key resume manifests across runs and cluster sizes."""
    col = F.col(url) if isinstance(url, str) else url
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(n_buckets)).cast("int")


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    url_col: str = "url",
    salt: int = 0,
) -> DataFrame:
    """Repartition by salted url-hash ahead of the extraction UDF.

    Partitions on the FULL-resolution 64-bit hash, not on a
    pre-bucketed value: ``repartition(n, expr)`` applies
    ``hash(expr) % n``, so an expr already reduced to n values
    collides (≈1/e of partitions empty, others double-loaded —
    caught by the skew-balance test)."""
    col = F.col(url_col)
    return df.repartition(num_partitions, F.xxhash64(col, F.lit(salt)))


def ensure_min_parallelism(df: DataFrame, floor: int | None = None) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism
    when the input has fewer partitions — otherwise pass through.

    CPU-heavy stages (minhash/simhash fingerprints, Arrow UDFs, LSH
    banding) inherit the SCAN's split count: a small corpus in one
    parquet file runs them in ONE task regardless of cores. At real
    scale a 100 TB scan yields thousands of splits and this is a
    no-op; below the floor the narrow shuffle is trivially cheap
    relative to the work it parallelizes. The check costs one plan
    analysis (``df.rdd``), no job."""
    want = floor or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
