"""Deterministic corpus sampling / mixing.

Training-data pipelines mix sources at controlled rates ("20% of the
German pages, 5% of everything else"). Random ``sample()`` is
seed-dependent and unreproducible across engines and reruns;
hash-based sampling is a pure function of the row key, so reruns,
resumes, and audits see the same sample (and a SQL oracle can verify
it exactly via the md5-parity hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solrizer_spark.operators.dedup import md5_hash60


def hash_bucket_100(key: Column | str, salt: str = "") -> Column:
    """Stable bucket 0-99 from a key column: md5-derived 60-bit int
    mod 100 (DuckDB-parity: ``('0x'||substr(md5(key||salt),1,15))
    ::UBIGINT % 100``)."""
    col = F.col(key) if isinstance(key, str) else key
    return (md5_hash60(F.concat(col, F.lit(salt))) % 100).cast("int")


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash."""
    return df.where(hash_bucket_100(key_col, salt) < int(round(fraction * 100)))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (the ``sampleBy`` analog,
    reproducible and oracle-checkable): rows keep if their key bucket
    falls under their stratum's rate."""
    rate = F.lit(int(round(default_fraction * 100)))
    for value, frac in sorted(fractions.items()):
        rate = F.when(
            F.col(strata_col) == value, F.lit(int(round(frac * 100)))
        ).otherwise(rate)
    return df.where(hash_bucket_100(key_col, salt) < rate)
