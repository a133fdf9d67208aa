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


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order: list[Column],
    k: int,
) -> DataFrame:
    """Best-k rows per group (curation: "keep the k highest-quality
    docs per language/domain"). A rank window per group — shuffles
    once on the group key, per-partition external sort, no global
    sort. ``order`` must be a total order (include a unique id as the
    last key) for deterministic, rerun-stable output."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= k)
        .withColumnRenamed("_rank", "group_rank")
    )


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order: list[Column],
    token_col: str,
    capacity: int,
) -> DataFrame:
    """Streaming sequence packing: assign each doc to a training bin of
    ~``capacity`` tokens, walking the group in ``order`` and cutting a
    new bin whenever the running token total crosses a capacity
    boundary — bin b holds the docs whose PRECEDING cumulative token
    count lies in ``[b*capacity, (b+1)*capacity)``. Deterministic,
    one window shuffle per group, and exactly reproducible in SQL
    (``sum() OVER (... ROWS UNBOUNDED PRECEDING)``), unlike greedy
    first-fit packers whose bins depend on partition boundaries.
    Emits ``bin_id`` and ``bin_offset`` (token offset inside the bin's
    preceding stream)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    preceding = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    return df.withColumn("bin_id", (preceding / capacity).cast("long")).withColumn(
        "bin_offset", (preceding % capacity).cast("long")
    )
