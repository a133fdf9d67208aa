"""Crawl-side scheduling: per-host politeness slots
(engine-original; upstream companion of the extraction engine — the
reference consumes an already-fetched repository, web.py:353, but a
100-TB crawl must rate-limit per host before fetch).

``fetch_schedule`` assigns every url a *slot* such that one host
contributes at most ``per_slot`` urls per slot (exact mode) or
~``per_slot`` in expectation (hash mode). A fetcher then processes
slots in order — within a slot, every host appears a bounded number
of times, which IS the politeness guarantee.

Two modes, one scale trade-off:

* ``exact``: ``row_number`` over a per-host window ordered by url —
  exact cap, but a mega-host (10^8 urls on one host) serializes into
  a single window task. Use when hosts are known-bounded.
* ``hash`` (default): per-host count (one map-side-combinable agg) →
  ``ceil(n/per_slot)`` slots → md5-bucket each url into a slot.
  No per-host ordering anywhere, so a mega-host parallelizes like any
  other key; the cap holds in expectation (binomial around
  ``per_slot``), which is what crawl politeness needs at 10^12 urls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.urls import url_host
from .dedup import md5_hash60


def fetch_schedule(
    df: DataFrame,
    url_col: str = "url",
    per_slot: int = 10,
    mode: str = "hash",
) -> DataFrame:
    """Add ``host`` and ``slot`` (0-based) columns. Deterministic:
    exact mode orders each host's urls lexicographically; hash mode
    buckets on the url's md5 (DuckDB-parity ``md5_hash60``)."""
    if per_slot < 1:
        raise ValueError(f"per_slot must be >= 1, got {per_slot}")
    if mode not in ("hash", "exact"):
        raise ValueError(f"mode must be 'hash' or 'exact', got {mode!r}")
    host = url_host(url_col)
    out = df.withColumn("host", host)
    if mode == "exact":
        w = Window.partitionBy("host").orderBy(F.col(url_col).asc())
        return out.withColumn(
            "slot",
            ((F.row_number().over(w) - F.lit(1)) / per_slot).cast("long"),
        )
    # null-safe join: rows with un-parseable/null urls form their own
    # null-host group (mirroring exact mode's window partition) rather
    # than silently vanishing through a null != null inner join
    counts = out.groupBy("host").agg(F.count(F.lit(1)).alias("__n"))
    counts = counts.select(F.col("host").alias("__h"), "__n")
    n_slots = F.ceil(F.col("__n") / per_slot).cast("long")
    return (
        out.join(counts, out["host"].eqNullSafe(counts["__h"]))
        .withColumn(
            "slot",
            F.pmod(md5_hash60(F.coalesce(F.col(url_col), F.lit(""))), n_slots),
        )
        .drop("__h", "__n")
    )


def fetch_schedule_with_delays(
    df: DataFrame,
    delays_df: DataFrame,
    url_col: str = "url",
    slot_seconds: float = 10.0,
    default_per_slot: int = 10,
) -> DataFrame:
    """Hash-mode scheduling with robots ``Crawl-delay`` honored per
    host: a slot represents ``slot_seconds`` of crawling, so a host
    declaring delay ``d`` absorbs ``max(1, floor(slot_seconds/d))``
    fetches per slot; hosts without a (valid, positive) delay row get
    ``default_per_slot``. ``delays_df`` is ``(host, crawl_delay)`` —
    build it with ``urls.parse_crawl_delay`` over fetched robots
    bodies. Same scale shape as hash-mode :func:`fetch_schedule`:
    per-host count, host⋈host join with the delay dim (both
    host-cardinality), md5 bucketing, no per-host ordering."""
    if default_per_slot < 1:
        raise ValueError(f"default_per_slot must be >= 1, got {default_per_slot}")
    out = df.withColumn("host", url_host(url_col))
    counts = out.groupBy("host").agg(F.count(F.lit(1)).alias("__n"))
    dim = delays_df.select(
        F.col("host").alias("__h"), F.col("crawl_delay").alias("__d")
    )
    per_slot = F.when(
        F.col("__d").isNotNull() & (F.col("__d") > 0),
        F.greatest(F.lit(1), F.floor(F.lit(float(slot_seconds)) / F.col("__d"))),
    ).otherwise(F.lit(default_per_slot)).cast("long")
    rated = (
        counts.join(dim, counts["host"].eqNullSafe(dim["__h"]), "left")
        .select(
            F.col("host").alias("__rh"),
            F.ceil(F.col("__n") / per_slot).cast("long").alias("__slots"),
        )
    )
    return (
        out.join(rated, out["host"].eqNullSafe(rated["__rh"]))
        .withColumn(
            "slot",
            F.pmod(
                md5_hash60(F.coalesce(F.col(url_col), F.lit(""))),
                F.col("__slots"),
            ),
        )
        .drop("__rh", "__slots")
    )
