"""Crawl-side scheduling: per-host politeness slots
(engine-original; upstream companion of the extraction engine — the
reference consumes an already-fetched repository, web.py:353, but a
100-TB crawl must rate-limit per host before fetch).

``fetch_schedule`` assigns every url a *slot* such that one host
contributes at most ``per_slot`` urls per slot (exact mode) or
~``per_slot`` in expectation (hash mode). A fetcher then processes
slots in order — within a slot, every host appears a bounded number
of times, which IS the politeness guarantee.
``fetch_schedule_with_delays`` derives the per-host rate from robots
``Crawl-delay`` directives instead of one global constant.

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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.urls import url_host
from .dedup import md5_hash60


def _host_counts(out: DataFrame) -> DataFrame:
    """Per-host url counts ``(host, __n)`` — one map-side-combinable
    aggregate; the null-host group (un-parseable/null urls) is kept."""
    return out.groupBy("host").agg(F.count(F.lit(1)).alias("__n"))


def _hash_slots(out: DataFrame, url_col: str, slots_dim: DataFrame) -> DataFrame:
    """Shared hash-mode tail: join the per-host ``(host, __slots)``
    dim back onto the rows and md5-bucket each url. One copy of the
    invariants both schedulers rely on: the join is NULL-SAFE (rows
    with un-parseable/null urls form their own null-host group,
    mirroring exact mode's window partition, instead of vanishing
    through a null != null inner join) and null urls hash as the
    empty string."""
    dim = slots_dim.select(F.col("host").alias("__h"), "__slots")
    return (
        out.join(dim, out["host"].eqNullSafe(dim["__h"]))
        .withColumn(
            "slot",
            F.pmod(
                md5_hash60(F.coalesce(F.col(url_col), F.lit(""))),
                F.col("__slots"),
            ),
        )
        .drop("__h", "__slots")
    )


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
    out = df.withColumn("host", url_host(url_col))
    if mode == "exact":
        w = Window.partitionBy("host").orderBy(F.col(url_col).asc())
        return out.withColumn(
            "slot",
            ((F.row_number().over(w) - F.lit(1)) / per_slot).cast("long"),
        )
    slots_dim = _host_counts(out).select(
        "host", F.ceil(F.col("__n") / per_slot).cast("long").alias("__slots")
    )
    return _hash_slots(out, url_col, slots_dim)


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
    bodies; duplicate host rows (e.g. robots fetched over both
    schemes) collapse to the MOST CONSERVATIVE (maximum) delay, so a
    messy dim can never fan the urls join out. Same scale shape as
    hash-mode :func:`fetch_schedule` (shared ``_hash_slots`` tail):
    host⋈host joins only, md5 bucketing, no per-host ordering."""
    if default_per_slot < 1:
        raise ValueError(f"default_per_slot must be >= 1, got {default_per_slot}")
    out = df.withColumn("host", url_host(url_col))
    # lowercase the dim key: url_host() lowercases, and a mixed-case
    # robots-fetch log must not silently lose its delay to a case
    # mismatch (review finding)
    dim = delays_df.groupBy(F.lower(F.col("host")).alias("__dh")).agg(
        F.max("crawl_delay").alias("__d")
    )
    counts = _host_counts(out)
    per_slot: Column = F.when(
        F.col("__d").isNotNull() & (F.col("__d") > 0),
        F.greatest(F.lit(1), F.floor(F.lit(float(slot_seconds)) / F.col("__d"))),
    ).otherwise(F.lit(default_per_slot)).cast("long")
    slots_dim = counts.join(
        dim, counts["host"].eqNullSafe(dim["__dh"]), "left"
    ).select(
        counts["host"],
        F.ceil(F.col("__n") / per_slot).cast("long").alias("__slots"),
    )
    return _hash_slots(out, url_col, slots_dim)
