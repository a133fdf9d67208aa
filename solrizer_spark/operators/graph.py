"""Host-graph analytics: fixed-point integer PageRank
(engine-original; consumes the edge lists produced by
``functions/urls.py`` outlink extraction — reference has no graph
layer).

Why integer fixed-point: floating-point PageRank is not reproducible
across engines or even across partition layouts (summation order), so
it could never hash-match an oracle. Ranks here are integer "mass"
(default total 10^12) and every step is exact integer arithmetic
(``DIV`` floor-division, multiply-before-divide) — bit-identical in
Spark and DuckDB, deterministic under any parallelism.

Semantics (documented contract):

* edges are de-duplicated first (simple graph; multi-edges don't
  multiply contribution),
* damping ``d = damping[0]/damping[1]`` (default 85/100): each round
  ``rank' = base + d * Σ inbound(rank DIV outdeg)`` with
  ``base = ((1-d)·total) DIV n_nodes``,
* dangling nodes (no out-edges) keep receiving ``base`` but their
  damped mass is dropped, not redistributed — redistribution costs an
  extra global aggregate per round and changes nothing for ranking
  order at web scale; total mass therefore decays slightly and sums
  to ≤ ``total_mass``.

Scale design: one shuffle per round (contribution groupBy; the
edges⋈ranks join shuffles on the same ``src`` key as the outdegree
join so AQE coalesces them), lineage truncated per round with an
eager ``localCheckpoint`` exactly like ``connected_components``
(dedup.py) — round count is a fixed parameter, so the plan depth is
bounded. The node-count action runs once, not per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: tuple[int, int] = (85, 100),
    total_mass: int = 10**12,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
    dedup_edges: bool = True,
) -> DataFrame:
    """Return ``(node, rank)`` after ``iterations`` rounds of integer
    PageRank over the (de-duplicated) ``edges``. ``rank`` sums to
    ≤ ``total_mass`` (floor rounding + dangling decay). Pass
    ``dedup_edges=False`` when the input is already distinct (e.g.
    :func:`host_edges` output) to skip a redundant full shuffle."""
    num, denom = damping
    if not (0 < num < denom):
        raise ValueError(f"damping must be a proper fraction, got {damping}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if dedup_edges:
        e = e.distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # pre-join rank-independent sides once; one plan reused each round
    edge_deg = e.join(outdeg, "src").persist()

    base = ((denom - num) * total_mass // denom) // n
    init = total_mass // n
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank"))

    for _ in range(iterations):
        contribs = edge_deg.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(
            F.col("dst").alias("node"),
            F.expr("rank DIV deg").alias("contrib"),
        )
        # keep-alive zero rows: nodes with no inbound edges must still
        # appear in the aggregate to receive the base term
        keep_alive = ranks.select("node", F.lit(0).cast("long").alias("contrib"))
        ranks = (
            contribs.unionAll(keep_alive)
            .groupBy("node")
            .agg(F.sum("contrib").alias("inbound"))
            .select(
                "node",
                (F.lit(base) + F.expr(f"{num} * inbound DIV {denom}"))
                .cast("long")
                .alias("rank"),
            )
        )
        if checkpoint:  # truncate lineage per round (False only for
            ranks = ranks.localCheckpoint(eager=True)  # plan audits)

    nodes.unpersist()
    edge_deg.unpersist()
    return ranks


def host_edges(
    pages: DataFrame,
    html_col: str = "html_text",
    url_col: str = "url",
) -> DataFrame:
    """Distinct (src, dst) eTLD+1 edges of a crawl's link graph:
    JVM-regex outlink extraction → registered domains → self-loops
    dropped. The web-graph side table `job.py --host-graph` writes."""
    from ..functions.urls import outlink_domains, registered_domain

    return (
        pages.select(
            registered_domain(url_col).alias("src"),
            F.explode(outlink_domains(html_col)).alias("dst"),
        )
        .where(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
    )


def host_pagerank(
    pages: DataFrame,
    html_col: str = "html_text",
    url_col: str = "url",
    iterations: int = 5,
) -> DataFrame:
    """PageRank over the registered-domain (eTLD+1) link graph of a
    crawl: outlink extraction (JVM regex, ``functions/urls.py``) →
    distinct host edges → :func:`pagerank`.

    The node set comes from the EDGES: a host whose pages have no
    valid outlinks and that nothing links to is absent from the
    result (it has no graph position) — left-join ranks back onto the
    crawl's host table and ``coalesce`` to 0 if every host needs a
    row."""
    return pagerank(
        host_edges(pages, html_col, url_col),
        iterations=iterations,
        dedup_edges=False,  # host_edges output is already distinct
    )
