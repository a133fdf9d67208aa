"""sf1 scale-stress for PageRank and IVF k-means training (round-4
verdict item 7 — the two operator families with correctness rows but
no 10x-scale artifact).

**PageRank**: the bench graph (``q_pagerank``) has 17 hosts; a web
host graph has millions of nodes with Zipf in-degree and dangling
hosts. This harness synthesizes a deterministic preferential-
attachment graph — node ``i`` emits ``1 + xxhash(i) % 8`` edges whose
destinations are ``xxhash(i, j) % (i + 1)`` (earlier nodes accumulate
in-links → power-law in-degree, node 0 is the hub), plus a 5% slice
of dangling sink nodes that only ever appear as destinations — at
``--nodes`` scale (default 200k nodes / ~900k edges, ~10^4x the bench
graph's node count). Measured per run: wall, shuffle bytes (Spark UI
REST), rounds. Asserted invariants:

* **mass conservation**: ``sum(rank) <= total_mass`` exactly (floor
  rounding + dangling decay only remove mass), and the dangling decay
  stays below the analytic bound ``1 - (1 - d*f)^r`` for dangling
  fraction ``f`` (proves dangling mass decays, is not duplicated);
* **hub dominance**: node 0's rank > 100x the median rank (the
  Zipf shape survived the integer arithmetic);
* **row-count sanity**: one rank row per node, all non-negative;
* **per-round cost is flat**: wall(10 rounds) < 2.6x wall(5 rounds)
  (localCheckpoint truncates lineage, so rounds don't compound;
  generous bound for the sandbox VM's bursty CPU).

**K-means**: bench trains k=4 over 2k vectors; production IVF is
k ~ sqrt(N) over 10^9+. This harness replicates the sf0.1
embeddings 50x (deterministic per-replica rotation of two
coordinates, so replicas are distinct but the cluster structure
survives) -> 100k x 64-dim vectors, and trains ``k=128`` — past the
``k <= 64`` literal-expression ceiling, forcing the broadcast-join
argmax path (``assign_cells_join``) the 10^5-cell shape uses.
Asserted invariants:

* **liveness**: >= k/2 cells non-empty after training (the join path
  actually clusters rather than collapsing);
* **assignment cardinality**: ``assign_cells_join`` over the full
  corpus returns exactly one row per vector (the struct-MAX argmax
  emits no dup / no drop);
* **driver payload**: the trained model is exactly k x dims floats
  (corpus size never reaches the driver);
* **unit norm**: every centroid is L2-normalized (spherical update).

Usage: python tools/graph_kmeans_stress.py [--nodes 200000]
[--reps 50] -> JSON on stdout (tee to BENCH/graph_kmeans_stress_r{N}.json).
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sf1_stress import ui_shuffle_totals  # same-scrape scaffolding


def main() -> None:
    n_nodes = 200_000
    reps = 50
    for a, arg in enumerate(sys.argv):
        if arg == "--nodes" and a + 1 < len(sys.argv):
            n_nodes = int(sys.argv[a + 1])
        if arg == "--reps" and a + 1 < len(sys.argv):
            reps = int(sys.argv[a + 1])

    from solrizer_spark.operators.graph import pagerank
    from solrizer_spark.operators.similarity import assign_cells_join, kmeans_fit
    from solrizer_spark.session import get_spark

    spark = get_spark(
        app_name="graph-kmeans-stress",
        cpus=32,
        shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"n_nodes": n_nodes, "reps": reps, "pagerank": {}, "kmeans": {}}

    def measure(sink: dict, name: str, fn):
        before = ui_shuffle_totals()
        t0 = time.monotonic()
        result = fn()
        wall = time.monotonic() - t0
        after = ui_shuffle_totals()
        sink[name] = {
            "wall_sec": round(wall, 2),
            "shuffle_write_bytes": after["shuffle_write_bytes"]
            - before["shuffle_write_bytes"],
            "shuffle_read_bytes": after["shuffle_read_bytes"]
            - before["shuffle_read_bytes"],
        }
        return result

    # ------------------------------------------------------------------
    # PageRank: deterministic preferential-attachment graph.
    # 95% of node ids are "live" sources; the top 5% of the id range
    # never emits an edge (dangling sinks) but is reachable as dst via
    # the modulus, so dangling decay is exercised.
    # ------------------------------------------------------------------
    live = int(n_nodes * 0.95)
    src_nodes = spark.range(live).select(F.col("id").alias("i"))
    fanout = F.pmod(F.xxhash64(F.col("i")), F.lit(8)) + 1  # 1..8
    route = F.pmod(F.xxhash64("i", "j"), F.lit(20))
    h2 = F.xxhash64("j", "i")
    edges = (
        src_nodes.select(
            "i", F.explode(F.sequence(F.lit(0), fanout - 1)).alias("j")
        )
        .select(
            F.col("i").alias("src"),
            # 25% of edges -> a 10-node core (the hubs), 5% -> the
            # dangling tail (ids >= live never emit), the rest
            # preferential (% (i+1): earlier nodes soak up in-links)
            F.when(route < 5, F.pmod(h2, F.lit(10)))
            .when(route == 5, F.lit(live) + F.pmod(h2, F.lit(n_nodes - live)))
            .otherwise(F.pmod(h2, F.col("i") + 1))
            .alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .repartition(64, "src")
        .persist()
    )
    n_edges = edges.count()
    out["pagerank"]["n_edges"] = n_edges

    total_mass = 10**12
    damping = (85, 100)

    ranks5 = measure(
        out["pagerank"], "iter5",
        lambda: pagerank(edges, iterations=5, damping=damping,
                         total_mass=total_mass).persist(),
    )
    stats5 = ranks5.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rank").alias("mass"),
        F.min("rank").alias("mn"),
        F.expr("percentile_approx(rank, 0.5)").alias("med"),
    ).collect()[0]
    hub = ranks5.where(F.col("node") == 0).collect()[0]["rank"]
    out["pagerank"].update(
        n_rank_rows=stats5["n"],
        mass_sum=stats5["mass"],
        mass_retained=round(stats5["mass"] / total_mass, 4),
        min_rank=stats5["mn"],
        median_rank=stats5["med"],
        hub_rank=hub,
        hub_over_median=round(hub / max(stats5["med"], 1), 1),
    )
    # node set is derived from edges; dangling-only nodes appear (dst)
    assert stats5["mass"] <= total_mass, "mass created from nothing"
    assert stats5["mn"] >= 0, "negative rank"
    d = damping[0] / damping[1]
    dangling = ranks5.join(
        edges.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    )
    dang_n, dang_mass = dangling.agg(
        F.count(F.lit(1)), F.sum("rank")
    ).collect()[0]
    out["pagerank"]["dangling_nodes"] = dang_n
    out["pagerank"]["dangling_mass_frac"] = round(dang_mass / stats5["mass"], 4)
    f = dang_n / stats5["n"]
    # decay bound: each round d * (dangling mass share) leaks; the
    # dangling mass share hovers near the dangling NODE share f (they
    # receive ~their node share of edges), so 2f is a loose ceiling —
    # retained mass below this means mass is being destroyed, above
    # total_mass means duplicated
    worst = (1 - min(1.0, 2 * d * f)) ** 5 * 0.9  # 0.9: rounding slack
    assert stats5["mass"] / total_mass >= worst, (
        f"mass {stats5['mass']/total_mass:.4f} below decay bound {worst:.4f}"
    )
    assert hub > 100 * max(stats5["med"], 1), (
        f"hub rank {hub} not dominant over median {stats5['med']}"
    )
    ranks5.unpersist()

    ranks10 = measure(
        out["pagerank"], "iter10",
        lambda: pagerank(edges, iterations=10, damping=damping,
                         total_mass=total_mass),
    )
    n10 = ranks10.count()
    assert n10 == stats5["n"], "node set changed with iteration count"
    w5 = out["pagerank"]["iter5"]["wall_sec"]
    w10 = out["pagerank"]["iter10"]["wall_sec"]
    out["pagerank"]["wall_ratio_10_over_5"] = round(w10 / w5, 2)
    assert w10 < 2.6 * w5, (
        f"per-round cost compounds: 10 rounds took {w10}s vs 5 rounds {w5}s "
        "— lineage truncation broken?"
    )
    edges.unpersist()

    # ------------------------------------------------------------------
    # K-means: 100k x 64 dims, k=128 -> broadcast-join argmax path
    # ------------------------------------------------------------------
    k, dims, n_iter = 128, 64, 3
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    rep = spark.range(reps).select(F.col("id").alias("rep"))
    # deterministic per-replica perturbation: rotate coords (0,1) by
    # rep * 2*pi/reps — distinct vectors, cluster geometry preserved
    theta = F.col("rep") * (2 * math.pi / reps)
    vecs = (
        base.crossJoin(F.broadcast(rep))
        .select(
            (F.col("vec_id") * reps + F.col("rep")).alias("vec_id"),
            F.concat(
                F.array(
                    F.element_at("embedding", 1) * F.cos(theta)
                    - F.element_at("embedding", 2) * F.sin(theta),
                    F.element_at("embedding", 1) * F.sin(theta)
                    + F.element_at("embedding", 2) * F.cos(theta),
                ),
                F.slice("embedding", 3, dims - 2),
            ).cast("array<double>").alias("embedding"),
        )
        .repartition(64, "vec_id")
        .persist()
    )
    n_vecs = vecs.count()
    out["kmeans"].update(n_vectors=n_vecs, k=k, dims=dims, n_iter=n_iter)

    cents = measure(
        out["kmeans"], "fit",
        lambda: kmeans_fit(vecs, k=k, n_iter=n_iter),
    )
    assert len(cents) == k and all(len(c) == dims for c in cents), (
        "driver payload is not exactly k x dims"
    )
    norms = [math.sqrt(sum(x * x for x in c)) for c in cents]
    assert all(abs(n - 1.0) < 1e-9 for n in norms), "centroid not unit-norm"

    assigned = measure(
        out["kmeans"], "assign_full_corpus",
        lambda: assign_cells_join(vecs, cents).persist(),
    )
    n_assigned = assigned.count()
    assert n_assigned == n_vecs, (
        f"argmax emitted {n_assigned} rows for {n_vecs} vectors"
    )
    occupancy = (
        assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    )
    occ = {r["cell"]: r["n"] for r in occupancy.collect()}
    out["kmeans"].update(
        nonempty_cells=len(occ),
        max_cell=max(occ.values()),
        min_cell=min(occ.values()),
    )
    assert len(occ) >= k // 2, (
        f"only {len(occ)}/{k} cells non-empty — clustering collapsed"
    )
    assigned.unpersist()
    vecs.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
