"""Scale-stress for SemDeDup semantic dedup (round-5 operator;
companion to substring_stress.py / graph_kmeans_stress.py).

The bench query runs 550 vectors through k=4 cells; the at-scale
hazard is the WITHIN-CELL self-join — quadratic in cell size, so a
degenerate clustering (every vector in one cell) is the adversarial
shape the ``max_cell`` valve exists for. Two corpora:

* **realistic** (``--vectors`` deterministic pseudo-random 64-dim
  vectors, default 100k — 180x the bench relation — across k=32
  cells, plus 5% planted scaled copies): asserts the flag set is
  EXACTLY the planted copies (cos 1.0 to their sources, same cell by
  scale-invariance; random directions never reach τ=0.99), records
  wall + shuffle bytes.
* **degenerate** (same corpus forced into ONE cell by an
  all-positive centroid): the uncapped join would generate
  ~C(105k, 2) ≈ 5.5e9 pairs — never run. With ``max_cell=256`` the
  cap bounds join participants pre-shuffle (row_number by id), the
  run completes in seconds, and flags stay within the cap's
  arithmetic bound. Same contract as the LSH bucket caps
  (BENCH/sf1_stress_r4.json): recall traded for a hard bound.

Usage: python tools/semdedup_stress.py [--vectors 100000]
-> JSON on stdout (tee to BENCH/semdedup_stress_r{N}.json).
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sf1_stress import ui_shuffle_totals

DIMS = 64
K = 32
TAU = 0.99
COPY_EVERY = 20  # 5% of vectors get a scaled near-dup copy
COPY_ID_BASE = 1_000_000


def _pseudo(i: int, d: int) -> float:
    """Deterministic pseudo-random coordinate in [-0.5, 0.5)."""
    h = hashlib.md5(f"{i}:{d}".encode()).hexdigest()
    return int(h[:8], 16) / 0xFFFFFFFF - 0.5


def build_vectors(spark, n: int):
    """Pseudo-random unit-ish vectors as Column expressions — the
    md5-pseudo-embedding idiom (operators/multimodal.py), built
    JVM-side so 100k x 64 doubles never ride a pickled literal."""
    coord = lambda d: (
        F.conv(F.substring(F.md5(F.concat_ws(":", F.col("vec_id"), F.lit(d))), 1, 8), 16, 10)
        .cast("double") / float(0xFFFFFFFF) - 0.5
    )
    vec = F.array(*[coord(d) for d in range(DIMS)])
    return spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def main() -> int:
    n = 100_000
    for i, a in enumerate(sys.argv):
        if a == "--vectors":
            n = int(sys.argv[i + 1])

    from solrizer_spark.operators.similarity import semantic_dedup
    from solrizer_spark.session import get_spark

    spark = get_spark(
        app_name="semdedup-stress", cpus=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = build_vectors(spark, n)
    copies = base.where(F.col("vec_id") % COPY_EVERY == 0).select(
        (F.col("vec_id") + COPY_ID_BASE).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(1.001)).alias("embedding"),
    )
    union = base.unionByName(copies).repartition(64).persist()
    n_total = union.count()
    n_copies = n_total - n
    out: dict = {"n_vectors": n, "n_copies": n_copies, "k": K, "tau": TAU}

    # realistic clustering: k=32 deterministic pseudo-random centroids
    cents = [[_pseudo(10_000_000 + c, d) for d in range(DIMS)] for c in range(K)]

    s0 = ui_shuffle_totals()
    t0 = time.monotonic()
    flagged = semantic_dedup(union, cents, tau=TAU).persist()
    n_rows = flagged.count()
    n_dups = flagged.where("semantic_dup").count()
    s1 = ui_shuffle_totals()
    out["realistic"] = {
        "wall_sec": round(time.monotonic() - t0, 2),
        "rows": n_rows,
        "flagged": n_dups,
        "shuffle_write_bytes": s1["shuffle_write_bytes"] - s0["shuffle_write_bytes"],
        "cells": flagged.select("cell").distinct().count(),
        "max_cell": flagged.groupBy("cell").count().agg(F.max("count")).collect()[0][0],
    }
    assert n_rows == n_total, (n_rows, n_total)
    # exactly the planted copies are flagged (copy ids are the dup
    # side; random 64-dim directions never reach cos 0.99)
    assert n_dups == n_copies, (n_dups, n_copies)
    assert (
        flagged.where("semantic_dup").where(F.col("vec_id") < COPY_ID_BASE).count() == 0
    )
    flagged.unpersist()

    # degenerate clustering: one all-positive centroid dominates every
    # pseudo-random vector? No — force it: a single centroid list of
    # length 1 puts EVERY vector in cell 0. Uncapped pair count would
    # be C(n_total, 2); run only the capped form.
    out["degenerate_uncapped_pairs"] = n_total * (n_total - 1) // 2
    one_cell = [[1.0] * DIMS]
    t2 = time.monotonic()
    capped = semantic_dedup(union, one_cell, tau=TAU, max_cell=256).persist()
    n_rows_c = capped.count()
    n_dups_c = capped.where("semantic_dup").count()
    s2 = ui_shuffle_totals()
    out["degenerate_capped"] = {
        "max_cell": 256,
        "wall_sec": round(time.monotonic() - t2, 2),
        "rows": n_rows_c,
        "flagged": n_dups_c,
        "shuffle_write_bytes": s2["shuffle_write_bytes"] - s1["shuffle_write_bytes"],
    }
    # caps recall, never rows; flags bounded by the cap's participants
    assert n_rows_c == n_total
    assert n_dups_c <= 255, n_dups_c
    capped.unpersist()

    out["pass"] = True
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
