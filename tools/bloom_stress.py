"""Scale-stress for the broadcast Bloom filter (round-5 family;
companion to sf1_stress.py / substring_stress.py).

The bench/test relation is 2k values; the 10^12-doc questions are:

* **build throughput** — one pass over the base, JVM-hashed, numpy
  OR-folded: measure items/sec at --items (default 5M, 2500× the
  test relation) for BOTH strategies, and assert they stay
  bit-identical at this scale, not just at 2k.
* **no position shuffle in the local build** — the tree merge moves
  only per-partition bitmaps (≤16 + P rows × filter bytes). Shuffle
  bytes for the local build are recorded and asserted ≤ 4× the raw
  bitmap payload (P partitions + 16 combiners, with row overhead);
  the shuffle build's position traffic (items × k × 12 bytes) is
  recorded for the capacity table.
* **guarantees hold at scale** — a 200k-row probe (half inserted,
  half disjoint): zero false negatives, realized FP ≤ 3× the sized
  fpp, and the probe stage itself is join-free (its plan has no
  SortMergeJoin/BroadcastHashJoin — asserted from the explain text).
* **dedup rate** — bloom_dedup drops every inserted value's row.

Usage: python tools/bloom_stress.py [--items 5000000] [--fpp 0.001]
-> JSON on stdout (tee to BENCH/bloom_stress_r{N}.json).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from pyspark.sql import functions as F

from sf1_stress import ui_shuffle_totals


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=5_000_000)
    ap.add_argument("--fpp", type=float, default=0.001)
    ap.add_argument("--probe", type=int, default=200_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from solrizer_spark.operators.bloom import (
        bloom_build,
        bloom_dedup,
        bloom_might_contain,
        bloom_params,
    )
    from solrizer_spark.session import get_spark

    spark = get_spark(app_name="bloom-stress", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    n = args.items
    base = spark.range(n).select(
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("v")
    )
    bits, k = bloom_params(n, args.fpp)
    out = {
        "items": n,
        "fpp": args.fpp,
        "bits_total": bits,
        "k": k,
        "filter_mb": round(bits / 8 / 2**20, 1),
        "stages": {},
    }

    def timed(name, fn):
        before = ui_shuffle_totals()
        t0 = time.monotonic()
        result = fn()
        wall = time.monotonic() - t0
        after = ui_shuffle_totals()
        out["stages"][name] = {
            "wall_sec": round(wall, 2),
            "shuffle_write_bytes": after["shuffle_write_bytes"]
            - before["shuffle_write_bytes"],
        }
        return result

    bf_local = timed(
        "build_local",
        lambda: bloom_build(base, "v", bits_total=bits, k=k, strategy="local"),
    )
    out["stages"]["build_local"]["items_per_sec"] = round(
        n / out["stages"]["build_local"]["wall_sec"]
    )
    # local-build shuffle budget: per-partition bitmaps + ≤16 combiner
    # rows, nothing position-sized. Allow 4× for row/codec overhead.
    n_parts = base.rdd.getNumPartitions()
    budget = 4 * (n_parts + 16) * (bits // 8)
    sw = out["stages"]["build_local"]["shuffle_write_bytes"]
    assert sw < 0 or sw <= budget, (sw, budget)
    out["local_shuffle_budget_bytes"] = budget

    bf_shuffle = timed(
        "build_shuffle",
        lambda: bloom_build(base, "v", bits_total=bits, k=k, strategy="shuffle"),
    )
    out["stages"]["build_shuffle"]["items_per_sec"] = round(
        n / out["stages"]["build_shuffle"]["wall_sec"]
    )
    assert bf_local.chunks == bf_shuffle.chunks, "strategy divergence at scale"
    out["strategies_bit_identical"] = True
    out["fill_ratio"] = round(bf_local.fill_ratio(), 4)

    # probe: half inserted, half disjoint
    half = args.probe // 2
    probe = (
        spark.range(half)
        .select(F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("v"))
        .unionByName(
            spark.range(half).select(
                F.concat(F.lit("new-"), F.col("id").cast("string")).alias("v")
            )
        )
    )
    checked = bloom_might_contain(probe, "v", bf_local)
    plan = checked._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, "probe stage must be join-free"
    agg = timed(
        "probe",
        lambda: checked.agg(
            F.sum(
                F.when(F.col("v").startswith("doc-") & ~F.col("bloom_hit"), 1)
                .otherwise(0)
            ).alias("false_negatives"),
            F.sum(
                F.when(F.col("v").startswith("new-") & F.col("bloom_hit"), 1)
                .otherwise(0)
            ).alias("false_positives"),
        ).collect()[0],
    )
    assert agg["false_negatives"] == 0, agg
    realized = agg["false_positives"] / half
    assert realized <= 3 * args.fpp, (realized, args.fpp)
    out["probe_false_negatives"] = int(agg["false_negatives"])
    out["probe_realized_fpp"] = round(realized, 6)
    out["probe_join_free_plan"] = True

    survivors = timed(
        "dedup", lambda: bloom_dedup(probe, "v", bf_local).count()
    )
    assert survivors <= half, survivors  # every inserted row dropped
    out["dedup_survivors_of_200k"] = survivors

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
