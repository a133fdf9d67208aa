"""Similarity Arrow-kernel micro-bench: numpy folds vs interpreted
Column higher-order functions, with whole-relation identity checks.

Companion to tools/pq_encode_bench.py (which proved the class: Arrow
numpy is 14-20× over interpreted ``aggregate``/``zip_with`` at
identical bit-level arithmetic). This benches the three flop-heavy
similarity stages that round-5 part-5 moved onto Arrow kernels:

* brute-force scan   — cosine-to-query over every vector
                       (``make_cosine_to_query_udf`` vs the Column
                       literal-norm fold in ``brute_force_topk``)
* near-dup pipeline  — banding (bands·bits·dims projections/vector)
                       + pair verification (``embedding_near_dup_pairs``
                       arrow=True vs arrow=False, end to end)
* semantic dedup     — normalize + assign + within-cell pair dots
                       (``semantic_dedup`` arrow=True vs arrow=False)

Every comparison asserts an exact whole-relation fingerprint match
(bit_xor of xxhash64 over the stringified rows — the oracle-gate
discipline), so the artifact doubles as a parity proof at bench scale.

Corpus: deterministic md5-pseudo vectors (JVM-side), 10% planted
near-dup copies (v·1.0001) so verification stages have real work.

Usage: python tools/simkernel_bench.py [--vectors 100000]
-> JSON on stdout (tee to BENCH/simkernel_bench_r{N}.json).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

DIMS = 64


def build_vectors(spark, n: int):
    coord = lambda d: (
        F.conv(F.substring(F.md5(F.concat_ws(":", F.col("vec_id"), F.lit(d))), 1, 8), 16, 10)
        .cast("double") / float(0xFFFFFFFF) - 0.5
    )
    vec = F.array(*[coord(d) for d in range(DIMS)])
    base = spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    dups = (
        base.where(F.col("vec_id") % 10 == 0)
        .select(
            (F.col("vec_id") + n).alias("vec_id"),
            F.transform("embedding", lambda x: x * 1.0001).alias("embedding"),
        )
    )
    return base.unionByName(dups)


def fingerprint(df) -> tuple[int, int]:
    row = df.agg(
        F.bit_xor(
            F.xxhash64(F.concat_ws("|", *[F.col(c).cast("string") for c in df.columns]))
        ).alias("fp"),
        F.count("*").alias("n"),
    ).first()
    return int(row["fp"] or 0), int(row["n"])


def timed(make_df):
    t = time.monotonic()
    fp, n = fingerprint(make_df())
    return time.monotonic() - t, fp, n


def main() -> int:
    n = 100_000
    for i, a in enumerate(sys.argv):
        if a == "--vectors":
            n = int(sys.argv[i + 1])

    from solrizer_spark.operators.similarity import (
        brute_force_topk,
        embedding_near_dup_pairs,
        kmeans_fit,
        semantic_dedup,
    )
    from solrizer_spark.session import get_spark

    spark = get_spark(app_name="simkernel-bench", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    vecs = build_vectors(spark, n).repartition(64).persist()
    total = vecs.count()  # materialize — timings see cached doubles only

    # near-dup leg gets its own right-sized table: 12-bit bands keep
    # buckets under the 64-id cap at this n (≈8 rows/bucket), so the
    # planted dup pairs SURVIVE capping and the pair-verification
    # kernel does real work (~1M candidate pairs) — with the default
    # 8-bit bands at 100k+, the ascending-id cap drops every planted
    # copy (ids sit at +n) and verification times an empty relation
    n_nd = min(n, 30_000)
    vecs_nd = build_vectors(spark, n_nd).repartition(32).persist()
    total_nd = vecs_nd.count()

    qvec = [((d * 37) % 19 - 9) / 9.0 for d in range(DIMS)]
    cents = kmeans_fit(vecs, k=8, n_iter=2)

    legs = {
        "brute_force_scan": lambda arrow: brute_force_topk(
            vecs, qvec, k=100, arrow=arrow
        ),
        "near_dup_pairs": lambda arrow: embedding_near_dup_pairs(
            vecs_nd, threshold=0.99, dims=DIMS, band_bits=12, arrow=arrow
        ),
        "semantic_dedup": lambda arrow: semantic_dedup(
            vecs, cents, tau=0.99, max_cell=256, arrow=arrow
        ),
    }

    out = {
        "metric": "similarity Arrow kernels vs interpreted Column HOFs",
        "n_vectors": total,
        "n_vectors_near_dup": total_nd,
        "dims": DIMS,
        "cores": cores,
        "legs": {},
    }
    for name, make in legs.items():
        timed(lambda: make(True))  # warm (codegen/JIT + Arrow workers)
        a_s, a_fp, a_n = timed(lambda: make(True))
        c_s, c_fp, c_n = timed(lambda: make(False))
        assert (a_fp, a_n) == (c_fp, c_n), (
            f"{name}: PATHS DIVERGE arrow=({a_fp},{a_n}) column=({c_fp},{c_n})"
        )
        assert a_n > 0, f"{name}: empty output relation — leg mis-sized"
        out["legs"][name] = {
            "rows_out": a_n,
            "arrow_s": round(a_s, 3),
            "column_s": round(c_s, 3),
            "speedup": round(c_s / a_s, 2),
            "identical": True,
        }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
