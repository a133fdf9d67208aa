"""PQ encode micro-bench: Arrow numpy encoder vs pure-Column fold.

Backs the round-5 part-4 claims in SCALE.md / similarity.py:

* the interpreted higher-order-function Column encode costs
  ~ms/row-core (Catalyst runs ``aggregate``/``zip_with`` lambdas
  interpreted, k*ds float ops per subspace per row);
* ``make_pq_encode_udf`` does the identical arithmetic (explicit
  per-dimension left fold, float64) through one Arrow batch — same
  codes bit-for-bit, numpy speed.

Both paths are forced to materialize every code (an aggregate over a
hash of the code array — column pruning cannot drop the encode), and
the artifact records an IDENTITY check: per-path ``bit_xor(xxhash64(
cast(code as string)))`` over all rows must match exactly, the same
whole-relation fingerprint discipline as the oracle gate.

Corpus: deterministic md5-pseudo vectors (the semdedup_stress idiom),
built JVM-side. Default 200k x 64 dims, m=8 k=16 codebooks trained on
a 10k hash-sample (train_fraction) so training cost stays out of the
encode timing.

Usage: python tools/pq_encode_bench.py [--vectors 200000]
-> JSON on stdout (tee to BENCH/pq_encode_bench_r{N}.json).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

DIMS = 64
M = 8
K = 16


def build_vectors(spark, n: int):
    coord = lambda d: (
        F.conv(F.substring(F.md5(F.concat_ws(":", F.col("vec_id"), F.lit(d))), 1, 8), 16, 10)
        .cast("double") / float(0xFFFFFFFF) - 0.5
    )
    vec = F.array(*[coord(d) for d in range(DIMS)])
    return spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def main() -> int:
    n = 200_000
    for i, a in enumerate(sys.argv):
        if a == "--vectors":
            n = int(sys.argv[i + 1])

    from solrizer_spark.operators.similarity import pq_encode, pq_train
    from solrizer_spark.session import get_spark

    spark = get_spark(app_name="pq-encode-bench", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    vecs = build_vectors(spark, n).repartition(64).persist()
    vecs.count()  # materialize: encode timings see cached doubles only

    t0 = time.monotonic()
    books = pq_train(vecs, m=M, k=K, n_iter=3, train_fraction=10_000 / n)
    train_s = time.monotonic() - t0

    def fingerprint(mode_arrow: bool) -> tuple[float, int, int]:
        t = time.monotonic()
        coded = pq_encode(vecs, books, arrow=mode_arrow)
        row = coded.agg(
            # bit_xor: order-free whole-relation fingerprint, no ANSI
            # long-overflow hazard (sum(xxhash64) overflows)
            F.bit_xor(F.xxhash64(F.col("pq_code").cast("string"))).alias("fp"),
            F.count("*").alias("n"),
        ).first()
        return time.monotonic() - t, int(row["fp"]), int(row["n"])

    # warm both paths once (codegen/JIT + Arrow worker spin-up), then time
    fingerprint(True)
    fingerprint(False)
    arrow_s, arrow_fp, n_a = fingerprint(True)
    column_s, column_fp, n_c = fingerprint(False)

    assert n_a == n_c == n, f"row counts diverge: {n_a} vs {n_c} vs {n}"
    assert arrow_fp == column_fp, (
        f"ENCODE PATHS DIVERGE: arrow fp={arrow_fp} column fp={column_fp}"
    )

    out = {
        "metric": "pq encode throughput, arrow numpy vs pure-Column fold",
        "n_vectors": n, "dims": DIMS, "m": M, "k": K, "cores": cores,
        "train_s": round(train_s, 2),
        "arrow_s": round(arrow_s, 3),
        "column_s": round(column_s, 3),
        "arrow_vecs_per_sec": round(n / arrow_s),
        "column_vecs_per_sec": round(n / column_s),
        "speedup": round(column_s / arrow_s, 2),
        "codes_identical": True,
        "code_fingerprint": arrow_fp,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
