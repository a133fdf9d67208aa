"""ANN quality evidence: recall@k of the bucketed paths vs exact.

`lsh_topk` / `ivf_topk` trade recall for touching 1/2^bits (or
nprobe/k_cells) of the corpus — this harness MEASURES that trade so
the claim isn't hand-waved. Corpus: ``--vectors`` (default 50k)
64-dim vectors in 64 planted clusters (center + 0.1·noise, both from
the md5-pseudo idiom, fully deterministic) — a shape where exact
top-10 neighbors are same-cluster, i.e. recoverable by a working
ANN, unlike uniform-random vectors whose "neighbors" are noise.

For ``--queries`` (default 10) corpus vectors: ground truth = exact
`brute_force_topk` (k=10, self excluded); measured = `lsh_topk`
(8-bit hyperplane bucket) and `ivf_topk` over `kmeans_fit`-trained
centroids at nprobe 1/2/4. Reported per variant: mean recall@10 +
wall. Asserted: IVF recall non-decreasing in nprobe, and
ivf(nprobe=4) ≥ 0.8 — the planted-cluster shape a working IVF must
recover.

Usage: python tools/ann_recall.py [--vectors 50000] [--queries 10]
-> JSON on stdout (tee to BENCH/ann_recall_r{N}.json).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

DIMS = 64
N_CLUSTERS = 64
K = 10


def build_clustered(spark, n: int):
    """vec(i) = center(i % 64) + 0.1 * noise(i), md5-pseudo coords."""
    u32 = float(0xFFFFFFFF)

    def h(*parts):
        return (
            F.conv(F.substring(F.md5(F.concat_ws(":", *parts)), 1, 8), 16, 10)
            .cast("double") / u32 - 0.5
        )

    cluster = (F.col("id") % N_CLUSTERS).cast("string")
    vec = F.array(
        *[
            h(F.lit("c"), cluster, F.lit(d)) + F.lit(0.1) * h(F.lit("n"), F.col("id"), F.lit(d))
            for d in range(DIMS)
        ]
    )
    return spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def main() -> int:
    n, n_queries = 50_000, 10
    for i, a in enumerate(sys.argv):
        if a == "--vectors":
            n = int(sys.argv[i + 1])
        if a == "--queries":
            n_queries = int(sys.argv[i + 1])

    from solrizer_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_fit,
        lsh_topk,
    )
    from solrizer_spark.session import get_spark

    spark = get_spark(app_name="ann-recall", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = build_clustered(spark, n).repartition(32).persist()
    corpus.count()
    # query vectors: one per cluster for the first n_queries clusters,
    # pulled to the driver (they're the literal probe inputs)
    qrows = (
        corpus.where(F.col("vec_id") < n_queries)
        .orderBy("vec_id")
        .collect()
    )
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]

    out: dict = {"n_vectors": n, "n_queries": len(queries), "k": K}

    # exact ground truth, computed ONCE and reused by every variant
    # (also the brute-force baseline timing)
    t0 = time.monotonic()
    truth = {
        qid: {
            r["vec_id"]
            for r in brute_force_topk(corpus, qv, k=K, exclude_id=qid).collect()
        }
        for qid, qv in queries
    }
    out["brute_force"] = {"wall_sec_total": round(time.monotonic() - t0, 2)}

    def run(label, fn):
        t0 = time.monotonic()
        recalls = []
        for qid, qv in queries:
            got = {r["vec_id"] for r in fn(qv, qid)}
            recalls.append(len(truth[qid] & got) / K)
        return {
            "mean_recall_at_10": round(sum(recalls) / len(recalls), 4),
            "min_recall": round(min(recalls), 4),
            "wall_sec_total": round(time.monotonic() - t0, 2),
        }

    out["lsh_8bit"] = run(
        "lsh", lambda qv, qid: lsh_topk(
            corpus.where(F.col("vec_id") != qid), qv, k=K
        ).collect()
    )
    out["lsh_8bit_4band"] = run(
        "lsh4", lambda qv, qid: lsh_topk(
            corpus.where(F.col("vec_id") != qid), qv, k=K, bands=4
        ).collect()
    )

    cents = kmeans_fit(corpus, k=N_CLUSTERS, n_iter=3)
    out["kmeans_cells"] = len(cents)
    for nprobe in (1, 2, 4):
        out[f"ivf_nprobe{nprobe}"] = run(
            f"ivf{nprobe}",
            lambda qv, qid, np=nprobe: ivf_topk(
                corpus.where(F.col("vec_id") != qid), qv, cents, k=K, nprobe=np
            ).collect(),
        )

    # production shape: the cell id is a STORED column (an Iceberg
    # partition at 10^12 scale), assigned once — a probe then scans
    # only nprobe/64 of the data instead of re-assigning the corpus
    from solrizer_spark.operators.similarity import (
        assign_ivf_cell,
        brute_force_topk as _bft,
    )

    celled = corpus.withColumn(
        "_cell", assign_ivf_cell(F.col("embedding"), cents)
    ).persist()
    celled.count()
    import math as _math

    def _cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = _math.sqrt(sum(x * x for x in a))
        nb = _math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    def stored_probe(qv, qid, nprobe=2):
        order = sorted(
            range(len(cents)), key=lambda i: (-_cos(qv, cents[i]), i)
        )[:nprobe]
        return _bft(
            celled.where(F.col("_cell").isin(order)).where(F.col("vec_id") != qid),
            qv, k=K,
        ).collect()

    out["ivf_stored_nprobe2"] = run("ivf_stored", stored_probe)
    celled.unpersist()

    # IVF-PQ: m=8 × k=16 codebooks trained in-engine, 8-byte codes
    # STORED as a column (encode once, probe many — the 10^12 shape:
    # the ADC scan reads 8 bytes/vector, the raw vectors never leave
    # the lake), integer-LUT ADC shortlist + exact re-rank. On this
    # planted-cluster corpus every same-cluster vector quantizes to a
    # near-identical code, so ADC TIES across the whole ~780-vector
    # cluster — the shortlist must cover the tie set (1024 > cluster)
    # or the lowest-id tie-break silently drops true neighbors; the
    # undersized 4·K row is kept to document exactly that failure.
    from solrizer_spark.operators.similarity import pq_encode, pq_topk, pq_train

    t0 = time.monotonic()
    books = pq_train(corpus, m=8, k=16, n_iter=3)
    pq_train_wall = round(time.monotonic() - t0, 2)
    pq_coded = pq_encode(corpus, books).persist()
    pq_coded.count()
    for label, sl in (("pq_adc_rerank_short40", 4 * K), ("pq_adc_rerank", 1024)):
        out[label] = run(
            label,
            lambda qv, qid, s=sl: pq_topk(
                pq_coded.where(F.col("vec_id") != qid), qv, books,
                k=K, shortlist=s, code_col="pq_code",
            ).collect(),
        )
    out["pq_adc_rerank"]["train_wall_sec"] = pq_train_wall
    pq_coded.unpersist()

    r1, r2, r4 = (out[f"ivf_nprobe{p}"]["mean_recall_at_10"] for p in (1, 2, 4))
    assert r1 <= r2 <= r4, (r1, r2, r4)
    assert r4 >= 0.8, r4
    assert out["ivf_stored_nprobe2"]["mean_recall_at_10"] == r2
    assert out["pq_adc_rerank"]["mean_recall_at_10"] >= 0.8, out["pq_adc_rerank"]
    out["pass"] = True
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
