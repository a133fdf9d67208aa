"""sf1 scale-stress for exact substring dedup (round-5 operator
family; companion to sf1_stress.py / postings_stress.py /
graph_kmeans_stress.py).

The bench query runs ``duplicate_spans`` over 500 docs with pairwise
copies; the 10^12-doc hazard is the BOILERPLATE MEGA-SPAN — one
50-token window shared by a large fraction of the corpus (cookie
banners, license footers). This harness synthesizes ``--docs``
documents (default 50k, 100x the bench relation) of unique filler
tokens and plants one fixed 60-token boilerplate paragraph into 30%
of them, then runs detection + removal end-to-end. What the design
claims, asserted here:

* **mega-span pre-aggregation**: the span count is ``count`` +
  ``min(struct)`` — map-side combinable, so the 15k-occurrence span
  reaches the wire as one row per partition, never a 15k-row reduce
  group. Evidenced by total shuffle bytes staying linear in corpus
  size (recorded), and detection wall time.
* **exact counts**: every planted window's ``n_occurrences`` equals
  the planted document count; exactly ONE keeper exists per
  duplicated span hash (the globally-first occurrence).
* **no false positives**: unique filler windows (every other window
  in the corpus) are never flagged at ``min_count=2``.
* **removal is surgical**: non-keeper planted docs lose EXACTLY the
  planted 60 tokens (plus nothing); the keeper doc and all clean
  docs keep every token; row count is preserved.

Usage: python tools/substring_stress.py [--docs 50000]
-> JSON on stdout (tee to BENCH/substring_stress_r{N}.json).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sf1_stress import ui_shuffle_totals

FILLER_TOKENS = 150
BOILER_TOKENS = 60
SPAN_TOKENS = 50
PLANT_MOD = 10
PLANT_LT = 3  # i % 10 < 3 → 30% of docs carry the boilerplate


def build_corpus(spark, n_docs: int):
    """Deterministic: doc i = 150 globally-unique filler tokens
    (``w<i>_<j>``); docs with i % 10 < 3 get a fixed 60-token
    boilerplate paragraph spliced in after token 40."""
    boiler = F.array(*[F.lit(f"BP{j}") for j in range(BOILER_TOKENS)])
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    filler = F.transform(
        F.sequence(F.lit(0), F.lit(FILLER_TOKENS - 1)),
        lambda j: F.concat(F.lit("w"), F.col("doc_id"), F.lit("_"), j),
    )
    planted = F.col("doc_id") % PLANT_MOD < PLANT_LT
    toks = F.when(
        planted,
        F.concat(F.slice(filler, 1, 40), boiler, F.slice(filler, 41, FILLER_TOKENS - 40)),
    ).otherwise(filler)
    return docs.select(
        "doc_id", planted.alias("planted"), F.array_join(toks, " ").alias("text")
    )


def main() -> int:
    n_docs = 50_000
    for i, a in enumerate(sys.argv):
        if a == "--docs":
            n_docs = int(sys.argv[i + 1])

    from solrizer_spark.operators.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )
    from solrizer_spark.session import get_spark

    spark = get_spark(
        app_name="substring-stress",
        cpus=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = build_corpus(spark, n_docs).repartition(64).persist()
    n_planted = corpus.where("planted").count()
    out: dict = {"n_docs": n_docs, "n_planted": n_planted}

    s0 = ui_shuffle_totals()
    t0 = time.monotonic()
    spans = duplicate_spans(corpus, span_tokens=SPAN_TOKENS).persist()
    n_flagged_rows = spans.count()
    out["detect"] = {
        "wall_sec": round(time.monotonic() - t0, 2),
        "flagged_occurrence_rows": n_flagged_rows,
    }
    s1 = ui_shuffle_totals()
    out["detect"]["shuffle_write_bytes"] = s1["shuffle_write_bytes"] - s0["shuffle_write_bytes"]

    # every flagged occurrence lies inside a planted doc's boilerplate
    # region: window starts 41-51 off-by-region (1-based token offsets
    # of 50-token windows fully inside tokens 41..100)
    stray = spans.join(corpus.select("doc_id", "planted"), "doc_id").where(
        ~F.col("planted")
        | (F.col("span_start") < 41)
        | (F.col("span_start") > 41 + BOILER_TOKENS - SPAN_TOKENS)
    )
    out["false_positive_rows"] = stray.count()

    # exact occurrence counts + single keeper per span hash
    per_hash = spans.groupBy("span_hash").agg(
        F.countDistinct("doc_id").alias("docs_with_span"),
        F.sum(F.col("is_keeper").cast("long")).alias("keepers"),
        F.max("n_occurrences").alias("n_occ_max"),
        F.min("n_occurrences").alias("n_occ_min"),
    )
    agg = per_hash.agg(
        F.count(F.lit(1)).alias("distinct_spans"),
        F.min("docs_with_span").alias("min_docs"),
        F.max("docs_with_span").alias("max_docs"),
        F.min("keepers").alias("min_keepers"),
        F.max("keepers").alias("max_keepers"),
    ).collect()[0]
    out["distinct_flagged_spans"] = agg["distinct_spans"]
    out["docs_per_span"] = [agg["min_docs"], agg["max_docs"]]
    out["keepers_per_span"] = [agg["min_keepers"], agg["max_keepers"]]
    # the boilerplate block yields BOILER-SPAN+1 = 11 distinct windows,
    # each occurring once per planted doc
    assert agg["distinct_spans"] == BOILER_TOKENS - SPAN_TOKENS + 1, agg
    assert agg["min_docs"] == agg["max_docs"] == n_planted, agg
    assert agg["min_keepers"] == agg["max_keepers"] == 1, agg
    assert out["false_positive_rows"] == 0, out

    t1 = time.monotonic()
    cleaned = remove_duplicate_spans(corpus, span_tokens=SPAN_TOKENS).persist()
    n_out = cleaned.count()
    out["remove"] = {"wall_sec": round(time.monotonic() - t1, 2), "rows_out": n_out}
    s2 = ui_shuffle_totals()
    out["remove"]["shuffle_write_bytes"] = s2["shuffle_write_bytes"] - s1["shuffle_write_bytes"]
    assert n_out == n_docs, (n_out, n_docs)

    # surgical removal: non-keeper planted docs lose exactly the 60
    # boilerplate tokens; everyone else is untouched
    j = cleaned.join(corpus.select("doc_id", "planted"), "doc_id")
    kept_stats = (
        j.groupBy("planted", (F.col("n_tokens_dropped") > 0).alias("touched"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("n_tokens_dropped").alias("min_drop"),
            F.max("n_tokens_dropped").alias("max_drop"),
            F.min("n_tokens_kept").alias("min_keep"),
            F.max("n_tokens_kept").alias("max_keep"),
        )
        .collect()
    )
    out["removal_groups"] = [
        {
            "planted": r["planted"], "touched": r["touched"], "n": r["n"],
            "drop": [r["min_drop"], r["max_drop"]],
            "keep": [r["min_keep"], r["max_keep"]],
        }
        for r in kept_stats
    ]
    groups = {(r["planted"], r["touched"]): r for r in kept_stats}
    clean_g = groups[(False, False)]
    assert clean_g["n"] == n_docs - n_planted, groups
    assert clean_g["min_drop"] == clean_g["max_drop"] == 0
    assert clean_g["min_keep"] == clean_g["max_keep"] == FILLER_TOKENS
    touched_g = groups[(True, True)]
    assert touched_g["n"] == n_planted - 1, groups  # all but the keeper
    assert touched_g["min_drop"] == touched_g["max_drop"] == BOILER_TOKENS
    assert touched_g["min_keep"] == touched_g["max_keep"] == FILLER_TOKENS
    keeper_g = groups[(True, False)]
    assert keeper_g["n"] == 1, groups  # the keeper retains its copy
    assert keeper_g["min_keep"] == FILLER_TOKENS + BOILER_TOKENS

    out["pass"] = True
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
