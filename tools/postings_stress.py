"""sf1 scale-stress for the inverted-index / TF-IDF / retrieval
family (round-4 operators), companion to ``tools/sf1_stress.py``.

Synthesizes **sf1 = 10× bench scale (50k docs)** by replicating the
sf0.1 documents table 10× with distinct ids, then plants the exact
adversarial shape the salted two-phase posting cap exists for: a
STOPWORD (``zzcommonzz``) appended to EVERY document, so one term's
posting list is corpus-sized (50k rows). With the direct single-window
rank, that term drags all 50k rows into ONE window partition; the
salted path partial-caps per (term, salt) first.

Measured (wall seconds + cumulative shuffle bytes via the Spark UI
REST API, diffed per stage):

* ``postings_salted`` — inverted_postings(max=100, salt=8), count
* ``postings_direct`` — same with salt_partitions=1 (the shape the
  valve replaces; still correct, just skew-bound)
* ``equivalence``     — full sorted comparison: salted ≡ direct
  (the valve's output-identity claim, at 50k docs not unit scale)
* ``tfidf``           — tfidf_keywords top-5, count
* ``search``          — keyword_search 3-term top-20 over the index

Assertions (hard-fail the artifact):

* the stopword's UNCAPPED df == corpus size, while its posting list
  is capped at exactly ``max_postings`` rows,
* salted and direct posting relations are row-identical,
* retrieval over the capped index still returns k hits.

Usage: python tools/postings_stress.py [--reps 10] → JSON on stdout
(tee to BENCH/postings_stress_r{N}.json).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sf1_stress import ui_shuffle_totals  # same UI-scrape helper


def main() -> None:
    reps = 10
    for a, arg in enumerate(sys.argv):
        if arg == "--reps" and a + 1 < len(sys.argv):
            reps = int(sys.argv[a + 1])

    from solrizer_spark.operators.indexing import (
        inverted_postings,
        search_postings,
        tfidf_keywords,
    )
    from solrizer_spark.session import get_spark

    spark = get_spark(
        app_name="postings-stress",
        cpus=32,
        shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    rep = spark.range(reps).select(F.col("id").alias("rep"))
    docs = (
        base.crossJoin(F.broadcast(rep))
        .select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            # every doc carries the planted stopword → one corpus-sized
            # posting list (plus each replica stays a distinct doc)
            F.concat(
                F.col("text"),
                F.lit(" zzcommonzz replica"),
                F.col("rep").cast("string"),
            ).alias("text"),
        )
        # single-file parquet = one scan partition (see sf1_stress):
        # without this the tokenize map side runs in ONE task
        .repartition(64, "doc_id")
        .persist()
    )
    n_docs = docs.count()

    results: dict = {"sf": reps / 10.0, "n_docs": n_docs, "stages": {}}
    prev = ui_shuffle_totals()

    def measure(name, fn):
        nonlocal prev
        t0 = time.monotonic()
        out = fn()
        wall = time.monotonic() - t0
        cur = ui_shuffle_totals()
        results["stages"][name] = {
            "wall_sec": round(wall, 2),
            "shuffle_write_bytes": cur["shuffle_write_bytes"]
            - prev["shuffle_write_bytes"],
            "shuffle_read_bytes": cur["shuffle_read_bytes"]
            - prev["shuffle_read_bytes"],
        }
        prev = cur
        return out

    MAX_POST = 100

    salted = inverted_postings(
        docs, max_postings_per_term=MAX_POST, salt_partitions=8
    ).persist()
    n_salted = measure("postings_salted", salted.count)

    direct = inverted_postings(
        docs, max_postings_per_term=MAX_POST, salt_partitions=1
    ).persist()
    n_direct = measure("postings_direct", direct.count)

    # stopword behavior: df uncapped, posting list capped (own
    # measure() so its shuffle isn't attributed to the next stage)
    stop = salted.where(F.col("term") == "zzcommonzz")
    stop_row = measure(
        "stopword_probe",
        lambda: stop.agg(
            F.max("df").alias("df"), F.count(F.lit(1)).alias("postings")
        ).collect()[0],
    )
    assert stop_row["df"] == n_docs, (stop_row, n_docs)
    assert stop_row["postings"] == MAX_POST, stop_row

    # output identity of the two-phase salted cap vs the direct window
    diff = measure(
        "equivalence",
        lambda: salted.exceptAll(direct).count() + direct.exceptAll(salted).count(),
    )
    assert diff == 0, f"salted/direct postings differ by {diff} rows"
    assert n_salted == n_direct

    tfidf = tfidf_keywords(docs, k=5)
    n_tfidf = measure("tfidf", tfidf.count)

    hits = measure(
        "search",
        lambda: search_postings(
            salted, ["zzcommonzz", "data", "web"], k=20
        ).collect(),
    )

    results.update(
        {
            "max_postings_per_term": MAX_POST,
            "stopword_df_uncapped": stop_row["df"],
            "stopword_postings_after_cap": stop_row["postings"],
            "salted_eq_direct": diff == 0,
            "n_postings": n_salted,
            "n_tfidf_rows": n_tfidf,
            "n_search_hits": len(hits),
            "wall_sec_total": round(
                sum(s["wall_sec"] for s in results["stages"].values()), 2
            ),
        }
    )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
