"""WARC-ingest throughput evidence (the Common-Crawl-native input).

`job.py --input-format warc` is the north-rule-native surface —
reading raw crawl archives straight into the extraction chain — but
the per-round bench only times the parquet path. This harness writes
``--segments`` gzip-membered WARC segments of ``--records`` HTML
responses each (deterministic page bodies from the corpus
generator's HTML shapes), then measures:

* **parse-only**: `read_warc` → count + byte sum (ingest kernel
  throughput, records/s);
* **end-to-end**: the full `job.py` chain over the same archives
  (warc parse → salted repartition → extraction → doc JSON),
  docs/s + the JSON line's own counters.

Asserted: every planted record survives to a doc row (no silent
drops), zero parse_error rows on clean input.

Scale notes measured here, designed in `sources/warc.py`: one
mapInPandas stage, one file per task (WARC members don't split, the
Common Crawl layout is ~1 GB segments — parallelism = segment
count), batched Arrow output.

Usage: python tools/warc_bench.py [--segments 32] [--records 1500]
-> JSON on stdout (tee to BENCH/warc_bench_r{N}.json).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from datetime import datetime, timezone

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def main() -> int:
    n_segments, n_records = 32, 1500
    for i, a in enumerate(sys.argv):
        if a == "--segments":
            n_segments = int(sys.argv[i + 1])
        if a == "--records":
            n_records = int(sys.argv[i + 1])

    from solrizer_spark.sources.warc import read_warc, write_warc
    from job import run_job
    from solrizer_spark.session import get_spark

    spark = get_spark(app_name="warc-bench", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="warc-bench-")
    warc_dir = f"{tmp}/archives"
    import os

    os.makedirs(warc_dir)
    body_tmpl = (
        "<html><head><title>Doc %d</title></head><body>"
        "<nav><a href='/'>Home</a> <a href='/a'>A</a></nav>"
        "<p>%s</p><p>%s</p>"
        "<footer>footer boilerplate text</footer></body></html>"
    )
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa").split()
    total_bytes = 0
    t0 = time.monotonic()
    for s in range(n_segments):
        recs = []
        for r in range(n_records):
            i = s * n_records + r
            p1 = " ".join(words[(i + j) % len(words)] for j in range(40))
            p2 = " ".join(words[(i * 7 + j) % len(words)] for j in range(40))
            body = (body_tmpl % (i, p1, p2)).encode()
            total_bytes += len(body)
            recs.append({
                "url": f"https://host{i % 97}.example.org/page/{i}",
                "ts": datetime(2024, 1, 1 + s % 27, tzinfo=timezone.utc),
                "body": body,
            })
        write_warc(recs, f"{warc_dir}/seg-{s:03d}.warc.gz", gzip_members=True)
    n_total = n_segments * n_records
    out: dict = {
        "segments": n_segments, "records_per_segment": n_records,
        "n_records": n_total, "payload_mb": round(total_bytes / 1e6, 1),
        "synth_sec": round(time.monotonic() - t0, 2),
    }

    t1 = time.monotonic()
    parsed = read_warc(spark, warc_dir)
    n_parsed, n_err = parsed.agg(
        F.count(F.lit(1)),
        F.sum(F.when(F.col("parse_error").isNotNull(), 1).otherwise(0)),
    ).collect()[0]
    parse_sec = time.monotonic() - t1
    out["parse_only"] = {
        "wall_sec": round(parse_sec, 2),
        "records_per_sec": round(n_parsed / parse_sec, 1),
        "archive_errors": int(n_err or 0),
    }
    assert n_parsed == n_total, (n_parsed, n_total)
    assert not n_err, n_err

    out_dir = f"{tmp}/out"
    t2 = time.monotonic()
    stats = run_job(spark, warc_dir, out_dir, input_format="warc")
    e2e_sec = time.monotonic() - t2
    docs = spark.read.parquet(out_dir + "/docs")
    n_docs = docs.count()
    out["end_to_end"] = {
        "wall_sec": round(e2e_sec, 2),
        "docs_per_sec": round(n_docs / e2e_sec, 1),
        "n_docs": n_docs,
        "job_counters": stats.get("counters", {}),
    }
    assert n_docs == n_total, (n_docs, n_total)

    out["pass"] = True
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
