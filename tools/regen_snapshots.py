"""Regenerate tests/golden/doc_snapshots.json (run deliberately after
an intentional doc-format change; the snapshot test pins the full doc
JSON byte-for-byte)."""

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    from solrizer_spark.corpus.generator import generate_page
    from solrizer_spark.plans.pipeline import run_chain
    from solrizer_spark.session import get_spark

    spark = get_spark(app_name="regen-snapshots", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    rows = [generate_page(i, 42)[0] for i in range(10)]
    df = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    snap = {r.url: r.doc for r in run_chain(df).select("url", "doc").collect()}
    with open("tests/golden/doc_snapshots.json", "w") as fh:
        json.dump(snap, fh, indent=1, sort_keys=True)
    print(f"wrote {len(snap)} snapshots")
    spark.stop()


if __name__ == "__main__":
    main()
