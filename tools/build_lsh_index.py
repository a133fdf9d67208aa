"""spark-submit entrypoint: build the durable LSH dedup index of a
corpus ONCE, for repeated-increment dedup via
``curate.py --ops basededup --base-index <path>`` or
``dedup_against_index``.

    spark-submit --master local[8] tools/build_lsh_index.py \
        --input /data/corpus_docs --output /data/corpus_lsh \
        --id-col url --text-col extracted_text
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    from solrizer_spark.operators.dedup import write_lsh_index
    from solrizer_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="corpus parquet path")
    ap.add_argument("--output", required=True, help="index directory")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--shingle-n", type=int, default=3)
    ap.add_argument("--num-hashes", type=int, default=64)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--max-bucket", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    if args.num_hashes % args.bands:
        raise SystemExit(
            f"--num-hashes ({args.num_hashes}) must be divisible by "
            f"--bands ({args.bands})"
        )
    spark = get_spark(app_name="solrizer-lsh-index", cpus=args.cpus)
    df = spark.read.parquet(args.input)
    for col in (args.id_col, args.text_col):
        if col not in df.columns:
            raise SystemExit(
                f"input is missing column {col!r} (has {sorted(df.columns)})"
            )
    write_lsh_index(
        df, args.output, id_col=args.id_col, text_col=args.text_col,
        shingle_n=args.shingle_n, num_hashes=args.num_hashes,
        bands=args.bands, max_bucket=args.max_bucket,
    )
    n = spark.read.parquet(f"{args.output}/signatures").count()
    print(json.dumps({"indexed_docs": n, "index": args.output}))
    spark.stop()


if __name__ == "__main__":
    main()
