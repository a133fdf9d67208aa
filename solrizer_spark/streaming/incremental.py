"""Incremental ingest via Structured Streaming.

The reference is strictly request/response (web.py:330-405, no
streaming operators — SURVEY.md §2.10); the engine's batch job is the
primary path. This module adds the natural Spark incremental mode: a
file-source stream over the pages directory (production: Iceberg
incremental scan), the same field chain (every stage is narrow /
per-row, so the plan is trivially stream-safe — no watermarks or state
needed), and an append sink with checkpoint-tracked exactly-once file
progress. ``Trigger.AvailableNow`` turns it into a catch-up batch:
each invocation processes exactly the files that arrived since the
last checkpoint — a second resumability mechanism, complementary to
the bucket manifests of the batch job.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from solrizer_spark.operators.repartition import url_bucket
from solrizer_spark.plans.pipeline import DEFAULT_CHAIN, build_pipeline

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

STREAM_DOC_COLUMNS = [
    "partition_key", "url", "id", "route", "extracted_text", "is_tagged",
    "title", "language__facet", "warc_ts__time", "is_discoverable", "doc",
    "parse_failed", "error",
]


def stream_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    n_buckets: int = 256,
    salt: int = 0,
    chain: list[str] | None = None,
    await_termination: bool = True,
):
    """Run one AvailableNow incremental pass: new files under
    ``input_path`` → field chain → append to ``output_path``."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_path)
    )
    pipeline = build_pipeline(chain or DEFAULT_CHAIN)
    docs = (
        pipeline(pages)
        .withColumn("partition_key", url_bucket("url", n_buckets, salt))
        .select(*STREAM_DOC_COLUMNS)
    )
    query = (
        docs.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query
