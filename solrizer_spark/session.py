"""SparkSession factory with scale-appropriate defaults.

Defaults are chosen for the 100 TB design point and scaled down by
parameters for local testing:

* AQE on (runtime coalesce + skew-join splitting),
* Arrow-vectorized pandas UDFs with a *capped* records-per-batch —
  web pages are multi-KB blobs; the stock 10k rows/batch risks
  multi-hundred-MB Arrow batches per Python worker at p99 page sizes,
* shuffle partitions sized by the caller (tests: small; cluster: ~2-3×
  total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Cap on rows per Arrow batch crossing the JVM↔Python boundary.
#: At ~64 KiB mean page size this bounds batches to ~64 MiB.
ARROW_MAX_RECORDS_PER_BATCH = 1024


def get_spark(
    app_name: str = "solrizer-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # ~2× cores locally; on a real cluster this is overridden by
        # --conf (and AQE coalesces anyway).
        shuffle_partitions = max(8, cpus * 2)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


try:  # Arrow conversion failures surface as this on the pandas path
    from pyarrow.lib import ArrowInvalid as pyarrow_lib_ArrowInvalid
except Exception:  # pragma: no cover - pyarrow is baked into this env
    class pyarrow_lib_ArrowInvalid(Exception):
        pass


def local_df(spark: SparkSession, rows, schema: str):
    """Driver-local rows → DataFrame via the pandas/Arrow path: a
    single JVM LocalRelation, zero Python-worker partitions.

    Timestamp semantics: NAIVE ``datetime`` values are localized in
    ``spark.sql.session.timeZone`` (the engine pins UTC in
    ``get_spark``), NOT the driver process's local timezone the
    pickled-list path would use. Pass tz-aware datetimes to opt out.

    The plain list form ``spark.createDataFrame(rows, ddl)`` pickles
    the rows into ``defaultParallelism`` Python partitions; every
    later action then launches that many Python workers for a
    handful of rows — and under ``coalesce(1)`` (tiny parquet
    artifacts like tokenizer merge tables) those evaluate SERIALLY
    in one task: a measured ~5 s to write 64 rows on 32 cores, vs
    ~0.2 s through this helper. Small dims/params tables should
    always enter through here; real data comes from files anyway.

    Falls back to the plain path for rows pandas/Arrow can't convert
    (never expected for the scalar/bytes/timestamp dims we build).
    """
    import pandas as pd

    # split on TOP-LEVEL commas only: decimal(10,2) / map<k,v> /
    # struct<a:int,b:int> carry commas inside (),<> nesting
    fields, depth, start = [], 0, 0
    for i, ch in enumerate(schema):
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        elif ch == "," and depth == 0:
            fields.append(schema[start:i])
            start = i + 1
    fields.append(schema[start:])
    cols = [f.split(None, 1)[0] for f in fields]
    # materialize ONCE up front: `rows` may be a one-shot iterator,
    # and the fallback must see the same rows the pandas path consumed
    rows = [tuple(r) for r in rows]
    try:
        pdf = pd.DataFrame(rows, columns=cols)
        return spark.createDataFrame(pdf, schema=schema)
    except (ValueError, TypeError, pyarrow_lib_ArrowInvalid):
        # rows pandas/Arrow can't shape — fall back to the plain path
        # (correct, just slower); schema/analysis errors still raise
        return spark.createDataFrame(rows, schema)
