"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full extraction field-chain over a
deterministic HTML wrap of the sf0.001 ``documents`` table.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2), each with an exact DuckDB oracle. The pages input for
extraction queries is constructed *inside Spark* from the shared
``documents`` parquet with deterministic JVM-side expressions, so the
DuckDB oracle can state the expected extraction output independently.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"

_STOPWORDS = ("the", "a")


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _esc(col: Column) -> Column:
    """Minimal HTML escaping (mirrors what any writer of the corpus
    would do); the extractor decodes these entities back."""
    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    return F.regexp_replace(out, ">", "&gt;")


def _wrap_pages(spark: SparkSession, sf_dir: str, boilerplate: bool) -> DataFrame:
    """documents → pages(url, warc_ts, html, text, lang) (+doc_id).

    ``boilerplate=False``: clean page → raw markup-strip route; the
    expected extracted text is ``'Doc {id}' + text`` (title text node
    + paragraph text node, adjacent tags contribute no whitespace).

    ``boilerplate=True``: nav + link farm + footer around the same
    paragraph → main-content route; expected text is exactly ``text``
    (1 block kept, nav/farm/footer dropped).
    """
    docs = _table(spark, sf_dir, "documents")
    title = F.concat(F.lit("Doc "), F.col("doc_id").cast("string"))
    body_core = F.concat(F.lit("<article><p>"), _esc(F.col("text")), F.lit("</p></article>"))
    if boilerplate:
        body = F.concat(
            F.lit(
                '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
                '<div><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a></div>'
            ),
            body_core,
            F.lit("<footer>Copyright 2026 corpus.example.org</footer>"),
        )
    else:
        body = body_core
    html = F.concat(
        F.lit("<html><head><title>"), title, F.lit("</title></head><body>"),
        body, F.lit("</body></html>"),
    )
    return docs.select(
        F.col("doc_id"),
        F.concat(F.lit("https://corpus.example.org/doc/"), F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_add("SECOND", F.col("doc_id").cast("int"), F.lit("2024-01-01 00:00:00").cast("timestamp")).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_extract_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup-strip route (extracted_text.py:105-107 semantics)."""
    from solrizer_spark.operators.extract import extract_stage

    pages = _wrap_pages(spark, sf_dir, boilerplate=False)
    return extract_stage(pages).select("doc_id", "extracted_text")


def q_extract_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate classification route (SURVEY.md §2.12): keep/drop
    counts and final bytes pinned."""
    from solrizer_spark.operators.extract import extract_stage

    pages = _wrap_pages(spark, sf_dir, boilerplate=True)
    return extract_stage(pages).select(
        "doc_id", "extracted_text", "blocks_kept", "blocks_dropped"
    )


def q_doc_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full field chain: content model, discoverability flags, solr
    timestamp, language facet (indexers.yml chain analog)."""
    from solrizer_spark.plans.pipeline import run_chain

    pages = _wrap_pages(spark, sf_dir, boilerplate=False)
    out = run_chain(pages)
    return out.select(
        "doc_id",
        F.col("content_model_name__str").alias("content_model"),
        F.col("language__facet").alias("language_facet"),
        "warc_ts__time",
        "is_published",
        "is_hidden",
        "is_top_level",
        "is_discoverable",
    )


def q_lang_facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facet aggregation (LanguageFacet, faceters.py:220-237 +
    language_name :76-84): facet value distribution."""
    from solrizer_spark.functions.language import language_name_col

    docs = _table(spark, sf_dir, "documents")
    return (
        docs.select(language_name_col("lang").alias("language_facet"))
        .groupBy("language_facet")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_solr_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp → UTC Z-notation (solr_datetime, utils.py:4-23)."""
    from solrizer_spark.functions.datetime_fns import solr_timestamp

    ev = _table(spark, sf_dir, "events")
    return ev.select("event_id", solr_timestamp("ts").alias("ts_solr"))


def q_page_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered page sequence → positional concat (page_sequence.py:28-71
    + ' '.join, extracted_text.py:58): lineitem lines as 'pages' of an
    order, ordered by line number."""
    li = _table(spark, sf_dir, "lineitem")
    pages = F.array_sort(
        F.collect_list(
            F.struct(F.col("l_linenumber"), F.col("l_quantity").cast("int").alias("qty"))
        )
    )
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("page_count"),
            F.array_join(
                F.transform(pages, lambda p: p["qty"].cast("string")), " "
            ).alias("page_text"),
        )
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy (training-data op): a
    deterministic 10% duplicate injection, then hash-group counts."""
    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.where(F.col("doc_id") % 10 == 0)
    union = docs.unionByName(dup)
    return (
        union.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("n_copies"))
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality scoring (training-data op): token count, mean
    token length, stopword ratio — all JVM-side array expressions."""
    docs = _table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.round(
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double") / n, 4
        ).alias("avg_token_len"),
        F.round(stop.cast("double") / n, 4).alias("stopword_ratio"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_strip": q_extract_strip,
        "extract_main_content": q_extract_main_content,
        "doc_fields": q_doc_fields,
        "lang_facet_counts": q_lang_facet_counts,
        "solr_timestamp": q_solr_timestamp,
        "page_sequence": q_page_sequence,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
    }


# --------------------------------------------------------------------------
# oracles (DuckDB SQL over the same parquet views)
# --------------------------------------------------------------------------

_LANG_CASE = (
    "CASE lang WHEN 'en' THEN 'English' WHEN 'de' THEN 'German' "
    "WHEN 'es' THEN 'Spanish' WHEN 'fr' THEN 'French' WHEN 'zh' THEN 'Chinese' "
    "ELSE lang END"
)


def oracle_sql() -> dict[str, str]:
    return {
        "extract_strip": (
            "SELECT doc_id, 'Doc ' || doc_id || text AS extracted_text FROM documents"
        ),
        "extract_main_content": (
            "SELECT doc_id, text AS extracted_text, 1 AS blocks_kept, "
            "3 AS blocks_dropped FROM documents"
        ),
        "doc_fields": (
            "SELECT doc_id, 'html' AS content_model, "
            f"{_LANG_CASE} AS language_facet, "
            "strftime(TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id), "
            "'%Y-%m-%dT%H:%M:%SZ') AS warc_ts__time, "
            "true AS is_published, false AS is_hidden, true AS is_top_level, "
            "true AS is_discoverable FROM documents"
        ),
        "lang_facet_counts": (
            f"SELECT {_LANG_CASE} AS language_facet, count(*) AS n_docs "
            "FROM documents GROUP BY 1"
        ),
        "solr_timestamp": (
            "SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ts_solr FROM events"
        ),
        "page_sequence": (
            "SELECT l_orderkey, count(*) AS page_count, "
            "string_agg(CAST(CAST(l_quantity AS INT) AS VARCHAR), ' ' "
            "ORDER BY l_linenumber, CAST(l_quantity AS INT)) AS page_text "
            "FROM lineitem GROUP BY l_orderkey"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS text_hash, count(*) AS n_copies FROM ("
            "SELECT doc_id, text FROM documents UNION ALL "
            "SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0"
            ") GROUP BY 1"
        ),
        "text_stats": (
            "SELECT doc_id, "
            "len(str_split(text, ' ')) AS n_tokens, "
            "length(text) AS n_chars, "
            "round(list_sum(list_transform(str_split(text, ' '), t -> length(t)))"
            " / len(str_split(text, ' ')), 4) AS avg_token_len, "
            "round(len(list_filter(str_split(text, ' '), t -> t IN ('the','a')))"
            " / len(str_split(text, ' ')), 4) AS stopword_ratio "
            "FROM documents"
        ),
    }


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction field-chain (markup-strip + boilerplate
    routes mixed) over sf0.001, returning the docs DataFrame."""
    from solrizer_spark.operators.repartition import url_bucket
    from solrizer_spark.plans.pipeline import run_chain

    clean = _wrap_pages(spark, SF_DEFAULT, boilerplate=False)
    boiler = _wrap_pages(spark, SF_DEFAULT, boilerplate=True).withColumn(
        "url", F.concat(F.col("url"), F.lit("?v=boiler"))
    )
    pages = clean.unionByName(boiler)
    out = run_chain(pages).withColumn("partition_key", url_bucket("url", 64, 0))
    return out.select(
        "url", "doc_id", "partition_key", "extracted_text", "title",
        "language__facet", "warc_ts__time", "is_discoverable", "doc",
    )
