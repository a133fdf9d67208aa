"""Canonical flat JSON doc assembly.

Reference semantics: ``json.dumps(doc, sort_keys=True)`` over a flat
dict with *dynamic* field names — typed suffixes, language-suffixed
text fields, ``__dps_txt`` switching (web.py:405; suffix system
content_model.py:59-111).

Spark re-expression: each field renders as a one-entry JSON map
(``to_json(map(key, value))`` — proper escaping, any value type, key
may be a runtime expression such as ``title__txt_en``), the braces are
stripped, null/empty fields are omitted (content_model.py:166-169),
and the entries are sorted lexicographically and joined. 100%
codegen'd Catalyst expressions — no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_entry(key: Column | str, value: Column) -> Column:
    """Render one ``"key":value`` JSON fragment, or null to omit.

    ``key`` may be a literal name or a runtime Column (dynamic field
    names). Null values are omitted; empty arrays are omitted.
    """
    key_col = F.lit(key) if isinstance(key, str) else key
    j = F.to_json(F.create_map(key_col, value))
    fragment = j.substr(F.lit(2), F.length(j) - F.lit(2))
    return F.when(value.isNotNull(), fragment)


def json_entry_array(key: Column | str, value: Column) -> Column:
    """Like :func:`json_entry` but omits empty arrays too."""
    return F.when(F.size(value) > 0, json_entry(key, value))


def assemble_doc(entries: list[Column]) -> Column:
    """Sorted-key canonical JSON object from entry fragments.

    Sorting the rendered fragments sorts by JSON-escaped key (all keys
    begin the fragment), reproducing ``sort_keys=True``.
    """
    return F.concat(
        F.lit("{"),
        F.array_join(F.array_sort(F.array_compact(F.array(*entries))), ","),
        F.lit("}"),
    )


def doc_json_stage(df: DataFrame, conf: dict | None = None) -> DataFrame:
    """Assemble ``doc`` from the field columns produced by the chain
    stages (plans/pipeline.py). Field inventory mirrors FIXTURES.md §2.

    Only fields whose producing stage actually ran (column present)
    are emitted — the reference's doc likewise contains exactly what
    the configured indexers for that model produced
    (indexers/__init__.py:82-101 fold + per-model lists).
    """
    cols = set(df.columns)
    entries: list[Column] = []

    def add(needed: set[str], entry_fn) -> None:
        if needed <= cols:
            entries.append(entry_fn())

    lang_sfx = F.col("lang_suffix")
    add({"id"}, lambda: json_entry("id", F.col("id")))
    # flat corpus: url is the root (root.py:45-55 analog)
    add({"id"}, lambda: json_entry("_root_", F.col("id")))
    add({"content_model_name__str"}, lambda: json_entry("content_model_name__str", F.col("content_model_name__str")))
    add({"described_by__uri"}, lambda: json_entry("described_by__uri", F.col("described_by__uri")))
    # extracted text: delimited-payload pages flip the field name
    # (extracted_text.py:51-56)
    add(
        {"is_tagged", "extracted_text"},
        lambda: json_entry(
            F.when(F.col("is_tagged"), F.lit("extracted_text__dps_txt")).otherwise(
                F.lit("extracted_text__txt")
            ),
            F.col("extracted_text"),
        ),
    )
    # title is a language-tagged data property → per-language text
    # field name (content_model.py:263-275)
    add({"title", "lang_suffix"}, lambda: json_entry(F.concat(F.lit("title__txt"), lang_sfx), F.col("title")))
    add(
        {"title", "lang_suffix"},
        lambda: json_entry(
            "title__display",
            F.when(
                F.col("title").isNotNull() & (lang_sfx != ""),
                F.concat(
                    F.lit("[@"),
                    F.regexp_replace(lang_sfx.substr(F.lit(2), F.lit(100)), "_", "-"),
                    F.lit("]"),
                    F.col("title"),
                ),
            ).otherwise(F.col("title")),
        ),
    )
    add({"language__facet"}, lambda: json_entry("language__facet", F.col("language__facet")))
    add({"warc_ts__time"}, lambda: json_entry("warc_ts__time", F.col("warc_ts__time")))
    for flag in ("is_published", "is_hidden", "is_top_level", "is_discoverable"):
        add({flag}, lambda flag=flag: json_entry(flag, F.col(flag)))
    add({"agg_text"}, lambda: json_entry_array("text", F.col("agg_text")))
    add({"agg_identifier"}, lambda: json_entry_array("identifier", F.col("agg_identifier")))
    return df.withColumn("doc", assemble_doc(entries))
