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


def _fragment(fields: list[tuple[str, Column]]) -> Column:
    """Render several static-name fields as one JSON fragment via a
    single ``to_json(struct(...))`` (null fields are omitted by the
    default ``spark.sql.jsonGenerator.ignoreNullFields=true``) — ~10×
    cheaper than per-field ``to_json(map(...))`` calls. Returns null
    when every field was null (so joiners skip it)."""
    j = F.to_json(F.struct(*[c.alias(name) for name, c in fields]))
    body = j.substr(F.lit(2), F.length(j) - F.lit(2))
    return F.nullif(body, F.lit(""))


def doc_json_stage(df: DataFrame, conf: dict | None = None) -> DataFrame:
    """Assemble ``doc`` from the field columns produced by the chain
    stages (plans/pipeline.py). Field inventory mirrors FIXTURES.md §2.

    Only fields whose producing stage actually ran (column present)
    are emitted — the reference's doc likewise contains exactly what
    the configured indexers for that model produced
    (indexers/__init__.py:82-101 fold + per-model lists).

    Keys are globally sorted (web.py:405 ``sort_keys=True``): static
    fields are batched into to_json struct fragments declared in
    sorted order; the two dynamic-name fields (``extracted_text__txt``
    vs ``__dps_txt``; ``title__txt{lang}``) sort into fixed gaps for
    every possible name, so fragments + dynamics concatenate in order
    without a per-row sort.
    """
    cols = set(df.columns)
    entries: list[Column] = []

    def add(needed: set[str], entry_fn) -> None:
        if needed <= cols:
            entries.append(entry_fn())

    lang_sfx = F.col("lang_suffix")

    def nonempty(arr: Column) -> Column:
        # empty multivalued fields are omitted (content_model.py:166-169)
        return F.when(F.size(arr) > 0, arr)

    # fragment A: keys sorting before 'extracted_text__*'
    frag_a: list[tuple[str, Column]] = []
    if "id" in cols:
        frag_a.append(("_root_", F.col("id")))  # root.py:45-55 analog
    if "content_model_name__str" in cols:
        frag_a.append(("content_model_name__str", F.col("content_model_name__str")))
    if "described_by__uri" in cols:
        frag_a.append(("described_by__uri", F.col("described_by__uri")))
    if frag_a:
        entries.append(_fragment(frag_a))

    # dynamic: extracted text flips the field name on delimited
    # payloads (extracted_text.py:51-56)
    add(
        {"is_tagged", "extracted_text"},
        lambda: json_entry(
            F.when(F.col("is_tagged"), F.lit("extracted_text__dps_txt")).otherwise(
                F.lit("extracted_text__txt")
            ),
            F.col("extracted_text"),
        ),
    )

    # fragment B: keys between 'extracted_text__*' and 'title__txt*'
    frag_b: list[tuple[str, Column]] = []
    if "id" in cols:
        frag_b.append(("id", F.col("id")))
    if "agg_identifier" in cols:
        frag_b.append(("identifier", nonempty(F.col("agg_identifier"))))
    for flag in ("is_discoverable", "is_hidden", "is_published", "is_top_level"):
        if flag in cols:
            frag_b.append((flag, F.col(flag)))
    if "language__facet" in cols:
        frag_b.append(("language__facet", F.col("language__facet")))
    if "agg_text" in cols:
        frag_b.append(("text", nonempty(F.col("agg_text"))))
    if {"title", "lang_suffix"} <= cols:
        # title with embedded language tag (content_model.py:278-293)
        frag_b.append(
            (
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
            )
        )
    if frag_b:
        entries.append(_fragment(frag_b))

    # dynamic: per-language title text field (content_model.py:263-275)
    add({"title", "lang_suffix"}, lambda: json_entry(F.concat(F.lit("title__txt"), lang_sfx), F.col("title")))

    # fragment C: keys after 'title__txt*'
    if "warc_ts__time" in cols:
        entries.append(_fragment([("warc_ts__time", F.col("warc_ts__time"))]))

    # fragments and dynamics are emitted in globally sorted key order;
    # concat_ws skips null (all-empty) pieces
    return df.withColumn(
        "doc", F.concat(F.lit("{"), F.concat_ws(",", *entries), F.lit("}"))
    )
