"""Config-driven ordered stage composition — the Spark re-expression
of the reference's indexer chain.

Reference model: ``IndexerContext.run(names)`` folds
``doc.update(indexer(ctx))`` over an ordered, per-model list of named
indexers loaded from a registry (indexers/__init__.py:82-101, registry
:47-49, per-model lists indexers.yml:1-29, late binding web.py:376-381).

Spark model: each "indexer" is a pure ``(DataFrame, conf) → DataFrame``
stage registered in :data:`STAGES`; a configured name list composes
them with ``functools.reduce``. Later stages see earlier stages'
columns (the ``doc.update`` accumulation). Catalyst fuses the whole
chain into one WholeStageCodegen pipeline — stage boundaries are
logical, not physical.

Unknown / duplicate stage names fail fast at composition time
(reference analog: parse_indexers_param validation, web.py:254-289).
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solrizer_spark.functions.datetime_fns import solr_timestamp
from solrizer_spark.functions.language import language_name_col, language_suffix_col
from solrizer_spark.operators.doc_json import doc_json_stage
from solrizer_spark.operators.extract import extract_stage

Stage = Callable[[DataFrame, dict], DataFrame]


# --------------------------------------------------------------------------
# field-chain stages (each one mirrors a reference indexer)
# --------------------------------------------------------------------------

def stage_extract(df: DataFrame, conf: dict) -> DataFrame:
    """html → extraction struct (extracted_text indexer analog,
    extracted_text.py:44-61). The only Python stage."""
    return extract_stage(
        df,
        dpi=conf.get("dpi", (400, 400)),
        include_blocks=conf.get("include_blocks", False),
    )


def stage_content_model(df: DataFrame, conf: dict) -> DataFrame:
    """Identity + model fields (content_model.py:141-179: ``id``,
    ``content_model_name__str``, ``described_by__uri``). Our content
    model is the payload route (html/plain/tagged/failed) — the analog
    of guess_model (web.py:357-362)."""
    return (
        df.withColumn("id", F.col("url"))
        .withColumn("content_model_name__str", F.col("route"))
        .withColumn("described_by__uri", F.col("url"))
    )


def stage_discoverability(df: DataFrame, conf: dict) -> DataFrame:
    """Boolean access flags (discoverability.py:23-30 semantics:
    membership tests + conjunction). Published ⇔ extraction produced
    text; hidden ⇔ parse failure; top-level ⇔ url path depth ≤ 2."""
    path = F.parse_url(F.col("url"), F.lit("PATH"))
    depth = F.size(F.split(path, "/")) - 1
    df = (
        df.withColumn("is_published", F.col("extracted_text").isNotNull())
        .withColumn("is_hidden", F.col("parse_failed"))
        .withColumn("is_top_level", depth <= F.lit(2))
    )
    return df.withColumn(
        "is_discoverable",
        F.col("is_top_level") & F.col("is_published") & ~F.col("is_hidden"),
    )


def stage_dates(df: DataFrame, conf: dict) -> DataFrame:
    """Timestamp → Solr UTC Z-notation (dates indexer / solr_datetime,
    utils.py:4-23)."""
    return df.withColumn("warc_ts__time", solr_timestamp("warc_ts"))


#: Pluggable faceter registry — the analog of the reference's
#: ``solrizer_faceters`` entry points (pyproject.toml:66-82 +
#: facets.py:38-49): each faceter is a Column builder; the facets
#: stage appends ``{name}__facet`` for every registered faceter (null
#: values are omitted from the doc, facets.py:44-47). Users extend by
#: inserting into this dict before building the pipeline.
def _ocr_faceter(df: DataFrame):
    # OCRFacet analog (faceters.py:262-282): present only when the
    # page carried tagged OCR text; null ⇒ facet omitted
    return F.when(F.col("is_tagged"), F.lit("Has OCR"))


def _domain_faceter(df: DataFrame):
    # collection-facet analog (AdminSet/ArchivalCollection,
    # faceters.py:119-154): the crawl corpus's natural grouping
    from solrizer_spark.functions.urls import registered_domain

    return registered_domain("url")


FACETERS: dict[str, Callable[[DataFrame], "object"]] = {
    "language": lambda df: language_name_col("lang"),
    "ocr": _ocr_faceter,
    "domain": _domain_faceter,
}


def stage_facets(df: DataFrame, conf: dict) -> DataFrame:
    """Facet columns (facets.py:38-49 chain; LanguageFacet
    faceters.py:220-237 via language_name). Null lang ⇒ facet omitted
    (facets.py:44-47)."""
    for name, builder in FACETERS.items():
        df = df.withColumn(f"{name}__facet", builder(df))
    return df.withColumn("lang_suffix", language_suffix_col("lang"))


#: default aggregate-field settings — the indexer-settings.yml analog
#: (indexer-settings.yml:7-26): each output field lists column paths
#: whose non-null values are concatenated. ``?``-suffixed paths are
#: optional (skipped when the column is absent), mirroring jq's
#: ``.foo?``; the reference's recursive-descent programs
#: (``..|objects|.x``) expand at plan time because our schema is
#: static.
DEFAULT_AGGREGATE_FIELDS: dict[str, list[str]] = {
    "agg_text": ["title?", "extracted_text"],
    "agg_identifier": ["id", "described_by__uri?"],
}


def stage_aggregate_fields(df: DataFrame, conf: dict) -> DataFrame:
    """Omnibus multivalued fields (aggregate_fields.py:22-44 +
    indexer-settings.yml:7-26). The reference compiles jq programs and
    concatenates their non-null results; here the configured column
    paths resolve at plan time and ``array_compact`` is the non-null
    filter (aggregate_fields.py:42). Configure via
    ``conf['aggregate_fields']``. Column names carry an ``agg_``
    prefix (the input table owns ``text``); doc JSON keys drop it."""
    settings = conf.get("aggregate_fields", DEFAULT_AGGREGATE_FIELDS)
    for out_field, paths in settings.items():
        cols = []
        for p in paths:
            optional = p.endswith("?")
            name = p.rstrip("?")
            if name in df.columns:
                cols.append(F.col(name))
            elif not optional:
                raise ValueError(
                    f"aggregate field {out_field!r} requires column {name!r} "
                    f"(available: {sorted(df.columns)})"
                )
        value = F.array_compact(F.array(*cols)) if cols else F.array().cast("array<string>")
        df = df.withColumn(out_field, value)
    return df


def stage_doc(df: DataFrame, conf: dict) -> DataFrame:
    """Canonical sorted-key JSON doc (web.py:405)."""
    return doc_json_stage(df, conf)


def stage_child_docs(df: DataFrame, conf: dict) -> DataFrame:
    """Nested child documents (content_model.py:324-336 /
    indexers/root.py: embedded resources become ``list[dict]`` values
    with the parent's id as ``_root_``): each kept DOM block becomes a
    ``page`` child doc struct. Requires the detail extraction mode
    (``conf['include_blocks']=True``) — blocks are dropped in the fast
    path."""
    if "blocks" not in df.columns:
        raise ValueError(
            "child_docs requires the detail extraction mode: set "
            "conf={'include_blocks': True} so the blocks column exists"
        )
    kept = F.filter(F.col("blocks"), lambda b: b["kept"])
    child = F.transform(
        kept,
        lambda b: F.struct(
            F.concat(F.col("url"), F.lit("#block-"), b["block_index"].cast("string")).alias("id"),
            F.col("url").alias("_root_"),
            b["block_index"].alias("page_index__int"),
            b["text"].alias("page__text__txt"),
            b["tag_path"].alias("page__tag_path__str"),
        ),
    )
    return df.withColumn("pages", child)


STAGES: dict[str, Stage] = {
    "extract": stage_extract,
    "content_model": stage_content_model,
    "discoverability": stage_discoverability,
    "dates": stage_dates,
    "facets": stage_facets,
    "aggregate_fields": stage_aggregate_fields,
    "child_docs": stage_child_docs,
    "doc": stage_doc,
}

#: Default chain — same shape as the reference's Item list
#: (indexers.yml:1-10), with extraction first because downstream
#: stages read its columns.
DEFAULT_CHAIN = [
    "extract",
    "content_model",
    "discoverability",
    "dates",
    "facets",
    "aggregate_fields",
    "doc",
]


def build_pipeline(names: list[str] | None = None, conf: dict | None = None) -> Callable[[DataFrame], DataFrame]:
    """Compose named stages into one DataFrame transform. Validates
    names up front (unknown / duplicate → ValueError, the
    parse_indexers_param analog)."""
    names = list(names or DEFAULT_CHAIN)
    conf = conf or {}
    unknown = [n for n in names if n not in STAGES]
    if unknown:
        raise ValueError(f"unknown stage(s): {unknown}; available: {sorted(STAGES)}")
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"duplicate stage(s): {sorted(dupes)}")

    def pipeline(df: DataFrame) -> DataFrame:
        return reduce(lambda acc, name: STAGES[name](acc, conf), names, df)

    return pipeline


def run_chain(df: DataFrame, names: list[str] | None = None, conf: dict | None = None) -> DataFrame:
    return build_pipeline(names, conf)(df)


def index_record(
    spark,
    url: str,
    html: bytes | None = None,
    text: str | None = None,
    lang: str | None = None,
    warc_ts=None,
    names: list[str] | None = None,
    conf: dict | None = None,
) -> dict:
    """Single-record convenience — the analog of the reference's
    ``GET /doc?uri=…`` request path (web.py:330-405): index ONE page
    through the same chain and return the doc as a dict. Exists for
    parity/debugging; the batch job is the real engine."""
    import datetime as _dt
    import json

    ts = warc_ts or _dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(url, ts, html, text, lang)],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    row = run_chain(df, names, conf).select("doc").first()
    return json.loads(row.doc)


#: Per-content-model stage lists — the analog of the reference's
#: per-model indexer configuration (indexers.yml:1-29) with the
#: ``__default__`` fallback (web.py:298-300,376-381). The extract
#: stage doubles as the model guesser (route column ≈ guess_model).
DEFAULT_MODEL_CHAINS: dict[str, list[str]] = {
    "html": ["content_model", "discoverability", "dates", "facets", "aggregate_fields", "doc"],
    "tagged": ["content_model", "discoverability", "dates", "facets", "aggregate_fields", "doc"],
    "plain": ["content_model", "discoverability", "dates", "facets", "aggregate_fields", "doc"],
    "__default__": ["content_model", "dates", "doc"],
}


def run_model_chains(
    df: DataFrame,
    chains: dict[str, list[str]] | None = None,
    conf: dict | None = None,
    route_col: str = "route",
) -> DataFrame:
    """Per-model dispatch: extraction classifies each row into a
    content model (route), each model runs its own configured stage
    list, and the per-model outputs are merged with
    ``unionByName(allowMissingColumns=True)`` — so a model whose chain
    skips a stage simply has nulls for that stage's columns.

    Catalyst sees N filtered branches over one cached scan; each
    branch is its own WholeStageCodegen pipeline. Models not named in
    ``chains`` take the ``__default__`` chain.
    """
    chains = chains or DEFAULT_MODEL_CHAINS
    conf = conf or {}
    extracted = STAGES["extract"](df, conf)
    named = {k: v for k, v in chains.items() if k != "__default__"}
    default_chain = chains.get("__default__")
    branches = []
    for model, names in named.items():
        branch = extracted.where(F.col(route_col) == model)
        branches.append(build_pipeline(names, conf)(branch))
    if default_chain is not None:
        rest = extracted.where(~F.col(route_col).isin(*named.keys()))
        branches.append(build_pipeline(default_chain, conf)(rest))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b, allowMissingColumns=True)
    return out
