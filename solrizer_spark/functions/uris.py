"""URI / display-value / IIIF scalar functions (Column expressions).

Reference semantics:
* ``shorten_uri`` (content_model.py:374-383): URI → CURIE via a
  namespace-prefix table, full URI when no prefix matches.
* ``embed_language_tag`` (content_model.py:386-406): template
  rendering ``[@{tag}]{value}`` / ``{value}|{tag}``; no-tag values
  render bare.
* ``get_display_values`` (content_model.py:278-293): 3-tier sort —
  preferred language first, then other languages by standardized tag,
  then untagged; casefolded value as secondary key — then tag-embed.
* ``iiif_identifier`` (iiif_links.py:30-43): strip leading '/',
  '/'→':', prepend prefix.
* best-file preference cascade (iiif_links.py:107-131): first match
  of an ordered predicate list via filtered arrays + coalesce.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from solrizer_spark.functions.language import normalize_primary

#: namespace-prefix table (public, the common RDF namespaces; the
#: reference's table comes from plastron.namespaces)
NAMESPACE_PREFIXES: dict[str, str] = {
    "http://purl.org/dc/elements/1.1/": "dc",
    "http://purl.org/dc/terms/": "dcterms",
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#": "rdf",
    "http://www.w3.org/2000/01/rdf-schema#": "rdfs",
    "http://www.w3.org/2002/07/owl#": "owl",
    "http://www.w3.org/2004/02/skos/core#": "skos",
    "http://xmlns.com/foaf/0.1/": "foaf",
    "http://pcdm.org/models#": "pcdm",
    "http://www.europeana.eu/schemas/edm/": "edm",
    "http://www.openarchives.org/ore/terms/": "ore",
}


def shorten_uri(uri: Column | str, prefixes: dict[str, str] | None = None) -> Column:
    """URI → CURIE (longest-prefix-first cascade), else the full URI."""
    col = F.col(uri) if isinstance(uri, str) else uri
    out = col
    for ns, short in sorted(
        (prefixes or NAMESPACE_PREFIXES).items(), key=lambda kv: -len(kv[0])
    ):
        out = F.when(
            col.startswith(ns),
            F.concat(F.lit(short + ":"), F.substring(col, len(ns) + 1, 10000)),
        ).otherwise(out)
    return out


def embed_language_tag(value: Column, tag: Column, template: str = "[@{tag}]{value}") -> Column:
    """Render value+tag through the template; bare value when untagged."""
    rendered = F.lit(template)
    rendered = F.replace(rendered, F.lit("{tag}"), tag)
    rendered = F.replace(rendered, F.lit("{value}"), value)
    return F.when(tag.isNull() | (tag == ""), value).otherwise(rendered)


def display_values(
    values: Column, preferred_language: Column | None = None
) -> Column:
    """``get_display_values`` over an ``array<struct<value,lang>>``
    column: 3-tier sort key ('1,' preferred / '2,{tag},' other /
    '3,' untagged + casefolded value), then ``[@tag]value`` embedding.
    """
    def sort_key(v: Column) -> Column:
        std = F.lower(normalize_primary(v["lang"]))
        untagged = v["lang"].isNull() | (v["lang"] == "")
        if preferred_language is not None:
            pref = F.lower(normalize_primary(preferred_language))
            return (
                F.when(untagged, F.concat(F.lit("3,"), F.lower(v["value"])))
                .when(std == pref, F.concat(F.lit("1,"), F.lower(v["value"])))
                .otherwise(F.concat(F.lit("2,"), std, F.lit(","), F.lower(v["value"])))
            )
        return F.when(untagged, F.concat(F.lit("3,"), F.lower(v["value"]))).otherwise(
            F.concat(F.lit("2,"), std, F.lit(","), F.lower(v["value"]))
        )

    keyed = F.transform(
        values, lambda v: F.struct(sort_key(v).alias("k"), v["value"].alias("value"), v["lang"].alias("lang"))
    )
    ordered = F.array_sort(keyed)  # struct sort: by k, then value, then lang
    return F.transform(
        ordered, lambda v: embed_language_tag(v["value"], v["lang"])
    )


def iiif_identifier(path: Column | str, prefix: str = "iiif:") -> Column:
    """lstrip '/', '/'→':', prepend prefix (iiif_links.py:30-43)."""
    col = F.col(path) if isinstance(path, str) else path
    return F.concat(F.lit(prefix), F.translate(F.regexp_replace(col, "^/+", ""), "/", ":"))


def expand_uri_template(template: str, id_value: Column) -> Column:
    """URITemplate expansion for the ``id`` variable
    (iiif_links.py:54-67 uses ``URITemplate(...).expand(id=...)``):
    the template is split at PLAN time; ``{+id}`` substitutes the raw
    value (RFC 6570 reserved expansion), ``{id}`` pct-encodes it
    (RFC 6570 simple expansion). Simple expansion is built on
    ``url_encode`` (application/x-www-form-urlencoded) with the three
    divergences from RFC 6570's unreserved set fixed up: `` `` must be
    ``%20`` not ``+``, ``~`` stays literal, and ``*`` is encoded
    (ADVICE r2; the reference's URITemplate follows RFC 6570)."""
    import re

    def simple_expand(v: Column) -> Column:
        enc = F.url_encode(v)
        enc = F.replace(enc, F.lit("+"), F.lit("%20"))
        enc = F.replace(enc, F.lit("%7E"), F.lit("~"))
        return F.replace(enc, F.lit("*"), F.lit("%2A"))

    pieces: list[Column] = []
    for tok in re.split(r"(\{\+?id\})", template):
        if tok == "{+id}":
            pieces.append(id_value)
        elif tok == "{id}":
            pieces.append(simple_expand(id_value))
        elif tok:
            pieces.append(F.lit(tok))
    return F.concat(*pieces)


def best_image_file(files: Column) -> Column:
    """The "best" image file struct by the reference's preference
    cascade (get_best_image_file, iiif_links.py:107-131):
    preservation-master image → image/tiff → image/jpeg → any
    image/*; null when nothing matches (ImageUnavailable analog).
    Elements are ``struct<mime_type, rdf_types, path>``."""
    return first_matching(
        files,
        lambda f: F.array_contains(f["rdf_types"], "pcdmuse:PreservationMasterFile")
        & f["mime_type"].startswith("image/"),
        lambda f: f["mime_type"] == "image/tiff",
        lambda f: f["mime_type"] == "image/jpeg",
        lambda f: f["mime_type"].startswith("image/"),
    )


def thumbnail_identifier(files: Column, prefix: str = "iiif:") -> Column:
    """IIIF identifier of the best image file, or the
    ``static:unavailable`` placeholder (get_first_file_identifier,
    iiif_links.py:134-149)."""
    best = best_image_file(files)
    return F.coalesce(
        iiif_identifier(best["path"], prefix), F.lit("static:unavailable")
    )


def first_matching(files: Column, *predicates) -> Column:
    """Preference cascade (iiif_links.py:107-131): the first element of
    the first predicate's non-empty filter result, else null. Each
    predicate is a Column-lambda over the array element."""
    out = F.lit(None)
    for pred in reversed(predicates):
        # try_element_at: an all-false filter yields an EMPTY array and
        # ANSI-mode element_at would throw instead of returning null
        candidate = F.try_element_at(F.filter(files, pred), F.lit(1))
        out = F.coalesce(candidate, out)
    return out
