"""Faceter primitives — the generalizable cores of the reference's 16
faceter classes (faceters.py:106-425), as pure Column expressions plus
one broadcast-join DataFrame transform.

* :func:`substring_test_facet`  CensorshipFacet (faceters.py:157-182):
  null unless a gate marker is present; "Yes"/"No" by a second marker.
* :func:`split_at_comma`        ResourceTypeFacet's Poster arm
  (faceters.py:366): the value up to the first comma (genre term,
  dropping extent info).
* :func:`membership_flag_facet` PublicationStatusFacet /
  VisibilityFacet (faceters.py:300-312, 412-424): a two-valued flag by
  membership of a marker value in a multivalued column.
* :func:`vocab_label_join`      rights_statement_label / RightsFacet
  (faceters.py:61-73, 373-390): correlate a URI column with a small
  controlled vocabulary and emit its label — a broadcast hash join
  against the dim table, falling back to the URI itself when the term
  is unknown (the reference logs a warning and returns the uri,
  faceters.py:70-73).

Scale: the first three are codegen'd row-local expressions; the vocab
join broadcasts a dim of at most a few hundred terms — no shuffle on
the fact side at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Public rightsstatements.org URIs with their standard labels — the
#: analog of the reference's rights vocabulary dim
#: (http://vocab.lib.umd.edu/rightsStatement#, faceters.py:61).
RIGHTS_VOCAB: list[tuple[str, str]] = [
    ("http://rightsstatements.org/vocab/InC/1.0/", "In Copyright"),
    ("http://rightsstatements.org/vocab/InC-NC/1.0/", "In Copyright - Non-Commercial Use Permitted"),
    ("http://rightsstatements.org/vocab/NoC-US/1.0/", "No Copyright - United States"),
    ("http://rightsstatements.org/vocab/CNE/1.0/", "Copyright Not Evaluated"),
    ("http://rightsstatements.org/vocab/UND/1.0/", "Copyright Undetermined"),
    ("http://rightsstatements.org/vocab/NKC/1.0/", "No Known Copyright"),
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def substring_test_facet(
    col: Column | str,
    gate: str,
    yes_marker: str,
    yes: str = "Yes",
    no: str = "No",
) -> Column:
    """Null when the value is null or the ``gate`` text is absent;
    ``yes`` when ``yes_marker`` is present, else ``no``
    (CensorshipFacet semantics, faceters.py:166-182)."""
    c = _col(col)
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(~c.contains(gate), F.lit(None).cast("string"))
        .when(c.contains(yes_marker), F.lit(yes))
        .otherwise(F.lit(no))
    )


def split_at_comma(col: Column | str) -> Column:
    """The segment before the first comma (``v.split(',')[0]``,
    faceters.py:366); null passes through."""
    return F.split(_col(col), ",").getItem(0)


def membership_flag_facet(
    arr: Column | str, marker: str, present: str, absent: str
) -> Column:
    """``present`` when ``marker`` is an element of the multivalued
    column, else ``absent`` (null arrays count as absent — an object
    with no rdf_type is unpublished/visible, faceters.py:308-312)."""
    return F.when(F.array_contains(_col(arr), marker), F.lit(present)).otherwise(
        F.lit(absent)
    )


def concat_values(arr: Column | str, separator: str = " / ") -> Column:
    """``separator.join(sorted(values))`` (concat_values,
    faceters.py:87-90): sort the multivalued column's elements
    (binary/UTF8 order, matching Python ``sorted`` on str) and join.
    Null array passes through as null."""
    return F.array_join(F.array_sort(_col(arr)), separator)


def get_labels(objects: Column | str, separator: str = " / ") -> Column:
    """One concatenated-label string per linked object (get_labels,
    faceters.py:93-96): ``objects`` is an ``array<struct<...,
    label:array<string>>>`` — the Spark shape of an RDFObjectProperty
    whose objects each carry a multivalued ``label``. Row-local
    higher-order function: no join, no shuffle, codegen'd."""
    sep = separator  # closure, NOT a default arg (PySpark HOF lambdas
    # bind extra params positionally to the array index)
    return F.transform(
        _col(objects), lambda o: F.array_join(F.array_sort(o["label"]), sep)
    )


def vocab_label_join(
    df: DataFrame,
    uri_col: str,
    out_col: str,
    vocab: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Add ``out_col`` = the vocabulary label for ``uri_col``, by
    broadcast-joining the (uri, label) dim; unknown URIs (and nulls)
    fall back to the URI value itself."""
    spark = df.sparkSession
    from solrizer_spark.session import local_df

    dim = local_df(
        spark, vocab or RIGHTS_VOCAB, "___vocab_uri string, ___vocab_label string"
    )
    return (
        df.join(F.broadcast(dim), F.col(uri_col) == F.col("___vocab_uri"), "left")
        .withColumn(out_col, F.coalesce(F.col("___vocab_label"), F.col(uri_col)))
        .drop("___vocab_uri", "___vocab_label")
    )
