"""Stdlib PDF text kernel (binary-PDF route; north rule's PDF half)."""

from __future__ import annotations

import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from solrizer_spark.extraction.pdf_text import extract_pdf_text, pdf_title


def make_pdf(content: bytes, compress: bool = True, title: bytes | None = None) -> bytes:
    """A minimal one-stream PDF around ``content``."""
    body = zlib.compress(content) if compress else content
    filt = b"/Filter /FlateDecode " if compress else b""
    info = b"" if title is None else (
        b"2 0 obj\n<< /Title (" + title + b") >>\nendobj\n"
    )
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< " + filt + b"/Length " + str(len(body)).encode() + b" >>\n"
        b"stream\n" + body + b"\nendstream\nendobj\n" + info +
        b"trailer\n<< >>\n%%EOF\n"
    )


def test_tj_flate():
    pdf = make_pdf(b"BT /F1 12 Tf 72 720 Td (Hello World) Tj ET")
    assert extract_pdf_text(pdf) == "Hello World"


def test_tj_uncompressed():
    pdf = make_pdf(b"BT (plain stream text) Tj ET", compress=False)
    assert extract_pdf_text(pdf) == "plain stream text"


def test_tj_array_with_kerning():
    pdf = make_pdf(b"BT [(Hel) -20 (lo) 15 ( wor) (ld)] TJ ET")
    assert extract_pdf_text(pdf) == "Hello world"


def test_newline_operators_and_escapes():
    content = (
        rb"BT (line one) Tj T* (line two \(escaped\) \050oct\051) Tj ET"
        rb" BT (next block) Tj ET"
    )
    pdf = make_pdf(content)
    assert extract_pdf_text(pdf) == (
        "line one\nline two (escaped) (oct)\nnext block"
    )


def test_quote_operator_and_hex_string():
    pdf = make_pdf(b"BT (first) Tj (second) ' <48 65 78> Tj ET")
    assert extract_pdf_text(pdf) == "first\nsecondHex"


def test_balanced_parens_in_literal():
    pdf = make_pdf(b"BT (balanced (inner) parens) Tj ET")
    assert extract_pdf_text(pdf) == "balanced (inner) parens"


def test_title_and_empty():
    pdf = make_pdf(b"BT (x) Tj ET", title=b"My \\(quoted\\) Doc")
    assert pdf_title(pdf) == "My (quoted) Doc"
    assert pdf_title(b"%PDF-1.4\n%%EOF") is None
    assert extract_pdf_text(b"") == "" and extract_pdf_text(None) == ""


def test_multiple_streams_in_order():
    one = zlib.compress(b"BT (alpha) Tj ET")
    two = zlib.compress(b"BT (beta) Tj ET")
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode >>\nstream\n" + one +
        b"\nendstream\nendobj\n2 0 obj\n<< /Filter /FlateDecode >>\nstream\n" +
        two + b"\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "alpha\nbeta"


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_never_raises_on_arbitrary_bytes(data):
    out = extract_pdf_text(b"%PDF-1.4\nstream\n" + data + b"\nendstream")
    assert isinstance(out, str)
    assert pdf_title(data) is None or isinstance(pdf_title(data), str)


def test_pdf_route_in_extraction_udf(spark):
    """End-to-end: a %PDF payload routes to 'pdf' with extracted text
    and title; a text-free PDF routes to parse_failed."""
    from solrizer_spark.operators.extract import extract_stage

    good = make_pdf(b"BT (Spark PDF route) Tj ET", title=b"A Title")
    empty = make_pdf(b"BT ET")
    rows = [
        ("https://x.org/good.pdf", good, None),
        ("https://x.org/empty.pdf", empty, None),
        ("https://x.org/page.html", b"<html><body><p>plain html</p></body></html>", None),
    ]
    df = spark.createDataFrame(rows, "url string, html binary, text string")
    out = {r["url"]: r for r in extract_stage(df).collect()}
    g = out["https://x.org/good.pdf"]
    assert g["route"] == "pdf" and g["parse_failed"] is False
    assert g["extracted_text"] == "Spark PDF route" and g["title"] == "A Title"
    e = out["https://x.org/empty.pdf"]
    assert e["route"] == "failed" and e["error"] == "pdf_no_text"
    assert out["https://x.org/page.html"]["route"] == "html"


def test_pdf_route_detail_mode_parity(spark):
    from solrizer_spark.operators.extract import extract_stage

    good = make_pdf(b"BT (detail parity) Tj T* (line 2) Tj ET")
    df = spark.createDataFrame(
        [("u1", good, None)], "url string, html binary, text string"
    )
    fast = extract_stage(df).select("extracted_text").collect()[0][0]
    detail = extract_stage(df, include_blocks=True).select(
        "extracted_text"
    ).collect()[0][0]
    assert fast == detail == "detail parity\nline 2"


def test_review_regressions_kernel():
    """Reproduced review findings: digits 8/9 are not octal; zlib
    bodies ending in EOL bytes must survive; a bad stream must not
    discard good ones; CRLF continuation emits nothing."""
    # \8 is not octal: literal '8' per the escape fallback, no raise
    assert extract_pdf_text(make_pdf(rb"BT (bad \8 esc) Tj ET")) == "bad 8 esc"
    assert pdf_title(make_pdf(b"BT (x) Tj ET", title=rb"bad \8")) == "bad 8"
    # compressed stream whose zlib bytes end in 0x0a (review repro)
    content = b"BT (strip victim 49) Tj ET"
    assert zlib.compress(content).endswith(b"\n")
    assert extract_pdf_text(make_pdf(content)) == "strip victim 49"
    # one undecodable stream between two good ones
    good = zlib.compress(b"BT (keep me) Tj ET")
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< >>\nstream\n" + good +
        b"\nendstream\n2 0 obj\n<< >>\nstream\n\xff\xfe\x01garbage"
        b"\nendstream\n3 0 obj\n<< >>\nstream\n" + good +
        b"\nendstream\n%%EOF"
    )
    assert "keep me" in extract_pdf_text(pdf)
    # CRLF line continuation: no output at all
    assert extract_pdf_text(
        make_pdf(b"BT (foo\\\r\nbar) Tj ET", compress=False)
    ) == "foobar"


def test_pdf_corpus_class_end_to_end(spark, tmp_path):
    """Opt-in PDF payload class drives the pdf route through the full
    job with byte-identity vs the independently constructed golden;
    the default generator output stays byte-stable (goldens frozen)."""
    import os

    import duckdb

    from job import run_job
    from solrizer_spark.corpus.generator import generate_page, write_corpus

    # default output unchanged by the new parameter
    assert generate_page(14, seed=42) == generate_page(14, seed=42, pdf_class=False)

    paths = write_corpus(str(tmp_path / "c"), n_pages=120, seed=7, pdf_class=True)
    out = str(tmp_path / "out")
    stats = run_job(spark, paths["pages"], out, n_buckets=8)
    assert stats["n_docs"] == 120
    match = duckdb.sql(f"""
        SELECT count(*) total,
               sum(CASE WHEN g.payload_class = 'pdf' THEN 1 ELSE 0 END) n_pdf,
               sum(CASE WHEN d.extracted_text = g.expected_text
                        OR (d.extracted_text IS NULL AND g.expect_parse_failed)
                   THEN 1 ELSE 0 END) identical
        FROM parquet_scan('{out}/docs/*/*.parquet') d
        JOIN parquet_scan('{paths["golden"]}/*.parquet') g USING (url)
    """).fetchone()
    assert match[0] == 120 and match[1] == 12 and match[2] == 120
    routes = duckdb.sql(
        f"SELECT sum(n_pdf) FROM parquet_scan('{out}/metrics/*.parquet')"
    ).fetchone()
    assert routes[0] == 12  # metrics route mix counts the pdf docs
