"""Property-based robustness tests (hypothesis) for the Spark-free
kernels — no payload may crash them, and they must be deterministic
(Spark task retries re-run kernels and demand identical bytes)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from solrizer_spark.extraction.edtf_dates import (
    EDTFParseError,
    UnsupportedEDTF,
    edtf_fields,
)
from solrizer_spark.extraction.html_text import extract_html
from solrizer_spark.extraction.tagged import (
    UnrecognizedOCRFormatError,
    extract_tagged_words,
)
from solrizer_spark.operators.multimodal import parse_media_header


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=2048))
def test_extract_html_never_raises(payload):
    r1 = extract_html(payload)
    r2 = extract_html(payload)
    assert (r1.raw_text, r1.title, [vars(b) for b in r1.blocks],
            r1.parse_failed, r1.error) == (
        r2.raw_text, r2.title, [vars(b) for b in r2.blocks],
        r2.parse_failed, r2.error)
    if not r1.parse_failed:
        assert isinstance(r1.raw_text, str)
        for b in r1.blocks:
            assert 0.0 <= b.link_density <= 1.0
            assert b.n_words >= 1


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=128))
def test_extract_html_text_inputs(payload):
    r = extract_html(payload)
    assert r.parse_failed == (payload == "")


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=1024))
def test_tagged_ocr_never_hangs(payload):
    try:
        words = extract_tagged_words(payload)
        for w in words:
            assert isinstance(w.xywh, str)
    except (UnrecognizedOCRFormatError, UnicodeDecodeError, ValueError):
        pass  # rejection is the contract; crashing is not


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="0123456789-/?~%XYTE:.[]", max_size=24))
def test_edtf_total_over_garbage(s):
    """edtf_fields either returns a complete bundle or raises one of
    its two declared errors — never anything else."""
    try:
        f = edtf_fields(s)
        assert set(f) == {"dt", "is_uncertain", "is_approximate",
                          "is_uncertain_and_approximate", "precision"}
        assert isinstance(f["dt"], str) and f["dt"]
    except (EDTFParseError, UnsupportedEDTF, ValueError):
        pass


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=64))
def test_media_header_never_raises(payload):
    meta = parse_media_header(payload)
    assert meta["valid"] in (True, False)
    assert meta["n_bytes"] == len(payload)
