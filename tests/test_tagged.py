"""Golden tests for the tagged OCR route, pinned to the reference
suite's expected strings (tests/indexers/test_extracted_text.py:70-79
[ALTO] and :94-122 [hOCR]) over the reference's own fixture payloads.
"""

import pytest
from conftest import reference_fixture

from solrizer_spark.extraction.tagged import (
    OCRWord,
    UnrecognizedOCRFormatError,
    detect_ocr_format,
    extract_alto_words,
    extract_hocr_words,
    extract_ocr1_words,
    extract_tagged_words,
    tagged_text,
)

ALTO_EXPECTED = (
    "Vol.|n=0&xywh=339,781,112,41"
    " VI|n=0&xywh=488,780,66,43"
    " VARSITY|n=0&xywh=340,926,246,83"
    " BASKETERS|n=0&xywh=631,920,339,85"
)

HOCR_EXPECTED = (
    " |n=0&xywh=0,2924,282,1320 "
    " |n=0&xywh=0,0,404,404 "
    "Page|n=0&xywh=340,473,230,85 "
    "1|n=0&xywh=675,472,77,84 "
    "Additions|n=0&xywh=1238,436,526,159 "
    ":|n=0&xywh=1773,485,71,100 "
    "nd|n=0&xywh=1850,406,154,127 "
    "g¢orrections|n=0&xywh=2055,395,656,161 "
    "for|n=0&xywh=2788,433,164,118 "
    "the|n=0&xywh=3028,425,164,96 "
    "manuseript|n=0&xywh=3312,420,596,108 "
    "of|n=0&xywh=3980,412,112,94 "
    '"The|n=0&xywh=1725,663,219,75 '
    "Future|n=0&xywh=2007,658,355,100 "
    "Is|n=0&xywh=2435,654,111,80 "
    "Now!|n=0&xywh=2607,654,224,74 "
    "A|n=0&xywh=3690,692,26,25 "
    "By|n=0&xywh=2235,762,129,86 "
    "Ka|n=0&xywh=2429,757,101,74 "
    "atherine|n=0&xywh=2497,696,446,192 "
    "Anne|n=0&xywh=3029,761,226,63 "
    "forter|n=0&xywh=3324,738,346,86 "
    " |n=0&xywh=3443,909,959,151"
)


def test_alto_reference_golden_byte_identity():
    payload = reference_fixture("alto.xml")
    words = extract_alto_words(payload, dpi=(400, 400))
    assert tagged_text(words, page_index=0) == ALTO_EXPECTED


def test_hocr_reference_golden_byte_identity():
    payload = reference_fixture("sample.hocr")
    words = extract_hocr_words(payload)
    assert tagged_text(words, page_index=0) == HOCR_EXPECTED


def test_hocr_nested_markup_words():
    # reference fixture libfcrepo-1743.xml: words wrapped in <strong>/<em>
    # (reference test: test_get_tagged_ocr_text, test_extracted_text.py:194+)
    payload = reference_fixture("libfcrepo-1743.xml")
    words = extract_hocr_words(payload)
    assert [w.text for w in words] == [
        "One", "Two", "Three", "Four", "Five", "Six", "Seven", "Eight",
    ]


def test_unrecognized_format_raises():
    payload = reference_fixture("other.xml")
    with pytest.raises(UnrecognizedOCRFormatError):
        extract_tagged_words(payload)


def test_format_detection():
    assert detect_ocr_format(reference_fixture("alto.xml")) == "alto"
    assert detect_ocr_format(reference_fixture("sample.hocr")) == "hocr"
    assert detect_ocr_format(b"OCR1\n1\t2\t3\t4\tword\n") == "ocr1"


def test_ocr1_roundtrip():
    payload = "OCR1\n10\t20\t30\t40\thello\n50\t60\t70\t80\tworld\n"
    words = extract_ocr1_words(payload)
    assert words == [OCRWord("hello", 10, 20, 30, 40), OCRWord("world", 50, 60, 70, 80)]
    assert tagged_text(words, 2) == (
        "hello|n=2&xywh=10,20,30,40 world|n=2&xywh=50,60,70,80"
    )


def test_page_index_threading():
    words = [OCRWord("w", 1, 2, 3, 4)]
    assert tagged_text(words, 7) == "w|n=7&xywh=1,2,3,4"


def test_tagged_suffix_matches_urlencode_property():
    """The inlined ``n={page}&xywh={x,y,w,h}`` suffix must equal the
    reference's ``urlencode({...}, safe=',')`` for every int geometry
    (extracted_text.py:114-119) — the encoder is the identity format
    because digits, ``-`` and the exempted ``,`` are all URL-safe."""
    from urllib.parse import urlencode

    from hypothesis import given
    from hypothesis import strategies as st

    ints = st.integers(min_value=-(2**31), max_value=2**31 - 1)

    @given(ints, ints, ints, ints, st.integers(min_value=0, max_value=10**6))
    def check(x, y, w, h, page):
        word = OCRWord("t", x, y, w, h)
        assert tagged_text([word], page) == (
            f"t|{urlencode({'n': page, 'xywh': word.xywh}, safe=',')}"
        )

    check()
