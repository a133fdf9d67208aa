"""Tagged OCR text extraction — the PDF/layout fallback route.

Produces word tokens in the reference's delimited-payload format
``{word}|n={page_index}&xywh={x},{y},{w},{h}`` (reference:
src/solrizer/indexers/extracted_text.py:114-119 — ``urlencode`` with
``safe=','``), byte-identical against the reference suite's ALTO and
hOCR golden strings (tests/indexers/test_extracted_text.py:70-79 and
:94-122) using the reference's own fixture files.

Supported input formats, auto-detected by :func:`detect_ocr_format`:

* **ALTO XML** (``<alto>`` root). Coordinates in ``inch1200``
  measurement units are scaled to pixels by ``dpi/1200`` per axis and
  rounded (the reference delegates to plastron.ocr with the source
  image's DPI; the stripped reference TIFFs are 400 DPI, recovered
  from the golden values: HPOS 1016 → x 339 ⇔ scale 1/3).
* **hOCR** (XHTML with ``ocrx_word`` spans); bbox ``x0 y0 x1 y1`` →
  ``x,y,w,h``.
* **OCR1** — this engine's own deterministic plain-text word+bbox
  format used by the synthetic corpus generator
  (``solrizer_spark.corpus``): header line ``OCR1``, then one
  ``x<TAB>y<TAB>w<TAB>h<TAB>word`` line per word.

Anything else raises :class:`UnrecognizedOCRFormatError` (reference
analog: plastron UnrecognizedOCRFormatError → IndexerError,
extracted_text.py:102-103); the Spark stage converts that into a
parse-failure metrics row instead of failing the job.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from html.parser import HTMLParser
from typing import NamedTuple

__all__ = [
    "OCRWord",
    "UnrecognizedOCRFormatError",
    "detect_ocr_format",
    "extract_alto_words",
    "extract_hocr_words",
    "extract_ocr1_words",
    "extract_tagged_words",
    "tagged_text",
]


class UnrecognizedOCRFormatError(ValueError):
    pass


class OCRWord(NamedTuple):
    text: str
    x: int
    y: int
    w: int
    h: int

    @property
    def xywh(self) -> str:
        return f"{self.x},{self.y},{self.w},{self.h}"


def tagged_text(words: Iterator[OCRWord] | list[OCRWord], page_index: int) -> str:
    """Join words into the delimited-payload string: each token is
    ``{word}|n={page}&xywh={x,y,w,h}`` (urlencoded, commas safe),
    tokens joined by single spaces — exactly the reference's
    ``' '.join(get_tagged_ocr_text(...))`` (extracted_text.py:96,114-119).

    The reference builds the suffix with ``urlencode(..., safe=',')``;
    both values are integer-formatted (digits, ``-``, ``,`` — all
    URL-safe with commas exempted), so the encoder is the identity
    format and is inlined here (it was ~10% of the tagged route;
    equivalence is pinned by a hypothesis property in
    tests/test_tagged.py)."""
    return " ".join(f"{w.text}|n={page_index}&xywh={w.xywh}" for w in words)


# --------------------------------------------------------------------------
# ALTO
# --------------------------------------------------------------------------

def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def extract_alto_words(content: str | bytes, dpi: tuple[int, int] = (400, 400)) -> list[OCRWord]:
    """Parse ALTO XML ``<String>`` elements in document order.

    ``inch1200`` measurement units scale by ``dpi/1200`` per axis with
    round-to-nearest; ``pixel`` (or absent) is identity.
    """
    try:
        root = ET.fromstring(content)
    except ET.ParseError as e:
        # sniff said ALTO but it isn't well-formed XML — most likely an
        # ordinary page that merely mentions '<alto' → let the caller
        # fall back to the HTML route
        raise UnrecognizedOCRFormatError(f"not parseable as ALTO XML: {e}") from e
    if _localname(root.tag) != "alto":
        raise UnrecognizedOCRFormatError("not an ALTO document")
    unit = "pixel"
    for el in root.iter():
        if _localname(el.tag) == "MeasurementUnit" and el.text:
            unit = el.text.strip()
            break
    if unit == "inch1200":
        sx, sy = dpi[0] / 1200.0, dpi[1] / 1200.0
    else:
        sx = sy = 1.0
    words: list[OCRWord] = []
    for el in root.iter():
        if _localname(el.tag) != "String":
            continue
        a = el.attrib
        words.append(
            OCRWord(
                text=a.get("CONTENT", ""),
                x=round(int(a["HPOS"]) * sx),
                y=round(int(a["VPOS"]) * sy),
                w=round(int(a["WIDTH"]) * sx),
                h=round(int(a["HEIGHT"]) * sy),
            )
        )
    return words


# --------------------------------------------------------------------------
# hOCR
# --------------------------------------------------------------------------

_BBOX_RE = re.compile(r"bbox (\d+) (\d+) (\d+) (\d+)")

#: void elements inside hOCR markup (no end tag)
_HOCR_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _HOCRWordParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.words: list[OCRWord] = []
        self._depth = 0  # nesting depth inside the current ocrx_word span
        self._bbox: tuple[int, int, int, int] | None = None
        self._buf: list[str] = []
        self.seen_page = False

    def handle_starttag(self, tag, attrs):
        if tag in _HOCR_VOID_TAGS:
            return  # <br>/<img> have no end tag — must not unbalance depth
        amap = dict(attrs)
        cls = amap.get("class", "")
        if "ocr_page" in cls:
            self.seen_page = True
        if self._depth:
            self._depth += 1
            return
        if "ocrx_word" in cls:
            m = _BBOX_RE.search(amap.get("title", "") or "")
            if m:
                x0, y0, x1, y1 = map(int, m.groups())
                self._bbox = (x0, y0, x1 - x0, y1 - y0)
                self._depth = 1
                self._buf = []

    def handle_endtag(self, tag):
        if tag in _HOCR_VOID_TAGS or not self._depth:
            return
        self._depth -= 1
        if self._depth == 0 and self._bbox is not None:
            x, y, w, h = self._bbox
            self.words.append(OCRWord("".join(self._buf), x, y, w, h))
            self._bbox = None

    def handle_data(self, data):
        if self._depth:
            self._buf.append(data)


def extract_hocr_words(content: str | bytes) -> list[OCRWord]:
    """Parse hOCR ``ocrx_word`` spans in document order. Word text is
    the span's inner text verbatim (nested ``<strong>``/``<em>`` kept,
    whitespace-only words kept — see the reference hOCR golden,
    tests/indexers/test_extracted_text.py:94-122)."""
    if isinstance(content, bytes):
        content = content.decode("utf-8")
    parser = _HOCRWordParser()
    parser.feed(content)
    parser.close()
    if not parser.seen_page and not parser.words:
        raise UnrecognizedOCRFormatError("no hOCR content found")
    return parser.words


# --------------------------------------------------------------------------
# OCR1 (engine-native synthetic format)
# --------------------------------------------------------------------------

OCR1_MAGIC = "OCR1"


def extract_ocr1_words(content: str | bytes) -> list[OCRWord]:
    if isinstance(content, bytes):
        content = content.decode("utf-8")
    lines = content.splitlines()
    if not lines or lines[0].strip() != OCR1_MAGIC:
        raise UnrecognizedOCRFormatError("missing OCR1 header")
    words = []
    for line in lines[1:]:
        if not line.strip():
            continue
        x, y, w, h, word = line.split("\t", 4)
        words.append(OCRWord(word, int(x), int(y), int(w), int(h)))
    return words


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------

def detect_ocr_format(content: str | bytes) -> str:
    head = content[:4096]
    if isinstance(head, bytes):
        head = head.decode("utf-8", errors="replace")
    stripped = head.lstrip()
    if stripped.startswith(OCR1_MAGIC):
        return "ocr1"
    if "<alto" in head:
        return "alto"
    if "ocrx_word" in head or "ocr-system" in head or "ocr_page" in head:
        return "hocr"
    raise UnrecognizedOCRFormatError("unsupported extracted text document")


def extract_tagged_words(
    content: str | bytes, dpi: tuple[int, int] = (400, 400)
) -> list[OCRWord]:
    """Auto-detecting front door (reference analog: plastron's
    ``get_ocr_resource`` dispatch used at extracted_text.py:89-99)."""
    fmt = detect_ocr_format(content)
    if fmt == "alto":
        return extract_alto_words(content, dpi=dpi)
    if fmt == "hocr":
        return extract_hocr_words(content)
    return extract_ocr1_words(content)
