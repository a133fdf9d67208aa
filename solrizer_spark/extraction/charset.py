"""Charset sniffing + rescue decode for web-page payloads.

The reference decodes binary payloads with a strict UTF-8 ``.decode()``
(reference src/solrizer/indexers/extracted_text.py:105-107, operating on
an already-decoded ``str`` fetched over HTTP where requests applied the
charset header). A Common-Crawl-style corpus has no such upstream
normalization: a real fraction of pages is windows-1252 / shift_jis /
gb18030 / utf-16, and a strict-UTF-8-only engine silently drops them as
``decode_error``.

This module is a WHATWG-encoding-sniffing-*style* (not a full spec
implementation) prescan, pure stdlib:

1. **BOM** — UTF-8 / UTF-16LE / UTF-16BE byte-order marks win outright
   (https://encoding.spec.whatwg.org/#bom-sniff).
2. **meta prescan** — scan the first :data:`PRESCAN_BYTES` bytes for
   ``<meta charset=...>`` or
   ``<meta http-equiv=content-type content="...charset=...">``, or an
   XML declaration ``<?xml ... encoding="...">``. The prescan operates
   on the raw bytes (ASCII-compatible encodings declare themselves in
   ASCII).
3. **label normalization** — a small WHATWG-alias table maps declared
   labels to Python codecs; per the spec, ``latin-1``/``ascii``-family
   labels mean windows-1252 on the web, and a meta-declared UTF-16 is
   treated as UTF-8 (a document readable by the ASCII prescan is not
   actually UTF-16).

The engine policy (:func:`decode_html_bytes`) is **strict-first**:
a payload that decodes as strict UTF-8 is returned unchanged, so every
byte-identity golden against the reference fixtures is untouched; the
sniffer only engages as a *rescue* after strict UTF-8 fails, and the
final windows-1252 fallback cannot fail (every byte sequence is valid
cp1252 under ``errors="replace"``), so the rescue path never raises.
"""
from __future__ import annotations

import re

#: bytes examined by the meta prescan (WHATWG uses 1024; we allow a
#: little slack for byte-bloated attribute soup before the declaration)
PRESCAN_BYTES = 2048

#: WHATWG-style label → Python codec. Keys are lower-cased, trimmed
#: labels as they appear on the web; values are Python codec names.
#: (subset: the labels that actually occur at non-trivial rates in
#: Common Crawl charset surveys)
_LABELS = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    # WHATWG: the whole latin-1 / ascii family means windows-1252
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "x-user-defined": "windows-1252",
    "iso-8859-2": "iso-8859-2",
    "iso-8859-15": "iso-8859-15",
    "windows-1250": "windows-1250",
    "windows-1251": "windows-1251",
    "cp1251": "windows-1251",
    "koi8-r": "koi8-r",
    "windows-1254": "windows-1254",
    "windows-1256": "windows-1256",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "euc-jp": "euc_jp",
    "iso-2022-jp": "iso2022_jp",
    # WHATWG maps gb2312/gbk onto the GBK decoder; gb18030 supersets it
    "gb2312": "gb18030",
    "gbk": "gb18030",
    "gb18030": "gb18030",
    "big5": "big5",
    "euc-kr": "euc_kr",
    "ks_c_5601-1987": "euc_kr",
    "tis-620": "cp874",
    "windows-874": "cp874",
}

# attribute-value charset declarations; raw-byte regexes so the prescan
# never needs a decode. Three forms:
#   <meta charset="utf-8">
#   <meta http-equiv="Content-Type" content="text/html; charset=utf-8">
#   <?xml version="1.0" encoding="ISO-8859-1"?>
_META_CHARSET = re.compile(
    rb"""<meta[^>]{0,%d}?charset\s*=\s*["']?\s*([a-zA-Z0-9._:-]{2,32})""" % 256,
    re.IGNORECASE,
)
_XML_DECL = re.compile(
    rb"""^\s*<\?xml[^>]{0,256}?encoding\s*=\s*["']([a-zA-Z0-9._:-]{2,32})["']""",
    re.IGNORECASE,
)
# WHATWG's prescan SKIPS comments — a charset declaration inside
# <!-- --> must not win. Closed comments are removed before the meta
# search; an UNCLOSED comment truncates the scannable head (everything
# after it is inside the comment as far as a streaming prescan knows).
_COMMENT = re.compile(rb"<!--.*?-->", re.DOTALL)
_OPEN_COMMENT = re.compile(rb"<!--")


def normalize_label(label: str) -> str | None:
    """Declared charset label → Python codec name, or None if unknown."""
    return _LABELS.get(label.strip().strip("\"'").lower())


def sniff_charset(payload: bytes) -> tuple[str | None, str]:
    """Return ``(python_codec | None, source)`` for a raw payload.

    ``source`` is one of ``"bom"``, ``"xml_decl"``, ``"meta"``,
    ``"none"`` — recorded so extraction metrics can report *why* an
    encoding was chosen, not just which.
    """
    if payload.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig", "bom"
    if payload.startswith(b"\xff\xfe") or payload.startswith(b"\xfe\xff"):
        # Python's endian-agnostic "utf-16" codec consumes the BOM
        # itself (and strips it), so one codec covers both marks
        return "utf-16", "bom"
    head = payload[:PRESCAN_BYTES]
    head = _COMMENT.sub(b"", head)
    m = _OPEN_COMMENT.search(head)
    if m is not None:
        head = head[: m.start()]
    m = _XML_DECL.match(head)
    if m is not None:
        codec = normalize_label(m.group(1).decode("ascii", "replace"))
        if codec is not None:
            return codec, "xml_decl"
    m = _META_CHARSET.search(head)
    if m is not None:
        codec = normalize_label(m.group(1).decode("ascii", "replace"))
        # WHATWG: a meta-declared UTF-16 on a prescannable (ASCII-
        # compatible) byte stream is a lie; the spec substitutes UTF-8
        if codec in ("utf-16-le", "utf-16-be"):
            codec = "utf-8"
        if codec is not None:
            return codec, "meta"
    return None, "none"


def decode_html_bytes(
    payload: bytes, http_charset: str | None = None
) -> tuple[str, str, str]:
    """Decode a web payload; never raises.

    Returns ``(text, encoding, source)`` where ``source`` is
    ``"strict"`` (plain strict UTF-8 — the reference-identical fast
    path), ``"bom"`` / ``"http"`` / ``"xml_decl"`` / ``"meta"``
    (rescued), or ``"fallback"`` (windows-1252 with replacement —
    cannot fail). Strict UTF-8 is tried FIRST so every valid-UTF-8
    payload — including all reference fixtures — round-trips
    byte-identically to the reference's own ``.decode()``.

    ``http_charset`` is the transport-layer label from the HTTP
    ``Content-Type`` header (WARC ingest surfaces it as the
    ``http_charset`` column). WHATWG precedence among the rescue
    sources: BOM beats the header, the header beats the in-document
    meta/xml declaration.
    """
    try:
        return payload.decode("utf-8"), "utf-8", "strict"
    except UnicodeDecodeError:
        pass
    candidates: list[tuple[str, str]] = []
    codec, source = sniff_charset(payload)
    if codec is not None and source == "bom":
        candidates.append((codec, source))
    if http_charset:
        header_codec = normalize_label(http_charset)
        if header_codec is not None:
            candidates.append((header_codec, "http"))
    if codec is not None and source != "bom":
        candidates.append((codec, source))
    for cand, src in candidates:
        if cand in ("utf-8", "utf-8-sig"):
            # strict UTF-8 already failed; a utf-8-labeled candidate
            # cannot succeed (utf-8-sig shares the body decoder)
            continue
        try:
            return payload.decode(cand), cand, src
        except (UnicodeDecodeError, LookupError):
            continue  # lying label → next source down the ladder
    return payload.decode("windows-1252", errors="replace"), "windows-1252", "fallback"
