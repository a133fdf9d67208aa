"""Minimal stdlib PDF text extraction — the binary-PDF route of the
extraction dispatch (north rule: "HTML boilerplate strip, PDF/layout
parse"; the layout half is `tagged.py`, this is the native-PDF half).

Spark-free kernel, stdlib only (``zlib`` provides FlateDecode).
Scope, documented honestly:

* content streams stored plain or FlateDecode-compressed (the
  overwhelming default for text PDFs) — each stream body is simply
  TRIED against ``zlib.decompress``, so no dictionary parsing can
  mis-identify a filter;
* text-showing operators ``Tj``, ``'``, ``"`` and ``TJ`` arrays with
  literal ``(...)`` strings (balanced parens + backslash escapes per
  spec) and hex ``<...>`` strings decoded as Latin-1;
* newline heuristics: ``T*``, the ``'``/``"`` next-line operators and
  ``ET`` end a line — kerning numbers inside ``TJ`` are ignored;
* NOT handled (returns whatever text is recoverable): CID/Type0 fonts
  needing a ToUnicode CMap, encrypted documents, LZW/other filters,
  object streams. At corpus scale these route to ``parse_failed``
  metrics rather than crashing the job — the kernel never raises.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_TITLE_RE = re.compile(rb"/Title\s*\(((?:\\.|[^()\\])*)\)", re.S)

#: octal / single-char escapes in PDF literal strings (spec 7.3.4.2)
_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _parse_literal(data: bytes, i: int) -> tuple[str, int]:
    """Parse a literal string starting at ``data[i] == '('``; returns
    (text, index just past the closing paren). Balanced unescaped
    parens nest per the spec."""
    out: list[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth > 0:
        c = data[i : i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = data[i + 1 : i + 2]
            if nxt in b"01234567":  # octal escape, up to 3 digits
                j = i + 1
                while j < min(i + 4, n) and data[j : j + 1] in b"01234567":
                    j += 1
                out.append(chr(int(data[i + 1 : j], 8) & 0xFF))
                i = j
                continue
            if nxt in (b"\r", b"\n"):  # line continuation: no output;
                i += 2  # CRLF counts as ONE end-of-line (spec 7.3.4.2)
                if nxt == b"\r" and data[i : i + 1] == b"\n":
                    i += 1
                continue
            out.append(_ESCAPES.get(nxt, nxt.decode("latin-1")))
            i += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                i += 1
                break
        if depth > 0:
            out.append(c.decode("latin-1"))
        i += 1
    return "".join(out), i


def _content_text(stream: bytes) -> list[str]:
    """Text pieces shown by one content stream, in stream order."""
    pieces: list[str] = []
    pending: list[str] = []
    i = 0
    n = len(stream)
    while i < n:
        c = stream[i : i + 1]
        if c == b"(":
            s, i = _parse_literal(stream, i)
            pending.append(s)
            continue
        if c == b"<" and stream[i + 1 : i + 2] != b"<":
            end = stream.find(b">", i + 1)
            if end == -1:
                break
            hx = re.sub(rb"\s", b"", stream[i + 1 : end])
            if len(hx) % 2:
                hx += b"0"
            try:
                pending.append(bytes.fromhex(hx.decode("ascii")).decode("latin-1"))
            except ValueError:
                pass
            i = end + 1
            continue
        if c.isalpha() or c in (b"'", b'"', b"*"):
            j = i
            while j < n and (stream[j : j + 1].isalpha() or stream[j : j + 1] in (b"'", b'"', b"*")):
                j += 1
            op = stream[i:j]
            if op in (b"Tj", b"TJ"):
                pieces.extend(pending)
            elif op in (b"'", b'"'):
                pieces.append("\n")
                pieces.extend(pending)
            elif op in (b"T*",):
                pieces.append("\n")
            elif op == b"ET":
                pieces.append("\n")
            pending.clear()
            i = j
            continue
        if c in (b"[", b"]"):
            i += 1  # TJ arrays: keep pending across the brackets
            continue
        if c == b"<":  # '<<' dict open
            i += 2
            pending.clear()
            continue
        i += 1
    return pieces


def extract_pdf_text(data: bytes | None) -> str:
    """All recoverable shown text of a PDF, stream order, lines per
    the newline heuristics above. Empty string when nothing is
    recoverable; never raises."""
    if not data:
        return ""
    out: list[str] = []
    for m in _STREAM_RE.finditer(data):
        body = m.group(1)
        try:
            # decompressobj ignores trailing bytes (the EOL before
            # 'endstream') — plain decompress on a stripped body can
            # corrupt streams whose zlib data itself ends in 0x0a/0x0d
            inflated = zlib.decompressobj().decompress(body)
            if inflated:
                body = inflated
        except zlib.error:
            pass  # stored uncompressed (or an image stream)
        try:
            out.extend(_content_text(body))
        except Exception:
            continue  # one bad stream must not discard the others
    text = "".join(out)
    # collapse the ET/T* newline runs; strip edges
    return re.sub(r"\n{2,}", "\n", text).strip()


def pdf_title(data: bytes | None) -> str | None:
    """``/Title (...)`` from the document info dictionary, unescaped;
    None when absent."""
    if not data:
        return None
    try:
        m = _TITLE_RE.search(data)
        if not m:
            return None
        text, _ = _parse_literal(b"(" + m.group(1) + b")", 0)
    except Exception:
        return None
    return text or None
