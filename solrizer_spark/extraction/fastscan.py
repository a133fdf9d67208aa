"""Fast single-shot HTML event scanner — stdlib-``HTMLParser``-exact.

``scan(text, sink)`` emits the same event stream that
``html.parser.HTMLParser(convert_charrefs=True)`` produces for
``feed(text); close()`` — same tags, same data chunks, same chunk
*boundaries* (block link-char accounting depends on them) — but skips
everything the extraction kernel never uses: attribute parsing,
line/offset tracking (``updatepos``), incremental-feed buffering, and
the ``__starttag_text`` slice. On the benchmark corpus this is the
majority of kernel CPU (see ``tools/kernel_bench.py``).

Parity contract: for every input, the ``_Extractor`` state driven by
``scan`` must equal the one driven by the stdlib parser. This is
pinned by the reference-fixture goldens (byte identity) plus a
differential fuzz suite (``tests/test_fastscan_parity.py``) that
compares full ``ExtractionResult`` equality against the stdlib
backend on adversarial and corpus inputs. The scanner intentionally
reuses the stdlib module's own compiled regexes (``tagfind_tolerant``,
``locatestarttagend_tolerant``, ``endtagfind``, ``commentclose``) so
tag-boundary decisions cannot drift from the reference semantics.

The sink protocol is four methods (``_on_start``, ``_on_end``,
``_on_startend``, ``_on_data``); see ``html_text._ExtractorState``.

Known deliberate non-replications (unreachable or quarantined paths):

* a start tag whose ``locatestarttagend`` span ends in ``>`` but whose
  attribute re-parse would *not* strip to ``>``/``/>`` (stdlib emits
  the raw tag text as data) — requires the two stdlib regexes to
  disagree, which the fuzz suite has not produced;
* invalid marked sections (``<![bogus ...``) raise ``AssertionError``
  in both implementations but with different messages; callers only
  see ``parse_failed=True``.
"""

from __future__ import annotations

import re
from html import unescape

# stdlib's own tag-boundary regexes: reusing them (public stdlib
# source, html/parser.py) keeps boundary decisions byte-identical.
from html.parser import (  # type: ignore[attr-defined]
    attrfind_tolerant,
    commentclose,
    endtagfind,
    locatestarttagend_tolerant,
    tagfind_tolerant,
)

__all__ = ["scan"]

_declname_match = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*").match
_markedsectionclose = re.compile(r"]\s*]\s*>")
_msmarkedsectionclose = re.compile(r"]\s*>")
_cdata_close = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}
# characters after a locatestarttagend match that mean "incomplete
# start tag at end of buffer" in check_for_whole_start_tag
_INCOMPLETE_NEXT = frozenset("abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ")

_MARKED_STD = frozenset({"temp", "cdata", "ignore", "include", "rcdata"})
_MARKED_MS = frozenset({"if", "else", "endif"})


def scan(s: str, sink) -> None:
    """Emit the stdlib-equivalent event stream for one full document."""
    n = len(s)
    i = 0
    cdata: str | None = None  # open script/style element, else None
    find = s.find
    startswith = s.startswith
    on_data = sink._on_data
    on_start = sink._on_start
    on_end = sink._on_end
    tagmatch = tagfind_tolerant.match
    startmatch = locatestarttagend_tolerant.match
    while i < n:
        # ---- text run up to the next markup boundary -----------------
        if cdata is None:
            j = find("<", i)
            if j < 0:
                chunk = s[i:]
                on_data(unescape(chunk) if "&" in chunk else chunk)
                return
            if i < j:
                chunk = s[i:j]
                on_data(unescape(chunk) if "&" in chunk else chunk)
            i = j
        else:
            m = _cdata_close[cdata].search(s, i)
            if m is None:
                # unterminated script/style: stdlib drops the tail
                return
            j = m.start()
            if i < j:
                on_data(s[i:j])  # raw: no charref conversion in CDATA
            i = j

        # ---- dispatch at '<' (same order as HTMLParser.goahead) ------
        c = s[i + 1 : i + 2]
        if c.isalpha() and c.isascii():
            # start tag (never reached in cdata mode: the cdata search
            # only stops at '</')
            m = startmatch(s, i)
            j = m.end()
            nxt = s[j : j + 1]
            if nxt == ">":
                if s[j - 1] == "/":
                    # trailing '/' consumed by the boundary regex: only
                    # the exact attribute re-scan can tell '<br/>'
                    # (startendtag) from '<a href=foo/>' (the '/' is
                    # part of a bare value → plain starttag). Rare path.
                    opened = _exact_starttag(s, i, j + 1, sink)
                    if opened in _cdata_close:
                        cdata = opened
                    i = j + 1
                else:
                    tag = tagmatch(s, i + 1).group(1).lower()
                    on_start(tag)
                    if tag in _cdata_close:
                        cdata = tag
                    i = j + 1
            elif nxt == "/":
                if startswith("/>", j):
                    opened = _exact_starttag(s, i, j + 2, sink)
                    if opened in _cdata_close:
                        cdata = opened
                    i = j + 2
                else:
                    i = _eof_recover(s, i, cdata, on_data)
            elif nxt == "" or nxt in _INCOMPLETE_NEXT:
                i = _eof_recover(s, i, cdata, on_data)
            else:
                # bogus start tag: stdlib re-emits the raw slice as data
                endpos = j if j > i else i + 1
                on_data(s[i:endpos])
                i = endpos
        elif c == "/":
            m = endtagfind.match(s, i)  # common case: </name>
            if m:
                elem = m.group(1).lower()
                if cdata is not None and elem != cdata:
                    on_data(s[i : m.end()])  # foreign end tag inside CDATA
                else:
                    on_end(elem)
                    cdata = None
                i = m.end()
                continue
            gt = find(">", i + 1)
            if gt < 0:
                i = _eof_recover(s, i, cdata, on_data)
                continue
            if cdata is not None:
                on_data(s[i : gt + 1])  # raw, stays in CDATA
                i = gt + 1
                continue
            nm = tagmatch(s, i + 2)
            if nm is None:
                if startswith("</>", i):
                    i += 3
                else:  # bogus comment </... > : swallowed
                    i = gt + 1
            else:
                on_end(nm.group(1).lower())
                i = find(">", nm.end()) + 1  # '>' exists past the name
        elif startswith("<!--", i):
            m = commentclose.search(s, i + 4)
            i = m.end() if m else _eof_recover(s, i, cdata, on_data)
        elif c == "?":
            gt = find(">", i + 2)
            i = gt + 1 if gt >= 0 else _eof_recover(s, i, cdata, on_data)
        elif c == "!":
            if startswith("<![", i):
                if i + 3 == n:
                    i = _eof_recover(s, i, cdata, on_data)
                    continue
                nm = _declname_match(s, i + 3)
                if nm is None:
                    raise AssertionError("expected name token in marked section")
                if nm.end() == n:
                    i = _eof_recover(s, i, cdata, on_data)
                    continue
                name = nm.group().strip().lower()
                if name in _MARKED_STD:
                    m = _markedsectionclose.search(s, i + 3)
                elif name in _MARKED_MS:
                    m = _msmarkedsectionclose.search(s, i + 3)
                else:
                    raise AssertionError(f"unknown status keyword {name!r} in marked section")
                i = m.end() if m else _eof_recover(s, i, cdata, on_data)
            elif s[i : i + 9].lower() == "<!doctype":
                gt = find(">", i + 9)
                i = gt + 1 if gt >= 0 else _eof_recover(s, i, cdata, on_data)
            else:  # bogus comment <!... >
                gt = find(">", i + 2)
                i = gt + 1 if gt >= 0 else _eof_recover(s, i, cdata, on_data)
        elif i + 1 < n:
            on_data("<")  # lone '<' is its own data chunk (stdlib parity)
            i += 1
        else:
            on_data("<")  # trailing '<' at EOF, flushed by goahead(end=1)
            return


def _exact_starttag(s: str, i: int, endpos: int, sink) -> str | None:
    """Exact ``HTMLParser.parse_starttag`` tail for the ambiguous
    trailing-slash cases: re-scan attributes with the stdlib's own
    ``attrfind_tolerant`` to locate ``k`` (end of attrs), then dispatch
    on ``rawdata[k:endpos].strip()`` exactly like the stdlib —
    ``'>'`` → starttag, ``'/>'`` → startendtag, anything else → the
    raw tag slice re-emitted as data. Returns the tag name iff a plain
    starttag was emitted (caller handles CDATA-mode entry)."""
    m = tagfind_tolerant.match(s, i + 1)
    tag = m.group(1).lower()
    k = m.end()
    while k < endpos:
        am = attrfind_tolerant.match(s, k)
        if not am:
            break
        k = am.end()
    end = s[k:endpos].strip()
    if end == ">":
        sink._on_start(tag)
        return tag
    if end == "/>":
        sink._on_startend(tag)
        return None
    sink._on_data(s[i:endpos])  # bogus tag: stdlib re-emits raw slice
    return None


def _eof_recover(s: str, i: int, cdata: str | None, on_data) -> int:
    """HTMLParser.goahead(end=1) recovery for an unterminated construct:
    swallow through the next '>', else to the next '<', else one char,
    re-emitting the slice as data (charref-converted outside CDATA)."""
    k = s.find(">", i + 1)
    if k < 0:
        k = s.find("<", i + 1)
        if k < 0:
            k = i + 1
    else:
        k += 1
    chunk = s[i:k]
    if cdata is None and "&" in chunk:
        chunk = unescape(chunk)
    on_data(chunk)
    return k
