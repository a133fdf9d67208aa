"""Deterministic synthetic pages-corpus generator (no external data).

Emits the authoritative input shape from BASELINE.json ``input_hint``:
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)`` plus a ``golden`` side table with the *independently
constructed* expected extraction results per url — the test oracle is
the construction itself, never the extractor.

Payload classes follow FIXTURES.md §1 (reference fixture analogs in
parentheses):

=====  ==================  ==========================================
i%10   class               notes
=====  ==================  ==========================================
0-2    boilerplate-html    nav + link farm + article + footer; main-
                           content route; keep/drop pinned (class 2)
3-4    simple-html         markup-strip route, shaped like the
                           reference's ``text.html`` (class 1)
5      multi-block         h1 + ≥3 paragraphs, ordering pinned
                           (class 6)
6      plain-text          ``html`` null, ``text`` populated
                           (class 3)
7      tagged-payload      OCR1 word+bbox payload → ``word|n=…&xywh``
                           tokens (class 4)
8      entity-html         boilerplate page whose content exercises
                           entity decoding (&amp;, &eacute;, &#x2014;)
9      malformed           empty/invalid-utf8/binary junk → parse-
                           failure metrics row (class 5)
=====  ==================  ==========================================

Domain skew: ~30% of urls land on 3 "mega" domains (FIXTURES.md), so
the salted url-hash repartition has real skew to defuse.

Determinism: every row is a pure function of ``(seed, i)`` via its own
``random.Random`` instance — generation order, chunking, and process
count cannot change content.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

GOLDEN_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("payload_class", pa.string()),
        pa.field("expected_text", pa.string()),
        pa.field("expected_title", pa.string()),
        pa.field("expect_parse_failed", pa.bool_()),
        pa.field("tagged", pa.bool_()),
    ]
)

_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu amber basalt cedar dune ember fjord grove harbor inlet "
    "jetty knoll lagoon mesa"
).split()

_LANGS = ["en", "en", "en", "en", "de", "es", "fr", "zh", "ger", "jpn", "en-US", "ja-Latn"]

_MEGA_DOMAINS = ["mega0.example.org", "mega1.example.org", "mega2.example.org"]

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _link_dst(i: int, k: int) -> str:
    """Cross-site link-farm target for page ``i``, slot ``k`` — pure
    ``(i, k)`` arithmetic so the per-page ``rng`` stream (and with it
    every byte-stable golden) is untouched. Targets are DISTINCT
    registrable domains (the corpus's own page hosts all collapse to
    the two eTLD+1s ``example.com``/``example.org``, which would
    yield a 2-node host graph): slot 0 always hits one of 3 hub
    domains (power-law in-link skew for pagerank); other even slots
    spread over a 1000-domain long tail."""
    if k == 0:
        return f"https://hub{i % 3}.example-hub{i % 3}.net/page/{(i * 7) % 1000}"
    n = (i * 31 + k * 127) % 1000
    return f"https://ext{n}.example-ext{n}.net/page/{(i + k) % 1000}"


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_VOCAB) for _ in range(n))


def _sentence(rng: random.Random, n: int) -> str:
    s = _words(rng, n)
    return s[0].upper() + s[1:] + "."


def generate_page(
    i: int, seed: int = 42, size_factor: int = 1, pdf_class: bool = False
) -> tuple[dict, dict]:
    """Pure function (seed, i, size_factor) → (pages row, golden row).

    ``size_factor`` scales the paragraph count of HTML payload classes
    (~500 B pages at 1; ~8 KB at 16) so benchmarks can exercise
    realistic Common-Crawl page sizes and the Arrow batch cap without
    touching the golden contract (expectations are computed from the
    same construction). ``pdf_class=True`` (opt-in; the default keeps
    every historical golden byte-stable) turns class 4 into a
    FlateDecode binary-PDF payload exercising the ``pdf`` route."""
    rng = random.Random(f"{seed}:{i}")
    if rng.random() < 0.30:
        domain = _MEGA_DOMAINS[i % len(_MEGA_DOMAINS)]
    else:
        domain = f"site{rng.randrange(10000)}.example.com"
    url = f"https://{domain}/page/{i}"
    warc_ts = _EPOCH + timedelta(seconds=(i * 37) % 31_536_000)
    lang = _LANGS[i % len(_LANGS)]
    cls = i % 10

    html: bytes | None = None
    text: str | None = None
    expected: str | None = None
    title: str | None = None
    failed = False
    tagged = False

    if cls in (0, 1, 2, 8):
        payload_class = "boilerplate-html" if cls != 8 else "entity-html"
        title = f"Article {i} " + _words(rng, 2)
        paras = [
            _sentence(rng, rng.randrange(8, 20))
            for _ in range(rng.randrange(2, 5) * size_factor)
        ]
        if cls == 8:
            paras[0] = f"Café & bar — review {i}: " + paras[0]
        para_html = "".join(
            "<p>"
            + p.replace("&", "&amp;").replace("<", "&lt;").replace("é", "&eacute;").replace("—", "&#x2014;")
            + "</p>\n"
            for p in paras
        )
        nav = '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>'
        # Even link-farm slots point at OTHER sites (dst drawn from
        # (i, k) arithmetic, NOT rng — extra rng draws would perturb
        # the byte-stable goldens of later fields) so generated
        # corpora carry a non-empty host graph: mega-domains take the
        # k=0 slot on every page → realistic in-link skew for
        # host_edges/pagerank; odd slots stay site-relative. href
        # values never reach extraction output (only anchor text
        # does), so every extraction golden is unchanged.
        farm = (
            '<div class="links">'
            + " ".join(
                (
                    f'<a href="{_link_dst(i, k)}">{rng.choice(_VOCAB)}</a>'
                    if k % 2 == 0
                    else f'<a href="/t/{k}">{rng.choice(_VOCAB)}</a>'
                )
                for k in range(6)
            )
            + "</div>"
        )
        footer = f"<footer>Copyright 2026 {domain}</footer>"
        html = (
            f"<html><head><title>{title}</title></head><body>\n{nav}\n{farm}\n"
            f"<article>\n{para_html}</article>\n{footer}\n</body></html>"
        ).encode("utf-8")
        expected = "\n".join(paras)  # main-content route: kept blocks only
    elif cls == 4 and pdf_class:
        payload_class = "pdf"
        import zlib as _zlib

        title = f"Document {i}"
        pdf_lines = [_sentence(rng, rng.randrange(5, 10)) for _ in range(3)]
        content = "BT " + " T* ".join(f"({ln}) Tj" for ln in pdf_lines) + " ET"
        body = _zlib.compress(content.encode("latin-1"))
        html = (
            b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length "
            + str(len(body)).encode() + b" >>\nstream\n" + body
            + b"\nendstream\nendobj\n2 0 obj\n<< /Title ("
            + title.encode("latin-1") + b") >>\nendobj\ntrailer\n<< >>\n%%EOF\n"
        )
        expected = "\n".join(pdf_lines)
    elif cls in (3, 4):
        payload_class = "simple-html"
        w0 = rng.choice(_VOCAB).capitalize()
        tail = _words(rng, rng.randrange(4, 8))
        line2 = _sentence(rng, rng.randrange(4, 8))
        line3 = _words(rng, 3)
        html = (
            f"<html>\n<p></p><b>{w0}</b> {tail}\n<p>{line2}\n({line3})\n"
        ).encode("utf-8")
        # raw markup-strip route (no boilerplate ⇒ zero dropped blocks)
        expected = f"\n{w0} {tail}\n{line2}\n({line3})\n"
    elif cls == 5:
        payload_class = "multi-block"
        title = f"Report {i}"
        heading = _words(rng, 2).title()
        paras = [_sentence(rng, rng.randrange(6, 12)) for _ in range(3)]
        html = (
            f"<html><head><title>{title}</title></head><body>"
            f"<h1>{heading}</h1>"
            + "".join(f"<p>{p}</p>" for p in paras)
            + "</body></html>"
        ).encode("utf-8")
        # zero dropped blocks ⇒ raw route; tags are adjacent so raw text
        # is the straight concatenation of text nodes (title included,
        # matching BeautifulSoup get_text document-order semantics):
        expected = title + heading + "".join(paras)
    elif cls == 6:
        payload_class = "plain-text"
        text = _sentence(rng, 10) + "\n" + _sentence(rng, 8) + "\n"
        expected = text  # passthrough unaltered (extracted_text.py:109-111)
    elif cls == 7:
        payload_class = "tagged-payload"
        tagged = True
        n_words = rng.randrange(3, 9)
        lines = ["OCR1"]
        toks = []
        y = 100
        for j in range(n_words):
            w = rng.choice(_VOCAB)
            x = 50 + 120 * j
            wd, ht = 20 + 10 * len(w), 42
            lines.append(f"{x}\t{y}\t{wd}\t{ht}\t{w}")
            toks.append(f"{w}|n=0&xywh={x},{y},{wd},{ht}")
        html = ("\n".join(lines) + "\n").encode("utf-8")
        expected = " ".join(toks)
    else:
        # class 9: payloads that are NOT valid UTF-8. Variant 0 stays a
        # genuine failure (empty payload); variants 1-2 pin the charset
        # rescue ladder (extraction/charset.py) end-to-end: a declared
        # windows-1251 page recovered via the meta prescan, and
        # undeclared cp1252 high bytes recovered via the WHATWG floor —
        # both byte-exact against expectations computed from the same
        # construction, so a mis-decode anywhere hash-fails.
        variant = i % 3
        if variant == 0:
            payload_class = "malformed"
            failed = True
            html = b""
            expected = None
        elif variant == 1:
            payload_class = "cp1251-declared"
            line1 = "Привет мир " + _sentence(rng, rng.randrange(6, 10))
            line2 = _sentence(rng, rng.randrange(6, 10))
            html = (
                '<html><meta charset="windows-1251">\n'
                f"<p>{line1}</p>\n<p>{line2}</p>\n"
            ).encode("windows-1251")
            expected = f"\n{line1}\n{line2}\n"
        else:
            payload_class = "cp1252-undeclared"
            line1 = f"Café {_words(rng, rng.randrange(5, 9))} — résumé"
            line2 = _sentence(rng, rng.randrange(6, 10))
            html = (
                f"<html>\n<p>{line1}</p>\n<p>{line2}</p>\n"
            ).encode("windows-1252")
            expected = f"\n{line1}\n{line2}\n"

    page = {"url": url, "warc_ts": warc_ts.replace(tzinfo=None), "html": html, "text": text, "lang": lang}
    golden = {
        "url": url,
        "payload_class": payload_class,
        "expected_text": expected,
        "expected_title": title,
        "expect_parse_failed": failed,
        "tagged": tagged,
    }
    return page, golden


def write_corpus(
    path: str,
    n_pages: int = 1000,
    seed: int = 42,
    chunk_size: int = 25_000,
    size_factor: int = 1,
    pdf_class: bool = False,
) -> dict[str, str]:
    """Write ``{path}/pages/*.parquet`` and ``{path}/golden/*.parquet``.

    Chunked into multiple files so Spark gets file-level scan
    parallelism even before row-group splitting.
    """
    import os

    pages_dir = os.path.join(path, "pages")
    golden_dir = os.path.join(path, "golden")
    os.makedirs(pages_dir, exist_ok=True)
    os.makedirs(golden_dir, exist_ok=True)
    part = 0
    for start in range(0, n_pages, chunk_size):
        stop = min(start + chunk_size, n_pages)
        rows = [generate_page(i, seed, size_factor, pdf_class) for i in range(start, stop)]
        pages = pa.Table.from_pylist([r[0] for r in rows], schema=PAGES_SCHEMA)
        golden = pa.Table.from_pylist([r[1] for r in rows], schema=GOLDEN_SCHEMA)
        pq.write_table(pages, os.path.join(pages_dir, f"part-{part:05d}.parquet"))
        pq.write_table(golden, os.path.join(golden_dir, f"part-{part:05d}.parquet"))
        part += 1
    return {"pages": pages_dir, "golden": golden_dir}
