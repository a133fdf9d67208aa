"""C kernel (cscan) parity + contract tests.

The compiled backend must be bit-identical to the stdlib backend on
every input it accepts, and must BAIL (return None → fused fallback)
on the documented constructs whose semantics depend on Python Unicode
behavior. The broader adversarial/corpus/hypothesis parity suite in
test_fastscan_parity.py also runs over this backend; this file adds
the cscan-specific surface: the bail contract, the regex-backtracking
shapes that broke the first cut (unterminated quoted values), charref
edge semantics, and a seeded differential fuzz heavy on the C-risky
alphabet (Unicode whitespace, case-fold letters, multi-byte text).
"""

from __future__ import annotations

import random

import pytest

from solrizer_spark.extraction.html_text import extract_html

cscan = pytest.importorskip("solrizer_spark.extraction.cscan")

pytestmark = pytest.mark.skipif(
    not cscan.load(), reason="no C toolchain on this image"
)


def _key(r):
    return (
        r.raw_text, r.title, r.parse_failed, r.error,
        [
            (b.block_index, b.tag_path, b.text, b.n_chars, b.n_words,
             b.link_chars, b.link_density, b.text_density,
             b.in_boilerplate_container, b.kept)
            for b in r.blocks
        ],
    )


def assert_c_parity(payload):
    assert _key(extract_html(payload, backend="stdlib")) == _key(
        extract_html(payload, backend="c")
    ), f"c backend divergence on {payload!r:.200}"


# ---------------------------------------------------------------------
# bail contract: None from run_cscan, correct result via fallback
# ---------------------------------------------------------------------

BAIL_CASES = [
    "<![CDATA[x]]><p>after</p>",          # marked section
    "<![if gte mso 9]>ms<![endif]>x",
    "<pä>non-ascii tag name</pä>",        # str.lower() parity risk
    "<script>x</ſcript>y</script>z",      # case-fold cdata close risk
]


@pytest.mark.parametrize("payload", BAIL_CASES, ids=range(len(BAIL_CASES)))
def test_bail_cases_fall_back_correctly(payload):
    assert cscan.run_cscan(payload) is None
    assert_c_parity(payload)              # backend='c' fused fallback


def test_common_documents_do_not_bail():
    html = (
        "<html><head><title>T &amp; t</title></head><body>"
        "<nav><a href='/'>Home</a></nav>"
        "<p>body &#65; text with <a href='x'>a link</a> here</p>"
        "<script>var x = '<p>no</p>';</script>"
        "<!-- c --><br/><img src=x></body></html>"
    )
    assert cscan.run_cscan(html) is not None


def test_lone_surrogate_strings_bail():
    assert cscan.run_cscan("a\ud800b") is None


# ---------------------------------------------------------------------
# regex-backtracking shapes (the stdlib engine gives back =+ / \s*)
# ---------------------------------------------------------------------

BACKTRACK = [
    '<s y==">',            # =+ gives back one '=': bare value '="'
    '<s y== ">',           # value at the quote fails, space backs off
    '<a b= \'>x',          # single '=', space, unterminated quote
    '<a b="unterminated',  # value group matches empty → incomplete tag
    "<a b=''>ok</a>",
    '<a b=="">d</a>',
    "<a b=c,,, d=e>f</a>", # locatestarttagend's (?:\s*,)* tail
    "<a b==c>x</a>",
    '<a b\xa0=\xa0"v">unicode-space around =</a>',
]


@pytest.mark.parametrize("payload", BACKTRACK, ids=range(len(BACKTRACK)))
def test_value_group_backtracking(payload):
    assert_c_parity(payload)


# ---------------------------------------------------------------------
# charref semantics
# ---------------------------------------------------------------------

CHARREFS = [
    "&amp; &lt; &#65; &#x41; &#X41;",
    "&notin; &notareal; &times &timesb;",      # longest-prefix fallback
    "&CounterClockwiseContourIntegral; end",   # longest key
    "&#0; &#13; &#128; &#x9f;",                # windows-1252 remap
    "&#xD800; &#x110000; &#999999999999999999;",  # surrogate/oob/overflow
    "&#1; &#11;",                              # invalid → ''
    "&#000000000065;",                         # leading zeros
    "&aacute &aacuteX &ampamp",                # no-semicolon forms
    "&acE; &acE x",
    "&thetasym; &ThickSpace;",                 # multi-cp value
    "&fakelongentitynamethatisnotreal;",
    "&" + "a" * 40 + ";",                      # past the 32-cp cap
    "a & b &; &#; &#x;",
]


@pytest.mark.parametrize("payload", CHARREFS, ids=range(len(CHARREFS)))
def test_charref_parity(payload):
    assert_c_parity("<p>" + payload + "</p>")


# ---------------------------------------------------------------------
# seeded differential fuzz, C-risky alphabet (runs ~10k cases)
# ---------------------------------------------------------------------

_FRAGS = [
    "<p>", "</p>", "<div>", "</div>", "<a href='x'>", "<a>", "</a>", "<A>",
    "<script>", "</script>", "</SCRIPT>", "<style>", "</style>", "<title>",
    "</title>", "<br>", "<br/>", "<br />", "<img src=x>", "<!-- c -->",
    "<!--", "-->", "<!-- a>b -->", "<!DOCTYPE html>", "<![CDATA[", "]]>",
    "<?pi?>", "<!x>", "</>", "</ p>", "text", " words here ", "&amp;",
    "&#65;", "&bogus;", "&", "&#", "&#x", "&notin;", "&times", "&#0;",
    "&#xD800;", "&aacute", "<", ">", "'", '"', "/", "=", " ", "\n", "\t",
    "\r", "\f", "\v", "a<b", "x=y", "<nav>", "</nav>", "<li>", "</li>",
    "é", "—", "\xa0", " ", "　", "\x1c", "\x85", "ſ", "İ", "K",
    "日本", "<a\xa0href=x>", "</\xa0p>", "<p\xa0>", "<a href=x/>",
    "<a x/y>", "<a 'n'>", "<a =v>", "<a b=>", "<a b=c,>", "<a b==c>",
    "<a b = c>", "<a b=='>", '<a b== ">', "<a b= '>", "<hr/>",
]

_ALPHA = "<>&;!?/='\"ab -#x[]\xa0ſKé \t\n\rcript styleSCRIPT!-"


def test_seeded_fragment_fuzz():
    rng = random.Random(0xC5CA)
    for _ in range(6000):
        s = "".join(rng.choice(_FRAGS) for _ in range(rng.randint(0, 25)))
        assert_c_parity(s)


def test_seeded_raw_fuzz():
    rng = random.Random(0xC5CB)
    for _ in range(4000):
        s = "".join(rng.choice(_ALPHA) for _ in range(rng.randint(0, 80)))
        assert_c_parity(s)


# ---------------------------------------------------------------------
# backend selection
# ---------------------------------------------------------------------

def test_auto_resolves_to_c_here():
    # on this image a toolchain exists, so auto == c; the assertion is
    # indirect: the default path must produce the same result object
    # shape and values as the explicit c backend
    doc = "<p><a href='x'>one two</a> three &amp; four</p>"
    assert _key(extract_html(doc)) == _key(extract_html(doc, backend="c"))


def test_strict_c_backend_errors_without_toolchain(monkeypatch):
    import solrizer_spark.extraction.cscan as m

    monkeypatch.setattr(m, "_lib", None)
    monkeypatch.setattr(m, "HAVE_CSCAN", False)
    monkeypatch.setattr(m, "build_library", lambda force=False: None)
    with pytest.raises(ImportError, match="cannot be built"):
        extract_html("<p>x</p>", backend="c")
    # auto degrades silently to the Python kernel
    r = extract_html("<p>x</p>", backend="auto")
    assert not r.parse_failed and r.raw_text == "x"
