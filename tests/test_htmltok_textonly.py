"""Equivalence pin for the r6 text-only tokenizer fast path.

stream_fulltext now uses htmltok.tokenize_text, which must consume
exactly the spans tokenize() consumes and emit exactly its data-event
stream (including None fallbacks on the same inputs). Any divergence
breaks the byte-identity north rule, so we fuzz it against the full
tokenizer over the fixture corpus plus adversarial fragments.
"""

from __future__ import annotations

import random

from swspark.extract.htmltok import tokenize, tokenize_text

ADVERSARIAL = [
    "",
    "plain text only",
    "a < b and c > d",
    "<p>hello</p>",
    "<p class='x'>a<b>c</b></p>",
    '<a href="x>y">quoted gt</a>',
    "<a href='x>y' title=\"z>w\">both</a>",
    "<br/><hr />text",
    "<script>var x = '<p>not a tag</p>';</script>after",
    "<script>unterminated",
    "<style>p { color: red; }</style>tail",
    "<SCRIPT>UPPER</SCRIPT>ok",
    "<!-- comment -->text<!-- unterminated",
    "<!doctype html><p>x</p>",
    "<!DOCTYPE HTML PUBLIC '-//W3C//DTD HTML 4.01//EN'>y",
    "<?php echo 1; ?>text",
    "<?incomplete",
    "</p>stray end</p>",
    "</>empty end tag</>x",
    "</ bogus>text",
    "<div<div>nested lt</div>",
    "<p>&amp; &lt; &gt; &#65; &#x41; &unknown;</p>",
    "< notatag>",
    "<",
    "text<",
    "<p",
    "<p class",
    "<p class=",
    "<p class='unterminated",
    "<input value=no-quotes x>",
    "<input checked>",
    "<weird-tag:ns.dotted attr=1>t</weird-tag:ns.dotted>",
    "<p / >slash sep</p>",
    "<p a='1'/>selfclose attr",
    "<p\ta='1'\nb=2>ws attrs</p>",
    "<![CDATA[not replicated]]>",
    "<b>&euro;100&nbsp;&copy;</b>",
    "<p>multi\nline\ttext</p>",
    "\x00null<p>\x00</p>",
]


def _data_stream(html: str):
    evs = tokenize(html)
    if evs is None:
        return None
    return [e[1] for e in evs if e[0] == "d"]


def _check(html: str) -> None:
    expected = _data_stream(html)
    got = tokenize_text(html)
    if expected is None:
        assert got is None, f"fast path did not fall back on {html!r}"
    else:
        assert got is not None and "".join(got) == "".join(expected), (
            f"text diverges on {html!r}: {got!r} vs {expected!r}"
        )


def test_textonly_adversarial():
    for frag in ADVERSARIAL:
        _check(frag)


def test_textonly_fixture_corpus():
    from swspark.fixtures import generate_corpus

    corpus = generate_corpus("tiny")
    for html in corpus.pages["html"]:
        _check(html.decode("utf-8", errors="replace"))


def test_textonly_random_fuzz():
    rng = random.Random(11)
    fragments = [
        "<p>", "</p>", "<a href='x'>", "text", "&amp;", "<!--", "-->",
        "<script>", "</script>", "<", ">", "'", '"', "=", "/", "<br/>",
        "<!doctype html>", "<?pi?>", "\n", " ", "<b", "x>y", "</",
    ]
    for _ in range(2000):
        html = "".join(
            rng.choice(fragments) for _ in range(rng.randint(0, 20))
        )
        _check(html)


def test_stream_fulltext_uses_fast_path():
    from swspark.extract.dom import Html, stream_fulltext

    from swspark.fixtures import generate_corpus

    corpus = generate_corpus("tiny")
    for html in corpus.pages["html"]:
        h = html.decode("utf-8", errors="replace")
        assert stream_fulltext(h) == Html.parse_document(h).root.inner_text()
