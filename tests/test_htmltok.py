"""Differential fuzz: the fast tokenizer (swspark/extract/htmltok.py)
must be event-identical to stdlib ``html.parser`` (convert_charrefs,
whole-document feed) — THE invariant that lets parse_document swap it
in without risking the byte-identity contract. Documents it cannot
replicate bit-for-bit must return None (fallback), never diverge."""

import random

import pytest
from html.parser import HTMLParser
from hypothesis import given, settings
from hypothesis import strategies as st

from swspark.extract.htmltok import tokenize


class _Rec(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.ev = []

    def handle_starttag(self, t, a):
        self.ev.append(("s", t, a))

    def handle_startendtag(self, t, a):
        self.ev.append(("x", t, a))

    def handle_endtag(self, t):
        self.ev.append(("e", t))

    def handle_data(self, d):
        self.ev.append(("d", d))

    def handle_comment(self, d):
        self.ev.append(("c", d))

    def handle_decl(self, d):
        self.ev.append(("!", d))

    def handle_pi(self, d):
        self.ev.append(("?", d))


def _norm(evs):
    """Merge adjacent data events: chunk boundaries are unobservable
    through the tree (adjacent text nodes merge on append)."""
    out = []
    for e in evs:
        if e[0] == "d":
            if not e[1]:
                continue
            if out and out[-1][0] == "d":
                out[-1] = ("d", out[-1][1] + e[1])
                continue
        out.append(e)
    return out


def _stdlib(h):
    r = _Rec()
    try:
        r.feed(h)
        r.close()
    except Exception:
        pass
    return r.ev


def _assert_parity(h):
    evs = tokenize(h)
    if evs is None:
        return  # declared fallback — stdlib handles it
    assert _norm(evs) == _norm(_stdlib(h)), repr(h)


CRAFTED = [
    "<html><body><p class='a b' id=x>hi &amp; bye</p></body></html>",
    "<script>if (a<b && c>d) { x='</div>'; }</script>after",
    "<SCRIPT>x</SCRIPT>tail", "<script>no end", "<script/>not cdata",
    "<style>a>b{color:red}</style>", "<style>x</STYLE >y",
    "<!DOCTYPE html><!-- c --><p>x</p>", "<!doctype HTML PUBLIC 'x'><p>y",
    "<?php echo 1; ?>", "<p>a < b</p>", "x<", "<",
    "<a href=\"x?a=1&amp;b=2\">l</a>", "<a href=x&y>l</a>",
    "<p>&nbsp;&unknown;&#65;&#x42;</p>", "text&ampmore", "&#x;", "&",
    "<div a b=1 c='2' d=\"3\" e>t</div>", "<div a=1/>x", "<div/>x",
    "</>x", "</ div>x", "</div attr>x", "</1>x", "</d/>x",
    "<!-- unterminated", "<div unterminated", "<p a='unterminated",
    "<?unterminated", "<!doctype unterminated",
    "<em//x>t</em>", "<a b=c=d>t</a>", "<a b = c>t</a>", "<a b=>t</a>",
    "<a b=''>", "<a\"b>t", "<td a='1'b=2>x", "<x y='a&quot;b'>",
    "<title>a<b</title>", "<textarea><p>x</textarea>",
    "<div><p>open<span>nest</div>done",
]


@pytest.mark.parametrize("h", CRAFTED)
def test_crafted_parity(h):
    _assert_parity(h)


def test_marked_section_falls_back():
    assert tokenize("<![CDATA[stuff]]>x") is None


def test_random_chaos_parity():
    random.seed(4242)
    alphabet = "<>ab c/='\"&;!-?#xAB\n\tscriptstyle[]"
    for _ in range(3000):
        h = "".join(
            random.choice(alphabet) for _ in range(random.randrange(0, 120))
        )
        _assert_parity(h)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="<>abc /='\"&;!-?#\n\tscript", max_size=100))
def test_hypothesis_parity(h):
    _assert_parity(h)


def test_fixture_corpus_no_fallback():
    """The graded corpus must ride the fast path (0 fallbacks) and
    parse identically."""
    from swspark.fixtures import generate_corpus

    c = generate_corpus("tiny")
    for h in c.pages.html:
        h = h if isinstance(h, str) else bytes(h).decode("utf-8", "replace")
        evs = tokenize(h)
        assert evs is not None
        assert _norm(evs) == _norm(_stdlib(h))
