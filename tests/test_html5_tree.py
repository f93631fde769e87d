"""Golden vectors for the html5 implied-tag tree-construction rules
(VERDICT r3 #1): expected shapes derived from the html5 spec's
tree-construction algorithm (the html5lib-tests conventions), i.e.
what html5ever — the reference's parser, tree_sink.rs:13-228 —
produces for each input. Documented deviation: character data is
never dropped (whitespace before <html>) or moved (foster parenting),
so cases avoid those constructs; tests/test_extract.py pins the
byte-identity invariant instead.
"""

import pytest

from swspark.extract.dom import DOCTYPE, DOCUMENT, ELEMENT, TEXT, Html


def dump(n, depth=-1, out=None):
    """html5lib-tests-style tree dump: one line per node."""
    if out is None:
        out = []
    if n.kind == ELEMENT:
        out.append("  " * depth + f"<{n.name}>")
    elif n.kind == TEXT:
        out.append("  " * depth + f'"{n.text}"')
    elif n.kind == DOCTYPE:
        out.append("  " * depth + f"<!DOCTYPE {n.text}>")
    elif n.kind != DOCUMENT:
        out.append("  " * depth + "#misc")
    for c in n.children:
        dump(c, depth + 1, out)
    return out


def tree(html):
    return "\n".join(dump(Html.parse_document(html).root))


GOLDEN = [
    # --- html/head/body implication --------------------------------
    ("<p>hi", '<html>\n  <head>\n  <body>\n    <p>\n      "hi"'),
    (
        "<!DOCTYPE html><title>t</title>x",
        "<!DOCTYPE html>\n<html>\n  <head>\n    <title>\n"
        '      "t"\n  <body>\n    "x"',
    ),
    (
        "<head><meta a=b></head><body>x",
        '<html>\n  <head>\n    <meta>\n  <body>\n    "x"',
    ),
    # metadata between </head> and <body> goes back into head
    (
        "<head></head><link href=u><body>x",
        '<html>\n  <head>\n    <link>\n  <body>\n    "x"',
    ),
    (
        "<head></head><script>s()</script><body>x",
        "<html>\n  <head>\n    <script>\n"
        '      "s()"\n  <body>\n    "x"',
    ),
    # content after </body> still lands in body
    (
        "<body><p>a</p></body><div>b</div>",
        "<html>\n  <head>\n  <body>\n    <p>\n"
        '      "a"\n    <div>\n      "b"',
    ),
    # --- p auto-close ----------------------------------------------
    (
        "<p>one<p>two",
        "<html>\n  <head>\n  <body>\n    <p>\n"
        '      "one"\n    <p>\n      "two"',
    ),
    (
        "<p>a<div>b</div>",
        "<html>\n  <head>\n  <body>\n    <p>\n"
        '      "a"\n    <div>\n      "b"',
    ),
    (
        "<p>a<hr>",
        '<html>\n  <head>\n  <body>\n    <p>\n      "a"\n    <hr>',
    ),
    # <p> does NOT close across a cell boundary (button scope)
    (
        "<table><tr><td><p>a<p>b</table>",
        "<html>\n  <head>\n  <body>\n    <table>\n      <tbody>\n"
        "        <tr>\n          <td>\n            <p>\n"
        '              "a"\n            <p>\n              "b"',
    ),
    # </p> with no open p inserts an empty one
    ("x</p>", '<html>\n  <head>\n  <body>\n    "x"\n    <p>'),
    # </br> acts as <br>
    ("x</br>y", '<html>\n  <head>\n  <body>\n    "x"\n    <br>\n    "y"'),
    # --- list items -------------------------------------------------
    (
        "<ul><li>a<li>b</ul>",
        "<html>\n  <head>\n  <body>\n    <ul>\n      <li>\n"
        '        "a"\n      <li>\n        "b"',
    ),
    (
        "<dl><dt>t<dd>d</dl>",
        "<html>\n  <head>\n  <body>\n    <dl>\n      <dt>\n"
        '        "t"\n      <dd>\n        "d"',
    ),
    # the li loop skips PAST a div (address/div/p exemption) and still
    # closes the open li — the new li is a sibling, not nested
    (
        "<ul><li><div><li>x</ul>",
        "<html>\n  <head>\n  <body>\n    <ul>\n      <li>\n"
        '        <div>\n      <li>\n        "x"',
    ),
    # --- headings ----------------------------------------------------
    (
        "<h1>a<h2>b",
        "<html>\n  <head>\n  <body>\n    <h1>\n"
        '      "a"\n    <h2>\n      "b"',
    ),
    # --- tables -------------------------------------------------------
    (
        "<table><tr><td>x</table>",
        "<html>\n  <head>\n  <body>\n    <table>\n      <tbody>\n"
        '        <tr>\n          <td>\n            "x"',
    ),
    (
        "<table><td>x</table>",
        "<html>\n  <head>\n  <body>\n    <table>\n      <tbody>\n"
        '        <tr>\n          <td>\n            "x"',
    ),
    (
        "<table><tr><td>x<td>y<tr><td>z</table>",
        "<html>\n  <head>\n  <body>\n    <table>\n      <tbody>\n"
        "        <tr>\n          <td>\n"
        '            "x"\n          <td>\n            "y"\n'
        '        <tr>\n          <td>\n            "z"',
    ),
    (
        "<table><thead><tr><th>h</thead><tbody><tr><td>v</table>",
        "<html>\n  <head>\n  <body>\n    <table>\n      <thead>\n"
        '        <tr>\n          <th>\n            "h"\n'
        "      <tbody>\n        <tr>\n          <td>\n"
        '            "v"',
    ),
    (
        "<table><col span=2><tr><td>v</table>",
        "<html>\n  <head>\n  <body>\n    <table>\n      <colgroup>\n"
        "        <col>\n      <tbody>\n        <tr>\n          <td>\n"
        '            "v"',
    ),
    # table tags with no open table are ignored (in-body rule)
    ("<td>x</td>", '<html>\n  <head>\n  <body>\n    "x"'),
    # ignored tags around text: adjacent characters merge (html5ever
    # appends characters to a current text node too)
    ("<tr><td>a</tr>b", '<html>\n  <head>\n  <body>\n    "ab"'),
    # <table> in table context closes the open table (sibling tables)
    (
        "<table><tr><td>a</td><table><tr><td>b</table>",
        "<html>\n  <head>\n  <body>\n    <table>\n      <tbody>\n"
        '        <tr>\n          <td>\n            "a"\n'
        "    <table>\n      <tbody>\n        <tr>\n          <td>\n"
        '            "b"',
    ),
    # ...but a table nested INSIDE a cell stays nested
    (
        "<table><tr><td><table><tr><td>i</table></td></tr></table>",
        "<html>\n  <head>\n  <body>\n    <table>\n      <tbody>\n"
        "        <tr>\n          <td>\n            <table>\n"
        "              <tbody>\n                <tr>\n"
        '                  <td>\n                    "i"',
    ),
    # --- option / optgroup / button ---------------------------------
    (
        "<select><option>a<option>b</select>",
        "<html>\n  <head>\n  <body>\n    <select>\n      <option>\n"
        '        "a"\n      <option>\n        "b"',
    ),
    (
        "<select><optgroup><option>a<optgroup><option>b</select>",
        "<html>\n  <head>\n  <body>\n    <select>\n      <optgroup>\n"
        "        <option>\n"
        '          "a"\n      <optgroup>\n        <option>\n'
        '          "b"',
    ),
    (
        "<button>a<button>b",
        "<html>\n  <head>\n  <body>\n    <button>\n"
        '      "a"\n    <button>\n      "b"',
    ),
]


@pytest.mark.parametrize("html,expected", GOLDEN, ids=range(len(GOLDEN)))
def test_html5_tree_golden(html, expected):
    assert tree(html) == expected, f"\ninput: {html!r}\ngot:\n{tree(html)}"


def test_both_tokenizer_paths_share_construction():
    """The stdlib fallback path must apply the same insertion rules:
    force it with a construct the fast tokenizer rejects (a bare CDATA
    section is stdlib-only) and check implied tags still appear."""
    from swspark.extract import htmltok

    doc = "<![CDATA[z]]><p>a<p>b"
    assert htmltok.tokenize(doc) is None  # really exercises fallback
    h = Html.parse_document(doc)
    body = [c for c in h.root_element().children if c.kind == ELEMENT]
    assert [e.name for e in body] == ["head", "body"] or [
        e.name for e in h.root_element().children
    ]
    ps = list(h.select("body > p"))
    assert [p.inner_text() for p in ps] == ["a", "b"]


def test_real_page_selectors_like_html5ever():
    """End-to-end: a sloppy real-web page (no html/body, implied
    tbody, unclosed p/li/td) selects identically to html5ever's tree."""
    page = (
        "<!DOCTYPE html><meta charset=utf-8><title>News</title>"
        "<h1>Top stories</h1>"
        "<p>Intro"
        "<ul><li>first<li>second<li>third</ul>"
        "<table><tr><td>cell-a<td>cell-b<tr><td>cell-c</table>"
        "<p>Outro"
    )
    h = Html.parse_document(page)
    assert [e.inner_text() for e in h.select("body > p")] == [
        "Intro", "Outro"
    ]
    assert [e.inner_text() for e in h.select("ul > li")] == [
        "first", "second", "third"
    ]
    # the implied tbody exists as a real element, like html5ever
    assert [e.inner_text() for e in h.select("table > tbody > tr > td")] == [
        "cell-a", "cell-b", "cell-c"
    ]
    assert [e.inner_text() for e in h.select("li:nth-child(2)")] == [
        "second"
    ]
    assert len(list(h.select("head > title"))) == 1
    # inner_text byte-identity is unaffected by implied structure
    from swspark.extract.dom import stream_fulltext

    assert h.root.inner_text() == stream_fulltext(page)
