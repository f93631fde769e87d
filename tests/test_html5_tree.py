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


# --- r5: foster parenting + active formatting (adoption agency) ----
# Expected shapes are the html5lib-tests trees (what html5ever, the
# reference's parser, produces — tree_sink.rs:13-228 delegates to the
# spec machinery these cases come from).
GOLDEN_R5 = [
    # foster parenting: stray table text moves before the table
    (
        "<table><tr><td>A</td></tr>B</table>",
        '<html>\n  <head>\n  <body>\n    "B"\n    <table>\n      <tbody>\n'
        '        <tr>\n          <td>\n            "A"',
    ),
    # whitespace-only runs stay inside the table
    (
        # in-table space stays at the current node: first run in the
        # table, second in the tbody (current node after </tr>)
        "<table> <tr><td>y</td></tr> </table>",
        '<html>\n  <head>\n  <body>\n    <table>\n      " "\n      <tbody>\n'
        '        <tr>\n          <td>\n            "y"\n        " "',
    ),
    # fostered elements: a <div> in table context lands before the table
    (
        "<div><table><div>D</div><tr><td>C</td></tr></table></div>",
        '<html>\n  <head>\n  <body>\n    <div>\n      <div>\n        "D"\n'
        '      <table>\n        <tbody>\n          <tr>\n            <td>\n'
        '              "C"',
    ),
    # adoption agency: <b><p>x</b>y  ->  b, p > (b > x, y)
    (
        "<b><p>x</b>y</p>",
        '<html>\n  <head>\n  <body>\n    <b>\n    <p>\n      <b>\n'
        '        "x"\n      "y"',
    ),
    # adoption agency with text before the block
    (
        "<b>1<p>2</b>3</p>",
        '<html>\n  <head>\n  <body>\n    <b>\n      "1"\n    <p>\n'
        '      <b>\n        "2"\n      "3"',
    ),
    # formatting reconstruction across paragraphs
    (
        "<p><b>1</p><p>2</p>",
        '<html>\n  <head>\n  <body>\n    <p>\n      <b>\n        "1"\n'
        '    <p>\n      <b>\n        "2"',
    ),
    # misnested <b><i>...</b>...</i>
    (
        "<b><i>bold italic</b>plain</i>",
        '<html>\n  <head>\n  <body>\n    <b>\n      <i>\n'
        '        "bold italic"\n    <i>\n      "plain"',
    ),
    # the html5lib-tests classic: formatting element opened in table
    # context fosters, reconstructs around fostered text, and
    # reconstructs again after the table
    (
        "<table><b><tr><td>aaa</td></tr>bbb</table>ccc",
        '<html>\n  <head>\n  <body>\n    <b>\n    <b>\n      "bbb"\n'
        '    <table>\n      <tbody>\n        <tr>\n          <td>\n'
        '            "aaa"\n    <b>\n      "ccc"',
    ),
    # cell boundaries are formatting markers: the <b> opened in one
    # cell does not leak into the next
    (
        "<table><tr><td><b>x</td><td>y</td></tr></table>",
        '<html>\n  <head>\n  <body>\n    <table>\n      <tbody>\n'
        '        <tr>\n          <td>\n            <b>\n              "x"\n'
        '          <td>\n            "y"',
    ),
    # nested <a>: the adoption agency closes the first
    (
        "<a href=1>x<div>y</div><a href=2>z",
        '<html>\n  <head>\n  <body>\n    <a>\n      "x"\n      <div>\n'
        '        "y"\n    <a>\n      "z"',
    ),
    # duplicate html tag merges missing attributes (spec)
    (
        "<html lang=en><html dir=ltr><p>x",
        '<html>\n  <head>\n  <body>\n    <p>\n      "x"',
    ),
    # after-head <noscript> opens body (not head metadata there)
    (
        "</head><noscript><p>x</noscript>more",
        '<html>\n  <head>\n  <body>\n    <noscript>\n      <p>\n'
        '        "x"\n    "more"',
    ),
]


@pytest.mark.parametrize("html,expected", GOLDEN_R5,
                         ids=[h[:40] for h, _ in GOLDEN_R5])
def test_r5_foster_and_formatting(html, expected):
    assert tree(html) == expected


def test_duplicate_html_attrs_merge():
    h = Html.parse_document("<html lang=en><html lang=fr dir=ltr>x")
    root = h.root_element()
    assert root.attrs == {"lang": "en", "dir": "ltr"}


def test_fostered_text_merges_with_existing_sibling():
    h = Html.parse_document("a<table>b<tr>c</table>")
    # both stray runs foster before the table, merging with "a"
    body = [c for c in h.root_element().children if c.name == "body"][0]
    kinds = [(c.kind, getattr(c, "name", "")) for c in body.children]
    assert body.children[0].kind == TEXT
    assert body.children[0].text == "abc"
    assert body.children[1].name == "table"


def test_formatting_cleared_at_cell_close_selectors():
    h = Html.parse_document(
        "<table><tr><td><em>x</td><td>y</td></tr></table>after"
    )
    # em must not be reconstructed around "y" or "after"
    assert [e.inner_text() for e in h.select("em")] == ["x"]
