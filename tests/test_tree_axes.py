"""Ports of the reference tree-layer tests
(crates/sws-tree/tests/{node,iter}.rs) over the DOM arena.

The Rust tests use tree!('a' => {...}) literals; here the same shapes
are built from HTML elements whose tag names carry the letter (the
values), so traversal order assertions transfer exactly.
"""

import pytest

from swspark.extract.dom import Html


def build(html):
    return Html.parse_document(html)


@pytest.fixture
def flat():
    # tree!('a' => { 'b', 'c', 'd' })
    return next(build("<a><b></b><c></c><d></d></a>").select("a"))


@pytest.fixture
def nested():
    # tree!('a' => { 'b' => { 'd', 'e' }, 'c' })
    return next(build("<a><b><d></d><e></e></b><c></c></a>").select("a"))


def names(it):
    return [n.name for n in it]


# node.rs ---------------------------------------------------------------

def test_node_parent(flat):
    b = flat.first_child()
    assert b.parent is flat


def test_node_prev_sibling(flat):
    c = flat.last_child()
    assert c.prev_sibling().prev_sibling() is flat.first_child()


def test_node_next_sibling(flat):
    b = flat.first_child()
    assert b.next_sibling().next_sibling() is flat.last_child()


def test_node_first_last_child(flat):
    assert flat.first_child().name == "b"
    assert flat.last_child().name == "d"


def test_leaf_axes_none(flat):
    b = flat.first_child()
    assert b.first_child() is None
    assert b.last_child() is None
    assert flat.first_child().prev_sibling() is None
    assert flat.last_child().next_sibling() is None


# iter.rs ----------------------------------------------------------------

def test_iter_descendants_preorder(nested):
    # iter.rs iter_descendants: [a, b, d, e, c] — ours is strict
    # descendants, so prepend self
    assert ["a"] + names(nested.descendants()) == ["a", "b", "d", "e", "c"]


def test_iter_ancestors():
    # r4: parse_document implies html/body around fragments (html5
    # tree construction, like html5ever) — they appear as ancestors
    d = next(build("<a><b><c><d></d></c></b></a>").select("d"))
    got = [n.name for n in d.ancestors() if n.name]
    assert got == ["c", "b", "a", "body", "html"]


def test_iter_prev_siblings(flat):
    assert names(flat.last_child().prev_siblings()) == ["c", "b"]


def test_iter_next_siblings(flat):
    assert names(flat.first_child().next_siblings()) == ["c", "d"]


def test_iter_children(flat):
    assert names(flat.children) == ["b", "c", "d"]
    assert names(reversed(flat.children)) == ["d", "c", "b"]


def test_iter_first_children():
    a = next(build("<a><b><d></d><e></e></b><c></c></a>").select("a"))
    assert names(a.first_children()) == ["b", "d"]


def test_iter_last_children():
    a = next(build("<a><b></b><c><d></d><e></e></c></a>").select("a"))
    assert names(a.last_children()) == ["c", "e"]


def test_iter_traverse_edges(nested):
    got = [(edge, n.name) for edge, n in nested.traverse()]
    assert got == [
        ("open", "a"),
        ("open", "b"),
        ("open", "d"),
        ("close", "d"),
        ("open", "e"),
        ("close", "e"),
        ("close", "b"),
        ("open", "c"),
        ("close", "c"),
        ("close", "a"),
    ]
