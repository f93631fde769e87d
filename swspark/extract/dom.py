"""DOM tree + HTML parser (stdlib ``html.parser``).

Reimplements the observable semantics of the reference's tree layer:

- flat-arena tree with parent/children links and pre-order traversal
  (reference: slotmap tree, crates/sws-tree/src/lib.rs:22-35);
- node kinds Document/Doctype/Comment/Text/Element/ProcessingInstruction
  (crates/sws-tree/src/node.rs:13-35);
- elements carry lowercased name, pre-split id/classes, attr map with
  first-occurrence-wins duplicates (node.rs:212-252);
- adjacent text nodes are merged on append
  (crates/sws-scraper/src/html/tree_sink.rs:100-124);
- parse errors are collected, never fatal (html/mod.rs:19-34);
- ``inner_text`` = concatenation of all descendant text nodes in
  pre-order document order, no separator, no whitespace normalization
  (element_ref/mod.rs:87-99) — the byte-identity target;
- character references decoded at parse time except inside rawtext
  elements (html5 tokenizer behavior).

Boundary vs html5ever (SURVEY.md §7 risk 1): full html5 tree
construction (implied tags, foster parenting, active formatting
reconstruction) is out of scope; equivalence is defined over
well-formed documents, which the fixture corpus guarantees. Unclosed
tags are recovered by popping to the nearest matching open tag.
"""

from __future__ import annotations

from html.parser import HTMLParser

from swspark.extract.htmltok import tokenize as _fast_tokenize

DOCUMENT = 0
DOCTYPE = 1
COMMENT = 2
TEXT = 3
ELEMENT = 4
PI = 5


class NodeKind:
    DOCUMENT = DOCUMENT
    DOCTYPE = DOCTYPE
    COMMENT = COMMENT
    TEXT = TEXT
    ELEMENT = ELEMENT
    PI = PI


# https://html.spec.whatwg.org/#void-elements
VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# Elements whose text content is never entity-escaped on serialization
# (html5ever serializer behavior for rawtext).
RAWTEXT_ELEMENTS = frozenset(
    "style script xmp iframe noembed noframes plaintext noscript".split()
)


class Node:
    __slots__ = ("kind", "parent", "children", "text", "name", "attrs", "id", "classes")

    def __init__(self, kind: int, text: str = "", name: str = ""):
        self.kind = kind
        self.parent: Node | None = None
        self.children: list[Node] = []
        self.text = text  # TEXT data / COMMENT data / DOCTYPE decl / PI data
        self.name = name
        self.attrs: dict[str, str] = {}
        self.id: str | None = None
        self.classes: frozenset[str] = frozenset()

    # --- structure -------------------------------------------------
    def append(self, child: "Node") -> None:
        """Append a child, merging adjacent text nodes
        (tree_sink.rs:100-124 semantics)."""
        if child.kind == TEXT and self.children and self.children[-1].kind == TEXT:
            self.children[-1].text += child.text
            return
        child.parent = self
        self.children.append(child)

    def descendants(self):
        """Pre-order traversal of strict descendants (document order)."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            yield node
            if node.children:
                stack.extend(reversed(node.children))

    def descendant_elements(self):
        for n in self.descendants():
            if n.kind == ELEMENT:
                yield n

    # --- traversal axes (reference: crates/sws-tree/src/iter.rs,
    # tested in crates/sws-tree/tests/{node,iter}.rs) ----------------
    def first_child(self) -> "Node | None":
        return self.children[0] if self.children else None

    def last_child(self) -> "Node | None":
        return self.children[-1] if self.children else None

    def _sibling_index(self) -> int:
        sibs = self.parent.children
        for i, s in enumerate(sibs):
            if s is self:
                return i
        raise ValueError("node not in parent children")  # pragma: no cover

    def prev_sibling(self) -> "Node | None":
        if self.parent is None:
            return None
        i = self._sibling_index()
        return self.parent.children[i - 1] if i > 0 else None

    def next_sibling(self) -> "Node | None":
        if self.parent is None:
            return None
        i = self._sibling_index()
        sibs = self.parent.children
        return sibs[i + 1] if i + 1 < len(sibs) else None

    def ancestors(self):
        n = self.parent
        while n is not None:
            yield n
            n = n.parent

    def prev_siblings(self):
        n = self.prev_sibling()
        while n is not None:
            yield n
            n = n.prev_sibling()

    def next_siblings(self):
        n = self.next_sibling()
        while n is not None:
            yield n
            n = n.next_sibling()

    def first_children(self):
        n = self.first_child()
        while n is not None:
            yield n
            n = n.first_child()

    def last_children(self):
        n = self.last_child()
        while n is not None:
            yield n
            n = n.last_child()

    def traverse(self):
        """Depth-first edge traversal: ('open', n) ... ('close', n),
        including self (iter.rs Edge::Open/Close semantics)."""
        stack = [("open", self)]
        while stack:
            edge, node = stack.pop()
            yield edge, node
            if edge == "open":
                stack.append(("close", node))
                for c in reversed(node.children):
                    stack.append(("open", c))

    # --- element accessors (node.rs:254-288, interop.rs:98-140) -----
    def attr(self, name: str) -> str | None:
        return self.attrs.get(name)

    def has_class(self, cls: str, case_insensitive: bool = False) -> bool:
        """Lua-surface hasClass is ASCII-case-insensitive
        (interop.rs:109-113); CSS .class matching is case-sensitive."""
        if case_insensitive:
            low = cls.lower()
            return any(c.lower() == low for c in self.classes)
        return cls in self.classes

    # --- extraction (element_ref/mod.rs) -----------------------------
    def text_nodes(self):
        """Lazy iterator over descendant text node strings, pre-order
        (element_ref/mod.rs:80-84,140-168)."""
        for n in self.descendants():
            if n.kind == TEXT:
                yield n.text

    def inner_text(self) -> str:
        """Byte-identity target: pre-order concat, no separator, no
        normalization (element_ref/mod.rs:87-99)."""
        return "".join(self.text_nodes())

    def inner_html(self) -> str:
        """Serialize children only (element_ref/mod.rs:75-77,
        TraversalScope::ChildrenOnly)."""
        out: list[str] = []
        raw = self.kind == ELEMENT and self.name in RAWTEXT_ELEMENTS
        for c in self.children:
            _serialize(c, out, raw)
        return "".join(out)

    def html(self) -> str:
        """Serialize including the node itself (element_ref/mod.rs:70-72)."""
        out: list[str] = []
        parent_raw = (
            self.parent is not None
            and self.parent.kind == ELEMENT
            and self.parent.name in RAWTEXT_ELEMENTS
        )
        _serialize(self, out, parent_raw)
        return "".join(out)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        if self.kind == ELEMENT:
            return f"<Element {self.name} id={self.id} classes={sorted(self.classes)}>"
        return f"<Node kind={self.kind} {self.text[:30]!r}>"


def _escape_text(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("\xa0", "&nbsp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def _escape_attr(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("\xa0", "&nbsp;")
        .replace('"', "&quot;")
    )


def _serialize(node: Node, out: list[str], in_rawtext: bool) -> None:
    """html5ever-compatible serialization
    (crates/sws-scraper/src/html/serializable.rs:9-53)."""
    k = node.kind
    if k == TEXT:
        out.append(node.text if in_rawtext else _escape_text(node.text))
    elif k == ELEMENT:
        out.append("<")
        out.append(node.name)
        for a, v in node.attrs.items():
            out.append(f' {a}="{_escape_attr(v)}"')
        out.append(">")
        if node.name in VOID_ELEMENTS:
            return
        raw = node.name in RAWTEXT_ELEMENTS
        for c in node.children:
            _serialize(c, out, raw)
        out.append(f"</{node.name}>")
    elif k == COMMENT:
        out.append(f"<!--{node.text}-->")
    elif k == DOCTYPE:
        out.append(f"<!DOCTYPE {node.text}>")
    elif k == PI:
        out.append(f"<?{node.text}>")
    else:  # DOCUMENT
        for c in node.children:
            _serialize(c, out, in_rawtext)


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node(DOCUMENT)
        self.stack: list[Node] = [self.root]
        self.errors: list[str] = []

    # html.parser lowercases tag and attribute names already.
    def _make_element(self, tag: str, attrs: list[tuple[str, str | None]]) -> Node:
        el = Node(ELEMENT, name=tag)
        amap: dict[str, str] = {}
        for k, v in attrs:
            if k not in amap:  # first occurrence wins (html5 spec)
                amap[k] = v if v is not None else ""
        el.attrs = amap
        el.id = amap.get("id")
        cls = amap.get("class")
        if cls:
            el.classes = frozenset(cls.split())
        return el

    def handle_starttag(self, tag: str, attrs) -> None:
        el = self._make_element(tag, attrs)
        self.stack[-1].append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.stack[-1].append(self._make_element(tag, attrs))

    def handle_endtag(self, tag: str) -> None:
        # Recover from mismatched end tags: pop to the nearest matching
        # open element; ignore the end tag if none is open.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return
        self.errors.append(f"unmatched end tag </{tag}>")

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].append(Node(TEXT, text=data))

    def handle_comment(self, data: str) -> None:
        self.stack[-1].append(Node(COMMENT, text=data))

    def handle_decl(self, decl: str) -> None:
        # decl is e.g. "DOCTYPE html" — store the name part.
        name = decl.split(None, 1)[1] if " " in decl else decl
        self.stack[-1].append(Node(DOCTYPE, text=name))

    def handle_pi(self, data: str) -> None:
        self.stack[-1].append(Node(PI, text=data.rstrip("?")))

    def error(self, message: str) -> None:  # pragma: no cover
        self.errors.append(message)


class _TextStream(HTMLParser):
    """Tree-free fulltext extractor. Document-root inner_text is the
    pre-order concat of TEXT nodes (element_ref/mod.rs:87-99), and the
    tree builder appends text nodes in handle_data event order — so
    joining the data events directly is byte-identical to
    parse_document(...).root.inner_text() while skipping every Node
    allocation (the fulltext hot path at corpus scale; equality is
    pinned by the extract_identity oracle and the golden tests)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []

    def handle_data(self, data: str) -> None:
        if data:
            self.parts.append(data)


def stream_fulltext(html: str | bytes) -> str:
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    evs = _fast_tokenize(html)
    if evs is not None:
        return "".join(e[1] for e in evs if e[0] == "d")
    ts = _TextStream()
    try:
        ts.feed(html)
        ts.close()
    except Exception:  # parse problems are never fatal (html/mod.rs:19-22)
        pass
    return "".join(ts.parts)


def _build_tree(events) -> "tuple[Node, list[str]]":
    """Tight event->tree loop (same construction rules as
    _TreeBuilder, minus per-event method dispatch)."""
    root = Node(DOCUMENT)
    errors: list[str] = []
    stack = [root]
    for ev in events:
        k = ev[0]
        if k == "d":
            top = stack[-1]
            ch = top.children
            if ch and ch[-1].kind == TEXT:
                ch[-1].text += ev[1]
            else:
                node = Node(TEXT, text=ev[1])
                node.parent = top
                ch.append(node)
        elif k == "s" or k == "x":
            el = Node(ELEMENT, name=ev[1])
            amap = el.attrs
            for a, v in ev[2]:
                if a not in amap:  # first occurrence wins (html5 spec)
                    amap[a] = v if v is not None else ""
            el.id = amap.get("id")
            cls = amap.get("class")
            if cls:
                el.classes = frozenset(cls.split())
            top = stack[-1]
            el.parent = top
            top.children.append(el)
            if k == "s" and ev[1] not in VOID_ELEMENTS:
                stack.append(el)
        elif k == "e":
            tag = ev[1]
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].name == tag:
                    del stack[i:]
                    break
            else:
                errors.append(f"unmatched end tag </{tag}>")
        elif k == "c":
            stack[-1].append(Node(COMMENT, text=ev[1]))
        elif k == "!":
            d = ev[1]
            stack[-1].append(
                Node(DOCTYPE, text=d.split(None, 1)[1] if " " in d else d)
            )
        else:  # "?"
            stack[-1].append(Node(PI, text=ev[1].rstrip("?")))
    return root, errors


class Html:
    """Parsed document (reference: Html struct, html/mod.rs:24-34).

    ``errors`` collects recoverable parse problems; parsing never
    raises (html/mod.rs:19-22).
    """

    __slots__ = ("root", "errors")

    def __init__(self, root: Node, errors: list[str]):
        self.root = root
        self.errors = errors

    @classmethod
    def parse_document(cls, html: str | bytes) -> "Html":
        if isinstance(html, (bytes, bytearray)):
            html = bytes(html).decode("utf-8", errors="replace")
        # fast tokenizer (event-identical to html.parser; differential-
        # fuzzed in tests) — a None return means the document hit a
        # construct only stdlib handles, so reparse with html.parser
        evs = _fast_tokenize(html)
        if evs is not None:
            root, errors = _build_tree(evs)
            return cls(root, errors)
        tb = _TreeBuilder()
        try:
            tb.feed(html)
            tb.close()
        except Exception as exc:  # never fatal
            tb.errors.append(str(exc))
        return cls(tb.root, tb.errors)

    def select(self, selector_str: str):
        from swspark.extract.selectors import select

        return select(self.root, selector_str)

    def root_element(self) -> Node | None:
        for c in self.root.children:
            if c.kind == ELEMENT:
                return c
        return None
