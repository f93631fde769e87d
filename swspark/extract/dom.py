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

Tree construction follows the common html5 insertion rules (r4:
matching html5ever on real-web implied-tag pages): html/head/body are
implied when absent, `<p>`/`<li>`/`<dd>`/`<dt>`/headings auto-close per
the spec's scoping rules, table context is normalized (implied
`<tbody>`, `<tr>`/cells close the open row/cell, stray table tags
outside a table are ignored), `</p>` with no open p inserts an empty
one and `</br>` acts as `<br>` — see _build_tree. One deliberate
deviation: character data is NEVER dropped or moved (html5ever
ignores whitespace before <html>/<head> and foster-parents stray
table text), so document-order text concatenation — the byte-identity
target — is invariant across both tree paths and stream_fulltext.

Remaining boundary vs html5ever (SURVEY.md §7 risk 1): foster
parenting and active-formatting reconstruction (tree_sink.rs:13-228
delegates both to html5ever's spec machinery). Unclosed tags are
recovered by popping to the nearest matching open tag.
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


class _EventCollector(HTMLParser):
    """stdlib fallback tokenizer: emit the same event tuples as
    htmltok.tokenize so BOTH tokenizer paths build trees through the
    one _build_tree (identical construction rules by construction)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.events: list[tuple] = []

    # html.parser lowercases tag and attribute names already.
    def handle_starttag(self, tag: str, attrs) -> None:
        self.events.append(("s", tag, attrs))

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.events.append(("x", tag, attrs))

    def handle_endtag(self, tag: str) -> None:
        self.events.append(("e", tag))

    def handle_data(self, data: str) -> None:
        if data:
            self.events.append(("d", data))

    def handle_comment(self, data: str) -> None:
        self.events.append(("c", data))

    def handle_decl(self, decl: str) -> None:
        self.events.append(("!", decl))

    def handle_pi(self, data: str) -> None:
        self.events.append(("?", data))

    def error(self, message: str) -> None:  # pragma: no cover
        pass


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


# html5 tree-construction vocabulary (all sets straight from the
# spec's "in body"/"in table" insertion modes — the rules html5ever's
# TreeBuilder applies for the reference, tree_sink.rs:13-228):
# start tags that close an open <p> in button scope
_P_CLOSERS = frozenset(
    "address article aside blockquote center details dialog dir div dl "
    "fieldset figcaption figure footer form header hgroup hr listing "
    "main menu nav ol p plaintext pre search section summary ul xmp "
    "h1 h2 h3 h4 h5 h6 li dd dt table".split()
)
_HEADINGS = frozenset("h1 h2 h3 h4 h5 h6".split())
# "has X in button scope" stops at these (p auto-close boundary)
_BUTTON_SCOPE_STOP = frozenset(
    "applet caption html table td th marquee object template button".split()
)
_DEFAULT_SCOPE_STOP = frozenset(
    "applet caption html table td th marquee object template".split()
)
# the spec's "special" category (li/dd/dt close-loop boundary)
_SPECIAL_CAT = frozenset(
    "address applet area article aside base basefont bgsound blockquote "
    "body br button caption center col colgroup dd details dir div dl dt "
    "embed fieldset figcaption figure footer form frame frameset h1 h2 h3 "
    "h4 h5 h6 head header hgroup hr html iframe img input keygen li link "
    "listing main marquee menu meta nav noembed noframes noscript object "
    "ol p param plaintext pre script search section select source style "
    "summary table tbody td template textarea tfoot th thead title tr "
    "track ul wbr xmp".split()
)
# metadata content routed into the implied <head> before body opens
_HEAD_ONLY = frozenset(
    "base basefont bgsound link meta title style script noscript "
    "noframes template".split()
)
_ROW_GROUPS = frozenset(("tbody", "thead", "tfoot"))
_CELLS = frozenset(("td", "th"))
# current-node names meaning "in table context, outside any cell"
_TABLE_MODES = frozenset(
    "table tbody thead tfoot tr caption colgroup".split()
)
_TABLE_TAGS = frozenset(
    "table caption col colgroup tbody td tfoot th thead tr".split()
)
# start tags needing construction logic beyond append+push
_SPECIAL_START = (
    _P_CLOSERS
    | _TABLE_TAGS
    | frozenset(("html", "head", "body", "option", "optgroup", "button",
                 "frame"))
)
_SPECIAL_END = frozenset(("p", "br", "body", "html", "head"))
_WS = frozenset(" \t\n\r\f")  # html5 ASCII whitespace (NOT \xa0)


def _make_element(name: str, attrs) -> Node:
    el = Node(ELEMENT, name=name)
    amap = el.attrs
    for a, v in attrs:
        if a not in amap:  # first occurrence wins (html5 spec)
            amap[a] = v if v is not None else ""
    el.id = amap.get("id")
    cls = amap.get("class")
    if cls:
        el.classes = frozenset(cls.split())
    return el


def _build_tree(events) -> "tuple[Node, list[str]]":
    """Event -> tree with the common html5 insertion rules (the subset
    real-web pages rely on; html5ever parity is pinned by
    tests/test_html5_tree.py golden vectors):

    - html/head/body implication: metadata tags fill an implied
      <head>, anything else opens <body>; </body>/</html> leave body
      current so trailing content still lands in body;
    - <p> closes in button scope before any _P_CLOSERS start tag;
      <li>/<dd>/<dt> close an open item (special-category loop);
      a heading start tag pops a current heading;
    - table normalization: <tr> under <table> implies <tbody>,
      <td>/<th> under a row group implies <tr>, a new cell/row/row
      group closes the open one, <col> implies <colgroup>, and table
      structure tags OUTSIDE any table are ignored (in-body rule);
    - <option>/<optgroup> close an open option; <button> closes an
      open button; </p> with no open p inserts an empty one; </br>
      acts as <br>.

    Character data is never dropped or reordered (see module
    docstring) — document-order text concat stays byte-identical to
    stream_fulltext on every input."""
    root = Node(DOCUMENT)
    errors: list[str] = []
    stack = [root]
    html_el: Node | None = None
    head_el: Node | None = None
    body_el: Node | None = None
    head_open = False
    head_reopened = False

    def _insert(el: Node, push: bool) -> None:
        top = stack[-1]
        el.parent = top
        top.children.append(el)
        if push:
            stack.append(el)

    def _insert_into(parent: Node, el: Node) -> None:
        el.parent = parent
        parent.children.append(el)

    def _ensure_html() -> None:
        nonlocal html_el
        if html_el is None:
            html_el = Node(ELEMENT, name="html")
            html_el.parent = root
            root.children.append(html_el)
            stack.append(html_el)

    def _open_head(el: Node | None = None) -> None:
        nonlocal head_el, head_open
        _ensure_html()
        if head_el is None:
            head_el = el if el is not None else Node(ELEMENT, name="head")
            head_el.parent = html_el
            html_el.children.append(head_el)
            stack.append(head_el)
            head_open = True

    def _ensure_body(el: Node | None = None) -> None:
        nonlocal body_el, head_open
        _ensure_html()
        if head_el is None:
            _open_head()
        if head_open:
            # pop the head (and anything left open inside it)
            for i in range(len(stack) - 1, 0, -1):
                if stack[i] is head_el:
                    del stack[i:]
                    break
            head_open = False
        if body_el is None:
            body_el = el if el is not None else Node(ELEMENT, name="body")
            body_el.parent = html_el
            html_el.children.append(body_el)
            stack.append(body_el)

    def _close_p_in_button_scope() -> None:
        for i in range(len(stack) - 1, 0, -1):
            name = stack[i].name
            if name == "p":
                del stack[i:]
                return
            if name in _BUTTON_SCOPE_STOP:
                return

    def _close_listitem(kinds: frozenset) -> None:
        # the spec's li/dd/dt loop: close an open item unless a
        # special-category element (other than address/div/p)
        # intervenes
        for i in range(len(stack) - 1, 0, -1):
            name = stack[i].name
            if name in kinds:
                del stack[i:]
                return
            if name in _SPECIAL_CAT and name not in ("address", "div", "p"):
                return

    def _nearest_table_index() -> int:
        for i in range(len(stack) - 1, 0, -1):
            if stack[i].name == "table":
                return i
        return -1

    def _pop_to_names(names: frozenset, floor: int) -> None:
        # pop until the top is one of ``names``; never below ``floor``
        while len(stack) - 1 > floor and stack[-1].name not in names:
            stack.pop()

    def _start_special(name: str, attrs, push: bool) -> None:
        nonlocal head_open
        if name == "html":
            if html_el is None:
                el = _make_element(name, attrs)
                el.parent = root
                root.children.append(el)
                stack.append(el)
                # bind the implied-structure pointers to the real tag
                _bind_html(el)
            return
        if name == "head":
            if head_el is None:
                _ensure_html()
                _open_head(_make_element(name, attrs))
            return
        if name == "body":
            if body_el is None:
                _ensure_body(_make_element(name, attrs))
            return
        if name == "frame":
            return  # in-body: ignored
        if body_el is None:
            _ensure_body()
        if name in _TABLE_TAGS and name != "table":
            ti = _nearest_table_index()
            if ti < 0:
                errors.append(f"stray table tag <{name}> ignored")
                return
            if name == "tr":
                _pop_to_names(_ROW_GROUPS | {"table"}, ti - 1)
                if stack[-1].name == "table":
                    _insert(Node(ELEMENT, name="tbody"), True)
                _insert(_make_element(name, attrs), push)
            elif name in _CELLS:
                _pop_to_names(_ROW_GROUPS | {"table", "tr"}, ti - 1)
                if stack[-1].name == "table":
                    _insert(Node(ELEMENT, name="tbody"), True)
                if stack[-1].name in _ROW_GROUPS:
                    _insert(Node(ELEMENT, name="tr"), True)
                _insert(_make_element(name, attrs), push)
            elif name in _ROW_GROUPS or name in ("caption", "colgroup"):
                _pop_to_names(frozenset(("table",)), ti - 1)
                _insert(_make_element(name, attrs), push)
            else:  # col
                _pop_to_names(frozenset(("table", "colgroup")), ti - 1)
                if stack[-1].name == "table":
                    _insert(Node(ELEMENT, name="colgroup"), True)
                _insert(_make_element(name, attrs), False)
            return
        if name in _P_CLOSERS:
            if name == "li":
                _close_listitem(frozenset(("li",)))
            elif name in ("dd", "dt"):
                _close_listitem(frozenset(("dd", "dt")))
            elif name == "table" and stack[-1].name in _TABLE_MODES:
                # in-table <table>: acts as </table> then reprocess —
                # sibling tables, never table-in-table (unless in a cell)
                ti = _nearest_table_index()
                if ti > 0:
                    del stack[ti:]
            _close_p_in_button_scope()
            if name in _HEADINGS and stack[-1].name in _HEADINGS:
                stack.pop()  # a heading closes a current heading
            _insert(_make_element(name, attrs), push)
            return
        if name == "option":
            if stack[-1].name == "option":
                stack.pop()
            _insert(_make_element(name, attrs), push)
            return
        if name == "optgroup":
            if stack[-1].name == "option":
                stack.pop()
            if stack[-1].name == "optgroup":
                stack.pop()
            _insert(_make_element(name, attrs), push)
            return
        if name == "button":
            for i in range(len(stack) - 1, 0, -1):
                nm = stack[i].name
                if nm == "button":
                    del stack[i:]
                    break
                if nm in _DEFAULT_SCOPE_STOP:
                    break
            _insert(_make_element(name, attrs), push)
            return
        _insert(_make_element(name, attrs), push)  # pragma: no cover

    def _bind_html(el: Node) -> None:
        nonlocal html_el
        html_el = el

    def _end_special(tag: str) -> None:
        nonlocal head_open
        if tag == "p":
            for i in range(len(stack) - 1, 0, -1):
                name = stack[i].name
                if name == "p":
                    del stack[i:]
                    return
                if name in _BUTTON_SCOPE_STOP:
                    break
            # </p> with no open p: acts as <p></p> (in-body rule)
            if body_el is None:
                _ensure_body()
            _insert(Node(ELEMENT, name="p"), False)
            return
        if tag == "br":  # </br> acts as <br>
            if body_el is None:
                _ensure_body()
            _insert(Node(ELEMENT, name="br"), False)
            return
        if tag in ("body", "html"):
            # content after </body>/</html> still belongs to body
            if body_el is None:
                _ensure_body()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i] is body_el:
                    del stack[i + 1:]
                    return
            return
        # tag == "head"
        if head_open:
            for i in range(len(stack) - 1, 0, -1):
                if stack[i] is head_el:
                    del stack[i:]
                    break
            head_open = False
        elif head_el is None:
            _open_head()  # </head> implies an (empty) head...
            stack.pop()  # ...which closes immediately
            head_open = False

    for ev in events:
        k = ev[0]
        if k == "d":
            top = stack[-1]
            if body_el is None and (
                top is root or top is html_el or top is head_el
            ):
                data = ev[1]
                if all(c in _WS for c in data):
                    pass  # whitespace may sit at the current level
                else:
                    _ensure_body()
                    top = stack[-1]
            ch = top.children
            if ch and ch[-1].kind == TEXT:
                ch[-1].text += ev[1]
            else:
                node = Node(TEXT, text=ev[1])
                node.parent = top
                ch.append(node)
        elif k == "s" or k == "x":
            name = ev[1]
            push = k == "s" and name not in VOID_ELEMENTS
            if name in _SPECIAL_START:
                _start_special(name, ev[2], push)
                continue
            if body_el is None:
                top = stack[-1]
                if top is root or top is html_el or top is head_el:
                    if name in _HEAD_ONLY:
                        if head_el is not None and not head_open:
                            # after-head metadata: the spec pushes the
                            # head back, processes in-head, pops it
                            if push:
                                stack.append(head_el)
                                head_reopened = True
                            else:
                                _insert_into(head_el,
                                             _make_element(name, ev[2]))
                                continue
                        else:
                            _open_head()
                    else:
                        _ensure_body()
            _insert(_make_element(name, ev[2]), push)
        elif k == "e":
            tag = ev[1]
            if tag in _SPECIAL_END:
                _end_special(tag)
                continue
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].name == tag:
                    del stack[i:]
                    break
            else:
                errors.append(f"unmatched end tag </{tag}>")
            if head_reopened and stack[-1] is head_el:
                stack.pop()
                head_reopened = False
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
        # construct only stdlib handles, so retokenize with html.parser.
        # BOTH paths build through the same _build_tree, so the html5
        # insertion rules apply identically whatever tokenized.
        evs = _fast_tokenize(html)
        if evs is None:
            ec = _EventCollector()
            try:
                ec.feed(html)
                ec.close()
            except Exception:  # never fatal (html/mod.rs:19-22)
                pass
            evs = ec.events
        root, errors = _build_tree(evs)
        return cls(root, errors)

    def select(self, selector_str: str):
        from swspark.extract.selectors import select

        return select(self.root, selector_str)

    def root_element(self) -> Node | None:
        for c in self.root.children:
            if c.kind == ELEMENT:
                return c
        return None
