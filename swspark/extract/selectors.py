"""CSS selector subset — parse + match in document order.

Reimplements the selector surface of the reference
(crates/sws-scraper/src/selector.rs:25-57,141-168 and the servo
Element-trait impl element.rs:9-148): the servo `selectors` engine with
**no** non-tree-structural pseudo-classes and no pseudo-elements.

Supported (the reference's full surface):
- selector groups ``a, b``; combinators: descendant (whitespace) and
  child ``>`` (the only combinators the shipped scripts use; sibling
  combinators ``+``/``~`` are also implemented for servo parity);
- compound selectors: type, ``*``, ``#id``, ``.class``,
  ``[attr]``, ``[attr=v]``, ``[attr~=v]``, ``[attr|=v]``,
  ``[attr^=v]``, ``[attr$=v]``, ``[attr*=v]`` (quoted or bare values);
- tree-structural pseudo-classes (element.rs:97-111 rejects all
  others): ``:root``, ``:empty``, ``:first-child``, ``:last-child``,
  ``:only-child``, ``:first-of-type``, ``:last-of-type``,
  ``:only-of-type``, ``:nth-child(An+B)``, ``:nth-last-child(An+B)``,
  ``:nth-of-type(An+B)``, ``:nth-last-of-type(An+B)``;
- ``:scope`` — matches the element ``select`` was called on
  (selector.rs:40-57; test element_ref/mod.rs:176-193).

Matching walks the subtree pre-order and tests each element
right-to-left with ancestor backtracking, so results come back in
document order like the reference's Select iterator
(element_ref/mod.rs:110-136).
"""

from __future__ import annotations

import re
from functools import lru_cache

from swspark.extract.dom import ELEMENT, Node

__all__ = ["Selector", "SelectorParseError", "select", "matches"]


class SelectorParseError(ValueError):
    """Invalid selector (reference: Selector::parse error,
    selector.rs:191-211 tests)."""


# --- parsing ---------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<combinator>[>+~])
  | (?P<comma>,)
  | (?P<hash>\#[\w-]+)
  | (?P<class>\.[\w-]+)
  | (?P<attr>\[\s*[-\w]+\s*(?:[~|^$*]?=\s*(?:"[^"]*"|'[^']*'|[^\]\s]+)\s*)?\])
  | (?P<pseudo>:[-\w]+(?:\([^)]*\))?)
  | (?P<type>(?:[\w-]+|\*))
    """,
    re.VERBOSE,
)

_ATTR_RE = re.compile(
    r"""\[\s*(?P<name>[-\w]+)\s*
        (?:(?P<op>[~|^$*]?=)\s*(?P<val>"[^"]*"|'[^']*'|[^\]\s]+)\s*)?\]""",
    re.VERBOSE,
)

_NTH_RE = re.compile(
    r"^\s*(?:(?P<odd>odd)|(?P<even>even)"
    r"|(?P<a>[+-]?\d*)n\s*(?:(?P<sign>[+-])\s*(?P<b2>\d+))?"
    r"|(?P<b>[+-]?\d+))\s*$"
)

_SIMPLE_PSEUDOS = frozenset(
    [
        "root",
        "empty",
        "scope",
        "first-child",
        "last-child",
        "only-child",
        "first-of-type",
        "last-of-type",
        "only-of-type",
    ]
)
_NTH_PSEUDOS = frozenset(
    ["nth-child", "nth-last-child", "nth-of-type", "nth-last-of-type"]
)


def _parse_nth(arg: str) -> tuple[int, int]:
    m = _NTH_RE.match(arg)
    if not m:
        raise SelectorParseError(f"bad An+B expression: {arg!r}")
    if m.group("odd"):
        return 2, 1
    if m.group("even"):
        return 2, 0
    if m.group("b") is not None:
        return 0, int(m.group("b"))
    a_txt = m.group("a")
    a = 1 if a_txt in ("", "+") else (-1 if a_txt == "-" else int(a_txt))
    b = 0
    if m.group("b2") is not None:
        b = int(m.group("b2"))
        if m.group("sign") == "-":
            b = -b
    return a, b


class Compound:
    """One compound selector: type + simple selectors, all must match."""

    __slots__ = ("type", "id", "classes", "attrs", "pseudos", "nths", "scope")

    def __init__(self) -> None:
        self.type: str | None = None  # None or "*" handled as None
        self.id: str | None = None
        self.classes: list[str] = []
        self.attrs: list[tuple[str, str | None, str]] = []  # (name, op, value)
        self.pseudos: list[str] = []
        self.nths: list[tuple[str, int, int]] = []  # (kind, a, b)
        self.scope = False

    def empty(self) -> bool:
        return not (
            self.type
            or self.id
            or self.classes
            or self.attrs
            or self.pseudos
            or self.nths
            or self.scope
        )


class Selector:
    """A parsed selector group (reference: Selector wraps
    SelectorList — selector.rs:25-38)."""

    __slots__ = ("source", "complexes")

    def __init__(self, source: str):
        self.source = source
        # Each complex: list of (compound, combinator_to_its_right).
        # Stored right-to-left for matching; rightmost combinator None.
        self.complexes: list[list[tuple[Compound, str | None]]] = []
        self._parse(source)

    @classmethod
    @lru_cache(maxsize=4096)
    def parse(cls, source: str) -> "Selector":
        """Parse with memoization — extraction specs re-select the
        same selector strings for every row of every Arrow batch."""
        return cls(source)

    def _parse(self, source: str) -> None:
        if not source or not source.strip():
            raise SelectorParseError("empty selector")
        for part in self._split_group(source):
            self.complexes.append(self._parse_complex(part))
        if not self.complexes:
            raise SelectorParseError(f"no selectors in {source!r}")

    @staticmethod
    def _split_group(source: str) -> list[str]:
        # Commas cannot appear inside our supported tokens except
        # attr values / pseudo args; split carefully.
        parts, depth, cur = [], 0, []
        for ch in source:
            if ch in "[(":
                depth += 1
            elif ch in "])":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        parts.append("".join(cur))
        out = [p for p in (s.strip() for s in parts) if p]
        if len(out) != len(parts):
            raise SelectorParseError(f"empty selector in group: {source!r}")
        return out

    def _parse_complex(self, src: str) -> list[tuple[Compound, str | None]]:
        seq: list[tuple[Compound, str | None]] = []  # left-to-right first
        cur = Compound()
        pending_combinator: str | None = None  # to the LEFT of cur
        saw_ws = False
        pos = 0
        first = True
        while pos < len(src):
            m = _TOKEN_RE.match(src, pos)
            if not m:
                raise SelectorParseError(f"unexpected {src[pos:]!r} in {src!r}")
            pos = m.end()
            kind = m.lastgroup
            tok = m.group(0)
            if kind == "ws":
                saw_ws = True
                continue
            if kind == "comma":  # handled by _split_group
                raise SelectorParseError("unexpected comma")
            if kind == "combinator":
                if cur.empty() and first:
                    raise SelectorParseError(f"dangling combinator in {src!r}")
                seq.append((cur, tok))
                cur = Compound()
                saw_ws = False
                first = False
                continue
            # A simple-selector token: if whitespace separated it from
            # the previous compound, that's a descendant combinator.
            if saw_ws and not cur.empty():
                seq.append((cur, " "))
                cur = Compound()
            saw_ws = False
            first = False
            self._add_token(cur, kind, tok, src)
        if cur.empty():
            raise SelectorParseError(f"dangling combinator in {src!r}")
        seq.append((cur, None))
        # seq is left-to-right with combinator-to-the-RIGHT stored on
        # each entry's second slot shifted: convert to right-to-left
        # with combinator linking each compound to the one on its left.
        rtl: list[tuple[Compound, str | None]] = []
        for i in range(len(seq) - 1, -1, -1):
            comp = seq[i][0]
            comb_left = seq[i - 1][1] if i > 0 else None
            rtl.append((comp, comb_left))
        return rtl

    @staticmethod
    def _add_token(cur: Compound, kind: str, tok: str, src: str) -> None:
        if kind == "type":
            if cur.type is not None or not cur.empty():
                # type selector must come first in a compound
                raise SelectorParseError(f"misplaced type selector in {src!r}")
            cur.type = tok.lower()
        elif kind == "hash":
            cur.id = tok[1:]
        elif kind == "class":
            cur.classes.append(tok[1:])
        elif kind == "attr":
            am = _ATTR_RE.match(tok)
            if not am:
                raise SelectorParseError(f"bad attribute selector {tok!r}")
            name = am.group("name").lower()
            op = am.group("op")
            val = am.group("val")
            if val is not None and val[:1] in "\"'":
                val = val[1:-1]
            cur.attrs.append((name, op, val if val is not None else ""))
        elif kind == "pseudo":
            name, _, arg = tok[1:].partition("(")
            name = name.lower()
            if arg:
                arg = arg.rstrip(")")
                if name not in _NTH_PSEUDOS:
                    raise SelectorParseError(f"unsupported pseudo-class :{name}()")
                a, b = _parse_nth(arg)
                cur.nths.append((name, a, b))
            elif name in _NTH_PSEUDOS:
                raise SelectorParseError(f":{name} requires an argument")
            elif name == "scope":
                cur.scope = True
            elif name in _SIMPLE_PSEUDOS:
                cur.pseudos.append(name)
            else:
                # Reference rejects all non-tree-structural
                # pseudo-classes (element.rs:97-111) and all
                # pseudo-elements (element.rs:113-121).
                raise SelectorParseError(f"unsupported pseudo-class :{name}")


# --- matching --------------------------------------------------------


def _element_siblings(el: Node) -> list[Node]:
    if el.parent is None:
        return [el]
    return [c for c in el.parent.children if c.kind == ELEMENT]


def _nth_match(a: int, b: int, index: int) -> bool:
    """index is 1-based position; matches An+B for some integer n>=0."""
    if a == 0:
        return index == b
    d = index - b
    return d % a == 0 and d // a >= 0


def _match_compound(el: Node, comp: Compound, scope: Node | None) -> bool:
    if el.kind != ELEMENT:
        return False
    if comp.scope and el is not scope:
        return False
    if comp.type is not None and comp.type != "*" and el.name != comp.type:
        return False
    if comp.id is not None and el.id != comp.id:
        return False
    for c in comp.classes:
        if c not in el.classes:
            return False
    for name, op, val in comp.attrs:
        actual = el.attrs.get(name)
        if actual is None:
            return False
        if op is None:
            continue
        if op == "=":
            ok = actual == val
        elif op == "~=":
            ok = val in actual.split()
        elif op == "|=":
            ok = actual == val or actual.startswith(val + "-")
        elif op == "^=":
            ok = bool(val) and actual.startswith(val)
        elif op == "$=":
            ok = bool(val) and actual.endswith(val)
        elif op == "*=":
            ok = bool(val) and val in actual
        else:  # pragma: no cover
            ok = False
        if not ok:
            return False
    for p in comp.pseudos:
        if not _match_pseudo(el, p):
            return False
    for kind, a, b in comp.nths:
        sibs = _element_siblings(el)
        if "of-type" in kind:
            sibs = [s for s in sibs if s.name == el.name]
        idx = sibs.index(el) + 1
        if kind in ("nth-last-child", "nth-last-of-type"):
            idx = len(sibs) - idx + 1
        if not _nth_match(a, b, idx):
            return False
    return True


def _match_pseudo(el: Node, name: str) -> bool:
    if name == "root":
        return el.parent is not None and el.parent.kind != ELEMENT
    if name == "empty":
        return not any(
            c.kind == ELEMENT or (c.kind == 3 and c.text) for c in el.children
        )
    sibs = _element_siblings(el)
    if name == "first-child":
        return sibs[0] is el
    if name == "last-child":
        return sibs[-1] is el
    if name == "only-child":
        return len(sibs) == 1
    of_type = [s for s in sibs if s.name == el.name]
    if name == "first-of-type":
        return of_type[0] is el
    if name == "last-of-type":
        return of_type[-1] is el
    if name == "only-of-type":
        return len(of_type) == 1
    return False  # pragma: no cover


def _match_complex(
    el: Node, rtl: list[tuple[Compound, str | None]], i: int, scope: Node | None
) -> bool:
    comp, comb_left = rtl[i]
    if not _match_compound(el, comp, scope):
        return False
    if comb_left is None:
        return True
    nxt = i + 1
    if comb_left == ">":
        p = el.parent
        return p is not None and _match_complex(p, rtl, nxt, scope)
    if comb_left == " ":
        p = el.parent
        while p is not None:
            if _match_complex(p, rtl, nxt, scope):
                return True
            p = p.parent
        return False
    if comb_left == "+":
        sibs = el.parent.children if el.parent else []
        prev = None
        for c in sibs:
            if c is el:
                break
            if c.kind == ELEMENT:
                prev = c
        return prev is not None and _match_complex(prev, rtl, nxt, scope)
    if comb_left == "~":
        if el.parent is None:
            return False
        for c in el.parent.children:
            if c is el:
                break
            if c.kind == ELEMENT and _match_complex(c, rtl, nxt, scope):
                return True
        return False
    return False  # pragma: no cover


def _match_any(el: Node, complexes, scope: Node | None) -> bool:
    # plain loop, not any(genexpr): this is the single hottest call
    # site in spec extraction (profiled ~3.4 us per genexpr setup vs
    # sub-us for the loop; selectors usually have ONE complex)
    for cx in complexes:
        if _match_complex(el, cx, 0, scope):
            return True
    return False


def matches(el: Node, selector: "Selector | str", scope: Node | None = None) -> bool:
    if isinstance(selector, str):
        selector = Selector.parse(selector)
    return _match_any(el, selector.complexes, scope)


def select(root: Node, selector: "Selector | str"):
    """Yield strict-descendant elements of ``root`` matching
    ``selector``, in pre-order document order; ``:scope`` refers to
    ``root`` (element_ref/mod.rs:47-56,110-136)."""
    if isinstance(selector, str):
        selector = Selector.parse(selector)
    complexes = selector.complexes
    for el in root.descendant_elements():
        if _match_any(el, complexes, root):
            yield el


def select_first_multi(
    root: Node, selectors: "tuple[str, ...]"
) -> "list[Node | None]":
    """FIRST match (document order) for each of several selectors in
    ONE pre-order traversal — identical results to
    [next(select(root, s), None) for s in selectors] (pinned by
    tests), but a spec extracting k fields per section pays one
    subtree walk instead of k. Stops early once every selector has
    matched (the common case: one hit per field per section)."""
    sels = [Selector.parse(s) for s in selectors]
    found: list[Node | None] = [None] * len(sels)
    remaining = len(sels)
    for el in root.descendant_elements():
        for i, sel in enumerate(sels):
            if found[i] is None and _match_any(el, sel.complexes, root):
                found[i] = el
                remaining -= 1
                if not remaining:
                    return found
    return found
