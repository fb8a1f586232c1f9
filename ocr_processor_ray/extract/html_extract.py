"""N2 — HTML boilerplate removal via text-density scoring (Arc90-lite).

Public-knowledge algorithm in the Readability / Arc90 family: drop known
boilerplate subtrees, restrict to the main content container when one is
declared, keep block elements whose link density is low. Plays the role
of the reference's layout-tree parse that locates the real content
inside markup (HOCR word extraction, ocr_combined.py:71-82), with
character spans replacing pixel bboxes.

Implementation uses only the stdlib ``html.parser`` so the DOM is frozen
and bit-deterministic across workers (SURVEY.md §7.4 hard part 1).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# subtrees dropped outright (boilerplate by tag)
_DROP_TAGS = frozenset(
    {"script", "style", "nav", "footer", "header", "aside", "form", "noscript",
     "iframe", "svg", "button"}
)
# class/id tokens marking boilerplate containers
_DROP_TOKENS = frozenset(
    {"ad", "ads", "advert", "banner", "sidebar", "menu", "nav", "footer",
     "promo", "cookie", "popup", "share", "social"}
)
# content containers searched for first (document order)
_MAIN_TAGS = ("main", "article")
# block elements emitted as extraction units
_BLOCK_TAGS = frozenset(
    {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote", "td"}
)
_VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)

MAX_LINK_DENSITY = 0.5


class _Node:
    __slots__ = ("tag", "dropped", "children", "parent")

    def __init__(self, tag: str, dropped: bool, parent: "_Node | None"):
        self.tag = tag
        self.dropped = dropped
        self.children: list[object] = []  # str (text) or _Node
        self.parent = parent


class _DomBuilder(HTMLParser):
    """Minimal DOM: enough structure for density scoring, nothing more."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", False, None)
        self._cur = self.root

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            if tag == "br":
                self._cur.children.append("\n")
            return
        dropped = tag in _DROP_TAGS
        if not dropped:
            for k, v in attrs:
                if k in ("class", "id") and v:
                    toks = v.replace("-", " ").replace("_", " ").lower().split()
                    if any(t in _DROP_TOKENS for t in toks):
                        dropped = True
                        break
        node = _Node(tag, dropped, self._cur)
        self._cur.children.append(node)
        self._cur = node

    def handle_endtag(self, tag):
        # close the nearest open element with this tag (tolerant of
        # mis-nesting, as real-world fragments require)
        cur = self._cur
        while cur is not None and cur.tag != tag:
            cur = cur.parent
        if cur is not None and cur.parent is not None:
            self._cur = cur.parent

    def handle_data(self, data):
        self._cur.children.append(data)


def _walk_text(node: _Node) -> tuple[int, int]:
    """Return (total_chars, link_chars) of non-dropped descendant text."""
    total = 0
    link = 0
    stack: list[tuple[object, bool]] = [(c, node.tag == "a") for c in node.children]
    while stack:
        item, in_link = stack.pop()
        if isinstance(item, str):
            n = len(item.strip())
            total += n
            if in_link:
                link += n
        elif not item.dropped:
            stack.extend((c, in_link or item.tag == "a") for c in item.children)
    return total, link


def _collect_text(node: _Node, out: list[str]) -> None:
    for c in node.children:
        if isinstance(c, str):
            out.append(c)
        elif not c.dropped:
            _collect_text(c, out)


def _find_first(node: _Node, tags: tuple[str, ...]) -> "_Node | None":
    for c in node.children:
        if isinstance(c, _Node) and not c.dropped:
            if c.tag in tags:
                return c
            found = _find_first(c, tags)
            if found is not None:
                return found
    return None


def _collect_blocks(node: _Node, out: list[tuple[str, str]]) -> None:
    """Append (tag, raw_text) for block elements in document order.

    Block elements nested inside other block elements (e.g. ``li`` inside
    a scored ``li``) are not double-emitted: recursion stops at a block.
    """
    for c in node.children:
        if not isinstance(c, _Node) or c.dropped:
            continue
        if c.tag in _BLOCK_TAGS:
            total, link = _walk_text(c)
            if total > 0 and (link / total) <= MAX_LINK_DENSITY:
                parts: list[str] = []
                _collect_text(c, parts)
                out.append((c.tag, "".join(parts)))
        else:
            _collect_blocks(c, out)


# ------------------------------------------------------------ fast path
#
# ``html.parser`` dominates the extraction kernel's profile (~58% of UDF
# time). The scanner below handles the common well-formed subset with two
# compiled regexes and produces a tree IDENTICAL to _DomBuilder's; on
# anything outside that subset — entity references, comments/doctype/
# CDATA, a ``<`` that isn't a clean tag, end tags with attributes,
# ``>`` inside quoted attribute values — it returns None and the stdlib
# parser runs instead. The choice depends only on the text, so results
# stay deterministic; equivalence is property-tested (fast ≡ stdlib on
# the synthetic corpus + adversarial fragments, test_kernels.py).

_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*"
    r"(?:\s*=\s*(?:\"[^\"<>]*\"|'[^'<>]*'|[^\s<>\"'`=]+))?)*)"
    r"\s*(/?)>"
)
_ATTR_RE = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s\"'`=<>]+)))?"
)
# stdlib parses script/style content in CDATA mode (no tags inside);
# the fast path replicates it only for a clean close — else bails
_CDATA_CLOSE = {
    t: (re.compile(rf"</\s*{t}", re.I), re.compile(rf"</\s*{t}\s*>", re.I))
    for t in ("script", "style")
}


def _stdlib_root(text: str) -> "_Node":
    builder = _DomBuilder()
    builder.feed(text)
    builder.close()
    return builder.root


def _fast_parse(text: str) -> "_Node | None":
    """Build the same tree as _DomBuilder, or None when the fragment
    needs the tolerant stdlib parser."""
    if "&" in text:  # entity refs: stdlib unescapes (convert_charrefs)
        return None
    root = _Node("#root", False, None)
    cur = root
    pos = 0
    n = len(text)
    while pos < n:
        lt = text.find("<", pos)
        if lt < 0:
            cur.children.append(text[pos:])
            break
        if lt > pos:
            cur.children.append(text[pos:lt])
        m = _TAG_RE.match(text, lt)
        if m is None:
            return None  # comment, doctype, bogus '<', unterminated tag …
        closing, tag, rawattrs, selfclose = m.groups()
        tag = tag.lower()
        if closing:
            if rawattrs.strip() or selfclose:
                return None  # end tag with attrs — stdlib semantics differ
            c = cur
            while c is not None and c.tag != tag:
                c = c.parent
            if c is not None and c.parent is not None:
                cur = c.parent
        else:
            if tag in _VOID_TAGS:
                if tag == "br":
                    cur.children.append("\n")
            else:
                dropped = tag in _DROP_TAGS
                if not dropped and rawattrs:
                    for am in _ATTR_RE.finditer(rawattrs):
                        k = am.group(1).lower()
                        if k in ("class", "id"):
                            v = am.group(2) or am.group(3) or am.group(4)
                            if v:
                                toks = (
                                    v.replace("-", " ").replace("_", " ").lower().split()
                                )
                                if any(t in _DROP_TOKENS for t in toks):
                                    dropped = True
                                    break
                node = _Node(tag, dropped, cur)
                cur.children.append(node)
                if not selfclose:
                    if tag in _CDATA_CLOSE:
                        prefix_re, close_re = _CDATA_CLOSE[tag]
                        mp = prefix_re.search(text, m.end())
                        mc = close_re.match(text, mp.start()) if mp else None
                        if mc is None:
                            return None  # unclosed/odd close — stdlib path
                        if mp.start() > m.end():
                            node.children.append(text[m.end() : mp.start()])
                        pos = mc.end()
                        continue
                    cur = node
        pos = m.end()
    return root


def extract_html_blocks(text: str) -> list[tuple[str, str]]:
    """Parse an HTML fragment and return content blocks ``(kind, raw_text)``.

    1. Drop boilerplate subtrees (tag set + class/id token set).
    2. If a ``<main>``/``<article>`` container exists, restrict to the
       first one in document order.
    3. Emit block elements whose link density ≤ 0.5, document order.
    4. Fragment with no block elements at all → the whole scope's text as
       one block of kind ``"text"``.
    """
    root = _fast_parse(text)
    if root is None:
        root = _stdlib_root(text)
    scope = _find_first(root, _MAIN_TAGS) or root
    blocks: list[tuple[str, str]] = []
    _collect_blocks(scope, blocks)
    if not blocks:
        parts: list[str] = []
        if not scope.dropped:
            _collect_text(scope, parts)
        raw = "".join(parts)
        if raw.strip():
            blocks.append(("text", raw))
    return blocks
