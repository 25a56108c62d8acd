"""Executable extraction spec — pure-Python reimplementation of the reference's
HTML→MDX kernel (duggal1/supercrawler, canonical variant ``src/supercrawler.rs``).

This module is the single source of truth for the per-row invariant
("byte-identical extracted text per url"): every function mirrors a cited span
of the reference and is exercised by golden fixtures in ``tests/``. The Spark
engine never calls the reference; it calls these functions from vectorized
pandas UDFs (see ``supercrawler_spark.functions.udfs``).

Reference citations (all into /root/reference):
  - element_to_markdown      src/supercrawler.rs:81-131
  - process_element          src/supercrawler.rs:133-345
  - code-language inference  src/supercrawler.rs:170-213
  - table → markdown         src/supercrawler.rs:250-310
  - clean_to_mdx             src/supercrawler.rs:347-500
  - link extraction          src/supercrawler.rs:736-757 (inline single-fetch variant)
  - url_to_filename          src/supercrawler.rs:527-562
  - PDF MDX wrapper          src/supercrawler.rs:720-723

Implementation notes on parity:
  - The reference parses with html5ever (WHATWG); we parse with stdlib
    ``html.parser`` extended with the WHATWG implied-end-tag rules the
    real web exercises most: block starts close an open <p>; <li>, <dt>/
    <dd>, <td>/<th>, <tr>, <option>/<optgroup> close their open siblings
    (scope-bounded); a heading start pops an open heading; a stray </p>
    synthesizes an empty <p>; non-whitespace text and non-table start
    tags inside table internals are FOSTER-PARENTED before the table,
    and td/th/tr starts clear the stack back to their row/table context.
    Unclosed-tag markup in these families now builds the same sibling
    structure html5ever does (adversarial fixtures in
    tests/test_refspec.py). Misnested inline formatting
    (``<b>x<i>y</b>z</i>``) runs a simplified adoption agency: the
    formatting elements implicitly closed by the mismatched end tag are
    queued and LAZILY reconstructed around the next content insertion
    (never eager — an empty clone would fabricate elements and
    duplicate <a href> extraction), cancelled by their own later end
    tag. Formatting cut by an IMPLIED close (``<p><b>x<p>y``) is
    re-queued the same way — html5ever keeps such elements in the
    active formatting list — bounded by WHATWG markers (td/th/
    caption/table) so table-cell formatting never leaks across
    cells. html/head/body are SYNTHESIZED per the WHATWG
    before-html/before-head/in-head/after-head modes (fragment
    input, head-only documents, even the empty string parse to
    html>head>body exactly like html5ever; re-opened html/head/
    body tags are ignored; </body> and </html> never pop — trailing
    markup stays in the body subtree), closing the last documented
    divergence class.
  - Rust ``str::len`` is bytes; the ``len > 10`` loose-text rule and the
    250-char description truncation use UTF-8 byte lengths here too.
  - CSS selector groups in scraper match in *document order* across the whole
    group (first element matching any alternative), reproduced exactly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Optional

from supercrawler_spark.functions.urls import rust_url_parse, rust_url_join

# --------------------------------------------------------------------------
# Minimal DOM (html5ever-compatible on well-formed input)
# --------------------------------------------------------------------------

VOID_ELEMENTS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

# tags whose open implicitly closes a still-open <p> (html5ever behavior)
_P_CLOSERS = {
    "p", "div", "ul", "ol", "li", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "pre", "table", "section", "article", "main", "header",
    "footer", "nav", "aside", "form", "dl", "dt", "dd",
}

# WHATWG implied-end-tag rules beyond <p> (html5ever's tree builder,
# exercised by the reference via process_element over real-web markup):
# a start tag of KEY closes any open tag in TARGETS, scanning the open
# stack top-down and stopping at the scope BARRIERS. This is what makes
# the common malformed patterns — unclosed <li>, <td>, <tr>, <dt>/<dd>,
# <option> — produce the same sibling structure html5ever builds.
_IMPLIED_CLOSES: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    "li": (("li",), ("ul", "ol", "menu")),
    "dt": (("dt", "dd"), ("dl",)),
    "dd": (("dt", "dd"), ("dl",)),
    "tr": (("tr", "td", "th"), ("thead", "tbody", "tfoot", "table")),
    "td": (("td", "th"), ("tr", "thead", "tbody", "tfoot", "table")),
    "th": (("td", "th"), ("tr", "thead", "tbody", "tfoot", "table")),
    "option": (("option",), ("select", "optgroup", "datalist")),
    "optgroup": (("option", "optgroup"), ("select",)),
}

# WHATWG "special" category (HTML namespace): the li/dt/dd start-tag
# algorithms stop their close-the-open-sibling scan at ANY special element
# other than address/div/p — e.g. <li>a<section><li>b keeps the outer li
# open, while <li>a<div><li>b closes it across the div.
_SPECIAL = {
    "address", "applet", "area", "article", "aside", "base", "basefont",
    "bgsound", "blockquote", "body", "br", "button", "caption", "center",
    "col", "colgroup", "dd", "details", "dir", "div", "dl", "dt", "embed",
    "fieldset", "figcaption", "figure", "footer", "form", "frame",
    "frameset", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header",
    "hgroup", "hr", "html", "iframe", "img", "input", "keygen", "li",
    "link", "listing", "main", "marquee", "menu", "meta", "nav", "noembed",
    "noframes", "noscript", "object", "ol", "p", "param", "plaintext",
    "pre", "script", "search", "section", "select", "source", "style",
    "summary", "table", "tbody", "td", "template", "textarea", "tfoot",
    "th", "thead", "title", "tr", "track", "ul", "wbr", "xmp",
}
_SPECIAL_SCAN_EXCEPT = {"address", "div", "p"}
_SPECIAL_RULE_KEYS = {"li", "dt", "dd"}

_HEADINGS = {"h1", "h2", "h3", "h4", "h5", "h6"}

_SCOPE_BARRIERS = {
    "body", "html", "#document", "template",
    # WHATWG base "in scope" list: every has-an-element-in-scope variant
    # includes these, so a <li> start inside a table nested in an open
    # <li> must NOT close the outer item and pop the table — the scan
    # stops at the cell/table boundary (html5ever list-item scope).
    "applet", "caption", "marquee", "object", "table", "td", "th",
}

# WHATWG foster parenting: while the insertion point is one of the table
# internals, character data with non-whitespace and start tags that are not
# legal table content are inserted immediately BEFORE the nearest open
# <table> in its parent (html5ever's "in table" insertion-mode recovery —
# real-web `<table>stray text<tr>…` hoists the stray run above the table).
_TABLE_CONTEXT = {"table", "thead", "tbody", "tfoot", "tr"}
_TABLE_ALLOWED = {
    "caption", "colgroup", "col", "thead", "tbody", "tfoot", "tr",
    "td", "th", "script", "style", "template", "form", "table",
}

# td/th/tr starts "clear the stack back to a table (row) context": any
# non-target element still open above the tr/table (a foster-parented <p>,
# a misnested <span>) is popped before the cell/row is inserted.
_CLEAR_TO_CONTEXT = {"td", "th", "tr"}

# WHATWG active formatting elements (the adoption-agency set): when an end
# tag closes an element with formatting elements still open ABOVE it
# (misnested ``<b>x<i>y</b>z</i>``), html5ever reopens the formatting
# elements around the following content — z renders inside a fresh <i>.
_FORMATTING = {"a", "b", "big", "code", "em", "font", "i", "nobr", "s",
               "small", "strike", "strong", "tt", "u"}
# elements that push a MARKER onto the active formatting list (WHATWG
# "insert a marker at the end of the list"): formatting opened inside
# never reconstructs outside
_FMT_MARKERS = {"table", "td", "th", "caption", "applet", "marquee",
                "object", "template"}


# shared attrs dict for the (majority) attribute-less elements and for
# text nodes: per-page allocation profiling showed the per-Node dict was
# a top allocation site, and most nodes never carry attributes. NEVER
# mutated — every writer must swap in a private dict first
# (_merge_doc_attrs does).
_EMPTY_ATTRS: dict = {}


@dataclass(slots=True, eq=False)
class Node:
    """DOM node: element (tag set) or text (tag is None).

    ``slots=True``: a page allocates thousands of Nodes and the per-
    instance ``__dict__`` was the kernel's single largest allocation
    source (measured ~12 KB/page of the 35 KB/page total) — slots cut the
    memory traffic behind the multi-core scaling ceiling. ``eq=False``:
    identity equality — the tree uses ``is`` checks and
    ``children.index`` for the foster-parent target, where value equality
    could even match a deeply-identical EARLIER sibling."""

    tag: Optional[str]
    attrs: dict = field(default_factory=dict)
    children: list = field(default_factory=list)
    text: str = ""
    parent: Optional["Node"] = None
    _flat: Optional[list] = field(default=None, init=False, repr=False)

    @property
    def is_element(self) -> bool:
        return self.tag is not None

    def attr(self, name: str) -> Optional[str]:
        return self.attrs.get(name)

    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def iter_text(self):
        """All descendant text nodes, document order (scraper's ``.text()``)."""
        for child in self.children:
            if child.tag is None:
                yield child.text
            else:
                yield from child.iter_text()

    def all_text(self) -> str:
        return "".join(self.iter_text())

    def descendants(self):
        """All descendant elements, document order, excluding self
        (scraper's ``element.select(sel)`` scope).

        Memoized as a flat preorder list: the extraction kernel runs ~9
        selector passes per page (title, metas, body, main-content, ToC,
        related links, anchors) and the tree is immutable after parse, so
        one iterative walk feeds every pass — the recursive-generator
        re-walks were ~20% of per-page CPU at crawl scale."""
        flat = self._flat
        if flat is None:
            # iterative preorder: children pushed reversed so pops come
            # out in document order
            flat = []
            stack = [c for c in reversed(self.children) if c.tag is not None]
            while stack:
                node = stack.pop()
                flat.append(node)
                kids = node.children
                for i in range(len(kids) - 1, -1, -1):
                    c = kids[i]
                    if c.tag is not None:
                        stack.append(c)
            self._flat = flat
        return flat

    def select(self, pred):
        return [el for el in self.descendants() if pred(el)]

    def select_first(self, pred):
        for el in self.descendants():
            if pred(el):
                return el
        return None


# html/head/body synthesis (WHATWG before-html / before-head / in-head /
# after-head insertion modes): tokens whose insertion point is one of these
# containers may first synthesize missing document structure. Every other
# insertion point skips the check entirely (one set lookup on the hot path).
_SYNTH_TRIGGER = {"#document", "html", "head"}
_DOC_TAGS = ("html", "head", "body")
# start tags the "in head" mode keeps in <head> (spec: base basefont
# bgsound link meta title style script noscript noframes template)
_HEAD_ONLY = {"base", "basefont", "bgsound", "link", "meta", "title",
              "style", "script", "noscript", "noframes", "template"}


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node(tag="#document")
        self.stack = [self.root]
        # the unique html/head/body elements (explicit or synthesized) —
        # html5ever materializes all three for ANY input; re-opened tags
        # merge attributes into these instead of nesting
        self._html: Optional[Node] = None
        self._head: Optional[Node] = None
        self._body: Optional[Node] = None
        # active formatting elements awaiting reconstruction (adoption
        # agency): (tag, attrs) entries, outermost first. Materialized
        # LAZILY on the next content insertion, exactly like html5ever —
        # an eager clone would fabricate empty elements (a duplicate
        # <a href> would corrupt link extraction).
        self._pending_fmt: list[tuple[str, dict]] = []

    def _reconstruct_formatting(self):
        for tag, attrs in self._pending_fmt:
            clone = Node(tag=tag, attrs=dict(attrs))
            clone.parent = self.stack[-1]
            self.stack[-1].children.append(clone)
            self.stack.append(clone)
        self._pending_fmt = []

    def _queue_open_formatting(self, cut: int) -> None:
        """Formatting elements popped by an implied close or left open
        above an explicit close stay in html5ever's list of active
        formatting elements — only their own end tag or the adoption
        agency removes them — so the next content insertion reconstructs
        them (``<p><b>x<p>y`` keeps y bold). Queue them outermost-first,
        STOPPING at the first marker element (td/th/caption/table/…):
        WHATWG pushes a marker onto the active list when entering those,
        and closing them clears the list back to the marker, so
        formatting opened inside a table cell never leaks past it."""
        for el in self.stack[cut:]:
            t = el.tag
            if t in _FMT_MARKERS:
                break
            if t in _FORMATTING:
                self._pending_fmt.append((t, el.attrs))

    def _synth(self, tag: str) -> None:
        node = Node(tag=tag)
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)
        self.stack.append(node)
        setattr(self, "_" + tag, node)

    def _ensure_context(self, tag=None, data=None) -> bool:
        """WHATWG html/head/body synthesis (before-html / before-head /
        in-head / after-head insertion modes reduced to tree shape):
        html5ever materializes html, head and body for ANY input, so
        fragment HTML like ``<p>hi`` parses to html>body>p — the
        could-not-parse branch is dead in the reference and now here too.
        Head-only tags before body go into (a possibly synthesized)
        <head>; the first body-content token implies </head> and <body>.
        Returns True when the token must be DROPPED (whitespace-only text
        above body — the spec ignores it)."""
        top = self.stack[-1].tag
        if top == "#document":
            if tag == "html":
                return False
            if data is not None and not data.strip():
                return True
            self._synth("html")
            top = "html"
        if top == "html":
            if tag == "head":
                return False
            if tag == "body":
                # before-head mode inserts a head for ANY token, an
                # explicit <body> included — html5ever always yields
                # html>head>body, so synthesize the missing head first
                if self._head is None:
                    self._synth("head")
                    self.stack.pop()
                return False
            if data is not None and not data.strip():
                return True
            if tag in _HEAD_ONLY and self._body is None:
                if self._head is None:
                    self._synth("head")
                else:
                    # after-head head-only token: spec re-enters the head
                    # element; popped again by the next body-content token
                    self.stack.append(self._head)
                return False
            if self._head is None:
                self._synth("head")    # spec emits an empty head first
                self.stack.pop()
            self._synth("body")
            return False
        if top == "head" and self._body is None and (
                (data is not None and data.strip())
                or (tag is not None and tag not in _HEAD_ONLY)):
            self.stack.pop()               # implied </head>
            if tag != "body":
                self._synth("body")
        return False

    def finish(self) -> None:
        """EOF: guarantee html>head>body exist even for empty, whitespace-
        only, or head-only documents — exactly html5ever's output shape."""
        if self._body is None:
            if self._html is None:
                self._synth("html")
            else:
                while len(self.stack) > 1 and self.stack[-1] is not self._html:
                    self.stack.pop()
            if self._head is None:
                self._synth("head")
                self.stack.pop()
            self._synth("body")

    def _merge_doc_attrs(self, tag: str, attrs) -> None:
        """Re-opened <html>/<body>: WHATWG in-body mode keeps the existing
        element but adds each token attribute NOT already present on it
        (html5ever does the same). A duplicate <head> start tag is a parse
        error the spec ignores entirely — no attribute merge."""
        if tag == "head":
            return
        node = getattr(self, "_" + tag)
        if node is None:
            return
        if node.attrs is _EMPTY_ATTRS:
            node.attrs = {}
        for k, v in attrs:
            node.attrs.setdefault(k.lower(), v if v is not None else "")

    def _open(self, tag, attrs, self_closing):
        tag = tag.lower()
        if self.stack[-1].tag in _SYNTH_TRIGGER:
            if tag in _DOC_TAGS and getattr(self, "_" + tag) is not None:
                self._merge_doc_attrs(tag, attrs)
                return
            if self._ensure_context(tag=tag):
                return
        elif tag in _DOC_TAGS:
            self._merge_doc_attrs(tag, attrs)
            return
        # implied </p> (html5ever): block-level start closes an open <p>
        if tag in _P_CLOSERS:
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].tag == "p":
                    self._queue_open_formatting(i)
                    del self.stack[i:]
                    break
                if self.stack[i].tag in ("body", "html", "#document",
                                         "td", "th", "li", "table",
                                         "caption"):
                    break
        # WHATWG implied end tags: <li><li>, <td><td>, <tr><tr>, <dt><dd>,
        # <option><option> — close the open sibling(s), bounded by the
        # element's scope. The cut is the DEEPEST matching target above
        # the barrier, so an incoming <tr> closes the whole open row
        # (td AND tr), while a nested <li> inside a fresh <ul> (its
        # barrier) leaves the outer li open.
        closes = _IMPLIED_CLOSES.get(tag)
        if closes is not None:
            targets, barriers = closes
            cut = None
            barrier_i = None
            own_barrier = False
            special_rule = tag in _SPECIAL_RULE_KEYS
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t in targets:
                    cut = i
                    continue
                if special_rule:
                    # li/dt/dd: any special element except address/div/p
                    # ends the scan (WHATWG in-body li/dd/dt start tags)
                    if t in _SPECIAL and t not in _SPECIAL_SCAN_EXCEPT:
                        barrier_i, own_barrier = i, t in barriers
                        break
                elif t in barriers or t in _SCOPE_BARRIERS:
                    barrier_i, own_barrier = i, t in barriers
                    break
            if cut is None and own_barrier and tag in _CLEAR_TO_CONTEXT \
                    and barrier_i < len(self.stack) - 1:
                # "clear the stack back to a table (row) context": a td/th/
                # tr arriving with non-cell elements still open inside the
                # tr/table pops them first. Only when the break was the
                # tag's OWN barrier (tr/table) — a stray <td> with no open
                # table must not pop document structure.
                cut = barrier_i + 1
            if cut is not None:
                if tag not in ("td", "th", "tr"):
                    # cell/row closes clear the active-formatting list up
                    # to the cell's marker (WHATWG) — formatting must NOT
                    # leak across table cells; li/dt/dd/option closes keep
                    # the list, so their formatting reconstructs
                    self._queue_open_formatting(cut)
                del self.stack[cut:]
        # WHATWG: a heading start tag pops a still-open heading (parse
        # error recovery — <h1>a<h2>b becomes siblings, never nesting)
        if tag in _HEADINGS and self.stack[-1].tag in _HEADINGS:
            self.stack.pop()
        if (self._pending_fmt and tag in _FORMATTING
                and self.stack[-1].tag not in _TABLE_CONTEXT):
            # reconstruct active formatting before a nested formatting
            # start so the clone wraps it in the original nesting order
            self._reconstruct_formatting()
        node = Node(tag=tag, attrs={
            k.lower(): (v if v is not None else "") for k, v in attrs
        } if attrs else _EMPTY_ATTRS)
        if tag in _DOC_TAGS:
            setattr(self, "_" + tag, node)  # first occurrence (dups returned)
        if self.stack[-1].tag in _TABLE_CONTEXT and tag not in _TABLE_ALLOWED:
            parent, idx = self._foster_target()
            node.parent = parent
            parent.children.insert(idx, node)
        else:
            node.parent = self.stack[-1]
            self.stack[-1].children.append(node)
        if not self_closing and tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def _foster_target(self):
        """(parent, insert_index) immediately before the nearest open
        <table> — the WHATWG foster-parenting insertion point."""
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == "table":
                tbl = self.stack[i]
                parent = tbl.parent if tbl.parent is not None else self.stack[i - 1]
                return parent, parent.children.index(tbl)
        last = self.stack[-1]
        return last, len(last.children)

    def handle_starttag(self, tag, attrs):
        self._open(tag, attrs, self_closing=False)

    def handle_startendtag(self, tag, attrs):
        self._open(tag, attrs, self_closing=True)

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in VOID_ELEMENTS:
            return
        if tag in ("body", "html"):
            # html5ever: </body> / </html> only switch the insertion mode —
            # the elements never leave the open stack, so trailing markup
            # after </body> keeps inserting at the CURRENT node (it belongs
            # to the body subtree, never to <html>)
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                # adoption agency (simplified): formatting elements still
                # open above the closed element are implicitly closed here
                # and queued for lazy reconstruction (original nesting
                # order) so following CONTENT keeps their formatting —
                # html5ever's recovery for misnested inline markup like
                # <b>x<i>y</b>z</i>. Non-formatting elements stay closed;
                # a closed MARKER element (td/table/…) clears its own
                # formatting instead of queueing it.
                if tag not in _FMT_MARKERS:
                    self._queue_open_formatting(i + 1)
                del self.stack[i:]
                return
        if tag in _FORMATTING:
            # end tag for a formatting element that is only PENDING (its
            # clone was never materialized): cancel the entry — html5ever
            # removes it from the active list without creating an element
            for j in range(len(self._pending_fmt) - 1, -1, -1):
                if self._pending_fmt[j][0] == tag:
                    del self._pending_fmt[j]
                    return
        if tag == "p":
            # WHATWG: </p> with no open <p> inserts an EMPTY <p> element
            # (html5ever does this; it is text-invisible but keeps the
            # sibling structure identical)
            node = Node(tag="p")
            node.parent = self.stack[-1]
            self.stack[-1].children.append(node)
            return
        # stray close tag: ignored (html5ever parse-error recovery)

    def handle_data(self, data):
        if data:
            if (self.stack[-1].tag in _SYNTH_TRIGGER
                    and self._ensure_context(data=data)):
                return
            if (data.strip() and self._pending_fmt
                    and self.stack[-1].tag not in _TABLE_CONTEXT):
                # reconstruct active formatting around the character run
                self._reconstruct_formatting()
            parent = self.stack[-1]
            node = Node(tag=None, text=data, attrs=_EMPTY_ATTRS)
            if parent.tag in _TABLE_CONTEXT and data.strip():
                # foster-parent non-whitespace character runs out of table
                # internals (whitespace-only runs stay in place, per spec)
                parent, idx = self._foster_target()
                node.parent = parent
                parent.children.insert(idx, node)
                return
            node.parent = parent
            parent.children.append(node)


# --------------------------------------------------------------------------
# Fast tokenizer — strict-grammar twin of stdlib html.parser
# --------------------------------------------------------------------------
# The stdlib tokenizer is ~60% of per-page extraction CPU (generic chunked
# feeding, per-token updatepos line accounting, tolerant multi-regex attr
# scanning). This tokenizer drives the SAME _TreeBuilder events over a
# STRICT grammar that is a subset of html.parser's tolerant one: whenever
# it matches, the (event, payload) stream is identical by construction;
# on ANY construct outside the strict grammar (slash-separated attrs,
# unterminated comments, marked sections <![, bogus end tags, values with
# '=' / '<' / backtick, …) it raises and parse_html re-parses the whole
# page with html.parser — bytes-exact behavior at the slow path's cost.
# tests/test_refspec.py::test_fast_tokenizer_* pin tree-equality across
# the corpus generator, the golden fixtures, and an adversarial battery.

from html import unescape as _unescape


class _TokenizerFallback(Exception):
    """Raised when input leaves the strict grammar — caller re-parses with
    the stdlib tokenizer."""


_FAST_START_RE = re.compile(
    r'<([a-zA-Z][-.a-zA-Z0-9:_]*)'                 # tag name
    r'((?:\s+[a-zA-Z_:][-.a-zA-Z0-9:_]*'           # attr name
    r'(?:\s*=\s*(?:"[^"]*"|\'[^\']*\'|[^\s>\'"=<`]+))?)*)'  # attr value
    r'\s*(/?)>')
_FAST_ATTR_RE = re.compile(
    r'\s+([a-zA-Z_:][-.a-zA-Z0-9:_]*)'
    r'(?:\s*=\s*("[^"]*"|\'[^\']*\'|[^\s>\'"=<`]+))?')
_FAST_END_RE = re.compile(r'</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>')
_COMMENT_CLOSE_RE = re.compile(r'--\s*>')          # html.parser commentclose
_CDATA_CLOSE_RE = {                                # html.parser `interesting`
    "script": re.compile(r'</\s*script', re.IGNORECASE),
    "style": re.compile(r'</\s*style', re.IGNORECASE),
}


def _cdata_fast(builder, html: str, i: int, elem: str) -> int:
    """Raw-text (script/style) content: emit raw data up to the first
    ``</elem`` (html.parser never unescapes cdata), close, return the
    resume position. -1 ≙ unclosed raw text: html.parser discards it at
    close() (no flush while cdata_elem is set) — so do we."""
    m = _CDATA_CLOSE_RE[elem].search(html, i)
    if m is None:
        return -1
    j = m.start()
    if j > i:
        builder.handle_data(html[i:j])
    m2 = _FAST_END_RE.match(html, j)
    if m2 is None or m2.group(1).lower() != elem:
        # `</scriptmore>` etc: html.parser treats it as cdata DATA and
        # stays in cdata mode — outside the strict grammar
        raise _TokenizerFallback
    builder.handle_endtag(elem)
    return m2.end()


def _feed_fast(builder, html: str) -> None:
    n = len(html)
    i = 0
    hd = builder.handle_data
    find = html.find
    while i < n:
        j = find("<", i)
        if j < 0:
            chunk = html[i:]
            hd(_unescape(chunk) if "&" in chunk else chunk)
            return
        if j > i:
            chunk = html[i:j]
            hd(_unescape(chunk) if "&" in chunk else chunk)
        c = html[j + 1:j + 2]
        if c and ("a" <= c <= "z" or "A" <= c <= "Z"):
            m = _FAST_START_RE.match(html, j)
            if m is None:
                raise _TokenizerFallback
            tag = m.group(1).lower()
            attrs = []
            rawattrs = m.group(2)
            if rawattrs:
                for am in _FAST_ATTR_RE.finditer(rawattrs):
                    val = am.group(2)
                    if val is not None:
                        if val[0] in "\"'":
                            val = val[1:-1]
                        if val and "&" in val:
                            val = _unescape(val)
                    attrs.append((am.group(1).lower(), val))
            if m.group(3):
                builder.handle_startendtag(tag, attrs)
                i = m.end()
            else:
                builder.handle_starttag(tag, attrs)
                i = m.end()
                if tag in ("script", "style"):
                    i = _cdata_fast(builder, html, i, tag)
                    if i < 0:
                        return
            continue
        if c == "/":
            if html[j:j + 3] == "</>":
                i = j + 3     # html.parser end-tag-open-state: dropped
                continue
            m = _FAST_END_RE.match(html, j)
            if m is None:
                raise _TokenizerFallback
            builder.handle_endtag(m.group(1).lower())
            i = m.end()
            continue
        if c == "!":
            if html[j + 1:j + 4] == "!--":
                m = _COMMENT_CLOSE_RE.search(html, j + 4)
                if m is None:
                    raise _TokenizerFallback
                i = m.end()   # comment ignored (builder has no handler)
                continue
            if html[j + 1:j + 3] == "![":
                raise _TokenizerFallback   # marked section
            g = find(">", j + 2)
            if g < 0:
                raise _TokenizerFallback
            i = g + 1         # doctype / bogus comment: skip past '>'
            continue
        if c == "?":
            g = find(">", j + 2)
            if g < 0:
                raise _TokenizerFallback
            i = g + 1         # processing instruction: ignored
            continue
        hd("<")               # bare '<' (incl. at EOF): literal data
        i = j + 1


def parse_html(html: str) -> Node:
    """Parse to a document node. html5ever always synthesizes html/head/
    body, and so does ``_TreeBuilder`` now (``_ensure_context``/
    ``finish``): fragment input like ``<p>hi`` or even an empty string
    parses to html>head>body, so the kernel's could-not-parse branch is
    as dead here as it is in the reference.

    Fast path: the strict tokenizer above; any input outside its grammar
    re-parses from scratch with stdlib html.parser (identical events on
    the common grammar, tolerant recovery on the rest)."""
    builder = _TreeBuilder()
    try:
        _feed_fast(builder, html)
    except _TokenizerFallback:
        builder = _TreeBuilder()
        builder.feed(html)
        builder.close()
    builder.finish()
    return builder.root


def parse_html_stdlib(html: str) -> Node:
    """The stdlib-tokenizer path, exposed for the fast-path equivalence
    tests (tests/test_refspec.py pins tree equality over the corpus)."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    builder.finish()
    return builder.root


def find_first(root: Node, tag: str) -> Optional[Node]:
    return root.select_first(lambda el: el.tag == tag)


# --------------------------------------------------------------------------
# X1: element_to_markdown — inline conversion (src/supercrawler.rs:81-131)
# --------------------------------------------------------------------------

_INLINE_SKIP = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li", "pre",
    "div", "img", "table", "thead", "tbody", "tr", "th", "td", "blockquote",
}


def element_to_markdown(element: Node) -> str:
    out = []
    for node in element.children:
        if node.tag is None:
            out.append(node.text)
            continue
        tag = node.tag
        if tag == "a":
            href = node.attr("href")
            if href is None:
                href = "#"
            link_text = element_to_markdown(node).strip()
            if link_text:
                out.append(f"[{link_text}]({href})")
        elif tag in ("strong", "b"):
            inner = element_to_markdown(node)
            if inner.strip():
                out.append(f"**{inner.strip()}**")
        elif tag in ("em", "i"):
            inner = element_to_markdown(node)
            if inner.strip():
                out.append(f"*{inner.strip()}*")
        elif tag == "code":
            inner_text = node.all_text().strip()
            if inner_text:
                out.append(f"`{inner_text}`")
        elif tag == "span":
            out.append(element_to_markdown(node))
        elif tag == "br":
            out.append("\n")
        elif tag in _INLINE_SKIP:
            pass  # block-level handled by process_element (rs:120-122)
        else:
            out.append(element_to_markdown(node))
    return "".join(out).strip()


# --------------------------------------------------------------------------
# X3: code-language inference (src/supercrawler.rs:170-213)
# --------------------------------------------------------------------------

_LANG_CLASS_RE = re.compile(r"(?:lang|language)-(\w+)")


def infer_code_language(class_attr: str) -> str:
    m = _LANG_CLASS_RE.search(class_attr)
    if m:
        return m.group(1).lower()
    if "jsx" in class_attr or "javascript" in class_attr:
        return "jsx"
    if "typescript" in class_attr or "ts" in class_attr:
        return "tsx"
    if "bash" in class_attr or "shell" in class_attr or "sh" in class_attr:
        return "bash"
    if "python" in class_attr or "py" in class_attr:
        return "python"
    if "rust" in class_attr or "rs" in class_attr:
        return "rust"
    if "html" in class_attr:
        return "html"
    if "css" in class_attr:
        return "css"
    return ""


# --------------------------------------------------------------------------
# X2/X4: process_element — block conversion (src/supercrawler.rs:133-345)
# --------------------------------------------------------------------------

_CONTAINER_TAGS = {"div", "section", "article", "main", "header", "aside"}
_BLOCKLIST_TAGS = {
    "nav", "footer", "script", "style", "noscript", "iframe", "form",
    "button", "input", "textarea", "select", "option", "label", "svg",
    "canvas", "audio", "video",
}


def _byte_len(s: str) -> int:
    return len(s.encode("utf-8"))


# §2.9 engine-variant divergence: the canonical ``supercrawler.rs`` keeps
# loose container text only when its trimmed byte length exceeds 10
# (rs:316-321,334-340); the ``main.rs`` copy keeps any non-empty text
# (main.rs:318-324,336-342). clean_to_mdx(variant=...) switches this.
_LOOSE_TEXT_MIN_BYTES = 10


def _container_children(element: Node) -> str:
    # shared body of the div/unknown branches (rs:311-325, 329-343)
    out = []
    for child in element.children:
        if child.is_element:
            out.append(process_element(child))
        else:
            trimmed = child.text.strip()
            if trimmed and _byte_len(trimmed) > _LOOSE_TEXT_MIN_BYTES:
                out.append(trimmed)
                out.append("\n\n")
    return "".join(out)


def _render_table(element: Node) -> str:
    # src/supercrawler.rs:250-310
    headers: list[str] = []
    rows: list[list[str]] = []

    thead = element.select_first(lambda el: el.tag == "thead")
    if thead is not None:
        tr = thead.select_first(lambda el: el.tag == "tr")
        if tr is not None:
            for cell in tr.select(lambda el: el.tag in ("th", "td")):
                headers.append(element_to_markdown(cell))
    else:
        tr = element.select_first(lambda el: el.tag == "tr")
        if tr is not None and tr.select_first(lambda el: el.tag == "th") is not None:
            for cell in tr.select(lambda el: el.tag in ("th", "td")):
                headers.append(element_to_markdown(cell))

    rows_container = element.select_first(lambda el: el.tag == "tbody") or element
    skip_first_row = bool(headers) and thead is None

    for tr in rows_container.select(lambda el: el.tag == "tr"):
        if skip_first_row:
            skip_first_row = False
            continue
        row = [element_to_markdown(cell)
               for cell in tr.select(lambda el: el.tag in ("td", "th"))]
        if row:
            rows.append(row)

    out = []
    if headers and rows:
        out.append("| " + " | ".join(headers) + " |\n")
        out.append("| " + " | ".join("---" for _ in headers) + " |\n")
        for row in rows:
            padded = [row[i] if i < len(row) else "" for i in range(len(headers))]
            out.append("| " + " | ".join(padded) + " |\n")
        out.append("\n")
    elif rows:
        for row in rows:
            out.append("| " + " | ".join(row) + " |\n")
        out.append("\n")
    return "".join(out)


def process_element(element: Node) -> str:
    tag = element.tag
    if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
        try:
            level = int(tag[1:])
        except ValueError:
            level = 1
        text = element_to_markdown(element)
        return "" if not text else "#" * level + f" {text}\n\n"
    if tag == "p":
        text = element_to_markdown(element)
        return "" if not text else f"{text}\n\n"
    if tag == "ul":
        items = []
        for li in element.select(lambda el: el.tag == "li"):
            li_text = element_to_markdown(li)
            if li_text:
                items.append(f"* {li_text}\n")
        return "" if not items else "".join(items) + "\n"
    if tag == "ol":
        items = []
        count = 1
        for li in element.select(lambda el: el.tag == "li"):
            li_text = element_to_markdown(li)
            if li_text:
                items.append(f"{count}. {li_text}\n")
                count += 1
        return "" if not items else "".join(items) + "\n"
    if tag == "pre":
        code = element.select_first(lambda el: el.tag == "code")
        if code is not None:
            class_attr = code.attr("class") or ""
            language = infer_code_language(class_attr)
            trimmed_code = code.all_text().strip()
            if not trimmed_code:
                return ""
            if not language and (
                "import React" in trimmed_code
                or "from 'react'" in trimmed_code
                or "next/" in trimmed_code
            ):
                lang_hint = "jsx"
            else:
                lang_hint = language
            return f"```{lang_hint}\n{trimmed_code}\n```\n\n"
        trimmed_pre = element.all_text().strip()
        return "" if not trimmed_pre else f"```\n{trimmed_pre}\n```\n\n"
    if tag == "img":
        src = element.attr("src") or ""
        alt = element.attr("alt") or ""
        if src == "" or src == "/":
            return ""
        return f"![{alt}]({src})\n\n"
    if tag == "a":
        href = element.attr("href")
        if href is None:
            href = "#"
        text = element_to_markdown(element)
        if not text or href == "#":
            return ""
        return f"[{text}]({href})\n\n"
    if tag == "blockquote":
        inner = "".join(process_element(ch) for ch in element.children if ch.is_element)
        trimmed = inner.strip()
        if not trimmed:
            return ""
        quoted = "\n".join(f"> {line}" for line in trimmed.splitlines())
        return f"{quoted}\n\n"
    if tag == "table":
        return _render_table(element)
    if tag in _CONTAINER_TAGS:
        return _container_children(element)
    if tag in _BLOCKLIST_TAGS:
        return ""
    return _container_children(element)


# --------------------------------------------------------------------------
# X5: clean_to_mdx — the full page → MDX transform (src/supercrawler.rs:347-500)
# --------------------------------------------------------------------------

_NOISE_RE = re.compile(
    r"<script.*?</script>|<style.*?</style>|<noscript.*?</noscript>|<!--.*?-->",
    re.IGNORECASE,  # deliberately no DOTALL: Rust regex `.` does not match \n
)
_BLANK_RE = re.compile(r"\n{3,}")

_MAIN_CONTENT_CLASSES = {
    "content", "main-content", "post", "entry", "article-body", "page-content",
}
_MAIN_CONTENT_IDS = {"content", "main-content"}


def _is_main_content(el: Node) -> bool:
    # selector group: main, article, [role='main'], .content, #content,
    # .main-content, #main-content, .post, .entry, .article-body, .page-content
    # (hot path: evaluated once per element per page — dict gets inline,
    # no attr()/classes() method-call overhead)
    tag = el.tag
    if tag == "main" or tag == "article":
        return True
    attrs = el.attrs
    if not attrs:
        return False
    if attrs.get("role") == "main":
        return True
    cls = attrs.get("class")
    if cls and any(c in _MAIN_CONTENT_CLASSES for c in cls.split()):
        return True
    return attrs.get("id") in _MAIN_CONTENT_IDS


def _meta_first(metas, names=(), props=(), itemprops=()) -> Optional[str]:
    """First <meta> of ``metas`` (document order) matching any alternative;
    its content. ``metas`` is the pre-collected meta list from
    ``_page_index`` — one tree pass serves all four meta selector groups."""
    for e in metas:
        a = e.attrs
        if ((a.get("name") or "") in names
                or (a.get("property") or "") in props
                or (a.get("itemprop") or "") in itemprops):
            return a.get("content")
    return None


def _opt_meta(metas, **kw) -> Optional[str]:
    val = _meta_first(metas, **kw)
    if val is None:
        return None
    val = val.strip()
    return val or None


def _page_index(doc: Node):
    """ONE preorder pass collecting everything the frontmatter/selector
    stage needs: (title_el, body_el, metas, canonical_link_el, main_el,
    related_links). Each slot keeps the FIRST document-order match,
    exactly like the per-selector ``select_first`` walks it replaces
    (scraper resolves every selector group in document order)."""
    title_el = body_el = link_el = main_el = None
    metas: list[Node] = []
    related: list[Node] = []
    for el in doc.descendants():
        tag = el.tag
        if tag == "meta":
            metas.append(el)
        elif tag == "title":
            if title_el is None:
                title_el = el
        elif tag == "body":
            if body_el is None:
                body_el = el
        elif tag == "link":
            if link_el is None and el.attrs.get("rel") == "canonical":
                link_el = el
        elif tag == "a" and _is_related_link(el):
            related.append(el)
        if main_el is None and _is_main_content(el):
            main_el = el
    return title_el, body_el, metas, link_el, main_el, related


_HEADING_TAGS = ("h1", "h2", "h3", "h4", "h5", "h6")


def _is_related_link(el: Node) -> bool:
    # a[rel='related'], .related a, .see-also a, .related-posts a, #related-links a
    if el.tag != "a":
        return False
    if el.attr("rel") == "related":
        return True
    anc = el.parent
    while anc is not None and anc.is_element:
        classes = anc.classes()
        if "related" in classes or "see-also" in classes or "related-posts" in classes:
            return True
        if (anc.attr("id") or "") == "related-links":
            return True
        anc = anc.parent
    return False


def _escape_quotes(s: str) -> str:
    return s.replace('"', '\\"')


def clean_to_mdx(content: str, source_url: str,
                 variant: str = "supercrawler") -> str:
    """HTML → MDX. ``variant``: 'supercrawler' (canonical, rs:347-500) or
    'main' (the §2.9 engine copy in main.rs — loose container text kept when
    non-empty instead of len > 10; all other kernel semantics shared)."""
    global _LOOSE_TEXT_MIN_BYTES
    prev = _LOOSE_TEXT_MIN_BYTES
    _LOOSE_TEXT_MIN_BYTES = 10 if variant == "supercrawler" else 0
    try:
        return _clean_to_mdx_inner(content, source_url)
    finally:
        _LOOSE_TEXT_MIN_BYTES = prev


def _clean_to_mdx_inner(content: str, source_url: str) -> str:
    clean = _NOISE_RE.sub("", content)
    return _clean_to_mdx_from_doc(parse_html(clean), source_url)


def _clean_to_mdx_from_doc(doc: Node, source_url: str) -> str:
    mdx: list[str] = []

    # one pass resolves every frontmatter selector group in document order
    title_el, body, metas, link_el, main_content, related = _page_index(doc)

    # title (rs:371-375)
    title = "Untitled"
    if title_el is not None:
        t = title_el.all_text().strip()
        if t:
            title = t

    # description (rs:377-396)
    description = _opt_meta(
        metas, names=("description",), props=("og:description", "twitter:description")
    )
    if description is None:
        if body is not None:
            p = body.select_first(lambda el: el.tag == "p")
            if p is not None:
                trimmed = p.all_text().strip()
                if _byte_len(trimmed) > 250:
                    # Rust byte-slice &trimmed[..250]; fixtures are ASCII-safe
                    trimmed = trimmed.encode("utf-8")[:250].decode("utf-8", "ignore") + "..."
                if trimmed:
                    description = trimmed
    if description is None:
        description = "No description available"

    keywords = _opt_meta(metas, names=("keywords",), props=("article:tag",)) \
        or "No keywords available"
    author = _opt_meta(metas, names=("author",), props=("article:author",))
    published_date = _opt_meta(
        metas, props=("article:published_time", "og:updated_time"),
        itemprops=("datePublished",),
    )

    canonical_url = None
    if link_el is not None:
        href = (link_el.attr("href") or "").strip()
        if href:
            canonical_url = href

    # frontmatter (rs:423-440)
    mdx.append("---\n")
    mdx.append(f'title: "{_escape_quotes(title)}"\n')
    mdx.append(f'description: "{_escape_quotes(description)}"\n')
    mdx.append(f'keywords: "{_escape_quotes(keywords)}"\n')
    mdx.append(f'sourceUrl: "{_escape_quotes(source_url)}"\n')
    if author is not None:
        mdx.append(f'author: "{_escape_quotes(author)}"\n')
    if published_date is not None:
        mdx.append(f'date: "{_escape_quotes(published_date)}"\n')
    mdx.append(f'canonicalUrl: "{_escape_quotes(canonical_url or source_url)}"\n')
    mdx.append("---\n\n")

    # ToC marker (rs:442-450)
    scope = main_content or body
    if scope is not None:
        headings = scope.select(lambda el: el.tag in _HEADING_TAGS)
        if len(headings) > 3:
            mdx.append("## Table of Contents\n\n")
            mdx.append("<!-- toc -->\n\n")

    if body is not None:
        main_node = main_content or body
        for child in main_node.children:
            if child.is_element:
                mdx.append(process_element(child))
            else:
                trimmed = child.text.strip()
                if trimmed and _byte_len(trimmed) > _LOOSE_TEXT_MIN_BYTES:
                    mdx.append(trimmed)
                    mdx.append("\n\n")

        if related:
            rel_parts = ["\n## Related Resources\n\n"]
            link_count = 0
            base = rust_url_parse(source_url)
            for link in related:
                href = link.attr("href")
                if href is None:
                    continue
                absolute = None
                if base is not None:
                    absolute = rust_url_join(base, href)
                if absolute is None:
                    absolute = href
                text = element_to_markdown(link)
                if text and absolute and absolute != "#":
                    rel_parts.append(f"- [{text}]({absolute})\n")
                    link_count += 1
            if link_count > 0:
                mdx.append("".join(rel_parts))
    else:
        mdx.append("Error: Could not parse body content.\n")

    return _BLANK_RE.sub("\n\n", "".join(mdx)).strip()


# --------------------------------------------------------------------------
# X6: link extraction (src/supercrawler.rs:736-757, single-fetch variant)
# --------------------------------------------------------------------------


def extract_links(content: str, source_url: str) -> list[str]:
    """All a[href] in document order from the RAW html (the reference parses
    the unstripped body for links, rs:738), prefiltered (F1), absolutized
    (F2), fragment-stripped (F3); duplicates preserved. Delegates to
    ``extract_anchors`` — one walker owns the prefilter/absolutize kernel."""
    return [href for href, _ in
            extract_anchors(content, source_url, with_text=False)]


def extract_anchors(content: str, source_url: str,
                    with_text: bool = True) -> list[tuple[str, str]]:
    """(absolute href, whitespace-normalized anchor text) pairs — the same
    walk, prefilter (F1), absolutization (F2) and fragment strip (F3) as
    ``extract_links`` (src/supercrawler.rs:736-757), additionally capturing
    each anchor's text content. Engine extension beyond the reference (which
    discards anchor text): the anchor-text corpus is a standard web-scale
    training-data signal. Text may be '' (image/empty anchors); duplicates
    preserved in document order like extract_links."""
    base = rust_url_parse(source_url)
    if base is None:
        return []
    return _anchors_from_doc(parse_html(content), base, with_text)


def _anchors_from_doc(doc: Node, base, with_text: bool = True
                      ) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    for el in doc.descendants():
        if el.tag != "a":
            continue
        href = el.attr("href")
        if href is None:
            continue
        trimmed = href.strip()
        if (
            not trimmed
            or trimmed.startswith("#")
            or trimmed.startswith("javascript:")
            or trimmed.startswith("mailto:")
        ):
            continue
        absolute = rust_url_join(base, trimmed, strip_fragment=True)
        if absolute is not None:
            # with_text=False skips the subtree text walk — the crawl hot
            # path (extract_links) doesn't pay for text it discards
            # (measured ~7% of the link-walk cost)
            out.append((absolute,
                        " ".join(el.all_text().split()) if with_text else ""))
    return out


def extract_page_fields(content: str, source_url: str,
                        variant: str = "supercrawler"
                        ) -> tuple[str, list[str]]:
    """(mdx, links) for one page, with a shared-parse fast path. The
    reference parses each page twice — noise-stripped for MDX
    (src/supercrawler.rs:734) and raw for links (rs:738). When the noise
    strip is a NO-OP (no script/style/noscript/comment markup), both parses
    would see identical bytes, so one tree serves both kernels with
    byte-identical output by construction (the MDX walk is read-only —
    blocklists filter during traversal, never mutate). Pages that do carry
    noise fall back to the exact two-parse structure."""
    global _LOOSE_TEXT_MIN_BYTES
    prev = _LOOSE_TEXT_MIN_BYTES
    _LOOSE_TEXT_MIN_BYTES = 10 if variant == "supercrawler" else 0
    try:
        clean = _NOISE_RE.sub("", content)
        if clean == content:
            doc = parse_html(content)
            mdx = _clean_to_mdx_from_doc(doc, source_url)
            base = rust_url_parse(source_url)
            links = [] if base is None else [
                h for h, _ in _anchors_from_doc(doc, base, with_text=False)]
            return mdx, links
        return (_clean_to_mdx_inner(content, source_url),
                extract_links(content, source_url))
    finally:
        _LOOSE_TEXT_MIN_BYTES = prev


# --------------------------------------------------------------------------
# X7: url_to_filename → doc key (src/supercrawler.rs:527-562)
# --------------------------------------------------------------------------

_FILENAME_MAP = set("/?&=:%#")


def url_to_filename(url: str) -> str:
    parsed = rust_url_parse(url)
    if parsed is None:
        safe = "".join(c for c in url if c.isalnum() or c in "-_")
        return f"./output/invalid_url/{safe}.mdx"
    domain = parsed.host or "unknown_domain"
    path_part = parsed.path + (f"_{parsed.query}" if parsed.query is not None else "")
    sanitized = "".join(
        ch
        for ch in ("_" if c in _FILENAME_MAP else c for c in path_part)
        if ch.isalnum() or ch in "-_"
    )
    truncated = sanitized.encode("utf-8")[:100].decode("utf-8", "ignore") \
        if _byte_len(sanitized) > 100 else sanitized
    if truncated == "" or truncated == "_":
        final = "index"
    else:
        final = truncated.strip("_")
    return f"./output/{domain}/{final}.mdx"


# --------------------------------------------------------------------------
# X8: PDF MDX wrapper (src/supercrawler.rs:720-723)
# --------------------------------------------------------------------------


try:  # pypdf is not bundled in this sandbox; gate it (S3 stays a real
    # operator with a deterministic fallback — see extract_pdf_text)
    import pypdf  # type: ignore  # noqa: F401
    _HAVE_PYPDF = True
except ImportError:
    _HAVE_PYPDF = False


_PDF_ESC = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
            "(": "(", ")": ")", "\\": "\\"}


def _pdf_unescape(s: str) -> str:
    """Decode a PDF literal-string body: backslash escapes, \\ooo octal,
    backslash-newline line continuations (PDF 32000-1 §7.3.4.2)."""
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        e = s[i]
        if e in _PDF_ESC:
            out.append(_PDF_ESC[e])
            i += 1
        elif e == "\n":
            i += 1                      # line continuation: drop
        elif e == "\r":
            # i still points AT the CR here — the optional LF of a CRLF
            # continuation is the NEXT char
            i += 1 + (s[i + 1:i + 2] == "\n")
        elif e.isdigit():
            j = i
            while j < n and j - i < 3 and s[j].isdigit():
                j += 1
            out.append(chr(int(s[i:j], 8) & 0xFF))
            i = j
        else:                           # unknown escape: backslash dropped
            out.append(e)
            i += 1
    return "".join(out)


_PDF_TEXT_OP = re.compile(
    # literal string shown by Tj or ' ...
    r"\((?P<lit>(?:\\.|[^\\()])*)\)\s*(?:Tj|')"
    # ... hex string shown by Tj or ' ...
    r"|<(?P<hex>[0-9A-Fa-f\s]*)>\s*(?:Tj|')"
    # ... or a TJ array of strings and kerning numbers
    r"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ",
    re.S)

_PDF_ARR_STR = re.compile(
    r"\((?P<lit>(?:\\.|[^\\()])*)\)|<(?P<hex>[0-9A-Fa-f\s]*)>", re.S)


def _pdf_hex_decode(h: str) -> str:
    h = re.sub(r"\s", "", h)
    if len(h) % 2:
        h += "0"                        # odd-length: implied trailing 0 (§7.3.4.3)
    return bytes.fromhex(h).decode("latin-1")


def _pdf_text_ops(content: str) -> str | None:
    """Text-showing operators (Tj, ', TJ) of a decoded content stream, in
    stream order, concatenated; returns None when the stream shows no text.
    Positioning operators (Td/TD/T*) are not interpreted — this is the
    minimal single-byte-encoding extractor (no CMap/ToUnicode), sufficient
    for simple generators; pypdf takes over when installed."""
    parts = []
    for m in _PDF_TEXT_OP.finditer(content):
        if m.group("lit") is not None:
            parts.append(_pdf_unescape(m.group("lit")))
        elif m.group("hex") is not None:
            parts.append(_pdf_hex_decode(m.group("hex")))
        else:
            for s in _PDF_ARR_STR.finditer(m.group("arr")):
                if s.group("lit") is not None:
                    parts.append(_pdf_unescape(s.group("lit")))
                else:
                    parts.append(_pdf_hex_decode(s.group("hex")))
    return "".join(parts) if parts else None


_PDF_STREAM = re.compile(rb"stream\r?\n(.*?)\s*endstream", re.S)


def extract_pdf_text(raw: bytes) -> str:
    """PDF → text (S3, ``pdf_extract::extract_text`` analog,
    src/supercrawler.rs:627-633). Decode ladder:

      1. pypdf, when installed (full extractor; absent in this sandbox);
      2. pure-Python minimal extractor: every ``stream…endstream`` segment is
         Flate-decompressed (zlib) when possible, then scanned for Tj/'/TJ
         text-showing operators (single-byte encodings only — no CMap);
      3. legacy raw BT/ET inner text (the synthetic fixture shape, kept
         byte-identical);
      4. raise NotImplementedError (undecodable without a real PDF lib).
    """
    if _HAVE_PYPDF:  # pragma: no cover - not present in sandbox
        import io
        reader = pypdf.PdfReader(io.BytesIO(raw))
        return "\n".join(page.extract_text() or "" for page in reader.pages)
    texts = []
    for m in _PDF_STREAM.finditer(raw):
        body = m.group(1)
        try:
            import zlib
            seg = zlib.decompress(body).decode("latin-1", errors="replace")
        except Exception:
            seg = body.decode("latin-1", errors="replace")
        t = _pdf_text_ops(seg)
        if t:
            texts.append(t)
    if texts:
        return "\n".join(texts)
    text = raw.decode("latin-1", errors="replace")
    start, end = text.find("BT\n"), text.rfind("\nET")
    if start != -1 and end > start:
        return text[start + 3:end]
    raise NotImplementedError(
        "PDF without decodable text streams; full extraction requires pypdf "
        "(not available in this sandbox)")


def pdf_to_mdx(url: str, pdf_text: str) -> str:
    # Rust: url.split('/').last().unwrap_or("document.pdf") — split of a
    # non-empty string always yields an item, so empty last segments survive
    last_segment = url.split("/")[-1]
    return (
        f'---\ntitle: "PDF Document: {last_segment}"\n'
        f'description: "Extracted text from PDF."\nsourceUrl: "{url}"\n---\n\n{pdf_text}'
    )
