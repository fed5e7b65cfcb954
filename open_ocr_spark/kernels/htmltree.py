"""Minimal, deterministic HTML node tree built on stdlib html.parser.

This is the graft's recast of the reference's external OCR binaries: where
open-ocr shells out to ``tesseract`` per document
(/root/reference/tesseract_engine.go:98-128, exec at :210-211), this engine
parses the raw page bytes into a node tree in pure Python so the extraction
stage can run vectorized inside one Arrow batch with zero subprocesses and
zero per-row Python on the Spark side.

Determinism requirements (SURVEY.md §7.3 "Hard #1/#2"): stdlib-only parsing,
an explicit frozen decode policy (WHATWG-style charset sniff: BOM, then a
1024-byte <meta> prescan with label normalization, then utf-8; always
errors=replace), no environment-dependent behavior. The same bytes must
yield the same tree on every executor at any parallelism.

Tree representation (hot-path layout): element nodes are ``Node``; text
runs are plain ``str`` entries in ``children`` — no object allocation per
text run, which is the bulk of nodes on a text-heavy page. Candidate
main-content roots are collected in document order at parse time
(``root.candidates``) so scoring needs no full-tree walk.
"""

from __future__ import annotations

import codecs
import re
from html.parser import HTMLParser

# --- charset sniff ----------------------------------------------------------
# WHATWG "encoding sniffing algorithm", reduced to its deterministic core:
# a byte-order mark wins; else a <meta charset=...> / <meta http-equiv
# content="...charset=..."> found in the first 1024 bytes; else utf-8.
# Labels normalize per the WHATWG encoding registry's big equivalence
# classes (every latin1-family label means windows-1252 on the web; a meta
# claiming utf-16 is a lie by construction — the prescan READ it as ASCII —
# and maps to utf-8, as the spec prescribes). Unknown labels fall back to
# utf-8. Decoding is always errors=replace: a wrong declaration degrades to
# replacement characters, never raises, and stays byte-deterministic.

_META_CHARSET_RE = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?\s*([a-zA-Z0-9._-]+)", re.I
)

# The WHATWG prescan skips comments: a commented-out <meta charset=...>
# must not win over the real declaration.  Closed comments are removed
# from the window; an UNCLOSED comment swallows the rest of the window
# (the spec jumps past "-->" and never finds it, ending the prescan).
_HTML_COMMENT_RE = re.compile(rb"<!--.*?-->", re.S)
_OPEN_COMMENT_RE = re.compile(rb"<!--.*\Z", re.S)

# WHATWG label -> Python codec, for the classes where they differ.
_CHARSET_ALIASES = {
    "iso-8859-1": "cp1252", "latin1": "cp1252", "latin-1": "cp1252",
    "us-ascii": "cp1252", "ascii": "cp1252", "windows-1252": "cp1252",
    "iso8859-1": "cp1252", "l1": "cp1252",
    "gb2312": "gb18030", "gbk": "gb18030", "gb_2312-80": "gb18030",
    "shift-jis": "shift_jis", "sjis": "shift_jis", "x-sjis": "shift_jis",
    "euc-kr": "cp949", "ks_c_5601-1987": "cp949", "korean": "cp949",
    "utf-16": "utf-8", "utf-16le": "utf-8", "utf-16be": "utf-8",
    "unicode": "utf-8",
}


def sniff_charset(raw: bytes) -> str:
    """The Python codec name the frozen decode policy picks for a page."""
    if raw[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if raw[:2] in (b"\xff\xfe", b"\xfe\xff"):
        # the utf-16 codec reads the BOM for endianness AND strips it;
        # the -le/-be variants would leave a U+FEFF in the text
        return "utf-16"
    window = raw[:1024]
    if b"<!--" in window:  # hot path: most pages have no early comment
        window = _OPEN_COMMENT_RE.sub(b"", _HTML_COMMENT_RE.sub(b"", window))
    m = _META_CHARSET_RE.search(window)
    if m:
        label = m.group(1).decode("ascii").lower()
        label = _CHARSET_ALIASES.get(label, label)
        try:
            codecs.lookup(label)
            return label
        except LookupError:
            return "utf-8"
    return "utf-8"


def decode_html_bytes(raw: bytes | bytearray | memoryview) -> str:
    """bytes -> str under the frozen sniff policy (never raises)."""
    raw = bytes(raw)
    return raw.decode(sniff_charset(raw), errors="replace")


def codec_for_label(label: str) -> str | None:
    """Python codec for a TRANSPORT-layer charset label (the HTTP
    Content-Type parameter), normalized through the same WHATWG label
    classes the meta prescan uses — per the spec the transport layer
    sits ABOVE the sniff, so a valid header label wins over BOM/meta.
    Unknown labels return None: the caller falls back to sniffing (the
    spec's behavior for an unrecognized label), never errors."""
    norm = _CHARSET_ALIASES.get(label.strip().lower(), label.strip().lower())
    try:
        codecs.lookup(norm)
        return norm
    except LookupError:
        return None


# Elements whose entire subtree carries no extractable text.
SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "head", "svg", "iframe",
     "object", "embed", "canvas", "audio", "video", "map", "button",
     "select", "option", "textarea", "datalist"}
)

# Void elements: never pushed on the open-element stack.
VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr"}
)

# Block-level elements: boundaries between them are paragraph breaks.
BLOCK_TAGS = frozenset(
    {"address", "article", "aside", "blockquote", "body", "caption", "dd",
     "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer", "form",
     "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "html", "li",
     "main", "nav", "ol", "p", "pre", "section", "table", "tbody", "td",
     "tfoot", "th", "thead", "tr", "ul"}
)

# Boilerplate containers: their text is counted but they are never chosen as
# the main-content root, and they are pruned from a chosen ancestor's output.
# This is the graft's analog of the stroke-width-transform text-region filter
# (/root/reference/stroke_width_transform.go:15-68): regions that do not look
# like body text are removed before the engine runs.
BOILERPLATE_TAGS = frozenset({"nav", "header", "footer", "aside", "form"})

# Candidate roots for main content (disjoint from BOILERPLATE_TAGS, so the
# parse-time candidate list needs no boilerplate filter).
CANDIDATE_TAGS = frozenset({"article", "main", "section", "div", "body", "td"})


class Node:
    """One element node: tag + children. ``children`` holds child ``Node``s
    and plain ``str`` text runs interleaved in document order.

    ``tlen``/``llen`` are subtree totals of collapsed text chars / chars
    under <a>, folded in DURING parsing (each element's totals flow into
    its parent when it closes) so scoring needs no second tree walk.
    ``candidates`` is set on the document root only: every CANDIDATE_TAGS
    element in document (pre-)order."""

    __slots__ = ("tag", "attrs", "children", "tlen", "llen", "candidates")

    def __init__(self, tag, attrs=None):
        self.tag = tag
        # stored as given (None for the fast tokenizer, which never parses
        # attributes — the extractor reads none); avoids a dict alloc per
        # node on the hot path
        self.attrs = attrs
        self.children = []
        self.tlen = 0
        self.llen = 0
        self.candidates = None

    def iter(self):
        """Depth-first pre-order walk of this subtree: yields Node elements
        and plain-str text runs."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            if type(node) is not str:
                stack.extend(reversed(node.children))

    def iter_text(self):
        """All text runs in document order."""
        for n in self.iter():
            if type(n) is str:
                yield n


class _TreeBuilder(HTMLParser):
    """Tolerant stack-based tree builder: unmatched end tags are ignored;
    a matching end tag pops every unclosed element above it (implicit
    close); elements inside SKIP_TAGS are dropped entirely."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.root.candidates = []
        self.stack = [self.root]
        self.skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if self.skip_depth:
            # inside a skipped subtree: drop everything, but track nesting
            # of the skipped tag itself so its end tag unwinds correctly
            if tag == self._skip_tag and tag not in VOID_TAGS:
                self.skip_depth += 1
            return
        if tag in SKIP_TAGS:
            self.skip_depth = 1
            self._skip_tag = tag
            return
        node = Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag in CANDIDATE_TAGS:
            self.root.candidates.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        if self.skip_depth or tag in SKIP_TAGS:
            return
        node = Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag in CANDIDATE_TAGS:
            self.root.candidates.append(node)

    def handle_endtag(self, tag):
        if self.skip_depth:
            if tag == self._skip_tag:
                self.skip_depth -= 1
            return
        if tag in VOID_TAGS:
            return
        # find the matching open element; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if self.skip_depth or not data:
            return
        self.stack[-1].children.append(data)


def fold_stats(root: Node) -> None:
    """Post-order fold of subtree text/link totals into tlen/llen for a
    finished tree (used by the stdlib parse path; the fast tokenizer folds
    during parsing)."""
    stack: list[tuple[Node, bool, bool]] = [(root, False, False)]
    while stack:
        node, in_link, visited = stack.pop()
        child_in_link = in_link or node.tag == "a"
        if not visited:
            node.tlen = 0
            node.llen = 0
            stack.append((node, in_link, True))
            for child in node.children:
                if type(child) is str:
                    n = collapsed_len(child)
                    node.tlen += n
                    if child_in_link:
                        node.llen += n
                else:
                    stack.append((child, child_in_link, False))
        else:
            for child in node.children:
                if type(child) is not str:
                    node.tlen += child.tlen
                    node.llen += child.llen


def parse_html_stdlib(raw: bytes | str) -> Node:
    """html.parser-backed tree build — the reference implementation the
    fast tokenizer below is cross-checked against (tests assert identical
    extraction on the golden fixtures)."""
    if isinstance(raw, (bytes, bytearray, memoryview)):
        raw = decode_html_bytes(raw)
    builder = _TreeBuilder()
    try:
        builder.feed(raw)
        builder.close()
    except Exception:
        # html.parser is tolerant, but freeze the guarantee: a parse blowup
        # yields whatever tree was built so far (error-as-value upstream).
        pass
    fold_stats(builder.root)
    return builder.root


# --- fast tokenizer ---------------------------------------------------------
# ~4× faster than html.parser because it never parses attributes (the
# extractor reads none), never tracks source positions, and drives the
# whole scan with one compiled-regex finditer (plus per-raw-text close
# regexes). Same tolerant tree semantics: implicit closes, ignored
# stray end tags, SKIP_TAGS subtrees dropped, entities unescaped.

import html as _html
import re as _re

_TOKEN_RE = _re.compile(
    r"<!--.*?(?:-->|$)"              # comment
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"    # cdata
    r"|<[!?][^>]*>?"                 # doctype / PI
    r"|<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9:_.-]*)[^>]*?(/?)\s*>",  # tag
    _re.S,
)
# raw-text elements: content runs to the matching close tag, never nested
_RAWTEXT = {"script", "style", "textarea", "title", "noscript", "template"}
_RAWTEXT_CLOSE = {
    t: _re.compile(rf"</\s*{t}[^>]*>", _re.I) for t in _RAWTEXT
}


def parse_html(raw: bytes | str) -> Node:
    """Parse HTML bytes (frozen sniff-then-replace decode policy, see
    decode_html_bytes) or a str into a Node tree. Never raises on
    malformed markup."""
    if isinstance(raw, (bytes, bytearray, memoryview)):
        raw = decode_html_bytes(raw)
    root = Node("#document")
    candidates: list[Node] = []
    root.candidates = candidates
    stack = [root]
    skip_tag = None
    skip_depth = 0
    a_depth = 0
    pos = 0
    n = len(raw)

    def add_text(text: str) -> None:
        if "&" in text:
            text = _html.unescape(text)
        top = stack[-1]
        clen = collapsed_len(text)
        top.tlen += clen
        if a_depth:
            top.llen += clen
        top.children.append(text)

    def pop_to(idx: int) -> None:
        # fold each popped element's totals into its parent (stats flow up
        # exactly once, at close time)
        nonlocal a_depth
        while len(stack) > idx:
            child = stack.pop()
            if child.tag == "a":
                a_depth -= 1
            parent = stack[-1]
            parent.tlen += child.tlen
            parent.llen += child.llen

    # C-level token scan: one finditer drives the whole loop (the regex
    # engine skips intervening text internally — measured ~9% faster than
    # the previous find('<') + anchored-match loop on the fixture corpus,
    # byte-identical trees). The ONE place `pos` jumps ahead of the
    # iterator is a raw-text body (script/style): the iterator is
    # re-created at the jump target, because a still-pending match that
    # STARTED inside the raw body can span past its close tag (an
    # unterminated `<!--` inside a script would otherwise swallow the
    # rest of the document as one comment token — real tags the old loop
    # parsed). Resyncs are 1-2 per document, so the restart cost is noise.
    it = _TOKEN_RE.finditer(raw)
    nxt = it.__next__
    while True:
        try:
            m = nxt()
        except StopIteration:
            break
        start = m.start()
        if start > pos and skip_depth == 0:
            add_text(raw[pos:start])
        pos = m.end()
        slash, tag, trail = m.group(1, 2, 3)
        if tag is None:
            continue  # comment / cdata / doctype / PI
        if not tag.islower():
            tag = tag.lower()

        if skip_depth:
            if tag == skip_tag:
                if slash:
                    skip_depth -= 1
                elif tag not in VOID_TAGS:
                    skip_depth += 1
            continue

        if slash:
            if tag in VOID_TAGS:
                continue
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    pop_to(i)
                    break
            continue

        if tag in SKIP_TAGS:
            if trail:
                continue
            if tag in _RAWTEXT:
                # raw-text content: jump straight to the close tag and
                # resync the token iterator past the body (see above)
                mclose = _RAWTEXT_CLOSE[tag].search(raw, pos)
                pos = mclose.end() if mclose else n
                it = _TOKEN_RE.finditer(raw, pos)
                nxt = it.__next__
            else:
                skip_tag = tag
                skip_depth = 1
            continue

        top = stack[-1]
        node = Node(tag, None)
        top.children.append(node)
        if tag in CANDIDATE_TAGS:
            candidates.append(node)
        if not trail and tag not in VOID_TAGS:
            stack.append(node)
            if tag == "a":
                a_depth += 1
    if pos < n and skip_depth == 0:
        add_text(raw[pos:])
    pop_to(1)  # folds every still-open element's totals up into root
    return root


def collapse_ws(s: str) -> str:
    """Frozen whitespace normalization: any run of unicode whitespace
    becomes one ASCII space; leading/trailing stripped."""
    return " ".join(s.split())


def collapsed_len(s: str) -> int:
    """len(collapse_ws(s)) without building the string."""
    parts = s.split()
    if not parts:
        return 0
    return sum(map(len, parts)) + len(parts) - 1
