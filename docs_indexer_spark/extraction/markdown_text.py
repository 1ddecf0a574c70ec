"""Markdown → plain-text extraction.

Reproduces the semantics of the reference's ``markdown_to_text``
(/root/reference/hugo.py:244-261):

    markdown_text = SHORTCODE_RE.sub("", markdown_text)   # hugo.py:57,249
    html = markdown(markdown_text,
                    extensions=["fenced_code", "tables", "attr_list"])
    text = html2text(html)

The behavior-bearing extension list (documented at hugo.py:251-258 and
pinned by the reference's own tests /root/reference/hugo_test.py:42-89):

- ``fenced_code``: a language hint (```nohighlight) becomes a CSS class on
  the <code> element — it must NOT leak into the text; fence content must
  survive.
- ``tables``: pipe/dash separators must NOT leak; cell contents must survive.
- ``attr_list``: heading anchors (## Title {#id}) become id attributes —
  the {#...} must NOT leak.
- Hugo shortcodes ({{< tabs >}} / {{% steps %}}, opening + closing +
  parameterized) are stripped before conversion; wrapped content is kept.

The ``markdown`` package is not installable in this environment, so this
module implements the markdown→HTML subset the reference exercises (block
structure, fenced code, tables, ATX headings with attr_list anchors, lists,
blockquotes, inline emphasis/code/links/images) with python-markdown's
serialization conventions (blocks joined by "\n", fence content keeps its
trailing newline inside <code>), then reuses :func:`html2text` — the same
two-stage pipeline as the reference.  Byte-identity is asserted against the
reference's checked-in test expectations, not a live ``markdown`` run.

Construct coverage vs python-markdown core (each pinned by a golden in
tests/test_extraction.py):

- PASS: fenced code (+language class), pipe tables, ATX headings
  (+attr_list anchors), SETEXT headings, indented (4-space/tab) code
  blocks, horizontal rules, flat + one-level-nested lists, blockquotes
  (nested — quoted bodies recurse through the full block grammar, round
  4), blockquote-in-list-item, inline code/em/strong/images, inline +
  reference + shortcut links (definitions consumed), raw inline AND
  block-level HTML passthrough (python-markdown keeps raw HTML; bs4
  downstream keeps only its text — escaping it would leak literal
  "<div ...>" into the extracted text), entity references (named,
  decimal, hex) kept intact with smart-ampersand escaping for bare "&"
  (round 4).
- PASS (round-4 additions): code spans are parsed FIRST with fully
  escaped content (an entity inside backticks stays the literal
  "&copy;" in the final text, and emphasis/link syntax inside code is
  never re-parsed — python-markdown's parse order); URL and email
  autolinks (<https://x>, <user@host.tld>).
- KNOWN DIVERGENCES (documented, not silently wrong): multi-paragraph
  ("loose") list items join their continuation lines with a space instead
  of nested <p> blocks.  Lazy paragraph continuation inside blockquotes
  IS recognized (round 3).  List nesting recurses to arbitrary depth
  (4 spaces/level).
"""

from __future__ import annotations

import html as _html
import re

from docs_indexer_spark.extraction.html_text import html2text

# Matches Hugo shortcode tags in both delimiter styles: {{< ... >}} and
# {{% ... %}}, including opening, closing (with leading /) and parameterized
# forms. Only the tag itself is matched, so wrapped content is kept.
# Identical regex semantics to /root/reference/hugo.py:57.
SHORTCODE_RE = re.compile(r"\{\{[<%]/?.*?[%>]\}\}")

_FENCE_OPEN_RE = re.compile(r"^(`{3,}|~{3,})\s*([A-Za-z0-9_+\-.]*)\s*$")


def _fence_close(ln: str, marker: str) -> bool:
    """CommonMark closing fence: up to 3 leading spaces, then a run of at
    least 3 fence chars (a column-0-only match would leave an indented
    closer unconsumed and swallow the rest of the document)."""
    return re.match(r" {0,3}" + re.escape(marker) + r"{3,}", ln) is not None
_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*?)(?:\s+#+)?\s*$")
_ATTR_LIST_RE = re.compile(r"\s*\{[:#.][^{}]*\}\s*$")
_TABLE_SEP_RE = re.compile(r"^\s*\|?\s*:?-{2,}:?\s*(\|\s*:?-{2,}:?\s*)*\|?\s*$")
# python-markdown CHILD_RE: an item marker at indent 0-3 starts an item
# (either marker type — the list TYPE comes from the block's first line);
# a marker at indent 4-7 is a nested chunk parsed inside the previous
# <li> (OListProcessor.INDENT_RE)
_UL_ITEM_RE = re.compile(r"^[ ]{0,3}[*+-][ \t]+(.*)$")
_OL_ITEM_RE = re.compile(r"^[ ]{0,3}\d+\.[ \t]+(.*)$")
# one tab == tab_length(4) spaces in python-markdown's preprocessing, so
# a tab-indented marker is a nested chunk too
_INDENT_ITEM_RE = re.compile(r"^(?:[ ]{4,7}|\t[ ]{0,3})(?:\d+\.|[*+-])[ \t]+")

_CODE_SPAN_RE = re.compile(r"`([^`]+)`")
_IMG_RE = re.compile(r"!\[([^\]]*)\]\(([^)]*)\)")
_LINK_RE = re.compile(r"\[([^\]]+)\]\(([^)]*)\)")
_STRONG_RE = re.compile(r"\*\*([^*]+)\*\*|__([^_]+)__")
_EM_RE = re.compile(r"\*([^*]+)\*|\b_([^_]+)_\b")

# reference-style links (python-markdown core behavior): definitions are
# consumed in a pre-pass; [text][id], [text][] and defined-[text] resolve
_REF_DEF_RE = re.compile(
    r"^ {0,3}\[([^\]]+)\]:\s*(\S+)(?:\s+[\"'(].*[\"')])?\s*$"
)
_REF_LINK_RE = re.compile(r"\[([^\]]+)\]\[([^\]]*)\]")
_SHORTCUT_REF_RE = re.compile(r"\[([^\]]+)\](?!\(|\[)")

# python-markdown SetextHeaderProcessor.RE (`^.*?\n[=-]+[ ]*(\n|$)`):
# the underline must be the SECOND line of the block, start at column 0
# (no leading-space allowance), may MIX = and - (level decided by the
# first char), and allows only trailing SPACES
_SETEXT_RE = re.compile(r"^[=-]+[ ]*$")
# python-markdown BlockQuoteProcessor.RE: `>` at indent 0-3 only — a
# 4-space-indented `> x` line is indented-code at block start and plain
# paragraph text mid-block
_QUOTE_LINE_RE = re.compile(r"^[ ]{0,3}>")
_HR_RE = re.compile(r"^ {0,3}(?:(?:\* *){3,}|(?:- *){3,}|(?:_ *){3,})$")
_INDENT_RE = re.compile(r"^(?:    |\t)(.*)$")
_NESTED_ITEM_RE = re.compile(r"^(?:    |\t)\s*(?:[*+-]|\d+\.)\s+")


def strip_shortcodes(text: str) -> str:
    """Remove Hugo shortcode tags, keeping wrapped content.

    Reference: /root/reference/hugo.py:54-57,249.
    """
    return SHORTCODE_RE.sub("", text)


# a valid-looking character/entity reference (python-markdown leaves
# these intact; a BARE ampersand becomes &amp;) and a raw inline HTML
# tag / comment (python-markdown passes raw HTML through — escaping it
# would make html2text emit the tag text itself, leaking "<div ...>"
# into the extracted text where the reference pipeline yields nothing)
_ENTITY_RE = re.compile(
    r"&(?:[A-Za-z][A-Za-z0-9]{1,31}|#[0-9]{1,7}|#[xX][0-9a-fA-F]{1,6});"
)
_TAG_RE = re.compile(
    r"</?[A-Za-z][A-Za-z0-9-]*(?:\s[^<>]*?)?/?>|<!--.*?-->", re.DOTALL
)


def _escape_text(s: str) -> str:
    """HTML-escape text, keeping valid entity references intact
    (smart-ampersand: python-markdown semantics)."""
    s = _ENTITY_RE.sub(lambda m: "\x00" + m.group(0)[1:], s)
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return s.replace("\x00", "&")


def _escape_inline(text: str) -> str:
    """Escape inline text while passing raw HTML tags/comments through
    verbatim (python-markdown keeps inline HTML; bs4 later drops the
    tags and keeps only their text)."""
    out: list[str] = []
    pos = 0
    for m in _TAG_RE.finditer(text):
        out.append(_escape_text(text[pos:m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(_escape_text(text[pos:]))
    return "".join(out)


_AUTOLINK_RE = re.compile(r"<([A-Za-z][A-Za-z0-9+.-]*://[^<>\s]+)>")
_AUTOMAIL_RE = re.compile(r"<([\w.+-]+@[\w.-]+\.[A-Za-z]{2,})>")


def _inline(text: str, refs: dict[str, str] | None = None) -> str:
    """Inline markdown → HTML (code spans, autolinks, images, links —
    inline, reference and shortcut style — strong, em).

    Code spans and autolinks are lifted into placeholders FIRST
    (python-markdown's parse order): code content is FULLY escaped (an
    entity reference inside backticks stays a literal "&copy;" in the
    final text) and neither may be re-mangled by the emphasis/link
    passes (underscores in a URL are not <em> markers)."""
    refs = refs or {}
    protected: list[str] = []

    def _protect(rendered: str) -> str:
        protected.append(rendered)
        return f"\x01{len(protected) - 1}\x01"

    out = _CODE_SPAN_RE.sub(
        lambda m: _protect(
            f"<code>{_html.escape(m.group(1), quote=False)}</code>"
        ),
        text,
    )
    out = _AUTOLINK_RE.sub(
        lambda m: _protect(
            f'<a href="{m.group(1)}">{_escape_text(m.group(1))}</a>'
        ),
        out,
    )
    out = _AUTOMAIL_RE.sub(
        lambda m: _protect(
            f'<a href="mailto:{m.group(1)}">{_escape_text(m.group(1))}</a>'
        ),
        out,
    )
    out = _escape_inline(out)
    out = _IMG_RE.sub(lambda m: f'<img alt="{m.group(1)}" src="{m.group(2)}" />', out)
    out = _LINK_RE.sub(lambda m: f'<a href="{m.group(2)}">{m.group(1)}</a>', out)

    def ref(m: re.Match) -> str:
        key = (m.group(2) if m.lastindex >= 2 and m.group(2) else m.group(1)).lower()
        url = refs.get(key)
        return f'<a href="{url}">{m.group(1)}</a>' if url is not None else m.group(0)

    if refs:
        out = _REF_LINK_RE.sub(ref, out)
        out = _SHORTCUT_REF_RE.sub(
            lambda m: ref(m) if m.group(1).lower() in refs else m.group(0), out
        )
    out = _STRONG_RE.sub(lambda m: f"<strong>{m.group(1) or m.group(2)}</strong>", out)
    out = _EM_RE.sub(lambda m: f"<em>{m.group(1) or m.group(2)}</em>", out)
    for idx, rendered in enumerate(protected):
        out = out.replace(f"\x01{idx}\x01", rendered)
    return out


def _table_html(lines: list[str], refs: dict[str, str] | None = None) -> str:
    def cells(line: str) -> list[str]:
        line = line.strip()
        if line.startswith("|"):
            line = line[1:]
        if line.endswith("|"):
            line = line[:-1]
        return [c.strip() for c in line.split("|")]

    head = cells(lines[0])
    rows = [cells(ln) for ln in lines[2:]]
    parts = ["<table>", "<thead>", "<tr>"]
    parts += [f"<th>{_inline(c, refs)}</th>" for c in head]
    parts += ["</tr>", "</thead>", "<tbody>"]
    for row in rows:
        parts.append("<tr>")
        parts += [f"<td>{_inline(c, refs)}</td>" for c in row]
        parts.append("</tr>")
    parts += ["</tbody>", "</table>"]
    return "\n".join(parts)


def _dedent4(ln: str) -> str:
    if ln.startswith("    "):
        return ln[4:]
    if ln.startswith("\t"):
        return ln[1:]
    return ln


def _list_html(lines: list[str], refs: dict[str, str] | None = None) -> str:
    """Render a (possibly nested) list block with python-markdown's
    ``OListProcessor.get_items`` line classes: an item marker at indent
    0-3 starts a new item of THIS list (either marker type — the list
    type comes from the first line); a marker at indent 4-7 starts a
    nested chunk parsed INSIDE the previous <li>; any other line lazily
    continues the previous entry.  Item bodies recurse through the block
    grammar (so an indented ``> quote`` — or ``> - inner`` sub-grammar —
    nests inside the <li>), with the first paragraph unwrapped to bare
    <li> text (tight-list shape).

    Documented divergence from python-markdown (deliberate, extraction
    quality): lazy continuation lines are dedented up to one level
    before the recursive parse, so ``    > quoted`` under an item
    renders as a blockquote instead of leaking a literal ``>`` into the
    indexed text; and blank-line-separated sibling items stay separate
    tight lists (python-markdown merges them into one loose list)."""
    ordered = bool(_OL_ITEM_RE.match(lines[0]))
    tag = "ol" if ordered else "ul"
    # entries: ("item", [item text, lazy lines...]) or
    #          ("nested", [raw 4-space-indented lines...])
    entries: list[tuple[str, list[str]]] = []
    for ln in lines:
        if _INDENT_ITEM_RE.match(ln):
            if entries and entries[-1][0] == "nested":
                entries[-1][1].append(ln)
            else:
                entries.append(("nested", [ln]))
            continue
        m = _UL_ITEM_RE.match(ln) or _OL_ITEM_RE.match(ln)
        if m:
            entries.append(("item", [m.group(1)]))
        elif entries:
            entries[-1][1].append(ln)
    out: list[str] = []
    for kind, body in entries:
        if kind == "nested":
            rendered = _render_blocks([_dedent4(l) for l in body], refs)
            if out and out[-1].endswith("</li>"):
                out[-1] = out[-1][: -len("</li>")] + rendered + "\n</li>"
            else:  # defensive: indented chunk with no preceding item
                out.append(f"<li>{rendered}</li>")
            continue
        if len(body) == 1:
            out.append(f"<li>{_inline(body[0], refs)}</li>")
            continue
        content = [body[0]] + [_dedent4(l) for l in body[1:]]
        rendered = _render_blocks(content, refs)
        if rendered.startswith("<p>") and "</p>" in rendered:
            close = rendered.index("</p>")
            rendered = rendered[3:close] + rendered[close + len("</p>"):]
        out.append(f"<li>{rendered}</li>")
    return f"<{tag}>\n" + "\n".join(out) + f"\n</{tag}>"


def markdown_to_html(markdown_text: str) -> str:
    """Markdown → HTML with fenced_code / tables / attr_list semantics,
    plus the python-markdown core constructs the reference relies on
    implicitly: indented (4-space) code blocks, setext headings,
    horizontal rules, reference-style links, nested lists."""
    raw_lines = markdown_text.split("\n")
    # pre-pass: reference-link definitions are consumed, never rendered.
    # Fence-aware: a "[label]: url" line inside a ``` / ~~~ fenced block is
    # code and must survive verbatim (python-markdown parses fences first).
    # Indented (4-space/tab) code can never match _REF_DEF_RE (it allows at
    # most 3 leading spaces), so only fences need tracking here.
    refs: dict[str, str] = {}
    lines: list[str] = []
    fence_marker: str | None = None
    for ln in raw_lines:
        if fence_marker is not None:
            lines.append(ln)
            if _fence_close(ln, fence_marker):
                fence_marker = None
            continue
        fm = _FENCE_OPEN_RE.match(ln)
        if fm:
            fence_marker = fm.group(1)[0]
            lines.append(ln)
            continue
        d = _REF_DEF_RE.match(ln)
        if d:
            refs[d.group(1).lower()] = d.group(2)
        else:
            lines.append(ln)
    return _render_blocks(lines, refs)


# block-level tags python-markdown passes through verbatim (a block whose
# first line opens one of these is raw HTML: consumed to the next blank
# line, NOT wrapped in <p>, NOT escaped — html2text then extracts only
# its text, matching the reference's markdown()→bs4 behavior)
_BLOCK_HTML_TAGS = {
    "address", "article", "aside", "audio", "blockquote", "canvas", "dd",
    "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "iframe",
    "li", "main", "nav", "noscript", "ol", "output", "p", "pre",
    "script", "section", "style", "table", "tbody", "td", "tfoot", "th",
    "thead", "tr", "ul", "video",
}
_BLOCK_HTML_RE = re.compile(r"^<(/?)([A-Za-z][A-Za-z0-9-]*)|^<!--")


def _is_block_html(line: str) -> bool:
    m = _BLOCK_HTML_RE.match(line)
    if not m:
        return False
    if m.group(0) == "<!--":
        return True
    return m.group(2).lower() in _BLOCK_HTML_TAGS


def _render_blocks(lines: list[str], refs: dict[str, str]) -> str:
    """Render pre-processed markdown lines (ref-defs consumed) to HTML
    blocks.  Factored out of :func:`markdown_to_html` so blockquote
    bodies recurse through the FULL block grammar (nested quotes,
    paragraphs, lists — python-markdown parses quoted content as
    markdown, it does not flatten it into one paragraph)."""
    blocks: list[str] = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        if not line.strip():
            i += 1
            continue

        fence = _FENCE_OPEN_RE.match(line)
        if fence:
            marker, lang = fence.group(1), fence.group(2)
            body: list[str] = []
            i += 1
            while i < n and not _fence_close(lines[i], marker[0]):
                body.append(lines[i])
                i += 1
            i += 1  # skip closing fence
            code = _html.escape("\n".join(body), quote=False)
            cls = f' class="language-{lang}"' if lang else ""
            blocks.append(f"<pre><code{cls}>{code}\n</code></pre>")
            continue

        # horizontal rule — before list ("- - -" would match a ul item)
        if _HR_RE.match(line):
            blocks.append("<hr />")
            i += 1
            continue

        # raw block-level HTML: passed through verbatim to the next blank
        # line (python-markdown; bs4 downstream keeps only the text)
        if _is_block_html(line):
            raw: list[str] = []
            while i < n and lines[i].strip():
                raw.append(lines[i])
                i += 1
            blocks.append("\n".join(raw))
            continue

        # indented (4-space / tab) code block — python-markdown core;
        # blank lines inside continue the block if more indented code
        # follows (trailing blanks are trimmed)
        if _INDENT_RE.match(line):
            body: list[str] = []
            while i < n and (_INDENT_RE.match(lines[i]) or not lines[i].strip()):
                m = _INDENT_RE.match(lines[i])
                body.append(m.group(1) if m else "")
                i += 1
            while body and not body[-1].strip():
                body.pop()
            code = _html.escape("\n".join(body), quote=False)
            blocks.append(f"<pre><code>{code}\n</code></pre>")
            continue

        heading = _HEADING_RE.match(line)
        if heading:
            level = len(heading.group(1))
            text = heading.group(2)
            anchor = _ATTR_LIST_RE.search(text)
            attr = ""
            if anchor:
                spec = anchor.group(0).strip()[1:-1].strip()
                text = text[: anchor.start()].rstrip()
                if spec.startswith("#"):
                    attr = f' id="{spec[1:]}"'
            blocks.append(f"<h{level}{attr}>{_inline(text, refs)}</h{level}>")
            i += 1
            continue

        # table: header row containing '|' followed by a separator row
        if "|" in line and i + 1 < n and _TABLE_SEP_RE.match(lines[i + 1]):
            tbl = [line, lines[i + 1]]
            i += 2
            while i < n and "|" in lines[i] and lines[i].strip():
                tbl.append(lines[i])
                i += 1
            blocks.append(_table_html(tbl, refs))
            continue

        if _UL_ITEM_RE.match(line) or _OL_ITEM_RE.match(line):
            # the list block runs to the next blank line; non-item lines
            # lazily continue the current item (python-markdown
            # get_items); higher-priority SEARCH processors (heading,
            # fence, hr) still split the block
            lst: list[str] = []
            while i < n and lines[i].strip():
                nxt = lines[i]
                if lst and (
                    _HEADING_RE.match(nxt)
                    or _FENCE_OPEN_RE.match(nxt)
                    or _HR_RE.match(nxt)
                ):
                    break
                lst.append(nxt)
                i += 1
            blocks.append(_list_html(lst, refs))
            continue

        if _QUOTE_LINE_RE.match(line):
            quoted: list[str] = []
            while i < n and lines[i].strip():
                ls = lines[i].lstrip()
                if ls.startswith(">"):
                    quoted.append(ls[1:].lstrip())
                    i += 1
                elif quoted and not (
                    _HEADING_RE.match(lines[i])
                    or _FENCE_OPEN_RE.match(lines[i])
                    or _HR_RE.match(lines[i])
                ):
                    # lazy continuation (python-markdown): any non-blank
                    # line that is not a higher-priority SEARCH splitter
                    # (heading / fence / hr) continues the quote — a
                    # "- item" line lazily joins the quoted paragraph as
                    # literal text, it does NOT start a list (list
                    # processors only test the block's first line)
                    quoted.append(ls)
                    i += 1
                else:
                    break
            blocks.append(
                "<blockquote>\n"
                + _render_blocks(quoted, refs)
                + "\n</blockquote>"
            )
            continue

        # paragraph: consume until blank line / structural splitter.  A
        # setext underline (=/-, column 0, may mix) closes the block as
        # a heading ONLY as the paragraph's second line — python-
        # markdown's SetextHeaderProcessor RE spans exactly the block's
        # first two lines, so "l1\nl2\n===" keeps the "===" as literal
        # paragraph text (and "l1\nl2\n---" splits on the hr SEARCH).
        # List-item lines never break a paragraph: python-markdown's
        # list processors test only the block's FIRST line, so a list
        # needs a blank line after a paragraph.  Heading / fence / hr /
        # quote DO split mid-block (SEARCH-based processors).
        para: list[str] = [line]
        i += 1
        setext_level = 0
        while i < n and lines[i].strip():
            nxt = lines[i]
            if len(para) == 1:
                st = _SETEXT_RE.match(nxt)
                if st:
                    setext_level = 1 if nxt[0] == "=" else 2
                    i += 1
                    break
            if (
                _FENCE_OPEN_RE.match(nxt)
                or _HEADING_RE.match(nxt)
                or _HR_RE.match(nxt)
                or _QUOTE_LINE_RE.match(nxt)
            ):
                break
            para.append(nxt)
            i += 1
        body_txt = _inline("\n".join(para), refs)
        if setext_level:
            blocks.append(f"<h{setext_level}>{body_txt}</h{setext_level}>")
        else:
            blocks.append(f"<p>{body_txt}</p>")

    return "\n".join(blocks)


def markdown_to_text(markdown_text: str) -> str:
    """Markdown → plain text; expects markdown unicode.

    Reference: /root/reference/hugo.py:244-261 (shortcode strip →
    markdown() → html2text).
    """
    markdown_text = strip_shortcodes(markdown_text)
    html = markdown_to_html(markdown_text)
    return html2text(html)
