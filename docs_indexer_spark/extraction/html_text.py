"""HTML → plain-text extraction.

Reproduces the semantics of the reference's ``html2text``
(/root/reference/common.py:33-38):

    parser = BeautifulSoup(html, features="html.parser")
    return ''.join(parser.find_all(string=True))

i.e. the concatenation of EVERY text node in document order — inter-tag
whitespace preserved exactly (proven by /root/reference/common_test.py:13-28),
entities decoded, and comment / script / style / doctype / CDATA /
processing-instruction text nodes included (they are all NavigableString
subclasses in bs4, so ``find_all(string=True)`` returns them).

bs4 with ``features="html.parser"`` is a thin tree-builder over the Python
stdlib ``html.parser.HTMLParser`` (``convert_charrefs=True``), and
``''.join`` of the strings erases the tree structure entirely, so the
extraction is exactly "concatenate the parser's data-like events in order".
We implement that directly on the stdlib parser: no tag handling, no tree —
O(bytes), allocation-light, suitable for running inside Arrow batches.

Divergence note: beautifulsoup4 is not installable in this environment, so
byte-identity is asserted against the reference's own checked-in golden
strings (common_test.py) plus a construct-pool fixture suite, not against a
live bs4 run.
"""

from __future__ import annotations

from html.parser import HTMLParser


class _TextNodeCollector(HTMLParser):
    """Collects every event that bs4's html.parser tree-builder would turn
    into a NavigableString (data, comments, declarations, PIs, CDATA)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []

    # regular character data (includes raw contents of <script>/<style>,
    # which html.parser delivers via handle_data in CDATA content mode)
    def handle_data(self, data: str) -> None:
        self.parts.append(data)

    # <!-- comment --> → bs4 Comment node (string subclass, included)
    def handle_comment(self, data: str) -> None:
        self.parts.append(data)

    # <!DOCTYPE html> → bs4 Doctype node; bs4 strips the "DOCTYPE " prefix
    def handle_decl(self, data: str) -> None:
        if data.startswith("DOCTYPE "):
            data = data[len("DOCTYPE "):]
        elif data == "DOCTYPE":
            data = ""
        self.parts.append(data)

    # <?php ... ?> → bs4 ProcessingInstruction node
    def handle_pi(self, data: str) -> None:
        self.parts.append(data)

    # <![CDATA[ ... ]]> → bs4 CData node
    def unknown_decl(self, data: str) -> None:
        if data.startswith("CDATA["):
            data = data[len("CDATA["):]
        self.parts.append(data)


def html2text(html: str) -> str:
    """Plain-text (UTF-8) representation of the given HTML.

    Reference: /root/reference/common.py:33-38.
    """
    collector = _TextNodeCollector()
    collector.feed(html)
    collector.close()
    return "".join(collector.parts)
