"""Golden extraction tests — the reference's own checked-in expectations
(/root/reference/common_test.py, /root/reference/hugo_test.py:7-89) run
against our stdlib-backed pipeline."""

from docs_indexer_spark.extraction import (
    get_front_matter,
    html2text,
    markdown_to_text,
    strip_shortcodes,
)

# /root/reference/common_test.py:4-20 — whitespace-exact golden pair
REF_HTML = """
<html>
<head/>
<body>
<div>This is my body</div>
</body>
</html>
"""
REF_TEXT = """



This is my body


"""


def test_html2text_reference_golden():
    assert html2text(REF_HTML) == REF_TEXT


def test_html2text_constructs():
    # nested inline tags: all text nodes, in order, no separators added
    assert html2text("<div>x<span>y</span>z</div>") == "xyz"
    # entities decoded
    assert html2text("a &amp; b &lt; &#169;") == "a & b < ©"
    # comments / script / style text nodes are included (bs4
    # find_all(string=True) semantics)
    assert html2text("<!-- note -->") == " note "
    assert html2text("<script>var a=1;</script>") == "var a=1;"
    assert html2text("<style>p{color:red}</style>") == "p{color:red}"
    # doctype contributes its name (bs4 Doctype node)
    assert html2text("<!DOCTYPE html><p>x</p>") == "htmlx"
    # br and malformed/unclosed tags don't eat surrounding text
    assert html2text("a<br>b<br/>c") == "abc"
    assert html2text("<div><p>open") == "open"
    assert html2text("") == ""


def test_markdown_fenced_code_language_stripped():
    # /root/reference/hugo_test.py:42-46
    md = "Intro text.\n\n```nohighlight\nkubectl get pods\n```\n\nAfter text."
    text = markdown_to_text(md)
    assert "nohighlight" not in text
    assert "kubectl get pods" in text


def test_markdown_table_separators_stripped():
    # /root/reference/hugo_test.py:48-61
    md = (
        "Intro.\n\n"
        "| Name | Role |\n"
        "| ---- | ---- |\n"
        "| Alice | Admin |\n"
        "| Bob | User |\n\n"
        "Outro."
    )
    text = markdown_to_text(md)
    assert "|" not in text
    assert "---" not in text
    for cell in ("Name", "Role", "Alice", "Admin", "Bob", "User"):
        assert cell in text


def test_markdown_heading_anchor_stripped():
    # /root/reference/hugo_test.py:63-69
    md = "## Resource types {#types}\n\nSome content.\n\n### Flags {#flags}\n\nMore."
    text = markdown_to_text(md)
    assert "{#types}" not in text
    assert "{#flags}" not in text
    assert "Resource types" in text
    assert "Flags" in text


def test_markdown_shortcodes_stripped():
    # /root/reference/hugo_test.py:71-89
    md = (
        "Install manually.\n\n"
        "{{< tabs >}}\n"
        '{{< tab name="Krew" >}}\n'
        "Pull the image.\n"
        "{{< /tab >}}\n"
        "{{< /tabs >}}\n\n"
        "{{% steps %}}\n"
        "Do the thing.\n"
        "{{% /steps %}}\n"
    )
    text = markdown_to_text(md)
    assert "{{" not in text and "}}" not in text
    assert "tabs" not in text and "steps" not in text
    assert "Pull the image." in text
    assert "Do the thing." in text


def test_shortcode_regex_forms():
    # parameterized + percent + closing forms, wrapped content kept
    s = strip_shortcodes('a {{< tab name="x" >}}b{{< /tab >}} c {{% s %}}d{{% /s %}}')
    assert s == "a b c d"


DOC_WITH_FM = """---
title: Node Pools
description: A general description of node pools.
date: 2019-12-19
weight: 130
type: page
categories: ["basics"]
---

This is the YAML example's text
"""

DOC_WITHOUT_FM = """# Headline 1

The _Giant Swarm App Catalog_ refers to a set of features and concepts.
"""


def test_markdown_indented_code_block():
    """python-markdown core: 4-space-indented lines are a code block —
    content survives, dedented; the block ends at the first unindented
    line."""
    from docs_indexer_spark.extraction.markdown_text import markdown_to_text

    md = "Before.\n\n    kubectl apply -f x.yaml\n    kubectl get pods\n\nAfter."
    text = markdown_to_text(md)
    assert "kubectl apply -f x.yaml" in text
    assert "kubectl get pods" in text
    assert "Before." in text and "After." in text
    assert "    kubectl" not in text  # dedented


def test_markdown_setext_headings():
    from docs_indexer_spark.extraction.markdown_text import (
        markdown_to_html,
        markdown_to_text,
    )

    md = "Top Title\n=========\n\nSection\n-------\n\nBody text."
    html = markdown_to_html(md)
    assert "<h1>Top Title</h1>" in html
    assert "<h2>Section</h2>" in html
    text = markdown_to_text(md)
    assert "Top Title" in text and "Section" in text and "Body text." in text
    assert "===" not in text and "---" not in text


def test_markdown_horizontal_rule_no_leak():
    from docs_indexer_spark.extraction.markdown_text import markdown_to_text

    md = "Above.\n\n---\n\nBelow.\n\n* * *\n\nEnd."
    text = markdown_to_text(md)
    assert "Above." in text and "Below." in text and "End." in text
    assert "---" not in text and "* * *" not in text


def test_markdown_reference_links():
    """Reference-style links resolve ([text][id], [text][], shortcut
    [text]); definition lines never leak into the text."""
    from docs_indexer_spark.extraction.markdown_text import markdown_to_text

    md = (
        "See [the docs][docs] and [GitHub][] or just [api].\n\n"
        "[docs]: https://docs.example/start\n"
        "[github]: https://github.example\n"
        "[api]: https://api.example\n"
    )
    text = markdown_to_text(md)
    assert "the docs" in text and "GitHub" in text and "api" in text
    assert "https://docs.example/start" not in text  # urls are attrs
    assert "[docs]:" not in text  # definitions consumed
    # undefined stays literal (python-markdown behavior)
    assert "[nope]" in markdown_to_text("try [nope] here")


def test_markdown_nested_lists():
    from docs_indexer_spark.extraction.markdown_text import (
        markdown_to_html,
        markdown_to_text,
    )

    md = (
        "- alpha\n"
        "    - alpha-one\n"
        "    - alpha-two\n"
        "- beta\n"
        "    1. beta-one\n"
        "- gamma\n"
    )
    html = markdown_to_html(md)
    assert html.count("<ul>") == 2 and "<ol>" in html
    text = markdown_to_text(md)
    for item in ("alpha", "alpha-one", "alpha-two", "beta", "beta-one", "gamma"):
        assert item in text
    # nested items stay inside the parent's <li> (python-markdown shape)
    assert "<li>alpha<ul>" in html


def test_markdown_setext_vs_hr_disambiguation():
    """A dash line AFTER a paragraph is a setext h2; standalone it is an
    hr — both python-markdown behaviors."""
    from docs_indexer_spark.extraction.markdown_text import markdown_to_html

    assert "<h2>Heading</h2>" in markdown_to_html("Heading\n---")
    assert "<hr />" in markdown_to_html("para\n\n---\n\nnext")


def test_front_matter_yaml():
    # /root/reference/hugo_test.py:30-33
    data, text = get_front_matter(DOC_WITH_FM, "yamlpath")
    assert data["title"] == "Node Pools"
    assert text == "This is the YAML example's text"


def test_front_matter_none():
    # /root/reference/hugo_test.py:35-37
    assert get_front_matter(DOC_WITHOUT_FM, "nonepath") == (None, None)


def test_front_matter_malformed_yaml_dropped():
    doc = "---\ntitle: [unclosed\n---\nbody\n"
    assert get_front_matter(doc, "p") == (None, None)


def test_front_matter_description_fallback():
    # /root/reference/hugo.py:287-289
    doc = "---\ntitle: T\ndescription: the fallback\n---\n\n   \n"
    data, text = get_front_matter(doc, "p")
    assert text == "the fallback"


def test_collect_properties_text():
    # /root/reference/hugo_test.py:152-186
    from docs_indexer_spark.extraction.properties_text import (
        collect_properties_text,
    )

    assert collect_properties_text({}) == []
    assert collect_properties_text({"description": "top"}) == ["top"]
    schema = {
        "description": "top",
        "properties": {
            "spec": {
                "description": "spec desc",
                "properties": {
                    "replicas": {"description": "number of replicas"},
                    "name": {},
                },
            },
            "status": {"description": "status desc"},
        },
    }
    assert collect_properties_text(schema) == [
        "top", "spec", "spec desc", "replicas", "number of replicas",
        "name", "status", "status desc",
    ]


def test_blockquote_lazy_continuation():
    """python-markdown lazy continuation: a non-blank line after a '>'
    line continues the quoted paragraph without its own '>'."""
    from docs_indexer_spark.extraction.markdown_text import markdown_to_html

    md = "> quoted start\nlazy continuation line\n\nnext paragraph"
    html = markdown_to_html(md)
    assert "<blockquote>" in html
    assert "lazy continuation line" in html.split("</blockquote>")[0]
    assert "next paragraph" in html.split("</blockquote>")[1]
    # a structural marker ends the quote instead of continuing it
    md2 = "> quoted\n# heading after"
    html2 = markdown_to_html(md2)
    assert "<h1>heading after</h1>" in html2
    assert "heading after" not in html2.split("</blockquote>")[0]


def test_markdown_raw_html_block_passthrough():
    """python-markdown passes raw block-level HTML through verbatim; the
    reference's html2text stage then keeps only its TEXT — tags must
    never leak into the extracted text (round-3 verdict item 8)."""
    from docs_indexer_spark.extraction.markdown_text import (
        markdown_to_html,
        markdown_to_text,
    )

    md = (
        "Before.\n\n"
        '<div class="note">\n'
        "<p>Inside <b>bold</b> text.</p>\n"
        "</div>\n\n"
        "After."
    )
    html = markdown_to_html(md)
    assert '<div class="note">' in html          # verbatim, not escaped
    assert "&lt;div" not in html
    text = markdown_to_text(md)
    assert "Inside bold text." in text
    assert "<" not in text and ">" not in text   # no tag leakage
    # comments pass through too (bs4 keeps comment text — pinned by the
    # reference golden for html2text("<!-- note -->"))
    assert " hidden note " in markdown_to_text("x\n\n<!-- hidden note -->\n\ny")


def test_markdown_raw_inline_html():
    from docs_indexer_spark.extraction.markdown_text import (
        markdown_to_html,
        markdown_to_text,
    )

    md = "A <span>span</span> and <abbr title='t'>abbr</abbr> here."
    assert "<span>span</span>" in markdown_to_html(md)
    assert markdown_to_text(md) == "A span and abbr here."
    # a lone "<" that opens no tag is escaped, not swallowed
    assert markdown_to_text("if a < b then") == "if a < b then"


def test_markdown_entity_references():
    """Named / decimal / hex entity references survive to the HTML stage
    intact (smart ampersand: only a BARE & is escaped), so the text
    stage decodes them exactly as bs4 decodes python-markdown output."""
    from docs_indexer_spark.extraction.markdown_text import (
        markdown_to_html,
        markdown_to_text,
    )

    md = "AT&amp;T vs AT&T and &copy; 2024 &mdash; star &#9733; hex &#x2605;"
    html = markdown_to_html(md)
    assert "&copy;" in html and "&#9733;" in html and "&#x2605;" in html
    assert "AT&amp;T vs AT&amp;T" in html        # both forms normalize
    assert markdown_to_text(md) == "AT&T vs AT&T and © 2024 — star ★ hex ★"


def test_markdown_nested_blockquote():
    """Quoted bodies recurse through the block grammar: '> >' nests, a
    '>'-only separator splits paragraphs, and no '>' marker ever leaks
    into the text."""
    from docs_indexer_spark.extraction.markdown_text import (
        markdown_to_html,
        markdown_to_text,
    )

    md = "> outer\n> > inner quote\n\nafter"
    html = markdown_to_html(md)
    assert html.count("<blockquote>") == 2
    assert "inner quote" in html
    text = markdown_to_text(md)
    assert ">" not in text
    assert "outer" in text and "inner quote" in text and "after" in text
    # paragraph split on a ">"-only line
    html2 = markdown_to_html("> first para\n>\n> second para")
    assert html2.count("<p>") == 2


def test_markdown_blockquote_in_list_item():
    from docs_indexer_spark.extraction.markdown_text import (
        markdown_to_html,
        markdown_to_text,
    )

    md = "- item one\n    > quoted inside item\n- item two"
    html = markdown_to_html(md)
    assert "<blockquote>" in html and "quoted inside item" in html
    text = markdown_to_text(md)
    assert ">" not in text
    for frag in ("item one", "quoted inside item", "item two"):
        assert frag in text


def test_markdown_indented_closing_fence():
    """A closing fence indented up to 3 spaces closes the block
    (CommonMark); previously it was missed and the fence swallowed the
    rest of the document."""
    from docs_indexer_spark.extraction.markdown_text import markdown_to_text

    md = "```\ncode line\n  ```\n\nAfter fence."
    text = markdown_to_text(md)
    assert "code line" in text and "After fence." in text


def test_markdown_code_span_fidelity():
    """python-markdown parses code spans FIRST and fully escapes their
    content: an entity inside backticks stays a literal reference in the
    final text, and emphasis/underscore syntax inside code is never
    re-parsed."""
    from docs_indexer_spark.extraction.markdown_text import markdown_to_text

    assert markdown_to_text("use `&copy;` not &copy;") == "use &copy; not ©"
    assert markdown_to_text("`a*b*c` and `x_y_z`") == "a*b*c and x_y_z"
    assert markdown_to_text("calc `a & b`") == "calc a & b"


def test_markdown_autolinks():
    from docs_indexer_spark.extraction.markdown_text import (
        markdown_to_html,
        markdown_to_text,
    )

    md = "see <https://ex.com/a_b?x=1&y=2> or mail <dev@example.com>"
    html = markdown_to_html(md)
    assert '<a href="https://ex.com/a_b?x=1&y=2">' in html
    assert '<a href="mailto:dev@example.com">' in html
    assert markdown_to_text(md) == \
        "see https://ex.com/a_b?x=1&y=2 or mail dev@example.com"


def test_markdown_setext_underline_second_line_only():
    """python-markdown's SetextHeaderProcessor RE spans exactly the
    block's first two lines (`^.*?\\n[=-]+[ ]*(\\n|$)` — the non-greedy
    `.*?` cannot cross a newline), so an underline after a multi-line
    paragraph is NOT a heading: a `===` line stays literal paragraph
    text, while a `---` line splits on the (SEARCH-based, lower-
    priority) hr processor instead."""
    from docs_indexer_spark.extraction.markdown_text import markdown_to_html

    html = markdown_to_html("line one\nline two\n===\n\nafter")
    assert "<h1>" not in html and "<h2>" not in html
    assert "<p>line one\nline two\n===</p>" in html

    html2 = markdown_to_html("line one\nline two\n---\n\nafter")
    assert "<h2>" not in html2
    assert "<p>line one\nline two</p>" in html2 and "<hr />" in html2

    # the underline must start at column 0 (python-markdown gives setext
    # no leading-space allowance, unlike hash headings' blocks)
    assert "<h1>" not in markdown_to_html("Title\n ===")
    # ... may mix = and - (level decided by the FIRST char) ...
    assert "<h1>Title</h1>" in markdown_to_html("Title\n=-=")
    # ... and the rest of the block re-parses after the heading
    html3 = markdown_to_html("Title\n===\nrest of block")
    assert "<h1>Title</h1>" in html3 and "<p>rest of block</p>" in html3


def test_markdown_list_requires_blank_line():
    """python-markdown's list processors test only the block's FIRST
    line (`OListProcessor.RE` is anchored, no MULTILINE), so a list
    cannot interrupt a paragraph — the marker lines stay literal
    paragraph text until a blank line precedes them."""
    from docs_indexer_spark.extraction.markdown_text import markdown_to_html

    html = markdown_to_html("para text\n- item one\n- item two")
    assert "<ul>" not in html
    assert "<p>para text\n- item one\n- item two</p>" in html
    # with the blank line the same lines ARE a list
    html2 = markdown_to_html("para text\n\n- item one\n- item two")
    assert "<ul>" in html2 and "<li>item one</li>" in html2
    # same rule inside a blockquote: a "- item" line lazily continues
    # the quoted paragraph as literal text
    html3 = markdown_to_html("> quoted\n- item\n\nnext para")
    assert "<ul>" not in html3
    assert "- item" in html3.split("</blockquote>")[0]


def test_markdown_list_blockquote_list():
    """List → blockquote → list: the quoted lines lazily continue the
    item (so the quote nests INSIDE the <li>), and the inner list needs
    a blank `>` line inside the quote — without one the `- inner` line
    lazily continues the quoted paragraph as literal text (list
    processors only test the block's first line)."""
    from docs_indexer_spark.extraction.markdown_text import (
        markdown_to_html,
        markdown_to_text,
    )

    blank = "- item\n  > quote\n  >\n  > - inner\n"
    html = markdown_to_html(blank)
    # quote nests inside the item's <li>, inner list inside the quote
    assert html.index("<li>item") < html.index("<blockquote>")
    assert html.index("<blockquote>") < html.index("<li>inner")
    assert html.index("<li>inner") < html.index("</blockquote>")
    text = markdown_to_text(blank)
    assert ">" not in text
    for frag in ("item", "quote", "inner"):
        assert frag in text

    noblank = "- item\n  > quote\n  > - inner\n"
    html2 = markdown_to_html(noblank)
    assert "<p>quote\n- inner</p>" in html2  # literal, no inner list
    assert html2.count("<ul>") == 1


def test_markdown_list_lazy_item_continuation():
    """A non-blank, non-marker line after a list item lazily continues
    that item's text (python-markdown get_items else-branch)."""
    from docs_indexer_spark.extraction.markdown_text import markdown_to_html

    html = markdown_to_html("- item\ncontinued text\n- second")
    assert "<li>item\ncontinued text</li>" in html
    assert "<li>second</li>" in html


def test_markdown_tab_indented_nested_list():
    """A tab-indented marker is a nested chunk (python-markdown expands
    tab = 4 spaces before block parsing)."""
    from docs_indexer_spark.extraction.markdown_text import markdown_to_html

    html = markdown_to_html("- item\n\t- inner\n- second")
    assert "<li>item<ul>" in html and "<li>inner</li>" in html
    assert "<li>second</li>" in html
