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
