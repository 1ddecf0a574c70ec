from docs_indexer_spark.extraction.html_text import html2text
from docs_indexer_spark.extraction.markdown_text import (
    markdown_to_text,
    strip_shortcodes,
)
from docs_indexer_spark.extraction.front_matter import get_front_matter

__all__ = ["html2text", "markdown_to_text", "strip_shortcodes", "get_front_matter"]
