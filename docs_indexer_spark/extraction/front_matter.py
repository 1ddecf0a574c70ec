"""YAML front-matter split + parse.

Reproduces the semantics of the reference's ``get_front_matter``
(/root/reference/hugo.py:264-293):

- the front-matter span is delimited by the FIRST TWO occurrences of the
  regex ``(---)\\n`` anywhere in the document (hugo.py:274);
- fewer than two markers → the page is dropped: ``(None, None)``
  (hugo.py:293, test /root/reference/hugo_test.py:35-37);
- YAML parse error → dropped, ``(None, None)`` (hugo.py:279-283);
- the remainder is converted with ``markdown_to_text``;
- if the stripped body is empty and the front matter has a ``description``,
  the description becomes the body (hugo.py:287-289);
- the returned text is ``.strip()``-ed (hugo.py:291).
"""

from __future__ import annotations

import re
from typing import Any, Optional

import yaml

try:  # prefer the C-accelerated loader, same as /root/reference/hugo.py:20-24
    from yaml import CSafeLoader as _Loader
except ImportError:  # pragma: no cover
    from yaml import SafeLoader as _Loader

from docs_indexer_spark.extraction.markdown_text import markdown_to_text

_MARKER_RE = re.compile(r"(---)\n")


def get_front_matter(
    source_text: str, path: str = ""
) -> tuple[Optional[dict[str, Any]], Optional[str]]:
    """Return ``(front_matter_dict, body_text)`` or ``(None, None)``.

    Reference: /root/reference/hugo.py:264-293.
    """
    matches = list(_MARKER_RE.finditer(source_text))
    if len(matches) < 2:
        return (None, None)

    front_matter_start = matches[0].start(1)
    front_matter_end = matches[1].start(1)
    try:
        data = yaml.load(
            source_text[front_matter_start + 3 : front_matter_end], Loader=_Loader
        )
    except Exception:
        return (None, None)

    if not isinstance(data, dict):
        # reference would crash later on a non-dict front matter and the
        # caller (hugo.py:315-321) treats that as "no parseable front
        # matter" — the page-level outcome is identical: dropped.
        return (None, None)

    text = markdown_to_text(source_text[front_matter_end + 3 :])

    # use description as fall back for body on otherwise empty pages
    # (hugo.py:287-289)
    if text.strip() == "" and "description" in data:
        text = data["description"]

    return (data, text.strip())
