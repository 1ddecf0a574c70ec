"""Query-term highlighting + snippet extraction (the OpenSearch
``highlight`` feature the reference's search UI consumes — part of the
query-semantics plane the rebuild owns; SURVEY §3.3).

Everything is native regexp machinery (JVM-side, no UDF):

- :func:`highlight_col` wraps every whole-word, case-insensitive match of
  any query term in pre/post tags;
- :func:`snippet_col` extracts the first ±width-char window around a
  match, ellipsized — the "fragment" OpenSearch returns.

Terms are assumed to be analyzer output ([a-z0-9]+), so no regex escaping
is needed; callers passing raw user input should tokenize first.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _alts(terms: list[str]) -> str:
    # longest-first: regex alternation is first-match-wins, so "spark"
    # before "spark's" would highlight only the prefix of the possessive
    return "|".join(sorted(terms, key=lambda t: (-len(t), t)))


def _pattern(terms: list[str]) -> str:
    return r"(?i)\b(" + _alts(terms) + r")\b"


def highlight_col(text_col, terms: list[str], pre: str = "<em>", post: str = "</em>"):
    """Every term match wrapped in ``pre``/``post`` tags."""
    if not terms:
        return F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_replace(text_col, _pattern(terms), f"{pre}$1{post}")


def snippet_col(text_col, terms: list[str], width: int = 40):
    """First fragment: up to ``width`` chars of context either side of the
    first term match (empty string when no term occurs)."""
    if not terms:
        return F.lit("")
    pat = (
        r"(?i)(.{0," + str(width) + r"}\b(?:" + _alts(terms)
        + r")\b.{0," + str(width) + r"})"
    )
    return F.regexp_extract(text_col, pat, 1)
