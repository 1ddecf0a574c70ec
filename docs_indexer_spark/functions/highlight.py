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


def fragments_col(
    text_col,
    terms: list[str],
    fragment_size: int = 100,
    num_fragments: int = 5,
):
    """Up to ``num_fragments`` matching fragments ranked by MATCH DENSITY
    — the OpenSearch plain highlighter's multi-fragment semantics
    (SimpleFragmenter cuts ``fragment_size``-char fragments, each scored
    by its term-match count, best N returned; ``order: score``).

    Returns ``array<struct<n_matches int, frag_idx int, fragment
    string>>``, best-first (ties broken by text order).  100% native HOF
    algebra — chunk via transform+substring, score via
    regexp_extract_all, rank via array_sort's natural struct ordering on
    (-n, idx) — so the plan stays JVM-side and the DuckDB twin is the
    same expressions.
    """
    txt = F.col(text_col) if isinstance(text_col, str) else text_col
    if not terms:
        return F.array().cast(
            "array<struct<n_matches:int,frag_idx:int,fragment:string>>"
        )
    pat = _pattern(terms)
    size = int(fragment_size)
    n_frags = F.ceil(F.length(txt) / F.lit(size)).cast("int")

    def _frag(i):
        piece = F.substring(txt, i * size + 1, size)
        return F.struct(
            (-F.size(F.regexp_extract_all(piece, F.lit(pat), 0)))
            .cast("int")
            .alias("_neg"),
            i.cast("int").alias("frag_idx"),
            piece.alias("fragment"),
        )

    frags = F.when(
        n_frags > 0,
        F.transform(F.sequence(F.lit(0), n_frags - 1), _frag),
    ).otherwise(
        F.array().cast(
            "array<struct<_neg:int,frag_idx:int,fragment:string>>"
        )
    )
    top = F.slice(
        F.array_sort(F.filter(frags, lambda s: s["_neg"] < 0)),
        1,
        num_fragments,
    )
    return F.transform(
        top,
        lambda s: F.struct(
            (-s["_neg"]).alias("n_matches"),
            s["frag_idx"].alias("frag_idx"),
            s["fragment"].alias("fragment"),
        ),
    )
