"""Text analysis chains — the native-Spark re-expression of the analyzers
the reference configures in OpenSearch (/root/reference/common.py:4-31 and
/root/reference/mappings/hugo.json:54-72):

- ``english`` analyzer (title / body / text.english): standard tokenizer →
  possessive strip → lowercase → english stopwords (Lucene's 33-word
  default list) → Porter stemmer.
- ``trigram`` analyzer (text.trigram): standard tokenizer → lowercase →
  shingle(2..3) (common.py:10-14,22-27).
- ``reverse`` analyzer (text.reverse): standard tokenizer → lowercase →
  per-token reverse (common.py:15-19).
- ``simple`` chain: lowercase → [a-z0-9]+ tokens, no stop/stem — the
  SQL-parity chain (expressible identically in Spark SQL and the DuckDB
  oracle via regexp_split, so the driver's correctness gate can verify the
  whole index/scoring plane end-to-end).

Tokenizer fidelity note (SURVEY.md §7): Lucene's ``standard`` tokenizer is
UAX#29 word-break.  For the latin-script corpus this engine targets, the
chain below (word chars + apostrophe-joined runs) produces identical output;
full UAX#29 (CJK, complex scripts) is documented out of scope.

Everything here exists twice on purpose:

- plain-Python functions (``tokenize`` / ``analyze_text``) used by the
  pandas UDFs AND by the single-process oracle (docs_indexer_spark.oracle) —
  one implementation, two callers, so rank-identity can't drift;
- native Column expressions (``tokens_col`` / ``shingles_col`` /
  ``reverse_tokens_col``) that stay JVM-side / whole-stage-codegen for the
  chains that don't need Python (simple chain, shingles, reverse).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

from docs_indexer_spark.functions.porter import porter_stem

# Lucene EnglishAnalyzer default stopword set (33 words) — public list.
ENGLISH_STOPWORDS = frozenset(
    {
        "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
        "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
        "that", "the", "their", "then", "there", "these", "they", "this",
        "to", "was", "will", "with",
    }
)

# "standard tokenizer" approximation (UAX#29 word-break, the Lucene
# StandardTokenizer behaviors that matter):
# - latin/digit runs, apostrophe-joined (MidLetter): "don't" is one token
# - Hangul runs are words (ALetter)
# - Katakana runs chain (the KATAKANA word-break property)
# - Han ideographs and Hiragana emit as SINGLE-character tokens
#   (IDEOGRAPHIC/Hiragana don't chain in UAX#29 — Lucene emits one token
#   per ideograph; CJK bigramming is an analyzer concern, not tokenizer)
_TOKEN_PATTERN = (
    r"[a-z0-9]+(?:'[a-z0-9]+)*"
    r"|[가-힯]+"          # Hangul syllable runs
    r"|[゠-ヿ]+"          # Katakana runs
    r"|[一-鿿぀-ゟ]"  # Han / Hiragana single chars
)
_TOKEN_RE = re.compile(_TOKEN_PATTERN)
# the same token class as a Spark/DuckDB-shared split pattern (simple chain)
SIMPLE_SPLIT_PATTERN = "[^a-z0-9]+"


def tokenize(text: str) -> list[str]:
    """Lowercase + standard-ish tokenize (no stop/stem)."""
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


def _strip_possessive(token: str) -> str:
    """Lucene EnglishPossessiveFilter: strip trailing 's."""
    if token.endswith("'s"):
        return token[:-2]
    return token


def analyze_english(text: str) -> list[str]:
    """The ``english`` chain: tokenize → possessive → stop → Porter stem."""
    out = []
    for tok in tokenize(text):
        tok = _strip_possessive(tok)
        if tok in ENGLISH_STOPWORDS:
            continue
        out.append(porter_stem(tok))
    return out


def analyze_simple(text: str) -> list[str]:
    """The SQL-parity chain: lowercase + [a-z0-9]+ split only."""
    if not text:
        return []
    return [t for t in re.split(SIMPLE_SPLIT_PATTERN, text.lower()) if t]


def analyze_stop(text: str) -> list[str]:
    """simple chain + stopword removal (no stemming) — still SQL-parity
    (NOT IN (stopword list) is expressible in both Spark SQL and DuckDB)."""
    return [t for t in analyze_simple(text) if t not in ENGLISH_STOPWORDS]


def shingles(tokens: list[str], min_size: int = 2, max_size: int = 3,
             output_unigrams: bool = True) -> list[str]:
    """Lucene shingle filter (common.py:22-27): word n-grams joined by a
    space; unigrams emitted too (Lucene default output_unigrams=true)."""
    out = list(tokens) if output_unigrams else []
    n = len(tokens)
    for size in range(min_size, max_size + 1):
        for i in range(n - size + 1):
            out.append(" ".join(tokens[i : i + size]))
    return out


def reverse_tokens(tokens: list[str]) -> list[str]:
    """Lucene reverse filter (common.py:15-19)."""
    return [t[::-1] for t in tokens]


@dataclass(frozen=True)
class AnalyzerConfig:
    """Pins one analysis chain by name so the engine, the pandas UDFs and
    the oracle always agree."""

    name: str = "english"

    def fn(self) -> Callable[[str], list[str]]:
        return ANALYZERS[self.name]


ANALYZERS: dict[str, Callable[[str], list[str]]] = {
    "english": analyze_english,
    "simple": analyze_simple,
    "stop": analyze_stop,
}


def analyze_text(text: str, analyzer: str = "english") -> list[str]:
    return ANALYZERS[analyzer](text)


def analyze_with_positions(
    text: str, analyzer: str = "english"
) -> list[tuple[str, int]]:
    """[(term, position)] where position is the token's index in the
    UNFILTERED token stream — a removed stopword advances positions
    (Lucene position increments), so a phrase query "merge the sort"
    yields [(merge, 0), (sort, 2)] and matches documents indexed the same
    way."""
    from docs_indexer_spark.functions.porter import porter_stem

    out: list[tuple[str, int]] = []
    for i, tok in enumerate(tokenize(text)):
        if analyzer == "simple":
            out.append((tok, i))
            continue
        if analyzer == "english":
            tok = _strip_possessive(tok)
        if tok in ENGLISH_STOPWORDS:
            continue
        out.append((porter_stem(tok) if analyzer == "english" else tok, i))
    return out


# ---------------------------------------------------------------------------
# Native Column expressions (JVM-side, whole-stage codegen; no Python).
# ---------------------------------------------------------------------------

def tokens_col(col_name: str):
    """simple-chain tokens as a native expression:
    split(lower(col), '[^a-z0-9]+') with empties filtered.

    Stays inside WholeStageCodegen — this is the hot-path tokenizer for the
    SQL-parity plane and the 100-TB build when stemming is disabled.
    """
    from pyspark.sql import functions as F

    return F.filter(
        F.split(
            F.lower(F.coalesce(F.col(col_name), F.lit(""))), SIMPLE_SPLIT_PATTERN
        ),
        lambda t: t != "",
    )


def stop_filter_col(tokens):
    """Remove english stopwords from an array<string> column natively."""
    from pyspark.sql import functions as F

    stop_array = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOPWORDS)])
    return F.filter(tokens, lambda t: ~F.array_contains(stop_array, t))


def shingles_col(tokens, min_size: int = 2, max_size: int = 3):
    """Shingle filter as a native expression over array<string> —
    reference analyzer 'trigram' (common.py:10-14).  Emits unigrams +
    2..3-grams, like Lucene's defaults."""
    from pyspark.sql import functions as F

    n = F.size(tokens)

    def _gram(size: int):
        # positions 1..n-size+1, slice `size` tokens, space-join; when
        # n < size the whole branch yields an empty array.
        return F.when(
            n >= size,
            F.transform(
                F.sequence(F.lit(1), n - size + 1),
                lambda i: F.array_join(F.slice(tokens, i, size), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.concat(tokens, *[_gram(s) for s in range(min_size, max_size + 1)])


def reverse_tokens_col(tokens):
    """Reverse filter as a native expression (common.py:15-19)."""
    from pyspark.sql import functions as F

    return F.transform(tokens, lambda t: F.reverse(t))
