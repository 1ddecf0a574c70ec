"""Damerau-OSA edit distance — the actual Lucene/OpenSearch ``fuzziness``
semantics.

OpenSearch match-query fuzziness (``transpositions: true``, the default;
Lucene FuzzyQuery / LevenshteinAutomata) counts a swap of two ADJACENT
characters as ONE edit.  Plain Levenshtein counts it as two — so the
canonical misspelling "spakr" sits at Levenshtein 2 from "spark" and a
``fuzziness: 1`` query would (wrongly) return nothing, while OpenSearch
matches it.  Reference behavior: OpenSearch ``match`` with fuzziness over
the index the reference creates (/root/reference/common.py:4-31, queried
by test/integrationtest.sh:19).

The variant implemented is optimal string alignment (OSA): each
substring may be edited at most once, i.e. a transposed pair cannot be
edited again afterwards.  OSA and unrestricted Damerau-Levenshtein agree
for all distances ≤ 1 (the common fuzziness) and differ only on
contrived shapes like "ca" → "abc" (OSA 3, unrestricted 2); DuckDB's
``damerau_levenshtein`` is the unrestricted form, which is why the
driver-gate oracle pins ``fuzziness = 1`` where the two coincide.

Where it runs: DRIVER-SIDE, on candidate term sets that a SymSpell
deletion-neighborhood equi-join (or a Levenshtein-bounded prefilter)
has already shrunk to O(neighborhood) rows — never on data rows, never
as a per-row UDF over the corpus.  SymSpell candidate generation is
OSA-complete: if OSA(a, b) ≤ d then deleting the edited characters from
each side reaches a common string within d deletions, so the depth-d
deletion neighborhoods intersect (transpositions included: drop either
swapped char from both sides).
"""

from __future__ import annotations


def osa_distance(a: str, b: str, cap: int | None = None) -> int:
    """Optimal-string-alignment distance between ``a`` and ``b``
    (insert/delete/substitute = 1, adjacent transposition = 1).

    ``cap``: optional early-exit bound — when every entry of a DP row
    exceeds it, returns ``cap + 1`` immediately (candidate verification
    only needs "≤ d or not").
    """
    la, lb = len(a), len(b)
    if a == b:
        return 0
    if cap is not None and abs(la - lb) > cap:
        return cap + 1
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev2: list[int] | None = None  # row i-2
    prev = list(range(lb + 1))      # row i-1
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            d = min(
                prev[j] + 1,        # deletion
                cur[j - 1] + 1,     # insertion
                prev[j - 1] + cost, # substitution / match
            )
            if (
                i > 1
                and j > 1
                and ca == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d = min(d, prev2[j - 2] + 1)  # adjacent transposition
            cur[j] = d
        if cap is not None and min(cur) > cap:
            return cap + 1
        prev2, prev = prev, cur
    return prev[lb]
