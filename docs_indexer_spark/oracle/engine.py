"""Single-process pure-Python reference engine — the rank-identity oracle.

Plays the role OpenSearch plays for the reference repo: given the same
corpus and the same analysis chain, its BM25 top-k (docIDs AND scores) is
the ground truth the Spark engine must match (SURVEY.md §5).  ≤200 lines,
no Spark, no numpy — deliberately boring.

Shares the analyzer implementations with the engine (one function object,
two callers) so tokenization can never drift between the two sides.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from docs_indexer_spark.config import BM25Params
from docs_indexer_spark.functions.analysis import analyze_text


class OracleIndex:
    def __init__(self, analyzer: str = "english", params: BM25Params = BM25Params()):
        self.analyzer = analyzer
        self.params = params
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        self.doclens: dict[int, int] = {}

    def add(self, doc_id: int, text: str) -> None:
        tokens = analyze_text(text, self.analyzer)
        self.doclens[doc_id] = len(tokens)
        for term, tf in Counter(tokens).items():
            self.postings[term][doc_id] = tf

    @property
    def n_docs(self) -> int:
        return len(self.doclens)

    @property
    def avgdl(self) -> float:
        if not self.doclens:
            return 0.0
        return sum(self.doclens.values()) / len(self.doclens)

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        if df == 0:
            return 0.0
        n = self.n_docs
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def score(self, query: str, doc_id: int) -> float:
        k1, b = self.params.k1, self.params.b
        dl = self.doclens[doc_id]
        s = 0.0
        for term in set(analyze_text(query, self.analyzer)):
            tf = self.postings.get(term, {}).get(doc_id, 0)
            if tf:
                tfn = tf / (tf + k1 * (1 - b + b * dl / self.avgdl))
                s += self.idf(term) * tfn
        return s

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Top-k by (score desc, doc_id asc) — the pinned tie-break."""
        k1, b = self.params.k1, self.params.b
        avgdl = self.avgdl
        scores: dict[int, float] = defaultdict(float)
        for term in sorted(set(analyze_text(query, self.analyzer))):
            plist = self.postings.get(term)
            if not plist:
                continue
            w = self.idf(term)
            for doc_id, tf in plist.items():
                dl = self.doclens[doc_id]
                tfn = tf / (tf + k1 * (1 - b + b * dl / avgdl))
                scores[doc_id] += w * tfn
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
        return ranked[:k]
