"""Engine-wide pinned parameters.

BM25 parameters and formula form are pinned to what the reference's
OpenSearch 3.x would run with its default similarity (no ``similarity`` key
anywhere in /root/reference/common.py or mappings/*.json → Lucene BM25
defaults k1=1.2, b=0.75; Lucene ≥8 form WITHOUT the (k1+1) numerator
factor — rank-neutral vs classic Okapi but score-relevant, so engine and
oracle both pin this exact form):

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(t,d) = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score    = sum_t idf(t) * tfn(t, d)

Divergence from Lucene documented here once: Lucene quantizes document
length through a 1-byte norm; we keep exact dl (float64), which makes the
engine *more* exact, and the oracle does the same, so rank-identity holds.

Tie-break is pinned: descending score, then ascending doc_id
(SURVEY.md §2 B8).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class BM25Params:
    k1: float = 1.2
    b: float = 0.75


# posting-list block size (docIDs per compressed block) — 128 like Lucene's
# postings format; small enough for fine-grained block-max pruning, large
# enough that per-block metadata is <5% of payload.
BLOCK_SIZE = 128

# number of doc-range buckets used to salt the per-term merge (SURVEY §2 C2):
# hot heads ("the"-class terms) split across buckets so no single task holds
# a whole Zipf-head posting list.  Buckets are doc_id RANGES, so per-term
# global doc order == (bucket, within-bucket order) and the merge is an
# ordered concat — no decode, no re-sort.
DEFAULT_BUCKETS = 32

DEFAULT_TOP_K = 10
