"""Deterministic synthetic corpus in the input_hint shape
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

Seeded, no wall-clock, no network (FIXTURES.md §1).  Bodies draw words
Zipf(α≈1.05) from a 30k-word vocabulary so head-term skew (SURVEY §2 C2) is
actually exercised; ~1% of docs are near-empty (the empty-body fallback
path, /root/reference/hugo.py:287-289); a seeded minority are markdown
payloads wrapped in front matter so both extraction paths run.

The golden ``text`` column is produced by the SAME vendored extraction
pipeline the engine's pandas UDFs call — generated distributed (mapInPandas
over a range), never collected to the driver, so bench corpora of millions
of rows are cheap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from docs_indexer_spark.extraction.front_matter import get_front_matter
from docs_indexer_spark.extraction.html_text import html2text

LANGS = ["en", "de", "es", "fr", "pt", "nl"]
_BASE_TS = np.datetime64("2026-01-01T00:00:00")

CORPUS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _vocab(size: int = 30_000) -> list[str]:
    # deterministic pseudo-words: syllable product, no RNG needed
    syll = [
        "ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "ne",
        "pa", "qui", "ro", "su", "ta", "ve", "wo", "xi", "yo", "zu",
        "bra", "cle", "dri", "flo", "gra", "ple", "sta", "tri", "vra", "sno",
    ]
    out = []
    i = 0
    while len(out) < size:
        a = syll[i % len(syll)]
        b = syll[(i // len(syll)) % len(syll)]
        c = syll[(i // (len(syll) ** 2)) % len(syll)]
        out.append(a + b + c)
        i += 1
    return out


def _doc_html(rng: np.random.Generator, words: list[str]) -> str:
    """HTML built from the construct pool (FIXTURES.md §2)."""
    paras = []
    k = len(words)
    cut = 0
    while cut < k:
        step = int(rng.integers(5, 40))
        paras.append(" ".join(words[cut : cut + step]))
        cut += step
    body = "\n".join(f"<p>{p}</p>" for p in paras)
    extras = []
    if rng.random() < 0.3:
        extras.append("<!-- generated fixture -->")
    if rng.random() < 0.2:
        extras.append("<script>var a = 1;</script>")
    if rng.random() < 0.2:
        extras.append("<style>p{margin:0}</style>")
    if rng.random() < 0.3:
        extras.append("<div>entity &amp; test &#169;</div>")
    return (
        "<!DOCTYPE html>\n<html>\n<head><title>t</title></head>\n<body>\n"
        + body
        + "\n"
        + "\n".join(extras)
        + "\n</body>\n</html>"
    )


def _doc_markdown(rng: np.random.Generator, words: list[str]) -> str:
    """Front-mattered markdown exercising fences/tables/anchors/shortcodes."""
    third = max(1, len(words) // 3)
    w1 = " ".join(words[:third])
    w2 = " ".join(words[third : 2 * third])
    w3 = " ".join(words[2 * third :])
    title = " ".join(words[:2]) if len(words) >= 2 else "untitled"
    md = [
        "---",
        f"title: {title}",
        f"description: {w1[:60] or 'fixture page'}",
        "weight: 10",
        "---",
        "",
        f"## Heading one {{#anchor-{int(rng.integers(0, 99))}}}",
        "",
        w1,
        "",
        "{{< tabs >}}",
        w2,
        "{{< /tabs >}}",
        "",
        "```nohighlight",
        w3 or "empty",
        "```",
    ]
    return "\n".join(md)


def generate_corpus(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    zipf_alpha: float = 1.05,
    vocab_size: int = 30_000,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus generator (seeded per doc id)."""
    vocab = _vocab(vocab_size)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].values:
                i = int(i)
                rng = np.random.default_rng(seed * 1_000_003 + i)
                lang = LANGS[int(rng.zipf(2.0)) % len(LANGS)] if rng.random() < 0.5 else "en"
                near_empty = rng.random() < 0.01
                n_words = 0 if near_empty else int(rng.integers(30, 400))
                # Zipf-ranked vocabulary draw
                ranks = np.minimum(
                    rng.zipf(zipf_alpha, size=n_words), vocab_size
                ) - 1
                words = [vocab[r] for r in ranks]
                is_md = rng.random() < 0.25
                if is_md:
                    payload = _doc_markdown(rng, words)
                    _, text = get_front_matter(payload, "")
                    text = text or ""
                else:
                    payload = _doc_html(rng, words)
                    text = html2text(payload)
                url = f"https://site{i % 97}.example/{lang}/p{i}/"
                ts = _BASE_TS + np.timedelta64(i * 137, "s")
                rows.append(
                    {
                        "url": url,
                        "warc_ts": pd.Timestamp(ts),
                        "html": payload.encode("utf-8"),
                        "text": text,
                        "lang": lang,
                    }
                )
            yield pd.DataFrame(rows)

    # enough output files that a downstream scan parallelizes across a
    # local[32] (or wider) session — 8 files would cap the tokenize stage
    # at 8 tasks regardless of cores; capped so tiny files don't dominate
    parts = partitions or min(256, max(32, n_docs // 2_000))
    ids = spark.range(0, n_docs, numPartitions=parts).toDF("id")
    return ids.mapInPandas(gen, schema=CORPUS_SCHEMA)
