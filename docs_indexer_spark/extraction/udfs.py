"""Arrow-batched pandas UDFs wrapping the extraction pipeline.

The Spark dispatch layer is vectorized (input_hint: "no per-row Python"):
one Arrow batch crosses the JVM↔Python boundary at a time; the per-element
parser calls happen inside the batch, amortizing all serialization —
exactly mirroring the reference's per-document logic
(/root/reference/hugo.py:296-355) without its per-document process/network
round-trip.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from docs_indexer_spark.extraction.front_matter import get_front_matter
from docs_indexer_spark.extraction.html_text import html2text
from docs_indexer_spark.extraction.markdown_text import markdown_to_text


@F.pandas_udf(StringType())
def html2text_udf(html: pd.Series) -> pd.Series:
    """binary/string HTML column → extracted plain text.

    Semantics: /root/reference/common.py:33-38 (every text node, in order).
    """
    def one(value) -> str:
        if value is None:
            return ""
        if isinstance(value, (bytes, bytearray)):
            value = value.decode("utf-8", errors="replace")
        return html2text(value)

    return html.map(one)


@F.pandas_udf(StringType())
def markdown2text_udf(md: pd.Series) -> pd.Series:
    """markdown column → plain text (shortcode strip → md→html → html2text).

    Semantics: /root/reference/hugo.py:244-261.
    """
    return md.map(lambda v: markdown_to_text(v) if v is not None else "")


@F.pandas_udf(StringType())
def front_matter_json_udf(source: pd.Series) -> pd.Series:
    """markdown document → JSON {"front_matter": {...}|null, "body": str|null}.

    Pages without parseable front matter yield nulls — the caller filters
    them out, mirroring the reference's drop-on-error
    (/root/reference/hugo.py:279-293).  JSON transport keeps the UDF a
    single Arrow column; the caller explodes it with native from_json.
    """
    def one(value) -> str:
        if value is None:
            return json.dumps({"front_matter": None, "body": None})
        data, body = get_front_matter(value)
        fm = (
            {str(k): "" if v is None else str(v) for k, v in data.items()}
            if isinstance(data, dict)
            else None
        )
        return json.dumps({"front_matter": fm, "body": body})

    return source.map(one)
