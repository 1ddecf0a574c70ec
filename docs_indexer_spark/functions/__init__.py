from docs_indexer_spark.functions.porter import porter_stem
from docs_indexer_spark.functions.analysis import (
    ENGLISH_STOPWORDS,
    AnalyzerConfig,
    analyze_text,
    tokenize,
)

__all__ = [
    "porter_stem",
    "ENGLISH_STOPWORDS",
    "AnalyzerConfig",
    "analyze_text",
    "tokenize",
]
