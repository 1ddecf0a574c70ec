from docs_indexer_spark.oracle.engine import OracleIndex

__all__ = ["OracleIndex"]
