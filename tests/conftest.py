import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from docs_indexer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="docs-indexer-spark-tests",
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]"),
        shuffle_partitions=8,
    )
    yield spark


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def rank_identical(expected, actual, tol=1e-6):
    """Compare two [(doc_id, score)] top-k lists under the pinned tie-break,
    treating docs whose scores differ by < tol as interchangeable within a
    tie group (float sum order across engines is not defined)."""
    assert len(expected) == len(actual), (expected, actual)
    for (ed, es), (ad, asc) in zip(expected, actual):
        assert abs(es - asc) <= tol * max(1.0, abs(es)), (expected, actual)
    # doc ids must match except within score-tie groups
    i = 0
    n = len(expected)
    while i < n:
        j = i + 1
        while j < n and abs(expected[j][1] - expected[i][1]) <= tol * max(
            1.0, abs(expected[i][1])
        ):
            j += 1
        assert {d for d, _ in expected[i:j]} == {d for d, _ in actual[i:j]}, (
            expected,
            actual,
        )
        i = j
