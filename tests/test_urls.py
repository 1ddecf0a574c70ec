"""URL canonicalization unit behaviors (functions/urls.py)."""

import pytest
from pyspark.sql import functions as F

from docs_indexer_spark.functions.urls import canonical_url_col, host_col

CASES = [
    # lowercase scheme://authority, path case preserved
    ("HTTPS://Ex.COM/Path/File", "https://ex.com/Path/File"),
    # fragment dropped
    ("https://ex.com/a#sec-2", "https://ex.com/a"),
    # www. dropped
    ("https://www.ex.com/a", "https://ex.com/a"),
    # scheme-default ports dropped ...
    ("http://ex.com:80/a", "http://ex.com/a"),
    ("https://ex.com:443/a", "https://ex.com/a"),
    ("http://ex.com:80", "http://ex.com"),
    # ... non-default and cross-scheme ports kept
    ("http://ex.com:8080/a", "http://ex.com:8080/a"),
    ("https://ex.com:80/a", "https://ex.com:80/a"),
    # tracking params dropped wherever they sit; real params survive
    ("https://ex.com/a?utm_source=f&id=7", "https://ex.com/a?id=7"),
    ("https://ex.com/a?id=7&utm_campaign=x", "https://ex.com/a?id=7"),
    ("https://ex.com/a?utm_a=1&utm_b=2", "https://ex.com/a"),
    ("https://ex.com/a?gclid=zz", "https://ex.com/a"),
    ("https://ex.com/a?a=1&fbclid=x&b=2", "https://ex.com/a?a=1&b=2"),
    # a param whose name merely ENDS with a tracker name is preserved
    ("https://ex.com/a?xgclid=5&b=2", "https://ex.com/a?xgclid=5&b=2"),
    ("https://ex.com/a?myutm_src=1", "https://ex.com/a?myutm_src=1"),
    # consecutive trackers, leading and mid-query
    ("https://ex.com/a?utm_a=1&utm_b=2&id=3", "https://ex.com/a?id=3"),
    ("https://ex.com/a?id=1&utm_a=1&utm_b=2", "https://ex.com/a?id=1"),
    # everything at once
    (
        "HTTP://WWW.Ex.COM:80/Docs/1?utm_source=feed&id=7#frag",
        "http://ex.com/Docs/1?id=7",
    ),
]


def test_canonical_url_table(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url_col("url").alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_canonical_idempotent(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, url string"
    )
    once = df.select("i", canonical_url_col("url").alias("c"))
    twice = once.select("i", canonical_url_col("c").alias("c2"))
    rows = once.join(twice, "i").collect()
    assert all(r["c"] == r["c2"] for r in rows)


def test_host_col(spark):
    df = spark.createDataFrame(
        [(1, "https://ex.com:8080/a?b=1"), (2, "http://sub.ex.org")],
        "i long, url string",
    )
    got = {
        r["i"]: r["h"]
        for r in df.select(
            "i", host_col(canonical_url_col("url")).alias("h")
        ).collect()
    }
    assert got == {1: "ex.com", 2: "sub.ex.org"}


def test_canonical_plan_is_codegen_only(spark):
    """The chain must stay native (no python UDF / no exchange)."""
    df = spark.createDataFrame([(1, "https://ex.com/a")], "i long, url string")
    plan = (
        df.select(canonical_url_col("url").alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "Exchange" not in plan
