"""Static gate (SURVEY §7): no row-at-a-time Python UDFs and no RDD API in
the engine — only pandas_udf / mapInPandas / applyInPandas cross the
JVM↔Python boundary, and only where a native expression can't express the
semantics."""

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "docs_indexer_spark"

ROW_UDF_RE = re.compile(r"(?<!pandas_)\budf\s*\(")
RDD_RE = re.compile(r"\.rdd\b|\bparallelize\s*\(")
COLLECT_LOOP_RE = re.compile(r"for\s+\w+\s+in\s+\w+\.collect\(\)")


def _sources():
    return list(PKG.rglob("*.py"))


def test_no_row_at_a_time_udf():
    for path in _sources():
        text = path.read_text()
        assert not ROW_UDF_RE.search(text), f"row-at-a-time udf( in {path}"


def test_no_rdd_api():
    """No RDD compute API.  A line may carry ``# rdd-lint: allow`` for the
    one sanctioned use: ``.rdd.getNumPartitions()`` as a plan-level
    partition-count probe (builds lineage, runs no job, moves no data)."""
    for path in _sources():
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if "rdd-lint: allow" in line:
                assert ".getNumPartitions()" in line, (
                    f"rdd-lint pragma only covers partition probes: {path}:{i}"
                )
                continue
            assert not RDD_RE.search(line), f"RDD API in {path}:{i}"


def test_no_driver_side_collect_loops():
    """collect() is allowed only for tiny driver-side lookups (stats, idf
    of query terms) — never to iterate data rows."""
    for path in _sources():
        text = path.read_text()
        assert not COLLECT_LOOP_RE.search(text), f"collect() loop in {path}"
