"""WARC source reader: spec framing, gzip members, HTTP payload strip,
end-to-end into the index build."""

import datetime

from pyspark.sql import functions as F

from docs_indexer_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc,
)

RECORDS = [
    {"url": "https://ex.com/a", "warc_ts": "2024-01-02T03:04:05Z",
     "html": b"<html><body>alpha beta gamma</body></html>"},
    {"url": "https://ex.com/b", "warc_ts": "2024-02-03T04:05:06Z",
     "html": b"<html><body>delta epsilon</body></html>"},
]


def test_parse_roundtrip_plain_and_gzip():
    for compress in (False, True):
        data = write_warc(RECORDS, compress=compress)
        got = list(parse_warc_bytes(data))
        assert [g["url"] for g in got] == [r["url"] for r in RECORDS]
        assert [g["html"] for g in got] == [r["html"] for r in RECORDS]


def test_parse_skips_non_response_and_truncation():
    # warcinfo record followed by a response; then a truncated tail
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\n"
        b"hello\r\n\r\n"
    )
    data = info + write_warc(RECORDS[:1]) + b"WARC/1.0\r\nWARC-Typ"
    got = list(parse_warc_bytes(data))
    assert len(got) == 1 and got[0]["url"] == RECORDS[0]["url"]
    # raw payload without an HTTP envelope is kept verbatim
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: u\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: 3\r\n\r\nxyz\r\n\r\n"
    )
    assert list(parse_warc_bytes(raw))[0]["html"] == b"xyz"


def test_read_warc_to_dataframe_and_build(spark, tmp_path):
    """Files → canonical (url, warc_ts, html, text, lang) table →
    straight into the staged index build."""
    from docs_indexer_spark.plans.build_index import build_index
    from docs_indexer_spark.plans.query import IndexReader
    from docs_indexer_spark.sources.catalog import SnapshotCatalog

    d = tmp_path / "warcs"
    d.mkdir()
    (d / "part1.warc").write_bytes(write_warc(RECORDS[:1]))
    (d / "part2.warc.gz").write_bytes(write_warc(RECORDS[1:], compress=True))

    df = read_warc(spark, str(d))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"https://ex.com/a", "https://ex.com/b"}
    assert rows["https://ex.com/a"]["warc_ts"] == datetime.datetime(
        2024, 1, 2, 3, 4, 5
    )
    assert rows["https://ex.com/b"]["html"].startswith(b"<html>")
    assert rows["https://ex.com/a"]["text"] is None

    cat = SnapshotCatalog(str(tmp_path / "wh"))
    build_index(spark, df, cat, fingerprint="warc-1",
                n_build_partitions=1, analyzer="stop",
                use_extraction=True)
    reader = IndexReader(spark, cat)
    hits = reader.search("alpha", k=5).collect()
    assert len(hits) == 1
    reader.close()


def test_read_warc_streams_bounded_batches(spark, tmp_path):
    """The Spark reader must (a) never materialize binaryFile content —
    only the path column reaches the scan — and (b) emit MANY bounded
    batches from one archive rather than one archive-sized DataFrame."""
    from docs_indexer_spark.sources.warc import parse_warc_stream, _open_warc

    # payloads big and high-entropy enough that the compressed archive
    # spans many gzip read-ahead chunks — otherwise incrementality is
    # unobservable (the whole file fits in one buffered read)
    many = [
        {"url": f"https://ex.com/p{i}", "warc_ts": "2024-03-04T05:06:07Z",
         "html": (f"<html><body>page {i} ".encode()
                  + bytes((i * 131 + j * 97) % 251 for j in range(4096))
                  + b"</body></html>")}
        for i in range(25)
    ]
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "big.warc.gz").write_bytes(write_warc(many, compress=True))

    df = read_warc(spark, str(d), max_batch_records=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan  # path-only projection on binaryFile
    got = df.collect()
    assert len(got) == 25
    assert {r["url"] for r in got} == {r["url"] for r in many}

    # the stream parser itself yields incrementally: pulling the first
    # record must not consume the rest of the archive
    import gzip as _gz
    with open(d / "big.warc.gz", "rb") as raw:
        stream = _open_warc(raw)
        it = parse_warc_stream(stream)
        first = next(it)
        assert first["url"] == "https://ex.com/p0"
        assert raw.tell() < (d / "big.warc.gz").stat().st_size
        assert sum(1 for _ in it) == 24


def test_content_fallback_reads_gzip(spark, tmp_path):
    """The non-local-scheme fallback (_read_warc_content) parses GZIPPED
    archives: the in-kernel stream must expose peek() so _open_warc can
    sniff the gzip magic (a bare BytesIO silently yielded 0 records)."""
    from docs_indexer_spark.sources.warc import _read_warc_content

    d = tmp_path / "warcs_gz"
    d.mkdir()
    (d / "seg.warc.gz").write_bytes(write_warc(RECORDS, compress=True))
    (d / "seg2.warc").write_bytes(write_warc(RECORDS[:1]))
    df = _read_warc_content(spark, str(d), 1024, 32 << 20)
    got = df.collect()
    assert len(got) == 3
    assert {r["url"] for r in got} == {r["url"] for r in RECORDS}
