"""WARC source — read Common-Crawl-style WARC/1.0 archives into the
engine's canonical input table (url, warc_ts, html, text, lang).

The north-star input is "an Iceberg table of Common-Crawl-style web
pages"; Common Crawl itself ships WARC files (ISO 28500): a
concatenation of records, each a header block (CRLF-terminated header
lines, blank-line terminator) followed by ``Content-Length`` bytes of
payload and a trailing CRLF CRLF.  ``response`` records carry an HTTP
response (status line + headers + body) whose body is the page HTML.

Spark shape: ``spark.read.format("binaryFile")`` lists the archive
files (one row per file — Common Crawl segments its crawl into ~1 GB
WARCs, so files are the natural unit of parallelism, exactly how
cc-pyspark and every CC processing stack shards the crawl), and the
parser runs as ``mapInPandas`` over the file rows — vectorized batch
in, record rows out, no driver involvement.  Gzip members
(``.warc.gz``: each record its own gzip member, per the spec) are
handled transparently.

Parsing is dependency-free (stdlib only) and deliberately strict about
record framing (Content-Length is authoritative) while lenient about
header case and missing optional fields — the posture a crawler-facing
reader needs.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Yield {'url', 'warc_ts', 'html'} dicts for every ``response``
    record in one WARC byte stream (plain or gzip; multi-member gzip
    per the WARC spec).  Non-response records (warcinfo, request,
    metadata) are skipped.  Framing errors stop the stream rather than
    resyncing — a truncated archive yields its complete prefix."""
    if data[:2] == b"\x1f\x8b":
        # .warc.gz: one gzip member per record; GzipFile reads across
        # member boundaries transparently
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    buf = memoryview(data)
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and buf[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        head = bytes(buf[pos:head_end]).decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            break
        fields = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            break
        body_start = head_end + 4
        body = bytes(buf[body_start : body_start + length])
        pos = body_start + length
        if fields.get("warc-type") == "response":
            html = body
            # payload is an HTTP response: strip its status+headers
            http_end = body.find(b"\r\n\r\n")
            if body[:5] == b"HTTP/" and http_end >= 0:
                html = body[http_end + 4 :]
            yield {
                "url": fields.get("warc-target-uri", ""),
                "warc_ts": fields.get("warc-date", ""),
                "html": html,
            }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC archive(s) at ``path`` → (url, warc_ts, html, text, lang)
    DataFrame — the engine's canonical input shape; feed straight into
    ``prepare_documents`` / ``build_index``.

    ``text`` and ``lang`` are null (extraction is the pipeline's job —
    ``--extract-html`` / prepare_documents); ``warc_ts`` parses the
    record's WARC-Date (ISO-8601 Zulu).
    """
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_warc_bytes(bytes(content)):
                    rows.append(rec)
            out = pd.DataFrame(
                rows, columns=["url", "warc_ts", "html"]
            )
            out["warc_ts"] = pd.to_datetime(
                out["warc_ts"], errors="coerce", utc=True
            ).dt.tz_localize(None)
            out["text"] = None
            out["lang"] = None
            yield out[["url", "warc_ts", "html", "text", "lang"]]

    return files.mapInPandas(parse, schema=WARC_SCHEMA)


def write_warc(records: list[dict], compress: bool = False) -> bytes:
    """Serialize {'url', 'warc_ts', 'html'} records to WARC/1.0 bytes
    (response records wrapped in a minimal HTTP response) — the test
    fixture generator and the round-trip twin of :func:`read_warc`."""
    out = io.BytesIO()
    for r in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + r["html"]
        )
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r['warc_ts']}\r\n"
            f"Content-Length: {len(http)}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            "\r\n"
        ).encode()
        rec = head + http + b"\r\n\r\n"
        out.write(gzip.compress(rec) if compress else rec)
    return out.getvalue()
