"""WARC source — read Common-Crawl-style WARC/1.0 archives into the
engine's canonical input table (url, warc_ts, html, text, lang).

The north-star input is "an Iceberg table of Common-Crawl-style web
pages"; Common Crawl itself ships WARC files (ISO 28500): a
concatenation of records, each a header block (CRLF-terminated header
lines, blank-line terminator) followed by ``Content-Length`` bytes of
payload and a trailing CRLF CRLF.  ``response`` records carry an HTTP
response (status line + headers + body) whose body is the page HTML.

Spark shape: ``spark.read.format("binaryFile")`` ENUMERATES the
archive files (path column only — content is never materialized; one
row per file, Common Crawl segments its crawl into ~1 GB WARCs, so
files are the natural unit of parallelism, exactly how cc-pyspark and
every CC processing stack shards the crawl), and the parser runs as
``mapInPandas`` over the file rows, STREAMING each archive record by
record and yielding bounded-size batches — peak task memory is one
batch, never one decompressed archive.  Gzip members (``.warc.gz``:
each record its own gzip member, per the spec) decompress
incrementally as the parser pulls bytes.

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


def parse_warc_stream(stream) -> Iterator[dict]:
    """Yield {'url', 'warc_ts', 'html'} dicts for every ``response``
    record read INCREMENTALLY from a binary file-like object — one
    record's header + body resident at a time, never the whole archive
    (a ~1 GB Common Crawl segment decompresses to ~4-5 GB; buffering it
    per task is exactly the OOM shape a crawl-scale reader must avoid).
    Non-response records (warcinfo, request, metadata) are skipped.
    Framing errors stop the stream rather than resyncing — a truncated
    archive yields its complete prefix."""
    while True:
        # skip inter-record CRLF trailers before the next version line
        line = stream.readline()
        while line in (b"\r\n", b"\n"):
            line = stream.readline()
        if not line or not line.startswith(b"WARC/"):
            return
        fields = {}
        while True:
            ln = stream.readline()
            if not ln:
                return  # truncated mid-header
            if ln in (b"\r\n", b"\n"):
                break
            k, _, v = ln.decode("utf-8", "replace").partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            return
        body = stream.read(length)
        if len(body) < length:
            return  # truncated mid-body
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


def _open_warc(raw) -> object:
    """Wrap a binary stream in transparent multi-member gzip decoding
    when the magic bytes say so (.warc.gz: one gzip member per record
    per the spec; GzipFile reads across member boundaries and
    decompresses INCREMENTALLY as the parser pulls bytes)."""
    head = raw.peek(2)[:2] if hasattr(raw, "peek") else b""
    if head == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=raw)
    return raw


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """In-memory convenience twin of :func:`parse_warc_stream` (plain or
    gzip bytes) — fixtures and small archives; the Spark path streams."""
    yield from parse_warc_stream(
        _open_warc(io.BufferedReader(io.BytesIO(data)))
    )


def read_warc(
    spark: SparkSession,
    path: str,
    max_batch_records: int = 1024,
    max_batch_bytes: int = 32 << 20,
) -> DataFrame:
    """WARC archive(s) at ``path`` → (url, warc_ts, html, text, lang)
    DataFrame — the engine's canonical input shape; feed straight into
    ``prepare_documents`` / ``build_index``.

    Scale shape: ``binaryFile`` is used ONLY to enumerate files (the
    projection keeps just ``path``, so Spark never materializes file
    contents — binaryFile would otherwise buffer whole files and caps
    them at 2 GiB); each task then opens its file paths directly and
    STREAMS records through :func:`parse_warc_stream`, yielding a
    bounded pandas batch every ``max_batch_records`` records or
    ``max_batch_bytes`` of payload.  Peak memory per task is one batch
    (~32 MB), not one decompressed archive (~4-5 GB for a Common Crawl
    segment).  Files are the unit of parallelism — exactly how
    cc-pyspark and every CC stack shards the crawl (a crawl ships
    thousands of ~1 GB segments; executors must see the same
    filesystem/object store, which ``binaryFile``'s content reads
    require anyway).

    ``text`` and ``lang`` are null (extraction is the pipeline's job —
    ``--extract-html`` / prepare_documents); ``warc_ts`` parses the
    record's WARC-Date (ISO-8601 Zulu).

    Non-local schemes (s3a://, hdfs://, …): the Python worker has no
    Hadoop client to open such paths directly, so those inputs fall
    back to ``binaryFile`` CONTENT reads — the JVM's filesystem layer
    handles any supported scheme, at the cost of whole-file buffering
    per task and binaryFile's 2 GiB file cap (a Common Crawl segment is
    ~1 GB gzipped, inside the cap).  Record-level streaming remains the
    default for local/file: paths.
    """
    from urllib.parse import urlparse as _urlparse

    scheme = _urlparse(path).scheme
    if scheme not in ("", "file"):
        return _read_warc_content(
            spark, path, max_batch_records, max_batch_bytes
        )
    files = spark.read.format("binaryFile").load(path).select("path")

    def _flush(rows):
        import pandas as pd

        out = pd.DataFrame(rows, columns=["url", "warc_ts", "html"])
        out["warc_ts"] = pd.to_datetime(
            out["warc_ts"], errors="coerce", utc=True
        ).dt.tz_localize(None)
        out["text"] = None
        out["lang"] = None
        return out[["url", "warc_ts", "html", "text", "lang"]]

    def parse(batches):
        from urllib.parse import unquote, urlparse

        for pdf in batches:
            for uri in pdf["path"]:
                local = uri
                if local.startswith("file:"):
                    local = unquote(urlparse(local).path)
                rows: list[dict] = []
                nbytes = 0
                with open(local, "rb") as raw:
                    for rec in parse_warc_stream(_open_warc(raw)):
                        rows.append(rec)
                        nbytes += len(rec["html"])
                        if (
                            len(rows) >= max_batch_records
                            or nbytes >= max_batch_bytes
                        ):
                            yield _flush(rows)
                            rows, nbytes = [], 0
                if rows:
                    yield _flush(rows)

    return files.mapInPandas(parse, schema=WARC_SCHEMA)


def _read_warc_content(
    spark: SparkSession,
    path: str,
    max_batch_records: int,
    max_batch_bytes: int,
) -> DataFrame:
    """Object-store fallback for :func:`read_warc`: the JVM materializes
    each file's bytes (any Hadoop-supported scheme), the kernel still
    yields bounded batches — peak memory is one file + one batch."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def _flush(rows):
        import pandas as pd

        out = pd.DataFrame(rows, columns=["url", "warc_ts", "html"])
        out["warc_ts"] = pd.to_datetime(
            out["warc_ts"], errors="coerce", utc=True
        ).dt.tz_localize(None)
        out["text"] = None
        out["lang"] = None
        return out[["url", "warc_ts", "html", "text", "lang"]]

    def parse(batches):
        import io

        for pdf in batches:
            for content in pdf["content"]:
                rows: list[dict] = []
                nbytes = 0
                # BufferedReader gives the stream a ``peek`` so _open_warc
                # can sniff the gzip magic — a bare BytesIO has none and
                # .warc.gz content would silently parse as zero records
                with io.BufferedReader(io.BytesIO(bytes(content))) as raw:
                    for rec in parse_warc_stream(_open_warc(raw)):
                        rows.append(rec)
                        nbytes += len(rec["html"])
                        if (
                            len(rows) >= max_batch_records
                            or nbytes >= max_batch_bytes
                        ):
                            yield _flush(rows)
                            rows, nbytes = [], 0
                if rows:
                    yield _flush(rows)

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
