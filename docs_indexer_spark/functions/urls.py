"""URL canonicalization for web-corpus dedup and host-level statistics.

Common Crawl-style pipelines dedup and shard by URL; raw crawl URLs
disagree on case, default ports, ``www.``, tracking parameters, and
fragments, so canonicalization is the first web-text-specific operator
any crawl pipeline runs (the reference indexes Hugo page URLs —
hugo.py's ``base_url + path`` join — where the same normalization
questions are settled by construction; a crawl corpus has to settle
them explicitly).

Every step is a native ``regexp_replace`` — whole-stage codegen, no
UDF — and every pattern is RE2-compatible (no lookarounds, backrefs
only in replacements) so a DuckDB twin can apply the byte-identical
steps for the oracle gate.

Canonical form, applied in order:

1. lowercase the ``scheme://authority`` prefix (path/query stay
   case-sensitive per RFC 3986 §6.2.2.1);
2. drop the ``#fragment`` (never sent to the server);
3. drop a leading ``www.`` label;
4. drop scheme-default ports (``http://…:80``, ``https://…:443``);
5. drop tracking parameters (``utm_*``, ``gclid``, ``fbclid``) and any
   separator debris they leave behind.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PREFIX = r"^[^/?#]*://[^/?#]*"
_TRACK = r"(utm_[a-z0-9]+|gclid|fbclid)"


def canonical_url_col(col) -> Column:
    """Canonical form of a URL column (see module docstring)."""
    u = F.col(col) if isinstance(col, str) else col
    # 1. lowercase scheme://authority, keep the rest byte-identical
    u = F.concat(
        F.lower(F.regexp_extract(u, f"({_PREFIX})", 1)),
        F.regexp_replace(u, _PREFIX, ""),
    )
    # 2. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. www.
    u = F.regexp_replace(u, r"^(https?://)www\.", r"$1")
    # 4. default ports (no lookahead: capture the tail instead)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80($|[/?#].*)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443($|[/?#].*)", r"$1$2")
    # 5. tracking params — the name must follow a [?&] separator (an
    #    unanchored pattern would also strip the tail of params that
    #    merely END with a tracker name, e.g. "xgclid=5"), keeping the
    #    separator; then collapse the separator debris the removals
    #    leave behind ("?&&a" → "?a", "a=1&&" → "a=1&", trailing [?&])
    u = F.regexp_replace(u, r"([?&])" + _TRACK + r"=[^&]*", r"$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]+$", "")
    return u


CANONICAL_URL_SQL_STEPS = """
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    lower(regexp_extract({u}, '(^[^/?#]*://[^/?#]*)', 1))
                      || regexp_replace({u}, '^[^/?#]*://[^/?#]*', ''),
                    '#.*$', ''),
                  '^(https?://)www\\.', '\\1'),
                '^(http://[^/:?#]+):80($|[/?#].*)', '\\1\\2'),
              '^(https://[^/:?#]+):443($|[/?#].*)', '\\1\\2'),
            '([?&])(utm_[a-z0-9]+|gclid|fbclid)=[^&]*', '\\1', 'g'),
          '\\?&+', '?', 'g'),
        '&&+', '&', 'g'),
      '[?&]+$', '')
"""
"""DuckDB twin of :func:`canonical_url_col` — format with ``u=<expr>``.
Kept adjacent to the Spark steps so a change to one is a visible diff
in the other."""


def host_col(canon) -> Column:
    """Registrable host of an already-canonical URL."""
    c = F.col(canon) if isinstance(canon, str) else canon
    return F.regexp_extract(c, r"^[a-z][a-z0-9+.\-]*://([^/:?#]+)", 1)


def host_stats(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host corpus statistics over canonicalized URLs:
    ``(host, n_docs, n_urls)`` — crawl-politeness sharding, per-site
    caps, and domain blocklists all key on exactly this relation.

    100-TB shape: one narrow projection (two regexp chains, codegen)
    then one aggregate keyed by host with map-side combine; hosts are
    the natural partition key downstream, so the single shuffle this
    costs is the partitioning later stages want anyway.
    """
    canon = docs.select(canonical_url_col(url_col).alias("_curl"))
    return (
        canon.select(host_col("_curl").alias("host"), F.col("_curl"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("_curl").alias("n_urls"),
        )
    )
