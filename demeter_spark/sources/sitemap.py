"""Sitemap XML parsing (sitemaps.org protocol) — the crawl-discovery
companion of the robots.txt gate (operators/robots.py): a crawler reads
per-host sitemaps to seed and refresh its URL frontier.

Spark shape: ONE map-only pass over the (host, xml) dimension — `<url>`
blocks are isolated with a non-greedy regexp_extract_all, then per-block
fields extracted inside a transform(); no UDF, no explode of anything
but the per-host entry list (which IS the output). lastmod parses W3C
datetime (date-only or full) via try_cast-style coalesce, so malformed
values degrade to NULL rather than failing the scan. Sitemap-index
files (`<sitemap>` blocks) emit is_index=1 rows pointing at child
sitemaps, so frontier code can iterate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["parse_sitemap"]


def _entries(xml: str, tag: str) -> str:
    """SQL: array of <tag>...</tag> block bodies (non-greedy, dotall)."""
    return (
        f"regexp_extract_all({xml}, '(?is)<{tag}[^>]*>(.*?)</{tag}>', 1)"
    )


def parse_sitemap(
    sitemaps: DataFrame, host_col: str = "host", xml_col: str = "xml"
) -> DataFrame:
    """(host, url, lastmod timestamp, changefreq, priority, is_index) —
    one row per <url> entry (is_index=0) or <sitemap> index entry
    (is_index=1, child sitemap location in url)."""
    out = []
    for tag, is_index in (("url", 0), ("sitemap", 1)):
        blocks = _entries(xml_col, tag)
        out.append(
            f"""transform({blocks}, b -> named_struct(
              'url', trim(regexp_extract(b, '(?is)<loc>([^<]*)</loc>', 1)),
              'lastmod_s', trim(regexp_extract(b,
                  '(?is)<lastmod>([^<]*)</lastmod>', 1)),
              'changefreq', nullif(trim(regexp_extract(b,
                  '(?is)<changefreq>([^<]*)</changefreq>', 1)), ''),
              'priority', try_cast(nullif(trim(regexp_extract(b,
                  '(?is)<priority>([^<]*)</priority>', 1)), '') AS DOUBLE),
              'is_index', {is_index}))"""
        )
    entries = f"concat({out[0]}, {out[1]})"
    return (
        sitemaps.selectExpr(
            f"{host_col} AS host", f"explode({entries}) AS e"
        )
        .selectExpr(
            "host",
            "e.url AS url",
            # W3C datetime: full timestamp, else date-only, else NULL
            "coalesce(try_cast(e.lastmod_s AS TIMESTAMP),"
            " try_cast(try_cast(e.lastmod_s AS DATE) AS TIMESTAMP))"
            " AS lastmod",
            "e.changefreq AS changefreq",
            "e.priority AS priority",
            "e.is_index AS is_index",
        )
        .filter("url != ''")
    )
