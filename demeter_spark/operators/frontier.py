"""Crawl-frontier planning — the composition the round-6 webtext wave
exists for: sitemap discovery + robots compliance + link-graph priority
folded into one prioritized fetch list.

    frontier = (sitemap URLs not yet crawled, or crawled before their
                lastmod) ∩ robots-allowed, ranked by host PageRank

Scale shape: ONE left anti-ish join of sitemap entries against the
crawled corpus keyed on url (the corpus side is pre-projected to
(url, warc_ts) — column-pruned at the scan), the broadcast robots
verdict (operators/robots.py, fact table never exploded), and a
broadcast host-rank dimension (operators/linkgraph.py ranks are
host-cardinality). Priority is deterministic: (host rank_fp desc,
sitemap priority desc, url asc) — integer fixed-point ranks make the
ordering identical at any parallelism.

Reference anchor: the reference's download planner is the minimal-cover
tile selection (demeter/sentinel2/utils/tiles.py:136-152) — choose what
to fetch next, cheapest sufficient set first; this is that stage for a
web crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["plan_frontier"]


def plan_frontier(
    sitemap_entries: DataFrame,
    corpus: DataFrame,
    robots_rules: DataFrame | None = None,
    host_ranks: DataFrame | None = None,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """(url, host, reason, rank_fp, priority) fetch list.

    ``reason``: 'new' (never crawled) or 'stale' (sitemap lastmod after
    the stored crawl timestamp). Entries without lastmod re-fetch only
    if never crawled. Sitemap-index rows are excluded (they feed the
    sitemap reader, not the fetcher). NULL-rank hosts sort last within
    their priority band (never-seen hosts are explored after known-good
    ones — the conservative frontier policy)."""
    sm = sitemap_entries.filter("is_index = 0").select(
        F.col("url"), F.col("lastmod"), F.col("priority"), F.col("host")
    )
    crawled = corpus.select(
        F.col(url_col).alias("url"), F.col(ts_col).alias("_crawled_ts")
    )
    j = sm.join(crawled, "url", "left").withColumn(
        "reason",
        F.expr(
            "CASE WHEN _crawled_ts IS NULL THEN 'new'"
            " WHEN lastmod IS NOT NULL AND lastmod > _crawled_ts"
            " THEN 'stale' END"
        ),
    ).filter("reason IS NOT NULL")
    if robots_rules is not None:
        from demeter_spark.operators.robots import allowed_pages

        j = (
            allowed_pages(j.drop("host"), robots_rules)
            .filter("allowed = 1")
            .drop("allowed", "match_allow_len", "match_dis_len", "path")
        )
    if host_ranks is not None:
        j = j.join(
            F.broadcast(
                host_ranks.select(
                    F.col("node").alias("host"), F.col("rank_fp")
                )
            ),
            "host",
            "left",
        )
    else:
        j = j.withColumn("rank_fp", F.lit(None).cast("bigint"))
    return j.select(
        "url", "host", "reason", "rank_fp", "priority"
    ).orderBy(
        F.desc_nulls_last("rank_fp"),
        F.desc_nulls_last("priority"),
        F.asc("url"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    content_col: str = "text",
) -> DataFrame:
    """Crawl-to-crawl delta: (key, change) with change in
    {'added','removed','modified'} — unchanged rows are dropped (at
    crawl scale they are ~all rows; the delta is the product). Feed two
    LineageLog time-travel reads (plans/lineage.read_stage(as_of=...))
    to diff committed snapshots without re-reading page bodies from
    later commits.

    ONE full outer join on the key comparing content fingerprints
    (md5 computed map-side so only 32-hex strings shuffle, not bodies).
    """
    o = old.selectExpr(f"{key_col} AS k", f"md5({content_col}) AS _fo")
    n = new.selectExpr(f"{key_col} AS k", f"md5({content_col}) AS _fn")
    return (
        o.join(n, "k", "full_outer")
        .selectExpr(
            f"k AS {key_col}",
            "CASE WHEN _fo IS NULL THEN 'added'"
            " WHEN _fn IS NULL THEN 'removed'"
            " WHEN _fo != _fn THEN 'modified' END AS change",
        )
        .where("change IS NOT NULL")
    )


def crawl_traps(
    pages: DataFrame,
    url_col: str = "url",
    min_urls: int = 50,
    max_template_ratio: float = 0.05,
) -> DataFrame:
    """Crawler-trap detection: hosts where huge URL counts collapse into
    few path TEMPLATES (numbers/hex-ids/uuids normalized to N) —
    calendars, session ids, faceted search, the infinite spaces a
    frontier must stop feeding. Map-only template projection + ONE
    map-side-combined aggregate per host (distinct templates via
    approx-exact count_distinct over the already-tiny per-host template
    set). Returns flagged hosts with the evidence columns."""
    t = (
        f"regexp_replace(regexp_replace(parse_url({url_col}, 'PATH'),"
        " '[0-9a-fA-F]{8,}', 'H'), '[0-9]+', 'N')"
    )
    per_host = (
        pages.selectExpr(
            f"parse_url({url_col}, 'HOST') AS host",
            f"{t} AS template",
        )
        .where("host IS NOT NULL")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("template").alias("n_templates"),
        )
    )
    return per_host.selectExpr(
        "host",
        "n_urls",
        "n_templates",
        "CAST(n_templates AS DOUBLE) / n_urls AS template_ratio",
    ).where(
        f"n_urls >= {min_urls}"
        f" AND CAST(n_templates AS DOUBLE) / n_urls <= {max_template_ratio}e0"
    )
