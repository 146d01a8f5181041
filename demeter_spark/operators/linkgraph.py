"""Hyperlink graph extraction + PageRank over crawled pages.

The web-graph half of a crawl pipeline: pull hrefs out of stored HTML,
aggregate to a host graph, rank hosts/pages by the public PageRank
power iteration (Brin & Page 1998). The reference has no web-graph
surface at all (it is a raster/vector fetch library); this extends the
webtext axis the same way hydrology extends the raster axis — computing
the derived product the inputs exist to support.

Scale shape:
- link extraction is ONE map-side pass (regexp_extract_all + explode,
  no UDF) — the fact-table scan every crawl pays anyway;
- each PageRank iteration is one join (ranks x edges on src — both sides
  hash-partitioned on the same key after the first iteration, so AQE
  reuses the layout) + one groupBy(dst) sum + a broadcast of two scalars
  (dangling mass, node count); per-round state is localCheckpointed
  (the repo-wide iterative-loop plan-growth contract);
- ranks live in INT64 fixed point (units of 2^-40) by default: integer
  sums are order-independent, so the result is BIT-IDENTICAL across
  partitionings, retries and engines — the same cross-engine discipline
  as the integer D8/zonal/LM cores. Floor-division mass loss (at most
  out_deg ulps per node per round) drains to nothing rather than
  accumulating; a float mode exists for accuracy comparisons and is
  pinned against a numpy reference in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1 << 40  # fixed-point unit for integer mode

__all__ = ["extract_links", "host_edges", "pagerank"]


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src, dst) absolute-http(s) link pairs from stored HTML bytes.
    Map-only: decode + regexp_extract_all + explode, no UDF. Relative
    URLs are out of scope (a resolver needs base-URL semantics; absolute
    links dominate cross-host graphs, which is what PageRank consumes).
    """
    return pages.selectExpr(
        f"{url_col} AS src",
        f"""explode(regexp_extract_all(decode({html_col}, 'UTF-8'),
            'href="(https?://[^"]+)"', 1)) AS dst""",
    )


def host_edges(links: DataFrame) -> DataFrame:
    """Page-level links -> distinct host-level edges (self-loops dropped:
    intra-host navigation is noise for inter-host rank flow)."""
    e = links.select(
        F.expr("parse_url(src, 'HOST')").alias("src"),
        F.expr("parse_url(dst, 'HOST')").alias("dst"),
    ).where("src IS NOT NULL AND dst IS NOT NULL AND src <> dst")
    return e.distinct()


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    mode: str = "int",
) -> DataFrame:
    """PageRank after ``n_iter`` power iterations: (node, rank).

    ``mode='int'`` (default): ranks in 2^-40 fixed point; every reduction
    is an integer sum => bit-identical output for any partitioning (the
    damping multiply is (r * num) div den with damping = num/den at
    den=2^20 — exact integer arithmetic throughout). Floor-division
    remainders (< out_deg units of 2^-40 per node per round) are
    deliberately dropped; total mass decays by < |E| * 2^-40 per round,
    immaterial at any real scale and fully deterministic.

    ``mode='float'``: textbook doubles (sum order is shuffle-dependent —
    use for accuracy studies, not for reproducible pipelines).

    Dangling nodes (no outlinks) redistribute their mass uniformly, the
    standard correction.
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # node dimension carries out_deg (NULL = dangling) so the per-round
    # dangling-mass sum is a scan of this small checkpointed frame — no
    # per-round anti-join against deg
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .join(deg.withColumnRenamed("src", "node"), "node", "left")
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    ed = edges.join(deg, "src").localCheckpoint(eager=True)

    d_num, d_den = int(round(damping * (1 << 20))), 1 << 20
    if mode == "int":
        init = SCALE // n
        base = (SCALE - d_num * SCALE // d_den) // n  # (1-d)/n, exact ints
        ranks = nodes.select("node", "out_deg").withColumn(
            "rank", F.lit(init).cast("bigint")
        )
        for _ in range(n_iter):
            r = ranks.select("node", "rank")
            contrib = (
                ed.join(r, ed["src"] == r["node"])
                .select(
                    F.col("dst").alias("node"),
                    # integer `div`, NOT `/`: bigint / bigint is a double
                    # divide in Spark, and truncating a nearest-rounded
                    # double is not exact floor division
                    F.expr("rank div out_deg").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("inflow"))
            )
            # dangling mass: rank sitting on nodes with no outlinks
            dangling = (
                ranks.filter("out_deg IS NULL")
                .agg(F.sum("rank"))
                .collect()[0][0]
                or 0
            )
            share = int(dangling) // n
            ranks = (
                nodes.join(contrib, "node", "left")
                .select(
                    "node",
                    "out_deg",
                    F.expr(
                        f"{base} + ((coalesce(inflow, 0) + {share})"
                        f" * {d_num}) div {d_den}"
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
        return ranks.select(
            "node",
            F.col("rank").alias("rank_fp"),
            (F.col("rank").cast("double") / F.lit(float(SCALE))).alias("rank"),
        )

    if mode != "float":
        raise ValueError(f"unknown mode {mode!r}")
    ranks = nodes.select("node", "out_deg").withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        r = ranks.select("node", "rank")
        contrib = (
            ed.join(r, ed["src"] == r["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        dangling = (
            ranks.filter("out_deg IS NULL")
            .agg(F.sum("rank"))
            .collect()[0][0]
            or 0.0
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                "out_deg",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.drop("out_deg")
