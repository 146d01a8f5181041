"""Crawl-frontier planning (operators/frontier.py): new/stale
selection, robots gating, rank-ordered output."""

from datetime import datetime

from demeter_spark.operators import frontier as fr
from demeter_spark.operators import robots as rb


def test_plan_frontier_end_to_end(spark):
    sm = spark.createDataFrame(
        [
            ("a.example", "https://a.example/new", None, 0.9, 0),
            ("a.example", "https://a.example/stale",
             datetime(2024, 9, 5), 0.5, 0),
            ("a.example", "https://a.example/fresh",
             datetime(2024, 8, 1), 0.5, 0),
            ("a.example", "https://a.example/tmp/blocked", None, 1.0, 0),
            ("a.example", "https://a.example/child.xml", None, None, 1),
            ("b.example", "https://b.example/new", None, 0.2, 0),
        ],
        "host string, url string, lastmod timestamp, priority double,"
        " is_index int",
    )
    corpus = spark.createDataFrame(
        [
            ("https://a.example/stale", datetime(2024, 9, 1)),
            ("https://a.example/fresh", datetime(2024, 9, 1)),
        ],
        "url string, warc_ts timestamp",
    )
    rules = rb.parse_robots(
        spark.createDataFrame(
            [("a.example", "User-agent: *\nDisallow: /tmp/")],
            "host string, robots_txt string",
        )
    )
    ranks = spark.createDataFrame(
        [("a.example", 900), ("b.example", 100)], "node string, rank_fp long"
    )
    got = fr.plan_frontier(sm, corpus, rules, ranks).collect()
    urls = [r.url for r in got]
    # fresh (crawled after lastmod) and blocked and index rows excluded;
    # a.example (rank 900) before b.example (rank 100)
    assert urls == [
        "https://a.example/new",
        "https://a.example/stale",
        "https://b.example/new",
    ]
    reasons = {r.url: r.reason for r in got}
    assert reasons["https://a.example/new"] == "new"
    assert reasons["https://a.example/stale"] == "stale"


def test_snapshot_diff(spark):
    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "before"), ("u3", "gone")],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("u1", "same"), ("u2", "after"), ("u4", "fresh")],
        "url string, text string",
    )
    got = {r.url: r.change for r in fr.snapshot_diff(old, new).collect()}
    assert got == {"u2": "modified", "u3": "removed", "u4": "added"}
    # only fingerprints cross the exchange, never bodies
    plan = (
        fr.snapshot_diff(old, new)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "md5" in plan and "text" not in plan.split("Join")[0]


def test_crawl_traps(spark):
    rows = (
        # trap host: 200 urls, all one calendar template
        [(f"https://trap.example/cal/2024/{m}/{d}",)
         for m in range(1, 11) for d in range(1, 21)]
        # healthy host: 60 urls over 60 distinct templates
        + [(f"https://ok.example/{'x' * (i % 7 + 1)}page{'y' * (i % 5)}/about{'z' * (i % 3)}",)
           for i in range(60)]
    )
    pages = spark.createDataFrame(rows, "url string")
    got = {r.host: r for r in fr.crawl_traps(pages, min_urls=50).collect()}
    assert "trap.example" in got
    assert got["trap.example"].n_templates == 1
    assert "ok.example" not in got


def test_streaming_frontier(spark, tmp_path):
    from demeter_spark.streaming.incremental import streaming_frontier

    corpus = spark.createDataFrame(
        [("https://a.example/stale", datetime(2024, 9, 1))],
        "url string, warc_ts timestamp",
    )
    corpus_dir = str(tmp_path / "corpus")
    corpus.write.parquet(corpus_dir)
    sm_xml = (
        "<urlset><url><loc>https://a.example/new</loc></url>"
        "<url><loc>https://a.example/stale</loc>"
        "<lastmod>2024-09-05</lastmod></url></urlset>"
    )
    sm_dir = str(tmp_path / "sm")
    spark.createDataFrame(
        [("a.example", sm_xml)], "host string, xml string"
    ).write.parquet(sm_dir)
    streaming_frontier(
        spark, sm_dir, corpus_dir,
        str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )
    got = {
        r.url: r.reason
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {
        "https://a.example/new": "new",
        "https://a.example/stale": "stale",
    }
