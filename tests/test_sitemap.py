"""Sitemap XML parsing (sources/sitemap.py)."""

from datetime import datetime

from demeter_spark.sources.sitemap import parse_sitemap


def test_parse_urlset_and_index(spark):
    urlset = """<?xml version="1.0" encoding="UTF-8"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url>
        <loc>https://a.example/p/1</loc>
        <lastmod>2024-09-02T10:30:00Z</lastmod>
        <changefreq>daily</changefreq>
        <priority>0.8</priority>
      </url>
      <url><loc> https://a.example/p/2 </loc><lastmod>2024-09-03</lastmod></url>
      <url><loc>https://a.example/p/3</loc><lastmod>not-a-date</lastmod></url>
    </urlset>"""
    index = """<sitemapindex>
      <sitemap><loc>https://b.example/sitemap-1.xml</loc></sitemap>
    </sitemapindex>"""
    df = parse_sitemap(
        spark.createDataFrame(
            [("a.example", urlset), ("b.example", index)],
            "host string, xml string",
        )
    )
    rows = {r.url: r for r in df.collect()}
    assert set(rows) == {
        "https://a.example/p/1",
        "https://a.example/p/2",
        "https://a.example/p/3",
        "https://b.example/sitemap-1.xml",
    }
    r1 = rows["https://a.example/p/1"]
    assert r1.lastmod == datetime(2024, 9, 2, 10, 30)
    assert r1.changefreq == "daily" and abs(r1.priority - 0.8) < 1e-12
    assert r1.is_index == 0
    assert rows["https://a.example/p/2"].lastmod == datetime(2024, 9, 3)
    assert rows["https://a.example/p/3"].lastmod is None
    assert rows["https://b.example/sitemap-1.xml"].is_index == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
