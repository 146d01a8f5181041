"""robots.txt parsing + longest-match allow/deny verdicts (RFC 9309
subset; operators/robots.py)."""

from demeter_spark.operators import robots as rb


def test_parse_robots_star_groups(spark):
    txt = "\n".join(
        [
            "# global rules",
            "User-agent: googlebot",
            "Disallow: /private-g",
            "",
            "User-agent: *",
            "User-agent: demeterbot",
            "Disallow: /tmp/",
            "Allow: /tmp/public",
            "Disallow:",  # empty value = no rule
            "Crawl-delay: 5",
            "Disallow: /late",  # still in the *-group (delay doesn't close)
            "",
            "User-agent: otherbot",
            "Disallow: /",
        ]
    )
    rules = rb.parse_robots(
        spark.createDataFrame([("a.example", txt)], "host string, robots_txt string")
    ).collect()[0]
    assert rules.host == "a.example"
    assert list(rules.allow) == ["/tmp/public"]
    assert list(rules.disallow) == ["/tmp/", "/late"]


def test_allowed_pages_longest_match(spark):
    txt = "User-agent: *\nDisallow: /tmp/\nAllow: /tmp/public\nDisallow: /x*.pdf"
    rules = rb.parse_robots(
        spark.createDataFrame([("a.example", txt)], "host string, robots_txt string")
    )
    pages = spark.createDataFrame(
        [
            ("https://a.example/tmp/secret",),      # disallowed
            ("https://a.example/tmp/public/doc",),  # allow is longer -> ok
            ("https://a.example/open",),            # no rule matches -> ok
            ("https://a.example/x123.pdf",),        # wildcard literal '/x'
            ("https://b.example/tmp/secret",),      # no robots row -> ok
            ("https://a.example",),                 # bare root -> '/'
        ],
        "url string",
    )
    got = {
        r.url: r.allowed for r in rb.allowed_pages(pages, rules).collect()
    }
    assert got == {
        "https://a.example/tmp/secret": 0,
        "https://a.example/tmp/public/doc": 1,
        "https://a.example/open": 1,
        "https://a.example/x123.pdf": 0,
        "https://b.example/tmp/secret": 1,
        "https://a.example": 1,
    }
    # pure Catalyst: no Python eval in the verdict plan
    plan = (
        rb.allowed_pages(pages, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
