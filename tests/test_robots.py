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


def test_parse_robots_crlf(spark):
    """ADVICE r06 (high): CRLF-served robots.txt must parse identically to
    LF — trailing '\\r' previously survived trim, the star group never set,
    and the gate failed open for the whole host."""
    txt_lf = "User-agent: *\nDisallow: /tmp/\nAllow: /tmp/public"
    txt_crlf = txt_lf.replace("\n", "\r\n")
    rows = rb.parse_robots(
        spark.createDataFrame(
            [("lf.example", txt_lf), ("crlf.example", txt_crlf)],
            "host string, robots_txt string",
        )
    ).collect()
    by_host = {r.host: (list(r.allow), list(r.disallow)) for r in rows}
    assert by_host["crlf.example"] == by_host["lf.example"] == (
        ["/tmp/public"], ["/tmp/"]
    )


def test_wildcard_rule_scored_by_literal_prefix(spark):
    """ADVICE r06 (low): 'Disallow: /*.pdf' matches every path on its
    literal prefix '/', but must score length 1 (the matched prefix), not
    7 (the full rule) — otherwise it out-ranks every shorter Allow and
    blocks the whole host."""
    txt = "User-agent: *\nAllow: /docs\nDisallow: /*.pdf"
    rules = rb.parse_robots(
        spark.createDataFrame([("a.example", txt)], "host string, robots_txt string")
    )
    pages = spark.createDataFrame(
        [("https://a.example/docs/guide",), ("https://a.example/other",)],
        "url string",
    )
    got = {r.url: r.allowed for r in rb.allowed_pages(pages, rules).collect()}
    # /docs/guide: allow '/docs' (5) beats wildcard prefix '/' (1)
    assert got["https://a.example/docs/guide"] == 1
    # /other: only the wildcard's '/' matches -> disallowed (len 1 > 0)
    assert got["https://a.example/other"] == 0
