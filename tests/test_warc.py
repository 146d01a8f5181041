"""WARC container source: round-trip writer/parser, gzip multi-member
layout, Spark binaryFile+mapInPandas ingestion, byte-identical html, and
composition with the extract_text invariant."""

import pytest

from demeter_spark.sources import warc
from demeter_spark.sources.synth import extract_text_expr


def _mk_records(n, host):
    recs = [
        {
            "type": "warcinfo",
            "url": None,
            "date": "2026-01-01T00:00:00Z",
            "payload": b"software: synthetic-crawler/1.0",
        }
    ]
    for i in range(n):
        text = f"Doc {i} body & <tagged> text from {host}"
        html = (
            f"<html><head><title>d{i}</title></head><body><article>"
            + text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            + "</article></body></html>"
        ).encode()
        url = f"https://{host}/page/{i}"
        recs.append(
            {
                "type": "request",
                "url": url,
                "date": f"2026-01-01T00:00:{i % 60:02d}Z",
                "payload": f"GET /page/{i} HTTP/1.1\r\nHost: {host}\r\n\r\n".encode(),
            }
        )
        recs.append(
            {
                "type": "response",
                "url": url,
                "date": f"2026-01-01T00:00:{i % 60:02d}Z",
                "payload": warc.http_response_bytes(html),
            }
        )
    return recs


def test_roundtrip_plain_and_gzip():
    recs = _mk_records(5, "a.example")
    for compress in (False, True):
        data = warc.warc_bytes(recs, compress=compress)
        got = list(warc.parse_warc(data))
        assert [r["type"] for r in got] == [r["type"] for r in recs]
        assert all(g["payload"] == r["payload"] for g, r in zip(got, recs))
    # gzip layout really is multi-member (one magic per record)
    gz = warc.warc_bytes(recs, compress=True)
    assert gz.count(b"\x1f\x8b\x08") >= len(recs)


def test_malformed_fail_loudly():
    with pytest.raises(ValueError):
        list(warc.parse_warc(b"NOT-A-WARC\r\n\r\n"))
    ok = warc.warc_bytes(_mk_records(1, "x.example"))
    with pytest.raises(ValueError):
        list(warc.parse_warc(ok[: len(ok) - 30]))  # truncated payload
    with pytest.raises(ValueError):
        warc.split_http_response(b"not http")


def test_read_warc_spark(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "seg-0.warc").write_bytes(warc.warc_bytes(_mk_records(7, "a.example")))
    (d / "seg-1.warc.gz").write_bytes(
        warc.warc_bytes(_mk_records(4, "b.example"), compress=True)
    )
    df = warc.read_warc(spark, str(d)).cache()
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 11  # responses only; warcinfo/request skipped
    assert df.filter("http_status = 200").count() == 11
    assert set(r["mime"] for r in rows.values()) == {"text/html"}
    # byte-exact html + timestamp parse
    r0 = rows["https://a.example/page/0"]
    assert bytes(r0["html"]).startswith(b"<html><head><title>d0")
    assert r0["warc_ts"].second == 0
    assert rows["https://b.example/page/3"]["warc_ts"].second == 3
    # one input file -> one warc_file tag per origin
    assert df.select("warc_file").distinct().count() == 2


def test_extract_text_composition(spark, tmp_path):
    d = tmp_path / "w"
    d.mkdir()
    (d / "s.warc").write_bytes(warc.warc_bytes(_mk_records(3, "c.example")))
    out = {
        r["url"]: r["text"]
        for r in warc.read_warc(spark, str(d))
        .selectExpr("url", f"{extract_text_expr('html')} AS text")
        .collect()
    }
    for i in range(3):
        assert (
            out[f"https://c.example/page/{i}"]
            == f"Doc {i} body & <tagged> text from c.example"
        )


def test_html_to_text_general_extractor(spark):
    from demeter_spark.operators import textstats

    html = (
        "<html><head><title>T</title><style>p{color:red}</style></head>"
        "<body><script type='text/js'>var x = '<p>';</script>"
        "<h1>Header</h1><p>First &amp;amp; para with &lt;tags&gt;.</p>"
        "<div>Second&nbsp;block</div><ul><li>one</li><li>two</li></ul>"
        "line<br/>break &quot;quoted&quot; &#39;q2&#39;</body></html>"
    )
    out = spark.createDataFrame(
        [("u", html.encode())], "url string, html binary"
    ).selectExpr(f"{textstats.html_to_text_expr('html')} AS text").collect()[0][0]
    lines = out.split("\n")
    assert lines[0] == "Header"
    assert lines[1] == 'First &amp; para with <tags>.'
    assert lines[2] == "Second block"
    assert lines[3] == "one" and lines[4] == "two"
    assert lines[5] == 'line' and lines[6] == 'break "quoted" \'q2\''
    # script/style/head content never leaks
    assert "color" not in out and "var x" not in out and "T" != lines[0][0]


def test_main_content_blocks(spark):
    from demeter_spark.operators import textstats

    html = (
        "<html><body>"
        "<nav><a href='/a'>Home</a> <a href='/b'>About</a>"
        " <a href='/c'>Contact us</a></nav>"
        "<article><p>This is the long main paragraph of the page with"
        " plenty of real sentence content to keep.</p>"
        "<p>Second substantial paragraph, also long enough to clear the"
        " minimum and mostly <a href='/x'>one link</a> free.</p></article>"
        "<footer><a href='/t'>Terms</a> <a href='/p'>Privacy</a></footer>"
        "</body></html>"
    ).encode()
    out = textstats.main_content_blocks(
        spark.createDataFrame([("u", html)], "url string, html binary")
    ).collect()
    texts = [r.text for r in out]
    assert any("long main paragraph" in t for t in texts)
    assert any("Second substantial paragraph" in t for t in texts)
    # nav and footer chrome dropped (short + link-dense)
    assert not any("Home" in t and "About" in t for t in texts)
    assert not any("Terms" in t for t in texts)
    for r in out:
        assert r.link_ratio <= 0.4 and r.n_chars >= 25
