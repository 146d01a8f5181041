"""pii_stats — detection counts, redaction, cross-engine regex parity."""

from __future__ import annotations

import hashlib

import pandas as pd

from demeter_spark.operators import textstats


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


_FIXTURE = pd.DataFrame(
    {
        "doc_id": [0, 1, 2, 3],
        "text": [
            "contact bob.smith+spam@mail.example.org or alice@ex.co today",
            "server at 10.0.255.7 and backup at 192.168.1.200 port 80",
            "call +1 (555) 867-5309 for help",
            "clean text with no identifiers at all",
        ],
    }
)


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(_FIXTURE)
    out = {r["doc_id"]: r.asDict() for r in textstats.pii_stats(df).collect()}
    assert out[0]["n_email"] == 2 and out[0]["pii_free"] == 0
    assert out[1]["n_ipv4"] == 2 and out[1]["n_email"] == 0
    assert out[2]["n_phone"] == 1
    assert out[3]["pii_free"] == 1
    assert out[0]["redacted_fp"] == _md5("contact <EMAIL> or <EMAIL> today")
    assert out[1]["redacted_fp"] == _md5(
        "server at <IP> and backup at <IP> port 80"
    )
    assert out[2]["redacted_fp"] == _md5("call <PHONE> for help")
    # clean text: fingerprint unchanged from the raw text
    assert out[3]["redacted_fp"] == _md5(_FIXTURE["text"][3])


def test_pii_duckdb_regex_parity(spark, ddb):
    """The exact patterns used by pii_stats produce identical matches and
    redactions in DuckDB (the dialect-portability contract: no
    backslashes, classes and bounded quantifiers only)."""
    df = spark.createDataFrame(_FIXTURE)
    got = (
        textstats.pii_stats(df)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ddb.register("pii_docs", _FIXTURE)
    email = textstats.PII_PATTERNS["email"]
    ipv4 = textstats.PII_PATTERNS["ipv4"]
    phone = textstats.PII_PATTERNS["phone"]
    want = ddb.sql(
        f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{email}')) AS n_email,
               len(regexp_extract_all(text, '{ipv4}')) AS n_ipv4,
               len(regexp_extract_all(text, '{phone}')) AS n_phone,
               md5(regexp_replace(regexp_replace(regexp_replace(text,
                   '{email}', '<EMAIL>', 'g'),
                   '{ipv4}', '<IP>', 'g'),
                   '{phone}', '<PHONE>', 'g')) AS redacted_fp
        FROM pii_docs ORDER BY doc_id
        """
    ).df()
    assert (got["n_email"] == want["n_email"]).all()
    assert (got["n_ipv4"] == want["n_ipv4"]).all()
    assert (got["n_phone"] == want["n_phone"]).all()
    assert (got["redacted_fp"] == want["redacted_fp"]).all()


def test_pii_map_only_plan(spark):
    df = spark.createDataFrame(_FIXTURE)
    plan = (
        textstats.pii_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
