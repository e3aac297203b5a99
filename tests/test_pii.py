"""PII detection/redaction (operators/pii.py).

Semantics pinned here: disjoint per-kind counts (earlier kinds' matches
masked before later kinds count), redaction order (email before IPv4 so
dotted-quad email domains never leak an <IP> token), and the map-only
plan shape (no Exchange — the scrub must not shuffle a 100 TB corpus).
"""

from __future__ import annotations

from exness_data_preprocess_spark.operators.pii import (
    pii_features,
    pii_report,
    redact_pii,
)


def _df(spark, *texts):
    return spark.createDataFrame(
        [(i, t, "web") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )


def test_pii_features_counts_each_kind(spark):
    df = _df(
        spark,
        "mail bob.smith+x@corp.example.org now",
        "server at 10.0.255.7 down",
        "ssn 123-45-6789 on file",
        "call 555-123-4567 or 555.123.4567",
        "w1 w2 w3 plain words 123 1.5",
    )
    rows = {r["doc_id"]: r for r in pii_features(df).collect()}
    assert (rows[0]["n_email"], rows[0]["n_pii"]) == (1, 1)
    assert (rows[1]["n_ipv4"], rows[1]["n_pii"]) == (1, 1)
    assert (rows[2]["n_ssn"], rows[2]["n_pii"]) == (1, 1)
    assert (rows[3]["n_phone"], rows[3]["n_pii"]) == (2, 2)
    # plain words, bare numbers, decimals: no false positives
    assert rows[4]["n_pii"] == 0


def test_pii_counts_disjoint_email_masks_embedded_id(spark):
    # an SSN-shaped string INSIDE an email local part: the email is
    # counted/masked first, so the id is not double-counted
    rows = pii_features(
        _df(spark, "from 123-45-6789@corp.example.org today")
    ).collect()
    r = rows[0]
    assert r["n_email"] == 1
    assert r["n_ssn"] == 0
    assert r["n_pii"] == 1


def test_ip_literal_domain_redacts_as_ip(spark):
    # the email pattern requires an alphabetic TLD, so an IP-literal
    # domain is NOT an email match — the quad is scrubbed as <IP>
    rows = pii_features(_df(spark, "root@10.11.12.13 logged in")).collect()
    r = rows[0]
    assert r["n_email"] == 0
    assert r["n_ipv4"] == 1
    assert r["n_pii"] == 1


def test_redact_pii_tokens_and_order(spark):
    out = {
        r["doc_id"]: r
        for r in redact_pii(
            _df(
                spark,
                "email a@b.io ip 1.2.3.4 id 111-22-3333 tel 555-123-4567",
                "from 123-45-6789@corp.example.org today",
                "root@10.11.12.13 logged in",
            )
        ).collect()
    }
    assert (
        out[0]["text_redacted"]
        == "email <EMAIL> ip <IP> id <ID> tel <PHONE>"
    )
    assert out[0]["n_pii_redacted"] == 4
    # email-first ordering: the SSN-shaped local part is consumed by
    # <EMAIL>, not split into <ID>@domain
    assert out[1]["text_redacted"] == "from <EMAIL> today"
    assert out[1]["n_pii_redacted"] == 1
    # IP-literal domain: not an email (alphabetic TLD required); the
    # quad is still scrubbed, as <IP>
    assert out[2]["text_redacted"] == "root@<IP> logged in"
    assert out[2]["n_pii_redacted"] == 1


def test_ssn_vs_phone_disambiguation(spark):
    # 3-2-4 is <ID>, 3-3-4 is <PHONE>; neither partially matches the
    # other's shape
    out = redact_pii(
        _df(spark, "a 123-45-6789 b 123-456-7890 c")
    ).collect()[0]
    assert out["text_redacted"] == "a <ID> b <PHONE> c"
    assert out["n_pii_redacted"] == 2


def test_pii_report_rollup(spark):
    df = spark.createDataFrame(
        [
            (0, "a@b.io here", "web"),
            (1, "w1 w2", "web"),
            (2, "10.0.0.1 and 10.0.0.2", "books"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in pii_report(df).collect()}
    assert rows["web"]["n_docs"] == 2
    assert rows["web"]["docs_with_pii"] == 1
    assert rows["web"]["total_email"] == 1
    assert rows["books"]["total_ipv4"] == 2
    assert rows["books"]["total_pii"] == 2


def test_redact_plan_is_map_only(spark):
    """The scrub is a projection over the scan — any Exchange in this
    plan would shuffle the full corpus at 100 TB for a map-only op."""
    df = _df(spark, "a@b.io x")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
