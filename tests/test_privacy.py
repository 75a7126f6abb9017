"""PII scrub: per-class counts equal the replacements made, scrubbing is
idempotent, and the whole operator stays JVM-side (no Python eval in the
plan)."""

from __future__ import annotations

from tabbyld_spark.operators.privacy import pii_profile, scrub_text


def _docs(spark):
    rows = [
        (0, "write bob.smith+spam@mail-host.co.uk today"),
        (1, "server 192.168.0.17 then call +1-555-0042 ok"),
        (2, "two mails a@b.io c.d@e.org and 10.0.0.1 10.0.0.2"),
        (3, "nothing sensitive here at all"),
        (4, "edge: 999.1.2.3 and +44 123 4567 trailing"),
        (5, None),  # NULL text → zero counts, scrubbed ''
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_counts_and_tokens(spark):
    out = {r["doc_id"]: r for r in pii_profile(_docs(spark)).collect()}
    assert (out[0]["n_emails"], out[0]["n_ips"], out[0]["n_phones"]) == (1, 0, 0)
    assert "<EMAIL>" in out[0]["scrubbed"] and "@" not in out[0]["scrubbed"]
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (0, 1, 1)
    assert out[1]["scrubbed"] == "server <IP> then call <PHONE> ok"
    assert (out[2]["n_emails"], out[2]["n_ips"]) == (2, 2)
    assert (out[3]["n_emails"], out[3]["n_ips"], out[3]["n_phones"]) == (0, 0, 0)
    assert out[3]["scrubbed"] == "nothing sensitive here at all"
    # the deliberately loose IPv4 shape (no 0-255 octet check) and the
    # separator-flexible phone shape both hit row 4 — a recall-over-
    # precision contract stated in the module docstring
    assert out[4]["n_ips"] == 1 and out[4]["n_phones"] == 1
    assert (out[5]["n_emails"], out[5]["n_ips"], out[5]["n_phones"]) == (0, 0, 0)
    assert out[5]["scrubbed"] == ""


def test_idempotent(spark):
    once = _docs(spark).select("doc_id", scrub_text("text").alias("text"))
    again = pii_profile(once).collect()
    for r in again:
        assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (0, 0, 0)
    scrub2 = {r["doc_id"]: r["scrubbed"] for r in again}
    first = {r["doc_id"]: r["text"] for r in once.collect()}
    assert scrub2 == first


def test_plan_stays_jvm_side(spark):
    plan = pii_profile(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # projection only — zero shuffle
