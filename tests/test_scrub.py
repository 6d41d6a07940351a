"""PII redaction: table-driven positive/negative cases, idempotency,
and audit counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from arachne_spark.operators.scrub import pii_counts, scrub_pii

CASES = [
    # (input, expected after scrub)
    ("contact alice@example.com for details",
     "contact <EMAIL> for details"),
    ("bob.smith+tag@sub.domain.org wrote",
     "<EMAIL> wrote"),
    ("server at 192.168.1.100 responded",
     "server at <IP> responded"),
    ("version 1.2.3 unchanged", "version 1.2.3 unchanged"),
    ("octet 999.1.1.1 not an ip", "octet 999.1.1.1 not an ip"),
    ("call 555-123-4567 now", "call <PHONE> now"),
    ("call +44 20 7946 0958 now", "call <PHONE> now"),
    ("intl +4915112345678 ok", "intl <PHONE> ok"),
    ("id 123456789 unchanged", "id 123456789 unchanged"),
    ("year 2024-2025 range", "year 2024-2025 range"),
    ("price 1,234.56 unchanged", "price 1,234.56 unchanged"),
    ("mail a@b.co and ip 10.0.0.1 and tel (020) 7946 0958",
     "mail <EMAIL> and ip <IP> and tel <PHONE>"),
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CASES)], "i long, text string"
    )


def test_scrub_cases(spark):
    got = {
        r["i"]: r["text"] for r in scrub_pii(_df(spark)).collect()
    }
    for i, (src, want) in enumerate(CASES):
        assert got[i] == want, (src, got[i], want)


def test_scrub_idempotent(spark):
    once = scrub_pii(_df(spark))
    twice = scrub_pii(once)
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


def test_pii_counts(spark):
    row = (
        pii_counts(_df(spark))
        .agg(
            F.sum("n_email").alias("e"),
            F.sum("n_ipv4").alias("i"),
            F.sum("n_phone").alias("p"),
        )
        .collect()[0]
    )
    want_e = sum("<EMAIL>" in w for _, w in CASES)
    want_i = sum("<IP>" in w for _, w in CASES)
    want_p = sum("<PHONE>" in w for _, w in CASES)
    assert (row["e"], row["i"], row["p"]) == (want_e, want_i, want_p)


def test_scrub_plan_is_jvm_side(spark):
    s = (
        scrub_pii(_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in s
    assert "ArrowEvalPython" not in s
    assert "Exchange" not in s
