"""URL canonicalization table-driven cases, eTLD+1 approximation,
and the skew-safe domain cap vs a single-window differential."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from arachne_spark.operators.urls import (
    domain_cap,
    with_canonical,
    with_domain,
)

CANON_CASES = [
    # (input, expected canonical)
    ("http://Example.COM/Path", "http://example.com/Path"),
    ("https://www.example.com:443/a/", "https://example.com/a"),
    ("http://example.com:80/", "http://example.com/"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("https://example.com/a?utm_source=x&b=2&a=1#frag",
     "https://example.com/a?a=1&b=2"),
    ("https://example.com/a?utm_source=x&gclid=1",
     "https://example.com/a"),
    ("HTTPS://example.com", "https://example.com/"),
    ("http://example.com/a//", "http://example.com/a"),
    ("not a url", None),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CANON_CASES)],
        "i long, url string",
    )
    got = {
        r["i"]: r["canonical_url"]
        for r in with_canonical(df).collect()
    }
    for i, (u, want) in enumerate(CANON_CASES):
        assert got[i] == want, (u, got[i], want)


def test_canonical_folds_recrawl_spellings(spark):
    spellings = [
        "http://Example.com/a?b=2&a=1",
        "http://www.example.com/a/?a=1&b=2",
        "http://example.com:80/a?a=1&b=2&utm_campaign=z",
    ]
    df = spark.createDataFrame([(s,) for s in spellings], "url string")
    assert (
        with_canonical(df).select("canonical_url").distinct().count() == 1
    )


DOMAIN_CASES = [
    ("https://news.bbc.co.uk/x", "bbc.co.uk"),
    ("https://a.b.example.com/", "example.com"),
    ("https://example.com/", "example.com"),
    ("https://localhost/", "localhost"),
    ("https://sub.shop.com.au/", "shop.com.au"),
]


def test_registrable_domain(spark):
    df = spark.createDataFrame(DOMAIN_CASES, "url string, want string")
    bad = with_domain(df).where(
        F.col("domain") != F.col("want")
    ).count()
    assert bad == 0


def _corpus(spark):
    """3 domains: one hot (500 rows), two small."""
    rows = [(f"d{i}", "hot.com" if i < 500 else
             ("a.com" if i % 2 == 0 else "b.org"), i % 97)
            for i in range(560)]
    return spark.createDataFrame(
        rows, "doc_id string, domain string, score long"
    )


def test_domain_cap_matches_single_window(spark):
    df = _corpus(spark)
    order = [F.col("score").cast("long")]
    got = domain_cap(df, "domain", 7, "doc_id", order_by=order)
    # single-window reference with the same total order
    from arachne_spark.operators.sampling import hash_unit

    full_order = order + [hash_unit(F.col("doc_id"), "domain_cap"),
                          F.col("doc_id")]
    w = Window.partitionBy("domain").orderBy(*full_order)
    want = (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 7)
        .drop("rn")
    )
    assert {r["doc_id"] for r in got.collect()} == {
        r["doc_id"] for r in want.collect()
    }
    counts = {
        r["domain"]: r["count"]
        for r in got.groupBy("domain").count().collect()
    }
    assert counts == {"hot.com": 7, "a.com": 7, "b.org": 7}


def test_domain_cap_deterministic_under_repartition(spark):
    df = _corpus(spark)
    a = {r["doc_id"] for r in domain_cap(df, "domain", 5, "doc_id").collect()}
    b = {
        r["doc_id"]
        for r in domain_cap(
            df.repartition(11), "domain", 5, "doc_id"
        ).collect()
    }
    assert a == b and len(a) == 15


def test_domain_cap_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        domain_cap(_corpus(spark), "domain", 0, "doc_id")


def test_canonical_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u): an incremental
    recrawl pipeline re-canonicalizes already-canonical keys, which
    must be a fixed point or URL-level dedup drifts between runs."""
    urls = [u for u, _ in CANON_CASES] + [
        f"https://Sub{i}.Example.org:443/a/b{i}/?z=1&utm_term=x&a={i}#f"
        for i in range(50)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = with_canonical(df).where(
        F.col("canonical_url").isNotNull()
    ).select(F.col("canonical_url").alias("url"))
    twice = with_canonical(once).select("url", "canonical_url")
    drift = twice.where(
        F.col("url") != F.col("canonical_url")
    ).collect()
    assert drift == [], drift


def test_domain_cap_hot_domain_at_scale(spark):
    """1e5 rows in ONE domain with k=10: the salted first phase keeps
    ≤ k per (domain, salt) — at most n_salts·k = 320 rows reach the
    exact second phase regardless of domain size — and the final
    answer is exactly the k hash-order winners, reproducibly."""
    n = 100_000
    df = spark.range(n).select(
        F.concat(F.lit("r"), F.col("id")).alias("doc_id"),
        F.lit("hot.example.com").alias("domain"),
    )
    got = domain_cap(df, "domain", 10, "doc_id")
    rows = sorted(r["doc_id"] for r in got.collect())
    assert len(rows) == 10
    again = sorted(
        r["doc_id"]
        for r in domain_cap(df.repartition(31), "domain", 10, "doc_id")
        .collect()
    )
    assert again == rows


def test_canonical_never_crashes_on_garbage(spark):
    """Seeded adversarial URL strings (control bytes, unicode, bare
    %, nested schemes, megabyte tails, empties) through the canonical
    + domain path: under ANSI mode a plain parse_url THROWS on
    malformed input, so the try_parse_url construction must yield
    NULL instead of a task crash — and canonicalization must stay
    idempotent on whatever survives."""
    import random

    from arachne_spark.operators.urls import with_canonical, with_domain

    rng = random.Random(20260818)
    frag = [
        "http://", "https://", "example.com", "%", "%%2", "%ZZ", "?",
        "??a=b", "##", " ", "\t", "\x00", "üñí¢ödé", "a" * 500,
        "[::1]", ":8080", "user:pass@", "//", "javascript:alert(1)",
        "ftp://x", ".", "..", "http://http://", "a b c",
    ]
    urls = [""]
    for _ in range(400):
        urls.append(
            "".join(rng.choice(frag) for _ in range(rng.randrange(1, 6)))
        )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = with_domain(with_canonical(df))
    rows = once.collect()  # must not raise
    assert len(rows) == len(urls)
    # idempotency on the canonical output (where one was produced)
    again = with_canonical(
        once.where(F.col("canonical_url").isNotNull()).select(
            F.col("canonical_url").alias("url")
        )
    )
    assert again.where(
        F.col("canonical_url") != F.col("url")
    ).count() == 0
