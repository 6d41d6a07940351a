"""WARC connector tests: roundtrip fidelity (plain, member-gzip,
whole-file gzip), malformed-record tolerance, and end-to-end pipeline
ingestion of a synthetic archive."""

from __future__ import annotations

import gzip
from datetime import datetime

from pyspark.sql import functions as F

from arachne_spark.sources.warc import read_warc, write_warc_bytes

RECORDS = [
    {
        "url": f"https://example.org/w/{i}",
        "warc_ts": datetime(2024, 1, 1, 0, 0, i),
        "html": (
            f"<html><body><p>page {i} talks about a human in the "
            f"united states</p></body></html>"
        ).encode(),
    }
    for i in range(20)
]


def _roundtrip(spark, tmp_path, blob, name):
    p = tmp_path / name
    p.write_bytes(blob)
    got = {
        (r["url"], r["warc_ts"], bytes(r["html"]))
        for r in read_warc(spark, str(p)).collect()
    }
    want = {(r["url"], r["warc_ts"], r["html"]) for r in RECORDS}
    assert got == want


def test_warc_roundtrip_plain(spark, tmp_path):
    _roundtrip(spark, tmp_path, write_warc_bytes(RECORDS), "a.warc")


def test_warc_roundtrip_member_gzip(spark, tmp_path):
    """The Common-Crawl layout: one gzip member per record."""
    _roundtrip(
        spark, tmp_path,
        write_warc_bytes(RECORDS, member_gzip=True),
        "a.warc.gz",
    )


def test_warc_roundtrip_wholefile_gzip(spark, tmp_path):
    _roundtrip(
        spark, tmp_path,
        gzip.compress(write_warc_bytes(RECORDS), mtime=0),
        "b.warc.gz",
    )


def test_warc_body_containing_warc_marker(spark, tmp_path):
    """A page whose body contains the literal WARC version marker (a
    page ABOUT warc files, a mirrored archive) must roundtrip intact —
    the reader is length-driven, not split-driven."""
    tricky = [
        {
            "url": "https://example.org/about-warc",
            "warc_ts": datetime(2024, 2, 1, 12, 0, 0),
            "html": (
                b"<html><body><pre>WARC/1.0\r\n"
                b"WARC-Type: response\r\n\r\n</pre>"
                b"a page explaining the warc format</body></html>"
            ),
        },
        *RECORDS[:2],
    ]
    p = tmp_path / "tricky.warc"
    p.write_bytes(write_warc_bytes(tricky))
    got = {
        (r["url"], bytes(r["html"])) for r in read_warc(spark, str(p)).collect()
    }
    assert got == {(r["url"], r["html"]) for r in tricky}


def test_warc_malformed_records_dropped(spark, tmp_path):
    """A corrupt record in the middle must not kill the read or eat
    its neighbors."""
    good = write_warc_bytes(RECORDS[:3])
    bad = b"WARC/1.0\r\nWARC-Type: response\r\ngarbage-without-blank-line"
    more = write_warc_bytes(RECORDS[3:6])
    p = tmp_path / "mixed.warc"
    p.write_bytes(good + bad + more)
    rows = read_warc(spark, str(p)).collect()
    assert {r["url"] for r in rows} == {
        r["url"] for r in RECORDS[:6]
    }


def test_warc_feeds_pipeline_operators(spark, tmp_path):
    """read_warc output is the canonical pages relation: the extractor
    and mention detector consume it unchanged."""
    from arachne_spark.operators.extract import latest_snapshot, with_text
    from arachne_spark.operators.mentions import detect_mentions
    from arachne_spark.sources.dictionary import alias_df

    p = tmp_path / "feed.warc.gz"
    p.write_bytes(write_warc_bytes(RECORDS, member_gzip=True))
    pages = read_warc(spark, str(p))
    clean = with_text(latest_snapshot(pages))
    assert clean.where(F.col("text").isNull()).count() == 0
    m = detect_mentions(clean, alias_df(spark))
    got = {(r["url"], r["qid"]) for r in m.collect()}
    # every page mentions "human" (Q5) and "united states" (Q30)
    assert all(
        (r["url"], "Q5") in got and (r["url"], "Q30") in got
        for r in RECORDS
    )


def test_warc_distributed_sink_roundtrip(spark, tmp_path):
    """write_warc (the distributed sink) → read_warc must round-trip
    (url, warc_ts, html) exactly, for both layouts, with a shard per
    non-empty partition, a consistent manifest, and a _SUCCESS marker."""
    import os

    from pyspark.sql import functions as F

    from arachne_spark.sources.pages import pages_df
    from arachne_spark.sources.warc import read_warc, write_warc

    pages = (
        pages_df(spark, 40, partitions=4)
        # the record format carries second precision
        .withColumn("warc_ts", F.date_trunc("second", "warc_ts"))
        .repartition(3, "url")
    )
    want = {
        (r["url"], r["warc_ts"], bytes(r["html"]))
        for r in pages.select("url", "warc_ts", "html").collect()
    }

    for member_gzip in (True, False):
        out = str(tmp_path / f"sink_{member_gzip}")
        manifest = write_warc(pages, out, member_gzip=member_gzip)
        assert os.path.exists(os.path.join(out, "_SUCCESS"))
        assert sum(m["n_records"] for m in manifest) == len(want)
        assert all(os.path.getsize(m["shard"]) > 0 for m in manifest)
        got = {
            (r["url"], r["warc_ts"], bytes(r["html"]))
            for r in read_warc(spark, out + "/part-*").collect()
        }
        assert got == want

    # idempotent rerun: same shards, no duplicates
    out = str(tmp_path / "sink_True")
    write_warc(pages, out, member_gzip=True)
    assert read_warc(spark, out + "/part-*").count() == len(want)

    # rerun with FEWER partitions into the same dir: the old
    # higher-numbered shards must be cleared, not ingested alongside
    # the new ones (stale-shard mixing), and a layout switch must not
    # leave the other extension's shards behind either
    narrow = pages.coalesce(1).limit(10)
    n_narrow = narrow.count()
    write_warc(narrow, out, member_gzip=False)
    shards = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(shards) == 1 and shards[0].endswith(".warc")
    assert read_warc(spark, out + "/part-*").count() == n_narrow


def test_warc_metrics_audit(spark, tmp_path):
    """read_warc_metrics: per-file record / response / dropped counts
    agree with what read_warc actually yields."""
    from arachne_spark.sources.warc import read_warc_metrics

    good = write_warc_bytes(RECORDS[:4])
    req_http = b"GET / HTTP/1.1\r\n\r\n"
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        + b"Content-Length: " + str(len(req_http)).encode() + b"\r\n\r\n"
        + req_http + b"\r\n\r\n"
    )
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: xyz\r\n\r\nbody"
    )
    p = tmp_path / "audit.warc"
    p.write_bytes(good + req + bad)

    [m] = read_warc_metrics(spark, str(p)).collect()
    assert m["n_records"] == 6      # 4 responses + 1 request + 1 bad
    assert m["n_responses"] == 4
    assert m["n_dropped"] == 1      # the unparseable length
    assert read_warc(spark, str(p)).count() == m["n_responses"]


def _wet_record(url: str, ts: datetime, text: bytes) -> bytes:
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {ts.isoformat()}Z\r\n".encode()
        + f"Content-Length: {len(text)}\r\n".encode()
        + b"\r\n" + text + b"\r\n\r\n"
    )


def test_wet_reader(spark, tmp_path):
    """WET conversion records land as text (html NULL); a mixed
    archive splits cleanly — read_warc sees only responses, read_wet
    only conversions; invalid UTF-8 is replaced, not fatal."""
    import gzip as _gzip

    from arachne_spark.sources.warc import read_wet

    ts = datetime(2024, 3, 1, 12, 0, 0)
    wet = b"".join(
        _wet_record(
            f"https://example.org/t/{i}", ts,
            f"extracted text {i} with ünïcode".encode(),
        )
        for i in range(5)
    )
    # an invalid-UTF-8 conversion record and a response record mixed in
    wet += _wet_record("https://example.org/bad", ts, b"broken \xff byte")
    wet += write_warc_bytes(
        [{"url": "https://example.org/resp", "warc_ts": ts,
          "html": b"<html>resp</html>"}]
    )
    p = tmp_path / "mix.warc"
    p.write_bytes(wet)
    (tmp_path / "mix.warc.gz").write_bytes(_gzip.compress(wet))

    for name in ("mix.warc", "mix.warc.gz"):
        rows = {
            r["url"]: r
            for r in read_wet(spark, str(tmp_path / name)).collect()
        }
        assert len(rows) == 6                      # conversions only
        assert "https://example.org/resp" not in rows
        r0 = rows["https://example.org/t/0"]
        assert r0["text"] == "extracted text 0 with ünïcode"
        assert r0["html"] is None and r0["warc_ts"] == ts
        assert "�" in rows["https://example.org/bad"]["text"]

    # and the crawl reader still sees ONLY the response record
    warc_rows = read_warc(spark, str(p)).collect()
    assert [r["url"] for r in warc_rows] == ["https://example.org/resp"]
    assert bytes(warc_rows[0]["html"]) == b"<html>resp</html>"
