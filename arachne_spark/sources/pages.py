"""Deterministic synthetic Common-Crawl-style pages corpus.

Shape per BASELINE input_hint: (url string, warc_ts timestamp,
html binary, text string, lang string).

Generation is fully Spark-native — ``spark.range(n)`` plus column
expressions over small literal arrays — so the corpus is produced
distributed, linearly, with no shuffle and no Python row loop; the same
recipe scales from 500 rows (tests) to 10^12 (cluster) by changing n.

Determinism: every field is a pure function of the row id; no
Date.now/random.  A pure-pandas twin of this generator lives in
tests/oracle.py and must produce byte-identical rows — that twin is the
"reference fixture" for the P/R and byte-identity gates.

Corpus features exercised downstream:
* 3 fact sentences per page drawn round-robin from dictionary.FACTS
  → golden triples are computable independently of the engine;
* a filler sentence with a long-tail alias + head-entity aliases on
  ~1/2 ("human" → Q5) and ~1/5 ("united states" → Q30) of pages → skew;
* every 10th url has a *second, later snapshot* (extra paragraph)
  → latest-snapshot-per-url window dedup is load-bearing;
* ``text`` is pre-extracted on url_id % 3 == 0 rows and NULL elsewhere
  → the extractor must both fill NULLs and byte-match non-NULLs;
* lang is 'de' on url_id % 11 == 7 rows → language filter
  (mirrors languages=en, /root/reference/include/utils.hpp:95).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arachne_spark.sources.dictionary import FACTS

SENTENCES: list[str] = [f"{s} {p} {o}." for s, p, o in FACTS]
N_FILLER = 80
BASE_TS = "2024-01-01 00:00:00"
RECRAWL_EVERY = 10  # every 10th url gets a second snapshot
UPDATE_SENTENCE = "updated content about sewing."
# misspelled surface forms on every 13th page (offset 3): exercised by
# the long-tail MinHash-LSH fuzzy-link stage, never by exact lookup
MISSPELL_EVERY = 13
MISSPELL_SENTENCE = "notes regarding velazques and pheidipides."


def _sentence(idx_col):
    arr = F.array(*[F.lit(s) for s in SENTENCES])
    return F.element_at(arr, (idx_col % len(SENTENCES) + 1).cast("int"))


def _filler(uid):
    base = F.concat(
        F.lit("this page talks about entity"),
        (uid * 7 % N_FILLER).cast("string"),
    )
    base = F.when(
        uid % 2 == 0, F.concat(base, F.lit(" and a human"))
    ).otherwise(base)
    return F.when(
        uid % 5 == 0, F.concat(base, F.lit(" in the united states"))
    ).otherwise(base)


def _page_fields(df: DataFrame, snapshot: int) -> DataFrame:
    """Build (url, warc_ts, html, text, lang) from a url_id column."""
    uid = F.col("url_id")
    title = F.concat(F.lit("page "), uid.cast("string"))
    s1, s2, s3 = (_sentence(uid + j) for j in range(3))
    filler = _filler(uid)

    paragraphs = [s1, s2, s3, filler]
    # NULL when absent: concat_ws skips NULLs (text), and the html
    # wrapper coalesces to '' so concat never nulls out.
    misspell = F.when(
        uid % MISSPELL_EVERY == 3, F.lit(MISSPELL_SENTENCE)
    ).otherwise(F.lit(None).cast("string"))
    paragraphs.append(misspell)
    if snapshot > 0:
        paragraphs.append(F.lit(UPDATE_SENTENCE))

    body = F.concat(
        *[
            F.coalesce(
                F.concat(F.lit("<p>"), p, F.lit("</p>")), F.lit("")
            )
            for p in paragraphs
        ]
    )
    html_str = F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit("</title><script>var x = 1 < 2;</script></head><body><h1>"),
        title,
        F.lit("</h1>"),
        body,
        F.lit("</body></html>"),
    )
    text_full = F.concat_ws("\n", title, title, *paragraphs)

    ts = F.to_timestamp(F.lit(BASE_TS)) + F.make_dt_interval(
        F.lit(7 * snapshot), F.lit(0), F.lit(0), (uid % 86400).cast("double")
    )
    return df.select(
        F.concat(F.lit("https://example.org/p/"), uid.cast("string")).alias(
            "url"
        ),
        ts.alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.when((uid % 3 == 0) & F.lit(snapshot == 0), text_full)
        .otherwise(F.lit(None).cast("string"))
        .alias("text"),
        F.when(uid % 11 == 7, F.lit("de")).otherwise(F.lit("en")).alias(
            "lang"
        ),
    )


def pages_df(
    spark: SparkSession, n_pages: int, partitions: int | None = None
) -> DataFrame:
    """The synthetic corpus: n_pages urls + recrawl snapshots."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    base = spark.range(0, n_pages, 1, partitions).select(
        F.col("id").alias("url_id")
    )
    first = _page_fields(base, snapshot=0)
    recrawls = spark.range(
        0, n_pages // RECRAWL_EVERY, 1, max(1, partitions // 4)
    ).select((F.col("id") * RECRAWL_EVERY).alias("url_id"))
    second = _page_fields(recrawls, snapshot=1)
    return first.unionByName(second)
