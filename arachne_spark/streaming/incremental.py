"""Structured Streaming surface: the "perpetual stitcher" run mode.

The reference aspires to perpetual operation (readme.md:20-26 — Arachne
"stitches entities perpetually"; Penelope re-stitches what "slips away
overnight") but is a single-shot CLI.  Here the same batch operators
run incrementally over an unbounded page feed:

* ``stream_pages``          — file-source stream of page parquet drops
  (on a cluster: Iceberg/Kafka source, same downstream code).
* ``streaming_mention_counts`` — the touch-counter (O8,
  /root/reference/src/arachne.cpp:224-233) as a watermarked windowed
  aggregation: per (window, qid) mention counts with late-data bounds.
  The broadcast alias join and tokenization are the *same* column
  expressions as the batch path — stream/batch parity by construction.
* ``run_incremental_pipeline`` — ``foreachBatch`` driving the full
  batch extraction core per micro-batch and APPENDING to the triples
  table; with ``availableNow`` this is the catch-up/backfill mode, with
  the default trigger it is the perpetual mode.  Checkpointing makes
  it exactly-once per micro-batch (the streaming analog of the
  warehouse snapshot-resume in plans/storage.py).

Mention *dominance* (the anti-join in detect_mentions) is a
stream-to-stream self-join Structured Streaming cannot express
directly, which is exactly why the foreachBatch path reuses the batch
operator unchanged — each micro-batch is a bounded DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGE_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_pages(spark: SparkSession, src_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGE_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
    )


def streaming_mention_counts(
    pages: DataFrame,
    alias_df: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(window_start, qid, cnt) with late-data handling.

    Reuses the batch tokenizer + first-token broadcast probe; no
    dominance (see module docstring), so counts are per candidate
    match — the touch-counter semantics, which also ignores spans
    (src/arachne.cpp:224-233 counts every touch).
    """
    from arachne_spark.operators.extract import with_text
    from arachne_spark.operators.mentions import (
        resolve_alias_dict,
        tokenize,
    )

    resolved = resolve_alias_dict(alias_df)
    toks = tokenize(with_text(pages)).select(
        "url", "warc_ts", "tokens",
        F.posexplode("tokens").alias("pos", "tok"),
    )
    matched = toks.join(
        F.broadcast(resolved),
        toks["tok"] == resolved["first_tok"],
        "inner",
    ).where(
        F.expr("array_join(slice(tokens, pos + 1, n), ' ')")
        == F.col("alias")
    )
    return (
        matched.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).start.alias("window_start"),
            "qid",
        )
        .agg(F.count("*").alias("cnt"))
    )


def run_incremental_pipeline(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    alias_df: DataFrame,
    predicate_df: DataFrame,
    available_now: bool = True,
):
    """foreachBatch: full batch extraction core per micro-batch,
    appended to ``out_dir`` exactly-once via the checkpoint."""
    from arachne_spark.operators.extract import latest_snapshot, with_text
    from arachne_spark.operators.mentions import (
        detect_mentions,
        extract_relations,
        mention_triples,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        clean = with_text(
            latest_snapshot(batch_df).where(F.col("lang") == "en")
        )
        m = detect_mentions(clean, alias_df)
        triples = mention_triples(m).unionByName(
            extract_relations(m, predicate_df)
            .select("subj", "pred", "obj")
            .dropDuplicates()
        )
        triples.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    writer = (
        stream_pages(spark, src_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
