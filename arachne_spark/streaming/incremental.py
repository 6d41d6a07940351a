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
  batch extraction core per micro-batch into the triples table; with
  ``availableNow`` this is the catch-up/backfill mode, with the
  default trigger it is the perpetual mode.  foreachBatch is
  at-least-once, so the write is made idempotent per batch_id
  (dynamic partition overwrite of ``batch_id=<n>``) and de-duplicated
  across batches (anti-join vs the committed table) — the streaming
  analog of the warehouse snapshot-resume in plans/storage.py.

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
    # group by the *window struct*, not window(...).start: projecting
    # .start inside the groupBy severs the event-time column from the
    # watermark, so append-mode refuses the plan and update-mode state
    # is never evicted.  Grouping on the struct keeps the linkage;
    # .start is projected after the aggregation.
    return (
        matched.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "qid")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("window.start").alias("window_start"), "qid", "cnt"
        )
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
    written to ``out_dir`` with end-to-end idempotence:

    * **per-batch**: each micro-batch writes to its own
      ``batch_id=<n>`` partition directory with dynamic partition
      overwrite, so a retried batch (foreachBatch is at-least-once —
      the checkpoint replays a batch whose write half-finished)
      replaces its own files instead of appending duplicates;
    * **cross-batch**: a url re-crawled in a later micro-batch
      re-derives triples already committed by an earlier batch; an
      anti-join against the committed table drops them before the
      write, so the output table stays a set across the whole stream.
      The anti-join's right side is the (subj, pred, obj) projection of
      the committed store — at scale this is the classic MERGE-style
      upsert an Iceberg sink expresses natively; the parquet fallback
      states it as the anti-join.
    """
    import os

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
        if os.path.isdir(out_dir) and any(
            e.startswith("batch_id=") for e in os.listdir(out_dir)
        ):
            # exclude THIS batch's partition (partition-pruned read):
            # on an at-least-once retry its partial files exist, and
            # anti-joining against them before overwriting the same
            # partition would drop the partially-written triples.
            committed = (
                batch_df.sparkSession.read.parquet(out_dir)
                .where(F.col("batch_id") != batch_id)
            )
            triples = triples.join(
                committed.select("subj", "pred", "obj"),
                ["subj", "pred", "obj"],
                "left_anti",
            )
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        try:
            (
                triples.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(out_dir)
            )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )

    writer = (
        stream_pages(spark, src_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
