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


def run_incremental_dedup(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.9,
    max_shingle_df: int = 50,
    max_band_bucket: int = 20,
    available_now: bool = True,
):
    """Streaming near-duplicate page dedup with stable representatives.

    Per micro-batch:

    1. cluster the batch's pages intra-batch with the full batch
       operator (``minhash_doc_dedup``);
    2. probe each page's MinHash bands against the *committed* band
       index (all pages seen in earlier batches), verify candidates by
       exact Jaccard over stored shingle sets, and adopt the minimum
       committed representative for the whole intra-batch cluster;
    3. emit (url, rep_url, keep) — ``keep`` only for pages that start
       a brand-new cluster — and append the batch's bands/sets/reps to
       the committed state.

    Semantics: **first-seen representative stability** — a committed
    page's rep never changes.  If one new page bridges two previously
    separate committed clusters, the new page adopts the smaller rep
    and the committed clusters stay distinct; the batch re-stitcher
    (``minhash_doc_dedup`` over the full corpus — the penelope role,
    /root/reference/include/penelope.hpp:29) reconciles bridges on its
    nightly pass.  This is the standard split between online dedup and
    offline re-clustering.

    State layout: one parquet relation per batch under ``out_dir`` —
    ``(url, rep_url, keep, band_idx, band_hash, shset)``, one row per
    band (shset duplicated per row; an Iceberg deployment normalizes
    this into bands + sets tables).  Writes use the same per-batch
    dynamic-partition-overwrite idempotence as the triples stream.
    """
    import os

    from arachne_spark.operators.dedup import (
        cap_shingle_df,
        doc_shingles,
        minhash_bands,
        minhash_doc_dedup,
    )
    from arachne_spark.operators.extract import latest_snapshot, with_text
    from arachne_spark.operators.lsh_link import jaccard_expr

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        docs = with_text(latest_snapshot(batch_df)).select("url", "text")

        sh = cap_shingle_df(
            doc_shingles(docs, id_col="url"), max_shingle_df
        )
        sets = sh.groupBy("doc_id").agg(
            F.sort_array(F.collect_set("s")).alias("shset")
        )
        bands = minhash_bands(sh)
        intra = minhash_doc_dedup(
            docs, id_col="url", text_col="text", threshold=threshold,
            max_shingle_df=max_shingle_df,
            max_band_bucket=max_band_bucket,
        ).select(
            F.col("doc_id").alias("url"),
            F.col("rep_id").alias("intra_rep"),
        )

        have_state = os.path.isdir(out_dir) and any(
            e.startswith("batch_id=") for e in os.listdir(out_dir)
        )
        if have_state:
            comm = (
                sp.read.parquet(out_dir)
                .where(F.col("batch_id") != batch_id)
            )
            cand = (
                bands.join(
                    comm.select(
                        "band_idx", "band_hash",
                        F.col("rep_url").alias("c_rep"),
                        F.col("shset").alias("c_shset"),
                    ),
                    ["band_idx", "band_hash"],
                )
                .join(sets, "doc_id")
                .withColumn(
                    "j", F.round(jaccard_expr("shset", "c_shset"), 4)
                )
                .where(F.col("j") >= threshold)
                .groupBy(F.col("doc_id").alias("url"))
                .agg(F.min("c_rep").alias("comm_rep"))
            )
            # the whole intra cluster adopts its minimum committed rep
            cluster_rep = (
                intra.join(cand, "url", "left")
                .groupBy(F.col("intra_rep").alias("cluster"))
                .agg(F.min("comm_rep").alias("cluster_comm_rep"))
            )
            resolved = intra.join(
                cluster_rep,
                intra["intra_rep"] == cluster_rep["cluster"],
            ).select(
                "url",
                F.coalesce("cluster_comm_rep", "intra_rep").alias(
                    "rep_url"
                ),
            )
        else:
            resolved = intra.select(
                "url", F.col("intra_rep").alias("rep_url")
            )

        out = resolved.withColumn(
            "keep", F.col("url") == F.col("rep_url")
        )
        state_rows = (
            out.join(
                sets.select(F.col("doc_id").alias("url"), "shset"),
                "url",
                "left",
            )
            .join(
                bands.select(
                    F.col("doc_id").alias("url"), "band_idx",
                    "band_hash",
                ),
                "url",
                "left",
            )
        )
        prev = sp.conf.get("spark.sql.sources.partitionOverwriteMode")
        sp.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        try:
            (
                state_rows.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(out_dir)
            )
        finally:
            sp.conf.set(
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
