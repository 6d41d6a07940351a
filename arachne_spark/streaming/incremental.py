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


def _try_read_parquet(spark: SparkSession, path: str) -> DataFrame | None:
    """Read ``path`` or return None if it does not exist / holds no
    readable parquet yet.  This is the FS-agnostic committed-state
    probe: driver-local ``os.path`` checks silently return False on
    HDFS/S3 (the advertised deployment), which would skip the
    cross-batch anti-join with no error."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(path)
        df.schema  # force resolution now, not at first action
        return df
    except AnalysisException:
        return None


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) — shared with the Warehouse layer."""
    from arachne_spark.plans.storage import hadoop_fs

    return hadoop_fs(spark, path)


class TwoTierState:
    """Compacted two-tier parquet state relation shared by the
    streaming operators: per-batch read cost stays bounded regardless
    of stream history.

    * ``<state_dir>/base`` — the compacted relation, rewritten as
      ``n_files`` files at every compaction;
    * ``<state_dir>/delta`` — per-batch ``batch_id=<n>`` partitions of
      the same schema, written with dynamic partition overwrite
      (idempotent under foreachBatch's at-least-once retries).

    Every ``compact_every`` delta partitions, base ∪ deltas is
    rewritten into a fresh base (full-row ``dropDuplicates`` absorbs
    retry-duplicated rows) and the delta dir is cleared, so each batch
    reads at most ``n_files`` base files plus ``compact_every`` delta
    partitions.  ``read_committed`` also applies ``dropDuplicates``:
    a crash between the base swap and the delta clear leaves the
    merged rows present in BOTH tiers until the next compaction, and
    the read-side dedup (cheap on the bounded state relation) makes
    that window invisible to every consumer.  All file ops go through
    the Hadoop FileSystem API so the layout works on HDFS/S3 exactly
    as on local disk; an Iceberg deployment replaces the swap with a
    MERGE / rewrite_data_files maintenance action.
    """

    def __init__(
        self,
        state_dir: str,
        compact_every: int = 4,
        n_files: int = 8,
    ):
        self.base_dir = state_dir + "/base"
        self.delta_dir = state_dir + "/delta"
        self.compact_every = compact_every
        self.n_files = n_files

    def recover_base(self, sp: SparkSession) -> None:
        """Crash recovery for the compaction swap: the swap is
        rename(base→old); rename(tmp→base).  A crash between the two
        leaves base missing and the data in old — and since the delta
        dir is only cleared AFTER a completed swap, restoring old
        reconstructs exactly the committed state (old ∪ deltas =
        the merged tmp)."""
        from arachne_spark.plans.storage import checked_rename

        fs, bpath = _hadoop_fs(sp, self.base_dir)
        jvm = sp._jvm
        old = jvm.org.apache.hadoop.fs.Path(self.base_dir + ".__old")
        if not fs.exists(bpath) and fs.exists(old):
            checked_rename(fs, old, bpath)

    def _read_all(self, sp: SparkSession) -> DataFrame | None:
        parts = [
            d
            for d in (
                _try_read_parquet(sp, self.base_dir),
                _try_read_parquet(sp, self.delta_dir),
            )
            if d is not None
        ]
        if not parts:
            return None
        comm = parts[0]
        for p in parts[1:]:
            comm = comm.unionByName(p)
        return comm

    def read_committed(
        self, sp: SparkSession, batch_id: int
    ) -> DataFrame | None:
        """Base ∪ deltas, minus THIS batch's partition (on an
        at-least-once retry its partial rows exist and must not
        pollute the probe), full-row deduplicated (see class doc)."""
        self.recover_base(sp)
        comm = self._read_all(sp)
        if comm is None:
            return None
        return comm.where(
            F.col("batch_id") != batch_id
        ).dropDuplicates()

    def exists(self, sp: SparkSession) -> bool:
        """True if either tier (or a recoverable base) is present."""
        fs, bpath = _hadoop_fs(sp, self.base_dir)
        jvm = sp._jvm
        mk = jvm.org.apache.hadoop.fs.Path
        return bool(
            fs.exists(bpath)
            or fs.exists(mk(self.delta_dir))
            or fs.exists(mk(self.base_dir + ".__old"))
        )

    def seed_base(self, df: DataFrame) -> None:
        """One-time bootstrap: write ``df`` as the compacted base
        (atomic tmp-write + checked rename, so a crash mid-seed never
        leaves a partial base that would silently shrink the probe).
        Caller ensures the state does not already exist."""
        from arachne_spark.plans.storage import checked_rename

        sp = df.sparkSession
        fs, bpath = _hadoop_fs(sp, self.base_dir)
        jvm = sp._jvm
        tmp = jvm.org.apache.hadoop.fs.Path(self.base_dir + ".__tmp")
        fs.delete(tmp, True)
        (
            df.repartition(self.n_files)
            .write.mode("overwrite")
            .parquet(self.base_dir + ".__tmp")
        )
        checked_rename(fs, tmp, bpath)

    def write_delta(self, df: DataFrame, batch_id: int) -> None:
        """Append ``df`` as the batch's ``batch_id=<n>`` delta
        partition (dynamic partition overwrite: a retried batch
        replaces its own partial files)."""
        sp = df.sparkSession
        prev = sp.conf.get("spark.sql.sources.partitionOverwriteMode")
        sp.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        try:
            (
                df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(self.delta_dir)
            )
        finally:
            sp.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )

    def compact(self, sp: SparkSession) -> None:
        self.recover_base(sp)
        fs, dpath = _hadoop_fs(sp, self.delta_dir)
        if not fs.exists(dpath):
            return
        n_deltas = sum(
            1
            for st in fs.listStatus(dpath)
            if st.getPath().getName().startswith("batch_id=")
        )
        if n_deltas < self.compact_every:
            return
        merged = self._read_all(sp)
        # full-row dedup: absorbs rows double-committed when a retry
        # interleaves with a compaction swap
        from arachne_spark.plans.storage import checked_rename

        merged = merged.dropDuplicates().repartition(self.n_files)
        jvm = sp._jvm
        tmp = jvm.org.apache.hadoop.fs.Path(self.base_dir + ".__tmp")
        old = jvm.org.apache.hadoop.fs.Path(self.base_dir + ".__old")
        bpath = jvm.org.apache.hadoop.fs.Path(self.base_dir)
        fs.delete(tmp, True)
        merged.write.mode("overwrite").parquet(self.base_dir + ".__tmp")
        fs.delete(old, True)
        if fs.exists(bpath):
            checked_rename(fs, bpath, old)
        # a failed swap raises HERE, before the backup and delta dirs
        # are cleared — the batch fails, foreachBatch retries it, and
        # recover_base restores the old base; silent state loss is the
        # one unacceptable outcome
        checked_rename(fs, tmp, bpath)
        fs.delete(old, True)
        fs.delete(dpath, True)


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
    max_shingle_df: int | None = None,
    max_band_bucket: int = 20,
    available_now: bool = True,
    state_dir: str | None = None,
    compact_every: int = 4,
    n_state_files: int = 8,
):
    """Streaming near-duplicate page dedup with stable representatives.

    Per micro-batch:

    1. cluster the batch's pages intra-batch with the full batch
       operator (``minhash_doc_dedup``);
    2. probe each page's MinHash bands against the *committed* band
       index (all pages seen in earlier batches), verify candidates by
       exact Jaccard over stored shingle sets, and adopt the minimum
       committed representative for the whole intra-batch cluster;
    3. emit (url, rep_url, keep, batch_id) to ``out_dir`` — ``keep``
       only for pages that start a brand-new cluster — and append the
       batch's bands/sets/reps to the committed state.

    Semantics: **first-seen representative stability** — a committed
    page's rep never changes.  If one new page bridges two previously
    separate committed clusters, the new page adopts the smaller rep
    and the committed clusters stay distinct; the batch re-stitcher
    (``minhash_doc_dedup`` over the full corpus — the penelope role,
    /root/reference/include/penelope.hpp:29) reconciles bridges on its
    nightly pass.  This is the standard split between online dedup and
    offline re-clustering.

    ``max_shingle_df`` defaults to **None** (no df-cap) here, unlike
    the batch operator: the cap is computed over whatever shares the
    micro-batch, so a capped signature is NOT a pure function of the
    document — the same page would hash differently depending on batch
    composition, and a mirror arriving in a boilerplate-heavy batch
    would fail to collide with its committed original.  Quadratic
    blow-up through hot bands is still bounded by ``max_band_bucket``,
    and precision by the exact-Jaccard verify; the nightly batch
    re-stitcher applies the globally-consistent df-cap.

    State layout (``state_dir``, default ``out_dir + "_state"``): a
    **compacted two-tier band index** so per-batch probe cost does NOT
    grow with the number of batches streamed:

    * ``state_dir/base`` — the compacted index
      ``(url, rep_url, band_idx, band_hash, shset, batch_id)``,
      rewritten as ``n_state_files`` files at every compaction;
    * ``state_dir/delta`` — per-batch ``batch_id=<n>`` appendixes of
      the same schema, written with dynamic partition overwrite
      (idempotent under foreachBatch's at-least-once retries).

    Every ``compact_every`` delta partitions, base ∪ deltas is
    rewritten into a fresh base (full-row dropDuplicates absorbs
    retry-duplicated rows) and the delta dir is cleared, so each batch
    reads at most ``n_state_files`` base files plus ``compact_every``
    delta partitions — bounded file count regardless of stream
    history.  (An Iceberg deployment replaces the swap with a MERGE /
    rewrite_data_files maintenance action; all file ops here go
    through the Hadoop FileSystem API so the layout works on HDFS/S3
    exactly as on local disk.)
    """
    from arachne_spark.operators.dedup import (
        cap_shingle_df,
        doc_shingles,
        minhash_bands,
        minhash_doc_dedup,
    )
    from arachne_spark.operators.extract import latest_snapshot, with_text
    from arachne_spark.operators.lsh_link import jaccard_expr

    sdir = state_dir if state_dir is not None else out_dir + "_state"
    state = TwoTierState(
        sdir, compact_every=compact_every, n_files=n_state_files
    )

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

        comm = state.read_committed(sp, batch_id)
        if comm is not None:
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
            out.select("url", "rep_url")
            .join(
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
                out.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(out_dir)
            )
        finally:
            sp.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )
        state.write_delta(state_rows, batch_id)
        state.compact(sp)

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
    state_dir: str | None = None,
    compact_every: int = 4,
    n_state_files: int = 8,
    scrub_pii: bool = False,
    c4_rules: bool = False,
    gopher_filter: bool = False,
    gopher_min_words: int = 50,
    classifier: tuple[dict[int, float], float, float] | None = None,
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
      anti-join against the committed (subj, pred, obj) set drops
      them before the write, so the output table stays a set across
      the whole stream.  The anti-join's right side is NOT the full
      output table (re-reading every ``batch_id=*`` partition would
      make per-batch cost O(stream history)): it is a **compacted
      probe index** (``TwoTierState`` at ``state_dir``, default
      ``out_dir + "_state"``) holding exactly the committed triple
      keys — per-batch reads stay bounded by ``n_state_files`` base
      files + ``compact_every`` delta partitions regardless of how
      long the stream has run.  An Iceberg sink expresses the same
      upsert natively as MERGE; the probe index is the parquet-
      fallback statement of it.

    **Curation gates** (``scrub_pii`` / ``c4_rules`` /
    ``gopher_filter`` / ``classifier=(weights, bias, min_prob)``): the
    per-row hygiene passes of the batch pipeline
    (pipeline._curate_pages), applied per micro-batch in the same
    order.  Only these four are offered on the stream — each is a pure
    function of row CONTENT (the CLAUDE.md streaming invariant), so
    batch boundaries cannot change any row's fate and streaming output
    equals the gated batch answer (test-pinned).  The CROSS-CORPUS
    passes (canonical-URL dedup, span dedup, boilerplate strip) stay
    batch-only by design: their output depends on the whole corpus, so
    a streaming variant would encode batch boundaries into results.
    """
    from arachne_spark.operators.extract import latest_snapshot, with_text
    from arachne_spark.operators.mentions import (
        detect_mentions,
        extract_relations,
        mention_triples,
    )

    state = TwoTierState(
        state_dir if state_dir is not None else out_dir + "_state",
        compact_every=compact_every,
        n_files=n_state_files,
    )
    # Migration / divergence bootstrap: a stream whose output was
    # committed before the probe index existed (or whose state dir was
    # lost) must NOT silently run with an empty probe — that would
    # re-admit every already-committed triple and break the
    # output-is-a-set contract.  Seed the base once from the committed
    # output's own rows; from then on the probe stays bounded.
    if not state.exists(spark):
        committed = _try_read_parquet(spark, out_dir)
        if committed is not None:
            # Sentinel batch_id, NOT the historical values: if the
            # checkpoint is also lost, batch ids restart at 0 and
            # read_committed's `batch_id != current` filter would
            # wrongly exclude seeded rows whose recycled id matches —
            # re-admitting committed triples.  -1 never collides with
            # a real (non-negative) micro-batch id.
            state.seed_base(
                committed.select(
                    "subj",
                    "pred",
                    "obj",
                    F.lit(-1)
                    .cast(committed.schema["batch_id"].dataType)
                    .alias("batch_id"),
                )
            )

    def curate(pages: DataFrame) -> DataFrame:
        out = pages
        if scrub_pii:
            from arachne_spark.operators.scrub import scrub_expr

            out = out.withColumn("text", scrub_expr(F.col("text")))
        if c4_rules:
            from arachne_spark.operators.quality import c4_clean

            out = c4_clean(out, id_col="url", text_col="text")
        if gopher_filter:
            from arachne_spark.operators.quality import (
                gopher_quality_filter,
            )

            out = gopher_quality_filter(
                out, id_col="url", text_col="text",
                min_words=gopher_min_words,
            )
        if classifier is not None:
            from arachne_spark.operators.classify import (
                quality_classifier_filter,
            )

            w, bias, min_prob = classifier
            out = quality_classifier_filter(
                out, w, bias, min_prob, id_col="url", text_col="text"
            )
        return out

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        clean = curate(
            with_text(
                latest_snapshot(batch_df).where(F.col("lang") == "en")
            )
        )
        m = detect_mentions(clean, alias_df)
        triples = mention_triples(m).unionByName(
            extract_relations(m, predicate_df)
            .select("subj", "pred", "obj")
            .dropDuplicates()
        )
        # read_committed excludes THIS batch's delta partition: on an
        # at-least-once retry its partial rows exist, and anti-joining
        # against them before overwriting the same partition would
        # drop the partially-written triples.
        committed = state.read_committed(sp, batch_id)
        if committed is not None:
            triples = triples.join(
                committed.select("subj", "pred", "obj"),
                ["subj", "pred", "obj"],
                "left_anti",
            )
        # two consumers (output partition + probe-index delta): persist
        # so the extraction core runs once per batch, not twice
        triples = triples.persist()
        prev = sp.conf.get("spark.sql.sources.partitionOverwriteMode")
        sp.conf.set(
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
            sp.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )
        state.write_delta(
            triples.select("subj", "pred", "obj"), batch_id
        )
        triples.unpersist()
        state.compact(sp)

    writer = (
        stream_pages(spark, src_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
