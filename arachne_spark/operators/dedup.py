"""Document-level near-duplicate dedup — the flagship LLM-training-data
operator: MinHash bands → candidate pairs → exact-Jaccard verify →
connected components → keep the min-id representative.

The reference has no document dedup (it ingests entity data, not web
text); this composes the engine's own primitives (minhash banding as in
q24, jaccard_expr from lsh_link, cc.connected_components) into the
end-to-end pipeline a 100 TB crawl actually needs.  Scale posture:

* **shingling** is a narrow per-doc projection (token k-grams,
  distinct) — embarrassingly parallel;
* **df-cap**: shingles appearing in more than ``max_shingle_df``
  documents are boilerplate (navigation chrome, license footers) and
  are dropped *before* any join — one hot shingle would otherwise make
  the inverted-index pair generation quadratic in its document
  frequency.  The cap costs one small aggregation over (shingle, df);
* **banding**: 8 minhashes → 2 bands; a pair collides iff some band
  matches, so candidate generation is an equi-join on
  (band_idx, band_hash) — never all-pairs;
* **bucket-cap**: a band bucket with B docs yields B^2/2 candidate
  pairs; buckets larger than ``max_band_bucket`` are near-certainly
  boilerplate clusters (every template page hashing identically) and
  are dropped — dedup of *exact* template duplicates belongs to the
  cheaper exact-hash pass (q03/q22 fingerprints), not the quadratic
  verifier;
* **verify** joins the (sorted, deterministic) shingle sets of the
  candidate pairs only — candidate-pair-scale data, corpus-scale never
  shuffles;
* **clustering** uses the large-star/small-star CC operator (O(log n)
  rounds, no star materialization), and the representative is the
  minimum doc id — total order, no ties.

MinHash scheme is md5-based and identical to q24's so a DuckDB oracle
reproduces every signature bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from arachne_spark.operators.cc import connected_components
from arachne_spark.operators.lsh_link import jaccard_expr

N_HASHES = 8
N_BANDS = 2


def doc_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """(doc_id, s): distinct token k-gram shingles per document.

    Documents with fewer than ``k`` tokens yield zero shingles (matching
    the DuckDB/python oracles).  The ``if(size >= k, ...)`` guard is
    load-bearing: ``sequence(1, n)`` is DESCENDING for n < 1 (e.g.
    ``sequence(1, 0) = [1, 0]``), which would index ``toks[]`` out of
    bounds and throw under ANSI mode.
    """
    parts = ", ".join(f"toks[i-1+{j}]" for j in range(k))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ", -1).alias("toks"),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform("
                    f" if(size(toks) >= {k},"
                    f"    sequence(1, size(toks) - {k - 1}), array()),"
                    f" i -> concat_ws(' ', {parts}))"
                )
            ).alias("s"),
        )
        .dropDuplicates()
    )


def cap_shingle_df(sh: DataFrame, max_df: int | None) -> DataFrame:
    """Drop shingles whose document frequency exceeds max_df (hot
    boilerplate shingles are the skew-killer of every posting-list
    self-join: pair fanout is quadratic in df).  ``None`` disables the
    cap — required where signatures must be a pure function of document
    content (the streaming dedup path: a batch-local df would make the
    same document hash differently depending on what it shares a
    micro-batch with)."""
    if max_df is None:
        return sh
    df = sh.groupBy("s").agg(F.count("*").alias("_df"))
    return (
        sh.join(df.where(F.col("_df") <= max_df), "s")
        .select("doc_id", "s")
    )


def ngram_jaccard_pairs(
    sh: DataFrame, threshold: float = 0.03
) -> DataFrame:
    """(da, db, jaccard): inverted-index self-join over (df-capped)
    shingles + exact Jaccard.  Callers cap df first; this function is
    the q23 surface."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("da"), "s")
    b = sh.select(F.col("doc_id").alias("db"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count("*").alias("i"))
    )
    na = sizes.select(F.col("doc_id").alias("da"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"))
    return (
        inter.join(na, "da")
        .join(nb, "db")
        .select(
            "da",
            "db",
            F.round(
                F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 4
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_bands(sh: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_hash): md5 minhash signature grouped
    into bands — the q24 scheme (8 hashes, 2 bands), oracle-exact."""
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{p}:"), F.col("s")))).alias(f"m{p}")
        for p in range(N_HASHES)
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    rows = N_HASHES // N_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.md5(
                    F.concat(*[F.col(f"m{j * rows + i}") for i in range(rows)])
                ).alias("band_hash"),
            )
            for j in range(N_BANDS)
        ]
    )
    return sig.select(
        "doc_id", F.explode(bands).alias("b")
    ).select("doc_id", "b.band_idx", "b.band_hash")


def minhash_doc_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_shingle_df: int | None = 50,
    max_band_bucket: int = 20,
) -> DataFrame:
    """(doc_id, rep_id, keep): every input document mapped to the
    minimum-id representative of its near-duplicate cluster; singleton
    docs map to themselves.  keep = (doc_id == rep_id) — filtering on
    it IS the dedup."""
    sh = cap_shingle_df(
        doc_shingles(docs, id_col, text_col), max_shingle_df
    )

    bands = minhash_bands(sh)
    bucket_sz = bands.groupBy("band_idx", "band_hash").agg(
        F.count("*").alias("_bsz")
    )
    bands = (
        bands.join(
            bucket_sz.where(F.col("_bsz") <= max_band_bucket),
            ["band_idx", "band_hash"],
        )
        .select("doc_id", "band_idx", "band_hash")
    )

    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_idx", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .dropDuplicates()
    )

    # exact verify over sorted (deterministic) shingle sets of the
    # candidate docs only
    sets = sh.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("s")).alias("shset")
    )
    ver = (
        cand.join(
            sets.select(
                F.col("doc_id").alias("da"), F.col("shset").alias("sa")
            ),
            "da",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("db"), F.col("shset").alias("sb")
            ),
            "db",
        )
        .withColumn("jaccard", F.round(jaccard_expr("sa", "sb"), 4))
        .where(F.col("jaccard") >= threshold)
        .select("da", "db")
    )

    # cluster + min-id representative.  Numeric ids are zero-padded to
    # a fixed width so string order == numeric order inside the CC
    # loop; string ids (urls) use their own lexicographic total order.
    id_type = docs.schema[id_col].dataType.simpleString()
    numeric = id_type in ("bigint", "int", "smallint", "tinyint")
    if numeric:
        enc = lambda c: F.lpad(F.col(c).cast("string"), 20, "0")  # noqa: E731
        dec = lambda c: F.col(c).cast("bigint")  # noqa: E731
    else:
        enc = lambda c: F.col(c)  # noqa: E731
        dec = lambda c: F.col(c)  # noqa: E731
    comp = connected_components(
        ver.select(enc("da").alias("src"), enc("db").alias("dst")),
        key_encode=False,
    ).select(
        dec("node").alias("doc_id"),
        dec("component").alias("rep_id"),
    )

    all_docs = docs.select(F.col(id_col).alias("doc_id"))
    return (
        all_docs.join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("rep_id", "doc_id").alias("rep_id"),
        )
        .withColumn("keep", F.col("doc_id") == F.col("rep_id"))
    )


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    k: int = 13,
    min_overlap: int = 1,
) -> DataFrame:
    """(doc_id, bench_id, n_overlap, n_shingles, overlap_frac):
    training-corpus decontamination — corpus documents sharing at
    least ``min_overlap`` token ``k``-gram shingles with a benchmark
    item (the published GPT-3/PaLM-style decontamination used 13-gram
    overlap, hence the default).

    Scale posture: the benchmark side is bounded by construction
    (eval suites are tiny next to a crawl), so the probe is a plain
    equi-join of corpus shingles against a benchmark-sized relation —
    AQE broadcasts it while it fits; the corpus never self-joins and
    corpus-scale data never shuffles beyond its own shingle
    projection.  Composes ``doc_shingles`` (ANSI-safe short-doc
    guard) on both sides.

    The corpus shingle projection feeds two consumers (the hits join
    and the per-doc size aggregate), so it is persisted — one corpus
    scan per sweep, not two; the cache entry is evictable storage and
    is released with the session (or by the caller unpersisting
    after its action)."""
    ds = doc_shingles(docs, id_col, text_col, k).persist()
    bs = doc_shingles(
        benchmark.select(
            F.col(bench_id_col).alias("doc_id"),
            F.col(bench_text_col).alias("text"),
        ),
        "doc_id",
        "text",
        k,
    ).select(F.col("doc_id").alias("bench_id"), "s")
    sizes = ds.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        ds.join(bs, "s")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_overlap"))
        .where(F.col("n_overlap") >= min_overlap)
    )
    return hits.join(sizes, "doc_id").select(
        "doc_id",
        "bench_id",
        "n_overlap",
        "n_shingles",
        F.round(F.col("n_overlap") / F.col("n_shingles"), 4).alias(
            "overlap_frac"
        ),
    )


def exact_substring_dedup(
    docs: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicated-substring removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    token span of ``k``+ tokens whose exact text occurs more than once
    corpus-wide is removed from ALL occurrences except the globally
    first — min (doc_id, position), a total order — and the surviving
    tokens are reassembled in place.  Complements minhash_doc_dedup
    (whole-document near-dups) by cutting copied PASSAGES out of
    otherwise-distinct documents; rows are preserved (a fully-copied
    doc comes back with empty text — filtering is the caller's call).

    The reference tool builds a corpus-wide suffix array on one giant
    machine; this is the shuffle-native restatement:

    * rolling ``k``-token shingles per doc as one per-row transform
      (pos is the 0-based start token) — a duplicated span of L >= k
      tokens is exactly a run of duplicated shingles, so span-level
      dedup reduces to shingle-hash equality;
    * shingles keyed by md5 of the gram text (128 bits: at 10^12
      shingles a 64-bit key would already collide by birthday bound);
    * per-hash count + min-occurrence in ONE partial-aggregatable pass
      (count and struct-min both combine map-side — boilerplate-hot
      hashes never funnel one reducer);
    * non-first occurrences merge into maximal covered intervals via
      gaps-and-islands (doc-partitioned window over marked starts:
      coverage [pos, pos+k-1] chains while successive starts are <= k
      apart), so the covered-index explode is proportional to the
      covered TEXT length, not (span length x k);
    * only touched documents are re-tokenized and reassembled — clean
      documents (the vast majority) pass through untouched, and the
      reassembly sorts (idx, token) structs so no per-group ordering
      assumption is made (same discipline as strip_boilerplate).

    Tokenization is single-space split/join, which is lossless
    (consecutive spaces round-trip as empty tokens), so untouched text
    is byte-identical and surviving spans keep their exact bytes.

    Batch-only by design: "first occurrence corpus-wide" is a global
    property, so a streaming variant would make every doc's output
    depend on batch boundaries — the exact batch-local-aggregate trap
    the streaming dedup path avoids (see streaming/incremental.py and
    the CLAUDE.md invariant).  Streams dedup near-duplicates
    incrementally; span-level cutting runs on the committed corpus.
    """
    other = [c for c in docs.columns if c != text_col]
    toks = docs.select(
        *other, F.split(F.col(text_col), " ", -1).alias("__toks")
    )
    occ = toks.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.expr(
                f"transform("
                f" if(size(__toks) >= {k},"
                f"    sequence(1, size(__toks) - {k - 1}), array()),"
                f" i -> md5(concat_ws(' ', slice(__toks, i, {k}))))"
            )
        ).alias("pos", "h"),
    )
    dup = (
        occ.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min(F.struct("__id", "pos")).alias("m"),
        )
        .where(F.col("c") > 1)
        .select("h", "m")
    )
    marked = (
        occ.join(dup, "h")
        .where(
            ~(
                (F.col("__id") == F.col("m.__id"))
                & (F.col("pos") == F.col("m.pos"))
            )
        )
        .select("__id", "pos")
        .distinct()
    )
    w = Window.partitionBy("__id").orderBy("pos")
    islands = (
        marked.withColumn("__prev", F.lag("pos").over(w))
        .withColumn(
            "__new",
            F.when(
                F.col("__prev").isNull()
                | (F.col("pos") - F.col("__prev") > k),
                1,
            ).otherwise(0),
        )
        .withColumn("__isl", F.sum("__new").over(w))
    )
    covered = (
        islands.groupBy("__id", "__isl")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + k - 1).alias("e"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.explode(F.sequence("s", "e")).alias("__idx"),
        )
    )
    touched_ids = covered.select(id_col).distinct()
    untouched = docs.join(touched_ids, id_col, "left_anti")
    tokens = (
        toks.join(touched_ids, id_col, "left_semi")
        .select(*other, F.posexplode("__toks").alias("__idx", "__tok"))
    )
    kept = tokens.join(covered, [id_col, "__idx"], "left_anti")
    rebuilt = kept.groupBy(*other).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__idx", "__tok"))),
                lambda s: s["__tok"],
            ),
            " ",
        ).alias(text_col)
    )
    # fully-covered docs lose every token and drop out of the groupBy;
    # restore them with empty text so the operator is row-preserving.
    # The anti-joins key on id_col ONLY: keying on every passthrough
    # column would silently duplicate any doc with a NULL column (NULL
    # join keys never match, so anti-join keeps the row)
    empties = (
        docs.select(*other)
        .join(untouched.select(id_col), id_col, "left_anti")
        .join(rebuilt.select(id_col), id_col, "left_anti")
        .withColumn(text_col, F.lit(""))
    )
    return (
        rebuilt.unionByName(empties)
        .unionByName(untouched.select(*rebuilt.columns))
        .select(*docs.columns)
    )
