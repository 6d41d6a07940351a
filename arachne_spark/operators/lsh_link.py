"""MinHash-LSH blocking + exact-Jaccard scoring for long-tail fuzzy
entity linking.

The reference links mentions to entities only by exact alias lookup
(the batched ``wbgetentities`` dictionary fetch,
/root/reference/src/pheidippides.cpp:29-82).  The north_star requires a
long-tail path: surface forms that miss the exact dictionary (typos,
variant spellings) still get candidate QIDs.  A brute-force
surface × alias similarity join is quadratic; MinHash-LSH blocking makes
it linear in (surfaces + aliases + true near-pairs):

  1. char k-shingles of each string (k=3) — ``transform``/``substring``
     array expressions, JVM-side;
  2. MinHash signature = per-seed minimum of md5(seed || shingle) —
     md5 (not xxhash64) so a DuckDB oracle can reproduce the exact
     signatures;
  3. signatures grouped into bands; band hash = md5 of the concatenated
     row of the signature;
  4. candidate pairs = equi-join on (band_idx, band_hash) — with the
     dictionary side broadcast this is a map-side join, zero shuffle of
     the (huge) surface side;
  5. exact Jaccard over the full shingle sets rescores candidates;
     pairs under ``threshold`` are dropped (LSH only *blocks*, the score
     decides).

At 10^12 documents the surface side stays partition-local end-to-end:
shingling, signatures and band hashes are narrow projections, and the
band join broadcasts the dictionary.  Only the final best-candidate
aggregation shuffles, and it moves candidate *pairs* (≈ a few per rare
surface), never token or shingle data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K_SHINGLE = 3
N_HASHES = 8
N_BANDS = 2


def shingle_expr(col: str, k: int = K_SHINGLE):
    """Distinct char k-grams of a string column; whole string if short."""
    return F.expr(
        f"""
        CASE WHEN length({col}) >= {k} THEN
          array_distinct(transform(
            sequence(1, length({col}) - {k} + 1),
            i -> substring({col}, i, {k})))
        ELSE array({col}) END
        """
    )


def _with_signature(
    df: DataFrame,
    text_col: str,
    prefix: str,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """Add `{prefix}sh` (shingle set) and `{prefix}bands`
    (array<struct<band_idx, band_hash>>)."""
    df = df.withColumn(f"{prefix}sh", shingle_expr(text_col))
    mins = [
        F.expr(
            f"array_min(transform({prefix}sh,"
            f" s -> md5(concat('{p}:', s))))"
        ).alias(f"{prefix}m{p}")
        for p in range(n_hashes)
    ]
    df = df.select("*", *mins)
    rows = n_hashes // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.md5(
                    F.concat(
                        *[
                            F.col(f"{prefix}m{j * rows + i}")
                            for i in range(rows)
                        ]
                    )
                ).alias("band_hash"),
            )
            for j in range(n_bands)
        ]
    )
    return df.withColumn(f"{prefix}bands", bands).drop(
        *[f"{prefix}m{p}" for p in range(n_hashes)]
    )


def jaccard_expr(a_col: str, b_col: str):
    """|A∩B| / (|A| + |B| - |A∩B|) over distinct-element arrays."""
    inter = F.size(F.array_intersect(F.col(a_col), F.col(b_col)))
    return inter / (
        F.size(F.col(a_col)) + F.size(F.col(b_col)) - inter
    )


MAX_BAND_DF = 1000


def lsh_candidates(
    surfaces: DataFrame,
    dictionary: DataFrame,
    surface_col: str = "surface",
    alias_col: str = "alias",
    threshold: float = 0.4,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    max_band_df: int | None = MAX_BAND_DF,
) -> DataFrame:
    """(surface, qid, jaccard): all dictionary candidates sharing >= 1
    LSH band with the surface form, rescored by exact char-shingle
    Jaccard and filtered to >= threshold.

    `dictionary` must carry (alias, qid); extra columns are dropped.

    ``max_band_df`` caps the dictionary-side frequency of a band hash:
    a band shared by B dictionary entries fans every matching surface
    out into B candidate rows, so one degenerate hot band (aliases that
    are all near-identical boilerplate strings) makes the blocking
    quadratic.  Bands above the cap are dropped *dictionary-side* (a
    tiny aggregation — the dictionary is vocabulary-sized); true
    near-pairs in a dropped band almost always share their other
    band(s).  The default is far above any real alias dictionary's band
    skew; the cap exists so a pathological input degrades recall, not
    the cluster.
    """
    s = _with_signature(
        surfaces.select(F.col(surface_col).alias("surface")).distinct(),
        "surface", "q_", n_hashes, n_bands,
    ).select(
        "surface", "q_sh", F.explode("q_bands").alias("qb")
    )
    d = _with_signature(
        dictionary.select(alias_col, "qid"),
        alias_col, "d_", n_hashes, n_bands,
    ).select(
        F.col(alias_col).alias("_alias"), "qid", "d_sh",
        F.explode("d_bands").alias("db"),
    )
    if max_band_df is not None:
        band_df = d.groupBy("db").agg(F.count("*").alias("_bdf"))
        d = (
            d.join(band_df.where(F.col("_bdf") <= max_band_df), "db")
            .select("_alias", "qid", "d_sh", "db")
        )
    pairs = (
        s.join(
            F.broadcast(d),
            (s["qb.band_idx"] == d["db.band_idx"])
            & (s["qb.band_hash"] == d["db.band_hash"]),
            "inner",
        )
        # a pair can collide in several bands — keep one copy
        .dropDuplicates(["surface", "_alias", "qid"])
        .withColumn("jaccard", F.round(jaccard_expr("q_sh", "d_sh"), 4))
        .where(F.col("jaccard") >= threshold)
    )
    return pairs.select("surface", "qid", "jaccard")


def fuzzy_link_best(
    surfaces: DataFrame,
    dictionary: DataFrame,
    surface_col: str = "surface",
    alias_col: str = "alias",
    threshold: float = 0.4,
) -> DataFrame:
    """(surface, qid, jaccard): single best candidate per surface by
    (jaccard desc, priority asc, qid asc) — the deterministic
    QID-priority rule of SURVEY.md §4.3 applied to fuzzy links.

    `dictionary` must carry (alias, qid, priority).
    """
    # min-priority per qid: order-independent by construction (a
    # dropDuplicates here would keep a partition-order-dependent row if
    # a future dictionary carried per-alias priorities — violating the
    # hard determinism invariant)
    cands = lsh_candidates(
        surfaces, dictionary, surface_col, alias_col, threshold
    ).join(
        F.broadcast(
            dictionary.groupBy("qid").agg(
                F.min("priority").alias("priority")
            )
        ),
        "qid",
    )
    pick = F.struct("qid", "jaccard")
    order = F.struct(
        (-F.col("jaccard")).alias("neg_j"), F.col("priority"), F.col("qid")
    )
    return (
        cands.groupBy("surface")
        .agg(F.min_by(pick, order).alias("b"))
        .select("surface", "b.qid", "b.jaccard")
    )


def fuzzy_mentions(
    pages,
    mentions,
    alias_df,
    min_len: int = 6,
    threshold: float = 0.5,
):
    """(url, surface, qid, jaccard): long-tail mention rows for surface
    forms that missed the exact dictionary, resolved to item entities
    via LSH blocking + best-candidate scoring.

    The linking runs once per distinct SURFACE (vocabulary-sized, tiny
    next to the corpus), then broadcast-joins back onto the
    (url, surface) occurrences — at 10^12 pages the per-page data never
    enters the similarity computation.
    """
    from arachne_spark.operators.mentions import unmatched_tokens

    um = unmatched_tokens(pages, mentions, min_len=min_len)
    best = fuzzy_link_best(
        um.select("surface").distinct(),
        alias_df.where(F.col("kind") == "item"),
        threshold=threshold,
    )
    # NOT a forced broadcast: on a real web corpus distinct tokens are
    # ~1e8+, past the 8 GB broadcast ceiling.  With AQE on (the
    # pipeline default) Spark broadcasts `best` automatically while it
    # fits and falls back to a shuffled join when it doesn't.
    return um.join(best, "surface").select(
        "url", "surface", "qid", "jaccard"
    )
