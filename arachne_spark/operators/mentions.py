"""Mention detection + relation extraction — the entity-linking core.

Spark-first design (no Python in this path at all):

1. tokenize: ``regexp_extract_all`` keeps words and sentence-final '.'
   as separate tokens, so n-grams and relation gaps never cross a
   sentence boundary (a '.' token can't match any alias or phrase).
2. n-grams of length 1..MAX_ALIAS_TOKENS are built with array
   expressions (``transform`` + ``slice``) and ``posexplode`` — narrow,
   JVM-side, no shuffle.
3. alias match = **broadcast hash join** against the alias dictionary —
   the Spark restatement of the reference's batched ``wbgetentities``
   dictionary lookup (/root/reference/src/pheidippides.cpp:29-82): the
   per-50 HTTP chunking becomes Arrow/codegen batching for free.
4. ambiguous aliases resolve by deterministic minimum priority
   (numeric QID part) — replacing the reference's nondeterministic
   hash-order merge (src/pheidippides.cpp:79).
5. longest-match dominance: a mention strictly contained in a longer
   one on the same page is dropped (left_anti self-join on url — the
   only shuffle, and it moves *mentions* (~10/page), not token data).
6. relation extraction: each mention carries the next
   MAX_GAP_TOKENS tokens (``after``), so a mention-pair self-join on
   url + a broadcast join of the gap phrase against the predicate
   dictionary emits (subj, pred, obj) — no join back to page text.

At 10^12 pages everything before step 5 is embarrassingly parallel;
steps 5-6 shuffle only the mention relation, co-partitioned on url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arachne_spark.sources.dictionary import MAX_ALIAS_TOKENS

MAX_GAP_TOKENS = 3
TOKEN_PATTERN = r"[a-z0-9]+|\."


def tokenize(pages: DataFrame, text_col: str = "text") -> DataFrame:
    return pages.withColumn(
        "tokens",
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0
        ),
    )


def _ngram_structs(n: int):
    """array<struct<pos,ngram,after>> of all n-grams of `tokens`.

    pos is 0-based token index; `after` carries the MAX_GAP_TOKENS
    tokens following the n-gram (gap context for relation extraction).
    """
    # the CASE guard matters: sequence(0, -1) is a DESCENDING sequence
    # in Spark, which would feed slice() a 0 start and blow up on
    # short token arrays.
    return F.expr(
        f"""
        CASE WHEN size(tokens) >= {n} THEN
          transform(
            sequence(0, size(tokens) - {n}),
            i -> struct(
              i                                            AS pos,
              array_join(slice(tokens, i + 1, {n}), ' ')   AS ngram,
              slice(tokens, i + 1 + {n}, {MAX_GAP_TOKENS}) AS after
            )
          )
        ELSE array() END
        """
    )


def detect_mentions(
    pages: DataFrame, alias_df: DataFrame, id_col: str = "url"
) -> DataFrame:
    """(url, pos, n, end, qid, alias, priority, after) mention rows.

    `id_col` is the document identity column; it is carried through as
    `url` in the output regardless of its input name.
    """
    if id_col != "url":
        pages = pages.withColumnRenamed(id_col, "url")
    with_tokens = tokenize(pages)
    grams = None
    for n in range(1, MAX_ALIAS_TOKENS + 1):
        g = with_tokens.select(
            "url", F.explode(_ngram_structs(n)).alias("g")
        ).select(
            "url",
            F.col("g.pos").alias("pos"),
            F.lit(n).alias("n"),
            (F.col("g.pos") + n).alias("end"),
            F.col("g.ngram").alias("ngram"),
            F.col("g.after").alias("after"),
        )
        grams = g if grams is None else grams.unionByName(g)

    matched = grams.join(
        F.broadcast(alias_df), grams["ngram"] == alias_df["alias"], "inner"
    ).select("url", "pos", "n", "end", "qid", "alias", "priority", "after")

    # deterministic QID-priority resolution for ambiguous aliases
    span = F.struct("qid", "alias", "priority", "after")
    best = (
        matched.groupBy("url", "pos", "n", "end")
        .agg(F.min_by(span, F.struct("priority", "qid")).alias("m"))
        .select("url", "pos", "n", "end", "m.qid", "m.alias", "m.priority",
                "m.after")
    )

    # longest-match dominance: drop mentions strictly inside a longer one
    longer = best.select(
        F.col("url").alias("d_url"),
        F.col("pos").alias("d_pos"),
        F.col("end").alias("d_end"),
        F.col("n").alias("d_n"),
    )
    return best.join(
        longer,
        (F.col("url") == F.col("d_url"))
        & (F.col("d_pos") <= F.col("pos"))
        & (F.col("d_end") >= F.col("end"))
        & (F.col("d_n") > F.col("n")),
        "left_anti",
    )


def extract_relations(
    mentions: DataFrame, predicate_df: DataFrame
) -> DataFrame:
    """(url, subj, pred, obj) from mention pairs with a dictionary gap."""
    m1 = mentions.select(
        F.col("url"),
        F.col("end").alias("s_end"),
        F.col("qid").alias("subj"),
        F.col("after").alias("s_after"),
    )
    m2 = mentions.select(
        F.col("url").alias("o_url"),
        F.col("pos").alias("o_pos"),
        F.col("qid").alias("obj"),
    )
    gap = F.col("o_pos") - F.col("s_end")
    pairs = m1.join(
        m2,
        (F.col("url") == F.col("o_url"))
        & (gap >= 1)
        & (gap <= MAX_GAP_TOKENS),
        "inner",
    ).select(
        "url",
        "subj",
        "obj",
        # greatest(gap, 0): whole-stage codegen can evaluate this
        # projection fused with the join consume before the range
        # condition has filtered a row (observed on Spark 4 ANSI mode —
        # slice() throws on negative length); clamping keeps the
        # expression total, and a clamped row never matches a predicate
        # phrase anyway.
        F.array_join(
            F.slice(F.col("s_after"), F.lit(1), F.greatest(gap, F.lit(0))),
            " ",
        ).alias("phrase"),
    )
    return pairs.join(F.broadcast(predicate_df), "phrase", "inner").select(
        "url", "subj", "pred", "obj"
    )


def mention_triples(mentions: DataFrame) -> DataFrame:
    """(subj=url, pred='mentions', obj=qid), deduplicated."""
    return mentions.select(
        F.col("url").alias("subj"),
        F.lit("mentions").alias("pred"),
        F.col("qid").alias("obj"),
    ).dropDuplicates(["subj", "obj"])
