"""N-gram language-model perplexity scoring — the CCNet-style
unsupervised quality signal that pairs with the supervised classifier
in operators/classify.py: train token bigram/unigram counts on a
reference corpus (one aggregation pass), then score any corpus by
add-k-smoothed bigram log-probability per token; low perplexity ≈
reference-like text, degenerate or non-linguistic pages score high.

CCNet trains a 5-gram KenLM offline; this is the shuffle-native
restatement at bigram order — the model is a pair of count RELATIONS,
not a driver-side artifact, so a web-scale vocabulary never has to fit
anywhere: scoring joins the document bigrams against the count tables
on their natural keys (AQE broadcasts them while they fit and
shuffle-joins past that).

Determinism: counts are exact longs; per-row probability math is IEEE
double; the per-doc mean log-prob accumulates as decimal(38,18)
(order-independent) — byte-identical perplexities at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ACC = "decimal(38,18)"

# sentence-boundary token: every doc is scored as <s> tok1 ... tokN,
# so the first real token conditions on a start symbol rather than
# being skipped (and 1-token docs still produce one bigram)
BOS = "\x02"


def _doc_bigrams(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, w1, w2) for <s>-prefixed space tokens, one row per
    bigram occurrence."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.concat(
            F.array(F.lit(BOS)), F.split(F.col(text_col), " ", -1)
        ).alias("toks"),
    ).select(
        "doc_id",
        F.posexplode(F.expr("slice(toks, 1, size(toks) - 1)")).alias(
            "pos", "w1"
        ),
        F.col("toks"),
    ).select(
        "doc_id", "w1", F.expr("toks[pos + 1]").alias("w2")
    )


def lm_train(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """→ (unigram_counts (w1, c1), bigram_counts (w1, w2, c12)) over
    the reference corpus.  Pure partial-aggregatable counts — one
    shuffle each, exact, deterministic.  The unigram relation counts
    CONTEXT occurrences (so c1 = Σ_w2 c12 and the smoothed
    probabilities normalize exactly), including the BOS context."""
    bg = _doc_bigrams(docs, id_col, text_col)
    bigrams = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    unigrams = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    return unigrams, bigrams


def lm_perplexity(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    k: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bigrams, log_prob_per_token, perplexity): add-k
    smoothed bigram log-probability, p(w2 | w1) = (c12 + k) /
    (c1 + k·(V + 1)), with V = trained unigram vocabulary size (the
    +1 reserves mass for unseen words).  Unseen contexts fall back to
    c1 = 0 — pure smoothing mass.  Every doc scores (empty docs score
    the single <s>→'' bigram), and the per-doc mean log-prob is an
    exact decimal sum, so output is partition-invariant."""
    v = unigrams.count()  # bounded scalar: vocabulary size
    bg = _doc_bigrams(docs, id_col, text_col)
    joined = (
        bg.join(bigrams, ["w1", "w2"], "left")
        .join(unigrams, "w1", "left")
        .select(
            "doc_id",
            (
                F.log(
                    (F.coalesce(F.col("c12"), F.lit(0)).cast("double")
                     + F.lit(float(k)))
                    / (F.coalesce(F.col("c1"), F.lit(0)).cast("double")
                       + F.lit(float(k) * (v + 1)))
                )
            ).alias("lp"),
        )
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.col("lp").cast(_ACC)).alias("lsum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (F.col("lsum").cast("double") / F.col("n_bigrams")).alias(
                "log_prob_per_token"
            ),
        )
        .withColumn(
            "perplexity", F.exp(-F.col("log_prob_per_token"))
        )
    )


def lm_filter(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    max_perplexity: float,
    k: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep docs at or below ``max_perplexity`` under the trained LM
    (the CCNet head/middle cut); returns input columns unchanged."""
    ok = lm_perplexity(
        docs, unigrams, bigrams, k, id_col, text_col
    ).where(F.col("perplexity") <= max_perplexity).select(
        F.col("doc_id").alias("__lmid")
    )
    return docs.join(
        ok, docs[id_col] == ok["__lmid"], "left_semi"
    ).select(*docs.columns)
