"""In-engine BPE tokenizer training and encoding (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units")
— the vocabulary-learning step of a training-data pipeline, restated
shuffle-native.

Scale design (the part that matters at 100 TB): the corpus is touched
exactly ONCE — the word-frequency aggregation (one partial-agg'd
shuffle; this is the same word-frequency compression every production
BPE trainer performs before its merge loop).  Every merge round then
works over the distinct-WORD relation — vocabulary-sized (~10^7-10^8
rows for a web corpus, a few GB), never corpus-sized — as pure JVM
column expressions: pair extraction is an explode + one partial-agg'd
count shuffle, the argmax is a 1-row action, and the merge application
is a per-row array fold.  No Python workers anywhere in training.
Driver state is the merge table itself — bounded by ``n_merges``
(= the vocabulary budget), the same bounded-scalar contract as
``ann.kmeans_fit``'s k×d centroids.

Encoding touches the corpus twice (pretokenize/explode + rebuild) but
runs the Python BPE scan only over DISTINCT words (Arrow-batched
pandas UDF over the vocabulary-sized relation), then joins token
arrays back by word — AQE broadcasts the encoded vocabulary while it
fits and shuffle-joins past that.

Determinism: counts are exact longs; the winning pair per round is
picked under a total order (count DESC, left ASC, right ASC); the
greedy left-to-right merge application is a per-row fold.  Merge
tables and encodings are therefore byte-identical at any parallelism
(pinned by the repartition test in tests/test_bpe.py).

Reference analog: the reference engine has no tokenizer training; this
operator extends the corpus-curation family (operators/lm.py,
operators/classify.py) that SURVEY §2's LLM-pipeline addendum calls
for.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: end-of-word marker appended to a word's final symbol (Sennrich
#: convention) so merges never cross word boundaries and a word's
#: tokenization is reversible: concat(tokens) == word + EOW.
EOW = "</w>"

# truncate the fold lineage every N merge rounds: each round nests one
# aggregate() expression over the previous round's plan, and analyzer
# time grows superlinearly past a few dozen nested HOFs
_CHECKPOINT_EVERY = 16

_MERGE_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("left", T.StringType(), False),
        T.StructField("right", T.StringType(), False),
        T.StructField("merged", T.StringType(), False),
        T.StructField("pair_count", T.LongType(), False),
    ]
)


def _words(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, wc): whitespace-word frequencies — the one corpus-sized
    pass.  NULL text counts as empty; empty words (consecutive
    spaces) are dropped."""
    return (
        docs.select(
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " ", -1)
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _initial_syms(word_col: str = "word"):
    """array<string> of code points with EOW appended to the last.
    ``split(word, '')`` yields one element per Unicode code point
    (verified against Python's ``list(str)`` incl. astral-plane
    chars), so the Spark side and the pure-Python twins agree on
    symbol boundaries."""
    cs = F.split(F.col(word_col), "")
    n = F.size(cs)
    return F.concat(
        F.slice(cs, F.lit(1), n - 1),
        F.array(F.concat(F.element_at(cs, -1), F.lit(EOW))),
    )


def _apply_merge(col, left: str, right: str):
    """Greedy left-to-right replacement of adjacent (left, right) with
    left+right in a symbol array — a fold, so each element is examined
    once and a merged token is never re-used as the left half of the
    same rule (matches re.sub's non-overlapping scan in the reference
    BPE).  Interpreted HOF, but it runs over the vocabulary-sized
    words relation, not the corpus (CLAUDE.md HOF note)."""
    return F.aggregate(
        col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Learn a BPE merge table: → (rank, left, right, merged,
    pair_count), rank 0 first.  Exact (not batched) BPE: each round
    counts all adjacent symbol pairs weighted by word frequency, picks
    the argmax under the total order (count DESC, left ASC, right
    ASC), applies it greedily, and stops early when the best pair's
    count falls below ``min_count``.

    One corpus pass (word counts); per-round cost is one explode +
    count shuffle over the words relation plus a 1-row action.  The
    returned merge table is built driver-side — bounded by
    ``n_merges`` rows (the vocabulary budget), the documented
    bounded-scalar collect contract."""
    spark = docs.sparkSession
    words = (
        _words(docs, text_col)
        .select(_initial_syms().alias("syms"), F.col("wc"))
        .persist()
    )
    words.count()
    merges: list[tuple[int, str, str, str, int]] = []
    retired = [words]
    try:
        for rank in range(int(n_merges)):
            pair = F.expr(
                "transform(sequence(0, size(syms) - 2),"
                " i -> struct(syms[i] as l, syms[i + 1] as r))"
            )
            top = (
                words.where(F.size("syms") >= 2)
                .select(F.col("wc"), F.explode(pair).alias("p"))
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("wc").alias("c"))
                .orderBy(F.col("c").desc(), F.col("l"), F.col("r"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["c"] < min_count:
                break
            left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["c"])
            merges.append((rank, left, right, left + right, cnt))
            nxt = words.select(
                _apply_merge(F.col("syms"), left, right).alias("syms"),
                F.col("wc"),
            )
            if (rank + 1) % _CHECKPOINT_EVERY == 0:
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt = nxt.persist()
                nxt.count()
            retired.append(nxt)
            words = nxt
    finally:
        for df in retired:
            df.unpersist()
    return spark.createDataFrame(merges, _MERGE_SCHEMA)


def collect_merges(merges: DataFrame) -> list[tuple[str, str]]:
    """Merge table → rank-ordered [(left, right)] on the driver.
    Bounded by the training vocabulary budget (same contract as
    collecting kmeans centroids)."""
    return [
        (r["left"], r["right"])
        for r in merges.orderBy("rank").select("left", "right").collect()
    ]


def encode_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    merge_list: Sequence[tuple[str, str]],
) -> list[str]:
    """Classic single-word BPE encode: repeatedly merge the
    lowest-rank adjacent pair (ties impossible — ranks are unique),
    each application greedy left-to-right.  Used inside the Arrow
    batch below; also the building block for driver-side spot
    checks."""
    if not word:
        return []
    syms = list(word)
    syms[-1] += EOW
    while len(syms) >= 2:
        best_rank = None
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank = rk
        if best_rank is None:
            break
        left, right = merge_list[best_rank]
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame | Sequence[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """(id_col, out_col array<string>): tokenize each document with a
    learned merge table.  The Python BPE scan runs only over DISTINCT
    words (Arrow-batched mapInPandas over the vocabulary-sized
    relation); documents then rebuild by position via an equi-join on
    the word — the corpus itself never enters a Python worker.  Rows
    with NULL/empty text are preserved with an empty token array
    (restored by an id-only join per the row-restore convention)."""
    if isinstance(merges, DataFrame):
        merge_list = collect_merges(merges)
    else:
        merge_list = [(left, right) for left, right in merges]
    ranks = {pair: i for i, pair in enumerate(merge_list)}

    toks_t = T.StructType(
        [
            T.StructField("word", T.StringType(), False),
            T.StructField("toks", T.ArrayType(T.StringType()), False),
        ]
    )

    def encode_batch(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "toks": pdf["word"].map(
                        lambda w: encode_word(w, ranks, merge_list)
                    ),
                }
            )

    exploded = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ", -1)
        ).alias("pos", "word"),
    ).where(F.col("word") != "")
    vocab = (
        exploded.select("word").distinct().mapInPandas(encode_batch, toks_t)
    )
    rebuilt = (
        exploded.join(vocab, "word")
        .groupBy(id_col)
        .agg(
            F.expr(
                "flatten(transform(array_sort(collect_list("
                "struct(pos, toks))), x -> x.toks))"
            ).alias(out_col)
        )
    )
    # id-only restore join (CLAUDE.md row-restore convention): docs
    # whose text produced no words still appear, with an empty array
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(
                F.col(out_col), F.array().cast("array<string>")
            ).alias(out_col),
        )
    )
