"""Bigram-LM perplexity: pure-Python twin, quality ordering,
filter contract, partition-invariance."""

from __future__ import annotations

from math import exp, log

BOS = "\x02"

TRAIN = {
    1: "the cat sat on the mat",
    2: "the dog sat on the rug",
    3: "a cat and a dog sat together",
    4: "the cat and the dog ran home",
}
SCORE = {
    10: "the cat sat on the rug",          # reference-like
    11: "zx qv wq jj kk pq zz",            # gibberish (all unseen)
    12: "the the the the the the",         # degenerate repetition
    13: "",                                # empty
}


def py_lm(train, score, k=1.0):
    uni, bi = {}, {}
    for t in train.values():
        toks = [BOS] + t.split(" ")
        for a, b in zip(toks, toks[1:]):
            uni[a] = uni.get(a, 0) + 1
            bi[(a, b)] = bi.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for i, t in score.items():
        toks = [BOS] + t.split(" ")
        lps = [
            log(
                (bi.get((a, b), 0) + k)
                / (uni.get(a, 0) + k * (v + 1))
            )
            for a, b in zip(toks, toks[1:])
        ]
        m = sum(lps) / len(lps)
        out[i] = (len(lps), m, exp(-m))
    return out


def _dfs(spark):
    train = spark.createDataFrame(
        list(TRAIN.items()), "doc_id bigint, text string"
    )
    score = spark.createDataFrame(
        list(SCORE.items()), "doc_id bigint, text string"
    )
    return train, score


def test_lm_perplexity_matches_twin(spark):
    from arachne_spark.operators.lm import lm_perplexity, lm_train

    train, score = _dfs(spark)
    uni, bi = lm_train(train)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["log_prob_per_token"],
                      r["perplexity"])
        for r in lm_perplexity(score, uni, bi).collect()
    }
    want = py_lm(TRAIN, SCORE)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        assert abs(got[i][1] - want[i][1]) < 1e-9, i
        assert abs(got[i][2] - want[i][2]) < 1e-6 * want[i][2], i
    # quality ordering: the reference-like doc scores the lowest
    # perplexity of the three non-empty docs (the add-k mass makes no
    # promise about gibberish vs degenerate-repetition ordering — a
    # high-frequency CONTEXT dilutes the smoothing mass more than an
    # unseen one)
    assert got[10][2] < got[11][2]
    assert got[10][2] < got[12][2]


def test_lm_filter_and_determinism(spark):
    from arachne_spark.operators.lm import (
        lm_filter,
        lm_perplexity,
        lm_train,
    )
    from pyspark.sql import functions as F  # noqa: F401

    train, score = _dfs(spark)
    uni, bi = lm_train(train)
    ppl = {
        r["doc_id"]: r["perplexity"]
        for r in lm_perplexity(score, uni, bi).collect()
    }
    cut = (ppl[10] + ppl[11]) / 2
    kept = lm_filter(score, uni, bi, max_perplexity=cut)
    assert kept.columns == score.columns
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 10 in ids and 11 not in ids
    # bit-determinism across partitionings (decimal log-prob sums)
    uni2, bi2 = lm_train(train.repartition(7))
    a = sorted(
        map(tuple, lm_perplexity(score.repartition(5), uni2, bi2)
            .collect())
    )
    b = sorted(
        map(tuple, lm_perplexity(score.repartition(2, "text"), uni, bi)
            .collect())
    )
    assert a == b  # EXACT equality, not approx
