"""BPE tokenizer training/encoding: independent pure-Python twin
(re.sub-based merge application — algorithmically distinct from the
product's array fold / priority scan), tie-breaks, overlap runs,
min_count stop, reversibility, NULL rows, partition-invariance, and
the no-row-Python plan contract."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from arachne_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
    collect_merges,
)

# classic Sennrich-style corpus: shared stems force multi-char merges
DOCS = {
    1: "low low low low low lower lower newest newest",
    2: "newest newest newest newest widest widest widest",
    3: "low lower lowest newer newest wide wider widest",
    4: "the newest low and the widest low",
    5: "",  # empty text
}


def _sub_merge(sym_str: str, left: str, right: str) -> str:
    """Sennrich's mechanism: non-overlapping left-to-right re.sub on
    the space-joined symbol string."""
    pat = re.compile(
        r"(?<!\S)" + re.escape(left + " " + right) + r"(?!\S)"
    )
    return pat.sub(left + right, sym_str)


def py_bpe_train(texts, n_merges, min_count=2):
    """Twin trainer: dict counting + re.sub application."""
    wc = Counter(
        w for t in texts for w in (t or "").split(" ") if w
    )
    vocab = {
        " ".join(list(w[:-1]) + [w[-1] + EOW]): c for w, c in wc.items()
    }
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for sym_str, c in vocab.items():
            syms = sym_str.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((rank, left, right, left + right, cnt))
        vocab = {
            _sub_merge(s, left, right): c for s, c in vocab.items()
        }
    return merges


def py_bpe_encode(text, merges):
    """Twin encoder: apply the full merge list in rank order (full
    application per rank is equivalent to the product's
    lowest-rank-first priority scan — a later merge can never create
    an adjacency of two earlier-vintage tokens)."""
    toks = []
    for w in (text or "").split(" "):
        if not w:
            continue
        s = " ".join(list(w[:-1]) + [w[-1] + EOW])
        for _, left, right, _, _ in merges:
            s = _sub_merge(s, left, right)
        toks.extend(s.split(" "))
    return toks


def _docs_df(spark, docs=DOCS):
    rows = [(i, t) for i, t in docs.items()] + [(99, None)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _merge_rows(df):
    return [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in df.orderBy("rank").collect()
    ]


def test_bpe_train_matches_twin(spark):
    # n_merges > _CHECKPOINT_EVERY so the lineage-truncation branch
    # runs too
    docs = _docs_df(spark)
    got = _merge_rows(bpe_train(docs, n_merges=20))
    want = py_bpe_train(DOCS.values(), n_merges=20)
    assert got == want
    assert len(got) > 0
    # EOW merges exist (word-final subwords learned)
    assert any(EOW in m[3] for m in got)


def test_bpe_tie_break_lexicographic(spark):
    # "b c" and "a d" both occur exactly twice and nothing else
    # repeats: the (count DESC, left ASC, right ASC) order must pick
    # ("a", "d") first
    docs = {1: "bc bc ad ad"}
    df = spark.createDataFrame(
        list(docs.items()), "doc_id bigint, text string"
    )
    got = _merge_rows(bpe_train(df, n_merges=2))
    want = py_bpe_train(docs.values(), n_merges=2)
    assert got == want
    assert (got[0][1], got[0][2]) == ("a", "d" + EOW)


def test_bpe_overlap_runs(spark):
    # runs of a repeated symbol: greedy left-to-right pairing
    docs = {1: "aaaa aaaa aaa aaaaa", 2: "aaaa aa a"}
    df = spark.createDataFrame(
        list(docs.items()), "doc_id bigint, text string"
    )
    for n in (1, 2, 3, 6):
        got = _merge_rows(bpe_train(df, n_merges=n))
        want = py_bpe_train(docs.values(), n_merges=n)
        assert got == want, n
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(df, bpe_train(df, n_merges=6)).collect()
    }
    want_enc = {
        i: py_bpe_encode(t, py_bpe_train(docs.values(), 6))
        for i, t in docs.items()
    }
    assert enc == want_enc


def test_bpe_min_count_stop(spark):
    docs = _docs_df(spark)
    merges = bpe_train(docs, n_merges=50, min_count=4)
    rows = _merge_rows(merges)
    assert rows == py_bpe_train(DOCS.values(), 50, min_count=4)
    assert 0 < len(rows) < 50
    assert all(m[4] >= 4 for m in rows)


def test_bpe_encode_matches_twin_and_reversible(spark):
    docs = _docs_df(spark)
    merges = bpe_train(docs, n_merges=15)
    merge_rows = _merge_rows(merges)
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(docs, merges).collect()
    }
    # twin equality
    for i, t in DOCS.items():
        assert enc[i] == py_bpe_encode(t, merge_rows), i
    # reversibility: concat(tokens) with EOW -> space == word stream
    for i, t in DOCS.items():
        rebuilt = "".join(enc[i]).replace(EOW, " ").rstrip(" ")
        assert rebuilt == " ".join(w for w in t.split(" ") if w), i
    # NULL and empty docs preserved with empty arrays
    assert enc[5] == [] and enc[99] == []
    # unseen characters pass through as char-level symbols
    nov = spark.createDataFrame(
        [(7, "zq"), (8, "low")], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(nov, merges).collect()
    }
    assert got[7] == ["z", "q" + EOW]
    # merge list also accepted as plain pairs
    pairs = collect_merges(merges)
    got2 = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(nov, pairs).collect()
    }
    assert got2 == got


def test_bpe_determinism_across_partitionings(spark):
    docs = _docs_df(spark)
    m1 = _merge_rows(bpe_train(docs.repartition(1), n_merges=12))
    m7 = _merge_rows(bpe_train(docs.repartition(7), n_merges=12))
    assert m1 == m7  # EXACT equality
    e1 = sorted(
        (r["doc_id"], tuple(r["bpe_tokens"]))
        for r in bpe_encode(
            docs.repartition(1), [(m[1], m[2]) for m in m1]
        ).collect()
    )
    e7 = sorted(
        (r["doc_id"], tuple(r["bpe_tokens"]))
        for r in bpe_encode(
            docs.repartition(7, "text"), [(m[1], m[2]) for m in m7]
        ).collect()
    )
    assert e1 == e7


def test_bpe_plans_stay_arrow_side(spark):
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from explain_audit import plan_of

    docs = _docs_df(spark)
    plan = plan_of(bpe_encode(docs, [("l", "o"), ("lo", "w" + EOW)]))
    # vocabulary encode is Arrow-batched; never row-at-a-time Python
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "MapInPandas" in plan
    # training's per-round pair count is pure JVM (no Python at all)
    words = docs.select(
        F.explode(F.split(F.coalesce("text", F.lit("")), " ", -1)).alias(
            "word"
        )
    )
    assert "EvalPython" not in plan_of(words)
