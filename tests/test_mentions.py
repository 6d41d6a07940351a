"""Adversarial-input bound for relation extraction: a spam page with
10^4 dictionary hits must not turn the mention-pair join quadratic
(10^8 pairs in one url group).  The position-bucket equi-key bounds
candidate fanout by bucket occupancy — linear in page length."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from arachne_spark.operators.mentions import extract_relations

N_MENTIONS = 10_000


def test_relation_extraction_adversarial_page(spark):
    # mentions spaced 4 tokens apart on ONE url: each subject's gap
    # window reaches exactly the next mention (gap == 3)
    rows = [
        (
            "spam", 4 * i, 1, 4 * i + 1, f"Q{i}", "t", 0,
            ["is", "a", "kind"],
        )
        for i in range(N_MENTIONS)
    ]
    mentions = spark.createDataFrame(
        rows,
        "url string, pos int, n int, end int, qid string, "
        "alias string, priority long, after array<string>",
    )
    preds = spark.createDataFrame(
        [("is a kind", "P31")], "phrase string, pred string"
    )
    t0 = time.time()
    out = extract_relations(mentions, preds)
    got = out.count()
    wall = time.time() - t0
    # every adjacent pair relates; nothing else is within the gap
    assert got == N_MENTIONS - 1
    # quadratic behavior (~10^8 pairs through one join group) takes
    # minutes; the bucket-bounded join is seconds even on a noisy host
    assert wall < 120, f"adversarial page took {wall:.0f}s"

    # spot-check exact pairs + determinism of the phrase slice
    sample = {
        (r["subj"], r["pred"], r["obj"])
        for r in out.where(F.col("subj").isin("Q0", "Q17")).collect()
    }
    assert sample == {("Q0", "P31", "Q1"), ("Q17", "P31", "Q18")}


def test_relation_extraction_bucket_key_preserves_semantics(spark):
    """Dense mentions at every position: the bucketed join must emit
    exactly the same relation set as the gap predicate alone implies
    (objects 1..MAX_GAP tokens after the subject end)."""
    rows = [
        ("p", i, 1, i + 1, f"Q{i}", "t", 0, ["x", "x", "x"])
        for i in range(50)
    ]
    mentions = spark.createDataFrame(
        rows,
        "url string, pos int, n int, end int, qid string, "
        "alias string, priority long, after array<string>",
    )
    # gap 1 -> phrase 'x'; gap 2 -> 'x x'; gap 3 -> 'x x x'
    preds = spark.createDataFrame(
        [("x", "g1"), ("x x", "g2"), ("x x x", "g3")],
        "phrase string, pred string",
    )
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in extract_relations(mentions, preds).collect()
    }
    want = set()
    for i in range(50):
        for gap, pred in ((1, "g1"), (2, "g2"), (3, "g3")):
            j = i + 1 + gap  # o_pos = end + gap = i + 1 + gap
            if j < 50:
                want.add((f"Q{i}", pred, f"Q{j}"))
    assert got == want
