"""Model-based quality classifier: feature twin, separable training,
bit-determinism across partitionings, filter contract."""

from __future__ import annotations

from pyspark.sql import functions as F


GOOD = [
    "the committee reviewed the annual report in detail",
    "researchers published a peer reviewed study on climate",
    "the library catalog lists thousands of historical documents",
    "engineers completed the bridge inspection ahead of schedule",
    "the museum opened a new exhibition about ancient pottery",
    "students presented their findings at the science fair",
    "the council approved funding for public transportation",
    "journalists documented the election process thoroughly",
    "the orchestra performed a symphony by a local composer",
    "volunteers restored the wetland habitat over two years",
]
SPAM = [
    "buy cheap pills now best price buy now",
    "click here win money fast click here now",
    "free casino bonus deposit now win big jackpot",
    "cheap watches replica buy discount offer now",
    "hot singles in your area click now free",
    "lose weight fast miracle pill order today",
    "earn cash from home no experience click",
    "limited offer buy one get ten free now",
    "unlock iphone cheap instant download click here",
    "best loans instant approval no credit check now",
]


def _corpus(spark):
    rows = [(i, t, 1.0) for i, t in enumerate(GOOD)]
    rows += [(100 + i, t, 0.0) for i, t in enumerate(SPAM)]
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id bigint, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in rows], "doc_id bigint, y double"
    )
    return docs, labels


def test_hashed_features_match_twin(spark):
    from arachne_spark.operators.classify import hashed_ngram_features

    docs, _ = _corpus(spark)
    nf = 1 << 12
    got = {
        (r["doc_id"], r["feat"]): r["x"]
        for r in hashed_ngram_features(docs, n_features=nf).collect()
    }
    # twin: recompute the expected grams + L1 weights; hashes are
    # checked structurally (x sums to 1, counts match gram counts)
    for i, text in enumerate(GOOD):
        toks = text.split(" ")
        n_grams = len(toks) + max(0, len(toks) - 1)
        xs = [v for (d, _), v in got.items() if d == i]
        assert abs(sum(xs) - 1.0) < 1e-12
        assert all(abs(x * n_grams - round(x * n_grams)) < 1e-9
                   for x in xs)


def test_lr_train_separates_and_generalizes(spark):
    from arachne_spark.operators.classify import lr_train, quality_score
    from arachne_spark.operators.classify import hashed_ngram_features

    docs, labels = _corpus(spark)
    nf = 1 << 12
    feats = hashed_ngram_features(docs, n_features=nf)
    w, b = lr_train(feats, labels, n_iters=25, lr=4.0)
    scores = {
        r["doc_id"]: r["prob"]
        for r in quality_score(docs, w, b, n_features=nf).collect()
    }
    for i in range(len(GOOD)):
        assert scores[i] > 0.5, (i, scores[i])
    for i in range(len(SPAM)):
        assert scores[100 + i] < 0.5, (i, scores[100 + i])
    # held-out docs built from the learned vocabularies
    held = spark.createDataFrame(
        [(0, "the committee published a study on transportation"),
         (1, "buy cheap jackpot pills click now free offer"),
         (2, "xy")],  # too short for features: falls back to bias
        "doc_id bigint, text string",
    )
    hs = {
        r["doc_id"]: r
        for r in quality_score(held, w, b, n_features=nf).collect()
    }
    assert hs[0]["prob"] > 0.5
    assert hs[1]["prob"] < 0.5
    assert abs(hs[2]["margin"]) < 1e9  # present, finite


def test_lr_train_bit_deterministic(spark):
    from arachne_spark.operators.classify import (
        hashed_ngram_features,
        lr_train,
    )

    docs, labels = _corpus(spark)
    nf = 1 << 12
    w1, b1 = lr_train(
        hashed_ngram_features(docs.repartition(7), n_features=nf),
        labels, n_iters=6,
    )
    w2, b2 = lr_train(
        hashed_ngram_features(
            docs.repartition(3, "text"), n_features=nf
        ),
        labels.repartition(5), n_iters=6,
    )
    assert b1 == b2          # EXACT float equality
    assert w1 == w2


def test_quality_classifier_filter(spark):
    from arachne_spark.operators.classify import (
        hashed_ngram_features,
        lr_train,
        quality_classifier_filter,
    )

    docs, labels = _corpus(spark)
    nf = 1 << 12
    feats = hashed_ngram_features(docs, n_features=nf)
    w, b = lr_train(feats, labels, n_iters=25, lr=4.0)
    kept = quality_classifier_filter(docs, w, b, n_features=nf)
    assert kept.columns == docs.columns
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == set(range(len(GOOD)))


def test_weights_warehouse_roundtrip(spark, tmp_path):
    """The production loop: train → persist weights as a warehouse
    table → reload in a 'later job' → identical scores (weights are
    plain (feat, w) rows, so model persistence is ordinary table I/O,
    no serialization format to invent)."""
    from arachne_spark.operators.classify import (
        hashed_ngram_features,
        lr_train,
        quality_score,
    )
    from arachne_spark.plans.storage import Warehouse

    docs, labels = _corpus(spark)
    nf = 1 << 12
    w, b = lr_train(
        hashed_ngram_features(docs, n_features=nf), labels, n_iters=8
    )
    wh = Warehouse(spark, str(tmp_path / "model_wh"))
    wh.write(
        spark.createDataFrame(sorted(w.items()), "feat bigint, w double"),
        "quality_weights",
    )
    wh.write(
        spark.createDataFrame([(b,)], "bias double"), "quality_bias"
    )
    w2 = {
        r["feat"]: r["w"] for r in wh.read("quality_weights").collect()
    }
    b2 = wh.read("quality_bias").collect()[0]["bias"]
    assert w2 == w and b2 == b
    a = sorted(
        map(tuple, quality_score(docs, w, b, n_features=nf).collect())
    )
    c = sorted(
        map(tuple, quality_score(docs, w2, b2, n_features=nf).collect())
    )
    assert a == c
