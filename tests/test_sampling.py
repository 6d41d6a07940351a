"""Deterministic sampling/split invariants: stability under
repartitioning and appends, totality/disjointness of splits,
proportion accuracy, salt independence, and a shuffle-free plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arachne_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
)

N = 20_000


def _df(spark, n=N, parts=4):
    return spark.range(0, n, 1, parts).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("key"), "id"
    )


def test_sample_stable_under_repartition_and_append(spark):
    base = _df(spark)
    s1 = {r["key"] for r in deterministic_sample(base, "key", 0.1).collect()}
    s2 = {
        r["key"]
        for r in deterministic_sample(
            base.repartition(13), "key", 0.1
        ).collect()
    }
    assert s1 == s2
    # appending new rows never moves an existing key in or out
    grown = _df(spark, n=2 * N)
    s3 = {
        r["key"]
        for r in deterministic_sample(grown, "key", 0.1).collect()
    }
    assert {k for k in s3 if int(k.split("-")[1]) < N} == s1


def test_sample_rate_accuracy_and_salt_independence(spark):
    base = _df(spark)
    n1 = deterministic_sample(base, "key", 0.1, salt="a").count()
    assert abs(n1 / N - 0.1) < 0.01
    a = {
        r["key"]
        for r in deterministic_sample(base, "key", 0.5, salt="a").collect()
    }
    b = {
        r["key"]
        for r in deterministic_sample(base, "key", 0.5, salt="b").collect()
    }
    overlap = len(a & b) / N
    assert abs(overlap - 0.25) < 0.02  # independent halves overlap ~25%


def test_split_total_disjoint_and_proportional(spark):
    out = hash_split(_df(spark), "key").groupBy("split").count()
    got = {r["split"]: r["count"] for r in out.collect()}
    assert set(got) == {"train", "val", "test"}
    assert sum(got.values()) == N  # total + disjoint (one row, one split)
    assert abs(got["train"] / N - 0.98) < 0.01
    assert abs(got["val"] / N - 0.01) < 0.005
    # nested property: a row's split never changes when later splits
    # are re-weighted (earlier ranges are untouched by construction)
    fine = hash_split(
        _df(spark), "key", {"train": 0.98, "val": 0.02}
    )
    coarse = hash_split(_df(spark), "key")
    joined = fine.alias("f").join(
        coarse.alias("c"), "key"
    ).where(
        (F.col("f.split") == "train") != (F.col("c.split") == "train")
    )
    assert joined.count() == 0


def test_split_rejects_bad_inputs(spark):
    with pytest.raises(ValueError):
        deterministic_sample(_df(spark), "key", 1.5)
    with pytest.raises(ValueError):
        hash_split(_df(spark), "key", {"a": 0.0})


def test_sampling_plan_is_shuffle_free(spark):
    s = (
        deterministic_sample(_df(spark), "key", 0.1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in s
    assert "BatchEvalPython" not in s
    s2 = (
        hash_split(_df(spark), "key")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in s2
