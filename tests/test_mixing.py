"""Corpus mixing and deterministic shuffle invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arachne_spark.operators.mixing import mix_corpora, sample_epochs
from arachne_spark.operators.sampling import deterministic_shuffle

N = 10_000


def _src(spark, tag, n=N):
    return spark.range(0, n, 1, 4).select(
        F.concat(F.lit(f"{tag}-"), F.col("id")).alias("key"),
        F.lit(tag).alias("body"),
    )


def test_sample_epochs_rates(spark):
    df = _src(spark, "a")
    down = sample_epochs(df, "key", 0.3)
    assert abs(down.count() / N - 0.3) < 0.02
    assert down.agg(F.max("epoch")).collect()[0][0] == 0
    up = sample_epochs(df, "key", 2.5)
    assert abs(up.count() / N - 2.5) < 0.02
    per_epoch = {
        r["epoch"]: r["count"]
        for r in up.groupBy("epoch").count().collect()
    }
    assert per_epoch[0] == N and per_epoch[1] == N
    assert abs(per_epoch[2] / N - 0.5) < 0.02
    with pytest.raises(ValueError):
        sample_epochs(df, "key", 0)


def test_mix_corpora_composition_and_lineage(spark):
    mixed = mix_corpora(
        {
            "web": (_src(spark, "web"), 0.6),
            "code": (_src(spark, "code"), 1.0),
            "ref": (_src(spark, "ref"), 2.0),
        },
        "key",
    )
    counts = {
        r["source"]: r["count"]
        for r in mixed.groupBy("source").count().collect()
    }
    assert counts["code"] == N and counts["ref"] == 2 * N
    assert abs(counts["web"] / N - 0.6) < 0.02
    assert set(mixed.columns) == {"key", "body", "epoch", "source"}
    # deterministic: same mix twice is identical
    again = mix_corpora(
        {
            "web": (_src(spark, "web"), 0.6),
            "code": (_src(spark, "code"), 1.0),
            "ref": (_src(spark, "ref"), 2.0),
        },
        "key",
    )
    assert mixed.exceptAll(again).count() == 0


def test_deterministic_shuffle_is_a_fixed_permutation(spark):
    df = _src(spark, "a", n=2000)
    o1 = [r["key"] for r in deterministic_shuffle(df, "key", num_partitions=8).collect()]
    o2 = [
        r["key"]
        for r in deterministic_shuffle(
            df.repartition(17), "key", num_partitions=8
        ).collect()
    ]
    assert o1 == o2  # same permutation regardless of input layout
    assert sorted(o1) == sorted(r["key"] for r in df.collect())
    assert o1 != sorted(o1)  # actually shuffled
    o3 = [
        r["key"]
        for r in deterministic_shuffle(
            df, "key", salt="run2", num_partitions=8
        ).collect()
    ]
    assert o3 != o1  # independent permutation per salt
