"""Deterministic, content-keyed sampling and dataset splits.

A training-data pipeline needs samples and train/val/test splits that
are (a) reproducible across runs and cluster sizes, (b) stable under
repartitioning, and (c) consistent for the same document across
corpus versions — none of which ``DataFrame.sample`` gives (its
Bernoulli draw is seeded per-partition, so adding one input file
reshuffles every assignment).  The standard fix is a hash of a
content key: ``u = bucket(xxhash64(key, salt)) ∈ [0, 1)`` is a pure
projection — no shuffle, no state, pushdown-friendly — and the same
key lands in the same split forever.

Determinism contract (CLAUDE.md): every assignment is a pure function
of row CONTENT + the explicit ``salt``; nothing here reads time,
randomness, or partition ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# xxhash64 returns a signed 64-bit value; map it to [0, 1) with the
# unsigned reinterpretation so the distribution is uniform over the
# full hash range (a plain abs() would double-weight the positives).
_U64 = float(1 << 64)


def hash_unit(key: Column, salt: str) -> Column:
    """``[0, 1)`` uniform deterministic in (key, salt)."""
    h = F.xxhash64(key, F.lit(salt)).cast("decimal(20,0)")
    # 2^63 exceeds a Java long, so it must enter the plan as a SQL
    # decimal literal, not a py4j lit()
    offset = F.expr(f"cast({1 << 63} as decimal(20,0))")
    return (h + offset).cast("double") / _U64


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    salt: str = "sample",
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by content hash.  Re-running on
    a repartitioned / re-ordered / appended-to input keeps exactly
    the same keys; disjoint salts give independent samples."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1]: {rate}")
    return df.where(hash_unit(F.col(key_col), salt) < F.lit(rate))


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    salt: str = "shuffle",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global training-order shuffle that is a pure function of row
    content: repartition by the key hash, sort within partitions by
    (hash, key).  Reading the output partitions in order visits rows
    in one fixed pseudorandom permutation — same permutation every
    run, any cluster size (``num_partitions`` changes the file split
    points, not the order).  Change ``salt`` to get an independent
    permutation per training run."""
    u = hash_unit(F.col(key_col), salt).alias("__u")
    out = df.withColumn("__u", u)
    out = (
        out.repartitionByRange(num_partitions, "__u")
        if num_partitions
        else out.repartitionByRange("__u")
    )
    return out.sortWithinPartitions("__u", key_col).drop("__u")


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by cumulative
    hash-range partitioning (default 98/1/1 train/val/test).  The
    assignment is total (ranges cover [0, 1)), disjoint, and stable:
    growing the corpus never moves an existing key between splits.

    Weight order is the dict's insertion order — the FIRST split owns
    the lowest hash range, so renaming or re-weighting later splits
    never disturbs earlier ones (the usual "grow val without touching
    train" requirement flips that: put the splits you may grow LAST)."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = hash_unit(F.col(key_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)
