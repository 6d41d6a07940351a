"""Sequence packing: documents → fixed-length training sequences.

The last mile of a pre-training data pipeline maps variable-length
documents onto fixed ``seq_len``-token training rows.  Two standard
disciplines, both deterministic and shuffle-bounded:

* :func:`pack_concat` — GPT-style: concatenate documents in a
  deterministic order and slice every ``seq_len`` tokens, letting
  documents straddle sequence boundaries.  Zero padding waste except
  one partial sequence per shard.  Pure JVM window arithmetic (one
  shuffle by shard, one in-partition sort) — no Python.
* :func:`pack_bins` — no-split first-fit-decreasing: each document
  lands whole in exactly one bin of capacity ``seq_len`` (SFT / long-
  context curation, where splitting a document corrupts the example).
  Packing is inherently sequential, so it runs per hash-shard inside
  one Arrow ``applyInPandas`` pass; FFD's ≤ 11/9·OPT + 1 bin bound
  holds within each shard and sharding adds at most one under-filled
  bin per shard — noise once shards hold thousands of documents.

Scale shape: both operators shuffle each doc row exactly once, keyed
by ``pmod(xxhash64(id), n_shards)`` — shard count is the parallelism
knob and bounds per-task memory (`pack_bins` holds one shard's
(id, n_tokens) pairs in memory — tiny even for 10^6-doc shards).
Ordering inside a shard is a content hash, so output is a pure
function of corpus content: re-running on a repartitioned or
re-ordered input yields byte-identical assignments.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from arachne_spark.operators.sampling import hash_unit


def _sharded(
    df: DataFrame, id_col: str, n_shards: int
) -> DataFrame:
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive: {n_shards}")
    return df.withColumn(
        "__shard",
        F.pmod(F.xxhash64(F.col(id_col), F.lit("pack")), F.lit(n_shards)),
    ).withColumn("__ord", hash_unit(F.col(id_col), "pack_order"))


def pack_concat(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    n_shards: int = 256,
) -> DataFrame:
    """Concat-and-slice packing plan: one row per document with the
    sequence coordinates its tokens occupy.

    Output columns: ``id_col``, ``n_tokens_col``, ``shard``,
    ``seq_start`` (index of the sequence holding the doc's first
    token, numbered per shard), ``seq_offset`` (token offset inside
    that sequence), ``n_seqs`` (how many sequences the doc touches).
    A writer materializes token buffers from this plan; the plan
    itself stays columnar and JVM-side."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive: {seq_len}")
    w = (
        Window.partitionBy("__shard")
        .orderBy("__ord", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.col(n_tokens_col).cast("long")
    out = (
        _sharded(docs, id_col, n_shards)
        .withColumn("__cum", F.sum(n).over(w))
        .withColumn("__start", F.col("__cum") - n)
        .select(
            id_col,
            n_tokens_col,
            F.col("__shard").alias("shard"),
            # integer `div`, not double division: exact past 2^53
            # cumulative tokens, where a double would drift
            F.expr(f"__start div {seq_len}").alias("seq_start"),
            F.pmod(F.col("__start"), F.lit(seq_len))
            .cast("long")
            .alias("seq_offset"),
            F.expr(
                f"(__cum - 1) div {seq_len} - __start div {seq_len} + 1"
            ).alias("n_seqs"),
        )
    )
    return out


def pack_bins(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    n_shards: int = 256,
) -> DataFrame:
    """No-split FFD bin packing: every doc in exactly one bin.

    Output columns: ``id_col``, ``n_tokens_col``, ``bin_id`` (string
    ``"<shard>-<idx>"``), ``bin_tokens`` (the bin's total fill),
    ``truncated`` (true when the doc alone exceeds ``seq_len`` and
    owns a single-doc bin the consumer must truncate)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive: {seq_len}")
    sharded = _sharded(docs, id_col, n_shards).select(
        F.col(id_col).alias("__id"),
        F.col(n_tokens_col).cast("long").alias("__n"),
        "__shard",
        "__ord",
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        # FFD: size-descending, content-hash tie-break (deterministic);
        # plain zip — itertuples renames __-prefixed columns
        rows = sorted(
            zip(pdf["__id"], pdf["__n"], pdf["__ord"]),
            key=lambda r: (-r[1], r[2], str(r[0])),
        )
        fills: list[int] = []
        assign: list[tuple] = []
        for rid, rn, _ in rows:
            rn = int(rn)
            if rn > seq_len:
                assign.append((rid, rn, len(fills), True))
                fills.append(rn)
                continue
            # first-fit over open bins
            for b, f in enumerate(fills):
                if f + rn <= seq_len:
                    assign.append((rid, rn, b, False))
                    fills[b] = f + rn
                    break
            else:
                assign.append((rid, rn, len(fills), False))
                fills.append(rn)
        return pd.DataFrame(
            {
                "__id": [a[0] for a in assign],
                "__n": [a[1] for a in assign],
                "bin_id": [f"{shard}-{a[2]}" for a in assign],
                "bin_tokens": [fills[a[2]] for a in assign],
                "truncated": [a[3] for a in assign],
            }
        )

    id_field = sharded.schema["__id"].dataType.simpleString()
    out = sharded.groupBy("__shard").applyInPandas(
        pack,
        schema=(
            f"__id {id_field}, __n long, bin_id string,"
            " bin_tokens long, truncated boolean"
        ),
    )
    return out.select(
        F.col("__id").alias(id_col),
        F.col("__n").alias(n_tokens_col),
        "bin_id",
        "bin_tokens",
        "truncated",
    )
