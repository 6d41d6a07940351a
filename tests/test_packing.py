"""Sequence packing invariants and a pure-Python FFD twin.

pack_concat: per-shard token streams are gapless (each doc starts
exactly where the previous ended), coordinates are internally
consistent, and assignments are stable under repartitioning.
pack_bins: every doc lands in exactly one bin, no bin over capacity
(except flagged single-doc overlong bins), bin fills match a Python
twin running the identical FFD, and fill efficiency is high on a
packable fixture."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from arachne_spark.operators.packing import pack_bins, pack_concat

SEQ = 100


def _docs(spark, n=3000, parts=7):
    # token lengths 1..149: a mix of small, half-bin, and >bin/2 docs
    return spark.range(0, n, 1, parts).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(149)) + 1).alias("n_tokens"),
    )


def test_pack_concat_streams_are_gapless(spark):
    out = pack_concat(_docs(spark), SEQ, n_shards=16).collect()
    by_shard = defaultdict(list)
    for r in out:
        by_shard[r["shard"]].append(r)
    assert len(out) == 3000
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: (r["seq_start"], r["seq_offset"]))
        pos = 0
        for r in rows:
            start = r["seq_start"] * SEQ + r["seq_offset"]
            assert start == pos, (shard, r)
            end = start + r["n_tokens"]
            # n_seqs consistent with the span the tokens occupy
            assert r["n_seqs"] == (end - 1) // SEQ - start // SEQ + 1
            pos = end


def test_pack_concat_stable_under_repartition(spark):
    a = {
        (r["doc_id"], r["shard"], r["seq_start"], r["seq_offset"])
        for r in pack_concat(_docs(spark), SEQ, n_shards=16).collect()
    }
    b = {
        (r["doc_id"], r["shard"], r["seq_start"], r["seq_offset"])
        for r in pack_concat(
            _docs(spark).repartition(23), SEQ, n_shards=16
        ).collect()
    }
    assert a == b


def _py_ffd(items, seq_len):
    """Identical FFD to operators/packing.py::pack_bins."""
    rows = sorted(items, key=lambda r: (-r[1], r[2], str(r[0])))
    fills, assign = [], {}
    for rid, rn, _ in rows:
        if rn > seq_len:
            assign[rid] = len(fills)
            fills.append(rn)
            continue
        for b, f in enumerate(fills):
            if f + rn <= seq_len:
                assign[rid] = b
                fills[b] = f + rn
                break
        else:
            assign[rid] = len(fills)
            fills.append(rn)
    return assign, fills


def test_pack_bins_matches_python_twin(spark):
    from arachne_spark.operators.sampling import hash_unit

    docs = _docs(spark, n=1200)
    out = pack_bins(docs, SEQ, n_shards=8).collect()
    assert len(out) == 1200
    assert len({r["doc_id"] for r in out}) == 1200  # exactly once
    # rebuild the twin's inputs: same shard + order keys
    keyed = docs.select(
        "doc_id",
        "n_tokens",
        F.pmod(
            F.xxhash64(F.col("doc_id"), F.lit("pack")), F.lit(8)
        ).alias("shard"),
        hash_unit(F.col("doc_id"), "pack_order").alias("ord"),
    ).collect()
    by_shard = defaultdict(list)
    for r in keyed:
        by_shard[r["shard"]].append((r["doc_id"], r["n_tokens"], r["ord"]))
    for shard, items in by_shard.items():
        assign, fills = _py_ffd(items, SEQ)
        got = [r for r in out if r["bin_id"].startswith(f"{shard}-")]
        for r in got:
            b = int(r["bin_id"].split("-")[1])
            assert assign[r["doc_id"]] == b, r
            assert r["bin_tokens"] == fills[b], r
            assert r["truncated"] == (r["n_tokens"] > SEQ)


def test_pack_bins_capacity_and_efficiency(spark):
    out = pack_bins(_docs(spark), SEQ, n_shards=8).collect()
    over = [r for r in out if r["bin_tokens"] > SEQ and not r["truncated"]]
    assert over == []
    # fill efficiency: FFD on this mix should average well above 80%
    fills = {r["bin_id"]: r["bin_tokens"] for r in out if not r["truncated"]}
    eff = sum(min(v, SEQ) for v in fills.values()) / (len(fills) * SEQ)
    assert eff > 0.8, eff


def test_pack_rejects_bad_args(spark):
    with pytest.raises(ValueError):
        pack_concat(_docs(spark), 0)
    with pytest.raises(ValueError):
        pack_bins(_docs(spark), SEQ, n_shards=0)
