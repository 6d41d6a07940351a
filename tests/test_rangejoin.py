"""Range-join differential tests: the bucketized plan (short path +
long-interval split + dedup) must equal a naive per-row oracle on a
fixture that exercises inclusive boundaries, multi-bucket intervals,
intervals past the max_buckets split, keyless mode, and points covered
by several overlapping intervals."""

from __future__ import annotations

from arachne_spark.operators.rangejoin import range_join

# deterministic fixture: numeric "timestamps"
POINTS = [(i, float((i * 37) % 500), f"k{i % 5}") for i in range(200)]
INTERVALS = (
    # short intervals (length <= 40 -> <= 5 buckets at width 10)
    [(float((j * 91) % 460), float((j * 91) % 460 + (j % 5) * 10),
      f"k{j % 5}") for j in range(60)]
    # long intervals: far past max_buckets=8 at width 10
    + [(0.0, 490.0, "k0"), (5.0, 495.0, "k3"), (100.0, 480.0, "k1")]
)


def _naive(keys=True):
    out = set()
    for pid, pts_, pk in POINTS:
        for s, e, ik in INTERVALS:
            if (not keys or pk == ik) and s <= pts_ <= e:
                out.add((pid, s, e) if not keys else (pid, s, e, pk))
    return out


def test_range_join_keyed_matches_naive(spark):
    pts = spark.createDataFrame(POINTS, "pid long, ts double, k string")
    ivs = spark.createDataFrame(
        sorted(set(INTERVALS)), "s double, e double, k string"
    )
    got = {
        (r["pid"], r["s"], r["e"], r["k"])
        for r in range_join(
            pts, ivs, point_id="pid", point_ts="ts",
            start_col="s", end_col="e", keys=["k"],
            bucket_width=10.0, max_buckets=8,
        ).collect()
    }
    assert got == _naive(keys=True)


def test_range_join_keyless_matches_naive(spark):
    pts = spark.createDataFrame(
        [(p[0], p[1]) for p in POINTS], "pid long, ts double"
    )
    ivs = spark.createDataFrame(
        sorted({(s, e) for (s, e, _) in INTERVALS}), "s double, e double"
    )
    want = set()
    for pid, t, _ in POINTS:
        for s, e in {(s, e) for (s, e, _) in INTERVALS}:
            if s <= t <= e:
                want.add((pid, s, e))
    got = {
        (r["pid"], r["s"], r["e"])
        for r in range_join(
            pts, ivs, point_id="pid", point_ts="ts",
            start_col="s", end_col="e",
            bucket_width=10.0, max_buckets=8,
        ).collect()
    }
    assert got == want
