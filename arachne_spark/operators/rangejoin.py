"""Range (interval) join — points matched to covering intervals.

``point p`` joins interval ``[s, e]`` (inclusive) on equal keys iff
``s <= p <= e``.  Spark executes the naive formulation (equi-join on
the key with the range as a post-join filter, or worse a pure theta
join) as |points| x |intervals| per key before filtering — quadratic
in density, the classic range-join blowup.

Scale-first formulation — **interval bucketization**:

* time is cut into fixed buckets of ``bucket_width``; a point owns one
  bucket, an interval explodes to the buckets it overlaps, and the
  candidate join becomes a plain EQUI-join on (keys…, bucket) with the
  exact range predicate as a cheap post-filter.  Work per bucket is
  |points in bucket| x |intervals overlapping bucket| — local density,
  not global cardinality.
* an interval's explode factor is its length / bucket_width; intervals
  longer than ``max_buckets`` buckets would fan out too far, so they
  split onto a second path: an equi-join on the keys alone with the
  range filter.  Long intervals are rare in real workloads (sessions,
  validity windows) — and when one key holds many, no bucketization
  helps anyway; the split keeps the common case linear and the rare
  case correct.
* candidates dedup on (point id, interval identity): an interval
  overlapping k buckets meets the point at most once per bucket.

Choose ``bucket_width`` near the typical interval length: explode
factor ~2 and bucket population stays balanced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_num(col: Column, dtype: str) -> Column:
    if dtype.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp")) / F.lit(1e6)
    return col.cast("double")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_id: str,
    point_ts: str,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bucket_width: float = 3600.0,
    max_buckets: int = 64,
) -> DataFrame:
    """→ points columns + the matching interval's columns, one row per
    (point, covering interval) pair.

    ``keys`` are equality columns present on both sides (e.g.
    user_id); ``point_id`` must uniquely identify a point row and
    interval rows must be distinct on (keys, start, end) — dedup the
    interval side first if not.
    """
    keys = keys or []
    p_num = _to_num(
        F.col(point_ts), points.schema[point_ts].dataType.simpleString()
    )
    s_num = _to_num(
        F.col(start_col),
        intervals.schema[start_col].dataType.simpleString(),
    )
    e_num = _to_num(
        F.col(end_col), intervals.schema[end_col].dataType.simpleString()
    )
    w = float(bucket_width)

    pts = points.withColumn(
        "_pb", F.floor(p_num / F.lit(w)).cast("long")
    )
    ivs = (
        intervals.withColumn("_sb", F.floor(s_num / F.lit(w)).cast("long"))
        .withColumn("_eb", F.floor(e_num / F.lit(w)).cast("long"))
        .where(F.col("_sb") <= F.col("_eb"))  # degenerate guard
    )
    n_b = F.col("_eb") - F.col("_sb") + 1

    short = ivs.where(n_b <= max_buckets).withColumn(
        "_pb", F.explode(F.sequence(F.col("_sb"), F.col("_eb")))
    )
    long_ivs = ivs.where(n_b > max_buckets)

    rng = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
    )
    short_hits = (
        pts.join(short, keys + ["_pb"])
        .where(rng)
        .drop("_pb", "_sb", "_eb")
    )
    if keys:
        long_hits = (
            pts.drop("_pb")
            .join(long_ivs.drop("_sb", "_eb"), keys)
            .where(rng)
        )
    else:
        # no keys: the rare long intervals cross against every point;
        # they are few by the max_buckets split, so the small side
        # broadcasts (same bounded-side argument as brute-force ANN)
        long_hits = (
            pts.drop("_pb")
            .crossJoin(F.broadcast(long_ivs.drop("_sb", "_eb")))
            .where(rng)
        )
    return short_hits.unionByName(long_hits).dropDuplicates(
        [point_id, start_col, end_col] + keys
    )
