"""As-of (time-travel) join — a temporal operator Spark lacks natively.

For each left row, attach the latest right row whose timestamp is at
or before the left row's, per key.  The reference's staleness gate
performs exactly this lookup scalar-style ("what was the last fetch
for this entity?", /root/reference/src/arachne.cpp:201-222); a
training-data pipeline needs it relationally (join each page/event
against the snapshot in force at its crawl time).

Scale-first formulation — **union + sort + carry-forward**, not a
range join:

* the naive `l JOIN r ON key AND r.ts <= l.ts` explodes to
  O(|l|·|r|) per key before the "latest" filter;
* instead both sides union into one relation tagged by side, sorted
  within each key partition by (ts, side, seq); a running
  ``last(payload, ignoreNulls)`` window carries each right payload
  forward to every later left row.  One shuffle on the key, O(n log n)
  per partition, no pair blowup — and AQE's skew-join splitting
  handles a hot key the same way it does any windowed aggregation.

Tie rules (deterministic): a right row AT the left timestamp is
visible (sorts before the left row); multiple right rows at the same
(key, ts) resolve by the greatest ``seq`` expression (caller-chosen
total order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list[str] | None = None,
    seq: Column | None = None,
) -> DataFrame:
    """Left rows + ``asof_<payload>`` columns from the latest right
    row with ``right_ts <= left_ts`` on ``key`` (nulls where no right
    row precedes).

    ``seq`` breaks ties among right rows sharing (key, right_ts);
    defaults to the first payload column.
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    seq = seq if seq is not None else F.col(payload_cols[0])

    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        seq.alias("_seq"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
    )
    l_cols = [F.col(c) for c in left.columns]
    lf = left.select(
        *l_cols,
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_seq"].dataType).alias("_seq"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
    )
    r2 = r.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        "_k", "_ts", "_side", "_seq", "_payload",
    )
    # nulls-first ascending puts left rows (null _seq) after no right
    # row they should see: ordering is (_ts, _side, _seq), and _side
    # already separates the sides within a timestamp
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lf.unionByName(r2).withColumn(
        "_carry", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("_side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[
            F.col("_carry").getField(c).alias(f"asof_{c}")
            for c in payload_cols
        ],
    )
    return out
