"""Physical-plan audit: assert the plans we ship are the plans we want.

For each audited operator/query this prints the formatted physical plan
and checks structural expectations:
  * broadcast joins where a dimension is joined (no shuffle of the
    fact side),
  * no BatchEvalPython anywhere (row-at-a-time Python is forbidden;
    ArrowEvalPython is the only acceptable Python boundary),
  * parquet scans carry PushedFilters / pruned ReadSchema where a
    filter/projection exists upstream.

Usage: python tools/explain_audit.py [--verbose]
Exits nonzero if any expectation fails — wired as a test-adjacent gate.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from arachne_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"
VERBOSE = "--verbose" in sys.argv


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )


def audit(name: str, df, expect_contains=(), expect_absent=()):
    p = plan_of(df)
    problems = []
    for s in expect_contains:
        if s not in p:
            problems.append(f"MISSING {s!r}")
    for s in expect_absent:
        if s in p:
            problems.append(f"FORBIDDEN {s!r}")
    status = "ok  " if not problems else "FAIL"
    print(f"{status} {name}" + (f": {problems}" if problems else ""))
    if VERBOSE or problems:
        print(p[:4000])
    return not problems


def main() -> None:
    import __spark_entry__ as em

    spark = get_spark("explain-audit", master="local[4]",
                      shuffle_partitions=8)
    ok = True

    # 1. broadcast enrichment join: dim broadcast, fact side unshuffled,
    #    filter pushed into the parquet scan
    q5 = em.q05_broadcast_enrich(spark, SF)
    ok &= audit(
        "q05 broadcast join", q5,
        expect_contains=("BroadcastHashJoin",),
        expect_absent=("BatchEvalPython", "SortMergeJoin"),
    )

    # 2. projection pruning reaches the scan: only needed columns read
    q3 = em.q03_dedup_exact(spark, SF)
    p3 = plan_of(q3)
    ok &= audit(
        "q03 column pruning", q3,
        expect_contains=("ReadSchema: struct<l_returnflag:string,"
                         "l_linestatus:string>",),
        expect_absent=("BatchEvalPython",),
    )
    _ = p3

    # 3. filter pushdown into parquet
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .where(F.col("l_quantity") > 40)
        .select("l_orderkey")
    )
    ok &= audit(
        "filter pushdown", li,
        expect_contains=("PushedFilters: [IsNotNull(l_quantity), "
                         "GreaterThan(l_quantity,40.0)]",),
    )

    # 4. KG mention path: dictionary broadcast; Python only via Arrow
    from arachne_spark.operators.extract import latest_snapshot, with_text
    from arachne_spark.operators.mentions import detect_mentions
    from arachne_spark.sources.dictionary import alias_df
    from arachne_spark.sources.pages import pages_df

    clean = with_text(
        latest_snapshot(pages_df(spark, 100)).where(F.col("lang") == "en")
    )
    m = detect_mentions(clean, alias_df(spark))
    ok &= audit(
        "mention detection", m,
        expect_contains=("BroadcastHashJoin", "ArrowEvalPython"),
        expect_absent=("BatchEvalPython",),
    )

    # 5. semi/anti joins compile to dedicated join types
    ok &= audit(
        "q06 semi join", em.q06_semi_join(spark, SF),
        expect_contains=("LeftSemi",),
    )
    ok &= audit(
        "q07 anti join", em.q07_anti_join(spark, SF),
        expect_contains=("LeftAnti",),
    )

    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
