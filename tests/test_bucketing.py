"""Co-located joins via bucketed tables: two tables written with the
same bucket spec must equi-join on the bucket keys with NO Exchange
in the physical plan — the layout-baked partitioning that removes the
repeated shuffle from triples ⋈ canonical_map / labels at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from arachne_spark.plans.storage import Warehouse

N_BUCKETS = 8


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    left = spark.range(200_000).select(
        F.concat(F.lit("Q"), (F.col("id") % 50_000).cast("string")).alias(
            "subj"
        ),
        F.col("id").alias("v"),
    )
    right = spark.range(50_000).select(
        F.concat(F.lit("Q"), F.col("id").cast("string")).alias("subj"),
        F.concat(F.lit("label "), F.col("id").cast("string")).alias(
            "label"
        ),
    )
    wh.write_bucketed(left, "bkt_left", N_BUCKETS, ["subj"], ["subj"])
    wh.write_bucketed(right, "bkt_right", N_BUCKETS, ["subj"], ["subj"])

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = wh.read_table("bkt_left").join(wh.read_table("bkt_right"), "subj")
        assert j.count() == 200_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {wh._bucketed_name('bkt_left')}")
        spark.sql(f"DROP TABLE IF EXISTS {wh._bucketed_name('bkt_right')}")


def test_bucketed_one_side_still_correct(spark, tmp_path):
    """A bucketed table joined against an unbucketed frame must still
    answer correctly (Spark shuffles only the unbucketed side)."""
    wh = Warehouse(spark, str(tmp_path))
    left = spark.range(10_000).select(
        F.concat(F.lit("Q"), F.col("id").cast("string")).alias("subj"),
        F.col("id").alias("v"),
    )
    wh.write_bucketed(left, "bkt_solo", N_BUCKETS, ["subj"])
    try:
        other = spark.range(500).select(
            F.concat(F.lit("Q"), (F.col("id") * 20).cast("string")).alias(
                "subj"
            )
        )
        got = wh.read_table("bkt_solo").join(other, "subj").count()
        assert got == 500
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {wh._bucketed_name('bkt_solo')}")


def test_two_warehouses_same_table_name_no_clobber(spark, tmp_path):
    """Catalog entries are namespaced by warehouse root: two Warehouse
    instances writing the same logical bucketed-table name must not
    overwrite each other (round-3 ADVICE finding)."""
    wa = Warehouse(spark, str(tmp_path / "a"))
    wb = Warehouse(spark, str(tmp_path / "b"))
    df_a = spark.range(10).select(F.col("id").alias("k"))
    df_b = spark.range(20).select(F.col("id").alias("k"))
    wa.write_bucketed(df_a, "shared", 4, ["k"])
    wb.write_bucketed(df_b, "shared", 4, ["k"])
    try:
        assert wa.read_table("shared").count() == 10
        assert wb.read_table("shared").count() == 20
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {wa._bucketed_name('shared')}")
        spark.sql(f"DROP TABLE IF EXISTS {wb._bucketed_name('shared')}")
