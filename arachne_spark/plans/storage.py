"""Warehouse abstraction: committed stage tables + snapshot resume.

Realizes the intended-but-empty ``ariadne`` persistence layer of the
reference (/root/reference/include/ariadne.hpp:29, call sites
src/arachne.cpp:103,205) as snapshot-committed tables.

Two backends behind one API:
* **Iceberg** (preferred on a real cluster): ``df.writeTo(cat.ns.table)``
  — atomic snapshot commit, time travel, incremental reads.  Used when
  the session has an Iceberg catalog configured (``iceberg_catalog``).
* **Parquet fallback** (this sandbox has no Iceberg runtime jar):
  per-table directory; Spark's ``_SUCCESS`` marker is the commit record.
  Writes go to a temp dir and are atomically swapped into place, so a
  killed run never leaves a half-written "committed" stage.  Every file
  operation goes through the Hadoop FileSystem API resolved from the
  session conf — the same warehouse root works on local disk, HDFS,
  and S3A (driver-local ``os.rename`` would silently no-op or fail on
  a remote filesystem).

``resume_or_compute`` gives the checkpoint-resume semantics demanded by
the north_rule: a stage whose table is committed is *read*, not
recomputed — kill the driver after stage N, restart, and stages 1..N
load from their snapshots.
"""

from __future__ import annotations

import hashlib
import time

from pyspark.sql import DataFrame, SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` resolved from the session's
    Hadoop conf — works on local, HDFS, and S3A alike."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def checked_rename(fs, src, dst) -> None:
    """Hadoop ``FileSystem.rename`` reports failure by RETURNING FALSE
    (cross-device moves, permission errors, some object-store paths) —
    unlike ``os.rename``, which raises.  Every swap-protocol rename
    must go through this wrapper: ignoring the boolean and then
    deleting the backup turns a failed rename into silent data loss."""
    if not fs.rename(src, dst):
        raise IOError(f"rename failed: {src} -> {dst}")


class Warehouse:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        iceberg_catalog: str | None = None,
    ):
        self.spark = spark
        self.root = root
        self.catalog = iceberg_catalog
        if not iceberg_catalog:
            fs, rpath = hadoop_fs(spark, root)
            fs.mkdirs(rpath)

    # -- parquet-backend paths ------------------------------------------
    def _path(self, table: str) -> str:
        # plain string join, not os.path.join: the root may be a URI
        # (hdfs://, s3a://) that os.path must not normalize
        return self.root.rstrip("/") + "/" + table

    def _jpath(self, path: str):
        return self.spark._jvm.org.apache.hadoop.fs.Path(path)

    def is_committed(self, table: str) -> bool:
        if self.catalog:
            return self.spark.catalog.tableExists(
                f"{self.catalog}.{table}"
            )
        fs, _ = hadoop_fs(self.spark, self.root)
        return fs.exists(self._jpath(self._path(table) + "/_SUCCESS"))

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        if self.catalog:
            writer = df.writeTo(f"{self.catalog}.{table}")
            if partition_by:
                from pyspark.sql.functions import col

                writer = writer.partitionedBy(
                    *[col(c) for c in partition_by]
                )
            if mode == "append" and self.is_committed(table):
                writer.append()
            else:
                writer.createOrReplace()
            return
        final = self._path(table)
        if mode == "append":
            w = df.write.mode("append")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(final)
            return
        # overwrite: write to temp, atomically swap in via the Hadoop
        # FS API (rename is atomic on HDFS and local; on S3A the
        # object-store commit protocol underneath gives the same
        # all-or-nothing contract for the directory marker)
        tmp = final + f".__tmp_{int(time.time() * 1000)}"
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        fs, _ = hadoop_fs(self.spark, self.root)
        if partition_by and not self._has_data_files(fs, tmp):
            # a ZERO-ROW partitioned write emits no data files at all
            # (no partition dirs — just _SUCCESS), which a later read
            # fails to infer a schema from.  Rewrite schema-only,
            # unpartitioned: an empty part file carries the schema and
            # the table stays readable (a curation gate that filters a
            # stage to nothing must not poison the stage graph).
            df.limit(0).write.mode("overwrite").parquet(tmp)
        old = self._jpath(final + ".__old")
        fpath = self._jpath(final)
        fs.delete(old, True)
        if fs.exists(fpath):
            checked_rename(fs, fpath, old)
        # a failed rename raises BEFORE the backup delete below — the
        # previous committed copy stays recoverable at .__old
        checked_rename(fs, self._jpath(tmp), fpath)
        fs.delete(old, True)

    def _has_data_files(self, fs, path: str) -> bool:
        """True iff the directory holds anything besides commit
        markers (_SUCCESS, .crc) — i.e. at least one data file or
        partition directory."""
        for st in fs.listStatus(self._jpath(path)):
            name = st.getPath().getName()
            if not name.startswith(("_", ".")):
                return True
        return False

    def read(self, table: str) -> DataFrame:
        if self.catalog:
            return self.spark.read.table(f"{self.catalog}.{table}")
        return self.spark.read.parquet(self._path(table))

    def drop(self, table: str) -> None:
        if self.catalog:
            self.spark.sql(f"DROP TABLE IF EXISTS {self.catalog}.{table}")
            return
        fs, _ = hadoop_fs(self.spark, self.root)
        fs.delete(self._jpath(self._path(table)), True)

    def _bucketed_name(self, table: str) -> str:
        """Session-catalog name for a bucketed parquet-fallback table,
        namespaced by a hash of the warehouse root: two Warehouse
        instances with different roots but the same logical table name
        must not overwrite each other's catalog entry.  (The entry
        itself is still session-scoped — a new session re-registers by
        re-running write_bucketed, or moves to the Iceberg backend
        where bucket metadata lives in the table format.)"""
        # normalized root: '/wh' and '/wh/' resolve every table to the
        # same directory, so they must hash to the same namespace
        tag = hashlib.md5(
            self.root.rstrip("/").encode()
        ).hexdigest()[:8]
        return f"wh_{tag}_{table}"

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        n_buckets: int,
        bucket_cols: list[str],
        sort_cols: list[str] | None = None,
    ) -> None:
        """Bucketed table for co-located joins: both sides of a
        repeated equi-join (triples ⋈ canonical_map, triples ⋈ labels)
        written with the same bucket spec join WITHOUT a shuffle —
        the Exchange disappears from the plan because partitioning is
        baked into the table layout.  On Iceberg this is the
        ``bucket(N, col)`` partition transform; the parquet fallback
        uses ``bucketBy``/``saveAsTable`` (plain ``save`` cannot carry
        bucket metadata), with the table's files rooted under the
        warehouse dir so nothing leaks into the driver cwd.

        Plan contract (asserted in tests/test_bucketing.py): joining
        two tables bucketed (same N, same keys) on those keys shows
        SortMergeJoin over FileScans with NO Exchange on either side.
        """
        if self.catalog:
            # Iceberg: one bucket transform PER key column (identity
            # partitioning on a high-cardinality key would explode the
            # partition count; joint-hash bucketing is not expressible
            # as a transform, and per-column bucket transforms still
            # co-locate two tables written with the same spec for a
            # join on all bucket_cols).  Atomic replace.
            from pyspark.sql.functions import bucket, col

            writer = df.writeTo(f"{self.catalog}.{table}").partitionedBy(
                bucket(n_buckets, col(bucket_cols[0])),
                *[bucket(n_buckets, col(c)) for c in bucket_cols[1:]],
            )
            writer.createOrReplace()
            return
        w = (
            df.write.mode("overwrite")
            .format("parquet")
            .option("path", self._path(table))
            .bucketBy(n_buckets, *bucket_cols)
        )
        if sort_cols:
            w = w.sortBy(*sort_cols)
        w.saveAsTable(self._bucketed_name(table))

    def read_table(self, table: str) -> DataFrame:
        """Catalog read that preserves bucket metadata (plain
        ``spark.read.parquet`` on the directory would forget it)."""
        if self.catalog:
            return self.spark.read.table(f"{self.catalog}.{table}")
        return self.spark.table(self._bucketed_name(table))

    def resume_or_compute(
        self, table: str, compute, force: bool = False, **write_kwargs
    ) -> tuple[DataFrame, bool]:
        """(df, resumed): read committed snapshot or compute+commit."""
        if not force and self.is_committed(table):
            return self.read(table), True
        df = compute()
        self.write(df, table, **write_kwargs)
        return self.read(table), False
