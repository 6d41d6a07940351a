"""Iterative transitive closure over an edge DataFrame.

Query capability for SPARQL property paths like ``wdt:P31/wdt:P279*``
(/root/reference/tests/sparql_tests.cpp:78-99): reachability over the
``triples`` table, computed as join-until-fixpoint with per-iteration
``localCheckpoint`` to cut lineage (same discipline as cc.py).

The frontier-join formulation does O(d) rounds for path depth d but
each round joins only the *new* pairs against the base edges — the
standard semi-naive datalog evaluation — so total work is proportional
to the closure size, not closure × depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 64,
) -> DataFrame:
    """→ all (src, dst) pairs with a directed path of length >= 1."""
    base = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    result = base
    frontier = base
    for _ in range(max_iter):
        # explicit renames instead of alias().col("f.x"): the aliased
        # self-join form trips attribute resolution on localCheckpoint'd
        # plans (key-not-found in AttributeMap on Spark 4)
        step = (
            frontier.select("src", F.col("dst").alias("mid"))
            .join(
                base.select(F.col("src").alias("mid"), "dst"), "mid"
            )
            .select("src", "dst")
            .distinct()
        )
        new = step.join(result, ["src", "dst"], "left_anti").localCheckpoint()
        if new.isEmpty():
            break
        result = result.unionByName(new).localCheckpoint()
        frontier = new
    return result


def reachable_from(
    edges: DataFrame,
    targets: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Nodes with a path (length >= 0) into `targets` — the
    ``p/q* <target>`` shape: closure restricted to target sinks plus the
    targets themselves."""
    clos = transitive_closure(edges, src, dst)
    hits = clos.join(
        targets.withColumnRenamed(targets.columns[0], "dst"), "dst"
    ).select("src")
    selfs = targets.withColumnRenamed(targets.columns[0], "src")
    return hits.unionByName(selfs).distinct()
