"""Iterative transitive closure over an edge DataFrame.

Query capability for SPARQL property paths like ``wdt:P31/wdt:P279*``
(/root/reference/tests/sparql_tests.cpp:78-99): reachability over the
``triples`` table, computed as join-until-fixpoint with per-iteration
``localCheckpoint`` to cut lineage (same discipline as cc.py).

Two strategies, both join-until-fixpoint with per-iteration
``localCheckpoint`` to cut lineage (same discipline as cc.py):

* ``doubling`` (default): R_{k+1} = R_k ∪ (R_k ∘ R_k) — after k rounds
  R covers paths up to length 2^k, so a depth-d graph converges in
  ⌈log2 d⌉ + 1 rounds.  Each driver round costs a scheduling barrier
  (~0.5 s at any scale), so halving the round count matters more than
  the extra join width for the shallow hierarchies this engine meets
  (P31/P279 class trees are depth ≲ 20).
* ``seminaive``: frontier ∘ base each round — O(d) rounds but each
  joins only the NEW pairs; total work proportional to closure size.
  The right choice for long chains / when the closure is much larger
  than memory-per-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 64,
    method: str = "doubling",
) -> DataFrame:
    """→ all (src, dst) pairs with a directed path of length >= 1."""
    base = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    if method == "doubling":
        result = base
        n = result.count()
        for _ in range(max_iter):
            # explicit renames instead of alias().col("f.x"): the
            # aliased self-join form trips attribute resolution on
            # localCheckpoint'd plans (AttributeMap key-not-found on
            # Spark 4)
            stepped = (
                result.select("src", F.col("dst").alias("mid"))
                .join(
                    result.select(F.col("src").alias("mid"), "dst"),
                    "mid",
                )
                .select("src", "dst")
            )
            # lazy checkpoint: the convergence count() is the action
            # that materializes it — one job per round instead of two
            # (eager localCheckpoint runs its own materialization job)
            grown = (
                result.unionByName(stepped)
                .distinct()
                .localCheckpoint(eager=False)
            )
            m = grown.count()
            if m == n:
                return result
            result, n = grown, m
        return result

    result = base
    frontier = base
    for _ in range(max_iter):
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
