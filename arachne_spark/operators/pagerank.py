"""Deterministic PageRank over the canonicalized entity graph.

Entity-importance ranking for the constructed knowledge graph — the
query-side analog of the reference's head-entity focus (the skew
handling in /root/reference/src/arachne.cpp centres on hot QIDs like
Q5/Q30; PageRank is how a consumer *finds* those hot entities in the
emitted triple set without hand-curating a list).  Power iteration as
join + aggregate rounds, the same discipline as cc.py / closure.py:

* **Bit-deterministic across partitionings** — the repo-wide hard
  invariant.  Floating-point summation order varies with partitioning,
  so every ORDER-SENSITIVE reduction (per-vertex contribution sum,
  dangling mass) accumulates as ``decimal(38,18)`` — exact, order
  independent — while per-row arithmetic (rank*weight, the damping
  update) stays IEEE double, which is deterministic row-local math.
  Same split as kmeans_fit's decimal mean step (ann.py).
* **Scale posture**: edge weights are computed once and checkpointed
  pre-partitioned on ``src`` (the per-round join re-shuffles only the
  rank relation — vertex-sized, two columns); each round is ONE
  shuffle-agg job; the dangling mass rides the round's DAG as a
  1-row broadcast cross join, not a separate driver action.  Rounds
  are fixed-count (no convergence collect), so the driver does one
  materializing action per round to cut checkpoint lineage.
* Dangling vertices (no out-edges) redistribute their mass uniformly —
  the standard correction, kept exact in decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# exact accumulator type for order-independent sums: ranks live in
# [0, 1], so 20 integer digits never overflow and 18 fractional digits
# out-resolve double's 52-bit mantissa
_ACC = "decimal(38,18)"


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 20,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """→ (v, rank double) for every vertex of the directed graph;
    ranks sum to 1.  Fixed ``n_iter`` power-iteration rounds (no
    convergence action — round count, not tolerance, is what a
    production scheduler budgets), bit-identical output for any
    partitioning of ``edges``.

    ``seeds`` switches to PERSONALIZED PageRank: the reset
    distribution (both the (1-d) teleport and the dangling-mass
    redistribution) concentrates uniformly on the seed vertices
    instead of all of V — the "entities related to these" query.
    Uniform PageRank is the special case seeds = V, and the
    implementation is literally that: a per-vertex r0 column replaces
    the two 1/N constants."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .distinct()
        .localCheckpoint()
    )
    verts = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # per-edge weight once, pre-partitioned on the join key so the
    # per-round join shuffles only the (vertex, rank) side.  persist,
    # NOT localCheckpoint: a checkpointed scan (ExistingRDD) reports
    # no outputPartitioning and would re-Exchange the edges every
    # round (verified via explain), while an InMemoryRelation keeps
    # the repartition("src") layout visible to the join planner.
    # Lineage here is static and shallow, so the checkpoint's
    # lineage-cutting is not needed (unlike the per-round rank state).
    w_edges = (
        e.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
        .repartition("src")
        .persist()
    )
    dangling_v = verts.join(
        out_deg.select(F.col("src").alias("v")), "v", "left_anti"
    ).localCheckpoint()
    # reset distribution r0: uniform 1/N, or 1/|S| on the seed set
    if seeds is None:
        vr = verts.withColumn("r0", F.lit(1.0 / n))
    else:
        s = seeds.select(
            F.col(seeds.columns[0]).alias("v")
        ).distinct()
        n_s = s.join(verts, "v", "left_semi").count()
        if n_s == 0:
            raise ValueError("no seed vertex appears in the graph")
        vr = (
            verts.join(s.withColumn("r0", F.lit(1.0 / n_s)), "v", "left")
            .select("v", F.coalesce("r0", F.lit(0.0)).alias("r0"))
        )
    vr = vr.localCheckpoint()
    ranks = vr.select("v", F.col("r0").alias("rank"))
    for _ in range(n_iter):
        contribs = (
            w_edges.join(
                ranks.select(F.col("v").alias("src"), "rank"), "src"
            )
            .groupBy(F.col("dst").alias("v"))
            .agg(
                F.sum((F.col("rank") * F.col("w")).cast(_ACC)).alias("s")
            )
        )
        dmass = dangling_v.join(ranks, "v").agg(
            F.coalesce(
                F.sum(F.col("rank").cast(_ACC)), F.lit(0).cast(_ACC)
            ).alias("d")
        )
        ranks = (
            vr.join(contribs, "v", "left")
            .crossJoin(F.broadcast(dmass))
            .select(
                "v",
                (
                    F.lit(1.0 - damping) * F.col("r0")
                    + F.lit(damping)
                    * (
                        F.coalesce(
                            F.col("s").cast("double"), F.lit(0.0)
                        )
                        + F.col("d").cast("double") * F.col("r0")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
        ranks.count()  # one action per round: materialize + cut lineage
    w_edges.unpersist()  # ranks is checkpointed; the cache can go
    return ranks


def entity_pagerank(
    triples: DataFrame, damping: float = 0.85, n_iter: int = 20
) -> DataFrame:
    """PageRank over the KG's entity-to-entity edges: (subj, obj)
    pairs of the canonical triples relation, predicates ignored —
    the "which entities does the graph say matter" relation."""
    return pagerank(
        triples, src="subj", dst="obj", damping=damping, n_iter=n_iter
    )
