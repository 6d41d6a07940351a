"""PageRank: pure-Python differential + bit-determinism across
partitionings (the repo-wide invariant) + mass conservation."""

from __future__ import annotations

import pytest


def py_pagerank(edges, d=0.85, n_iter=8, seeds=None):
    """Ordered-float twin (dict-based, no Spark) of operators/
    pagerank.py — deliberately a different algorithmic shape
    (scatter over adjacency lists vs join+agg)."""
    verts = sorted({v for e in set(edges) for v in e})
    n = len(verts)
    out: dict = {}
    for s, t in sorted(set(edges)):
        out.setdefault(s, []).append(t)
    if seeds is None:
        r0 = {v: 1.0 / n for v in verts}
    else:
        r0 = {
            v: (1.0 / len(seeds) if v in seeds else 0.0) for v in verts
        }
    rank = dict(r0)
    for _ in range(n_iter):
        dmass = sum(rank[v] for v in verts if v not in out)
        new = {
            v: (1 - d) * r0[v] + d * dmass * r0[v] for v in verts
        }
        for s, ts in out.items():
            w = 1.0 / len(ts)
            for t in ts:
                new[t] += d * rank[s] * w
        rank = new
    return rank


EDGES = [
    ("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"), ("C", "D"),
    # D is dangling; E/F a 2-cycle feeding A
    ("E", "F"), ("F", "E"), ("E", "A"),
]


def _big_edges():
    # 120-node deterministic graph: chain + hub fan-in + danglings
    edges = [(f"n{i}", f"n{i + 1}") for i in range(100)]
    edges += [(f"n{i}", "hub") for i in range(0, 100, 7)]
    edges += [("hub", "n0"), ("n100", "sink")]  # sink dangles
    return edges


@pytest.mark.parametrize("edges", [EDGES, _big_edges()])
def test_pagerank_matches_python_twin(spark, edges):
    from arachne_spark.operators.pagerank import pagerank

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["v"]: r["rank"]
        for r in pagerank(df, n_iter=8).collect()
    }
    want = py_pagerank(edges, n_iter=8)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_pagerank_bit_deterministic_across_partitionings(spark):
    from arachne_spark.operators.pagerank import pagerank

    edges = _big_edges()
    df = spark.createDataFrame(edges, "src string, dst string")
    a = {
        r["v"]: r["rank"]
        for r in pagerank(df.repartition(7), n_iter=6).collect()
    }
    b = {
        r["v"]: r["rank"]
        for r in pagerank(df.repartition(2, "dst"), n_iter=6).collect()
    }
    assert a == b  # EXACT float equality, not approx


def test_personalized_pagerank_matches_twin(spark):
    from arachne_spark.operators.pagerank import pagerank

    edges = _big_edges()
    df = spark.createDataFrame(edges, "src string, dst string")
    seed_df = spark.createDataFrame([("hub",)], "v string")
    got = {
        r["v"]: r["rank"]
        for r in pagerank(df, n_iter=8, seeds=seed_df).collect()
    }
    want = py_pagerank(edges, n_iter=8, seeds={"hub"})
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # mass concentrates on the seed and its out-neighborhood
    assert got["hub"] > got["n50"]
    assert got["n0"] > got["n50"]          # hub -> n0 edge
    # a seed absent from the graph is an error, not a silent zero
    import pytest as _pytest

    with _pytest.raises(Exception):
        pagerank(
            df, n_iter=2,
            seeds=spark.createDataFrame([("nope",)], "v string"),
        )


def test_entity_pagerank_shape(spark):
    from arachne_spark.operators.pagerank import entity_pagerank

    triples = spark.createDataFrame(
        [("Q1", "instance_of", "Q5"), ("Q2", "instance_of", "Q5"),
         ("Q5", "subclass_of", "Q35120")],
        "subj string, pred string, obj string",
    )
    got = entity_pagerank(triples, n_iter=4)
    assert got.columns == ["v", "rank"]
    # the dangling-mass cross join is a 1-row broadcast, never a
    # CartesianProduct; no row-at-a-time Python anywhere
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    rows = {r["v"]: r["rank"] for r in got.collect()}
    # the fan-in targets outrank their sources
    assert rows["Q5"] > rows["Q1"]
    assert rows["Q35120"] > rows["Q1"]
