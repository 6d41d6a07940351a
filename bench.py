"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "...", "value": <total headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "kg": {"triples_sec_local8": ..., "triples_sec_local32": ...,
           "scaling_efficiency": ...}}

Two parts:
1. headline operator queries from __spark_entry__ at
   $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
   local[$SPARK_GRAFT_CPUS];
2. the KG-construction pipeline core (extract → mentions → relations →
   triples, no warehouse I/O) on an identical synthetic corpus at
   local[8] vs local[32] — the sandbox substitute for N vs 4N executors
   demanded by BASELINE.json; scaling_efficiency =
   throughput_32 / (4 * throughput_8).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q05_broadcast_enrich",
    "q09_agg_q1",
    "q02_snapshot_latest",
    "q18_doc_mentions",
    "q23_ngram_jaccard",
    "q26_cosine_topk",
    "q29_event_window",
    "q17_property_path",
]

KG_PAGES = int(os.environ.get("BENCH_KG_PAGES", "60000"))
KG_PARTITIONS = 64  # fixed: identical work at both parallelism levels


def run_headline(sf_dir: str, cpus: int) -> dict:
    import __spark_entry__ as em
    from arachne_spark.session import get_spark

    spark = get_spark(
        "bench-headline", master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    qs = em.queries()
    out = {}
    for name in HEADLINE:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
        _ = n
    spark.stop()
    return out


def kg_core_run(cores: int, n_pages: int) -> tuple[float, int]:
    """Wall seconds + triple count for the pipeline core at `cores`."""
    from pyspark.sql import SparkSession

    from arachne_spark.operators.extract import latest_snapshot, with_text
    from arachne_spark.operators.mentions import (
        detect_mentions,
        extract_relations,
        mention_triples,
    )
    from arachne_spark.session import get_spark
    from arachne_spark.sources.dictionary import alias_df, predicate_df
    from arachne_spark.sources.pages import pages_df
    from pyspark.sql import functions as F

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(
        f"bench-kg-{cores}", master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
    )
    pages = pages_df(spark, n_pages, partitions=KG_PARTITIONS)
    aliases = alias_df(spark)
    preds = predicate_df(spark)

    t0 = time.time()
    clean = with_text(latest_snapshot(pages).where(F.col("lang") == "en"))
    mentions = detect_mentions(clean, aliases)
    triples = mention_triples(mentions).unionByName(
        extract_relations(mentions, preds)
        .select("subj", "pred", "obj")
        .dropDuplicates()
    )
    n = triples.count()
    wall = time.time() - t0
    spark.stop()
    return wall, n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    queries = run_headline(sf_dir, cpus)

    w8, n8 = kg_core_run(8, KG_PAGES)
    w32, n32 = kg_core_run(32, KG_PAGES)
    tput8, tput32 = n8 / w8, n32 / w32
    eff = tput32 / (4 * tput8)

    result = {
        "metric": "headline queries total + KG triples/sec scaling",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "kg": {
            "pages": KG_PAGES,
            "triples": n32,
            "wall_sec_local8": round(w8, 3),
            "wall_sec_local32": round(w32, 3),
            "triples_sec_local8": round(tput8, 1),
            "triples_sec_local32": round(tput32, 1),
            "scaling_efficiency_8_to_32": round(eff, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
