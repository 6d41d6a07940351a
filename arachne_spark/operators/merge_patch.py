"""RFC 7386 JSON merge-patch folding of chunked entity payloads.

The reference accumulates per-chunk API responses with nlohmann's
``combined.merge_patch(data)`` (/root/reference/src/pheidippides.cpp:74,
payload fields per /root/reference/include/utils.hpp:90-96): objects
merge recursively key-by-key, non-object values replace, an explicit
``null`` deletes the key.  A last-wins whole-value merge is NOT
equivalent — partial payloads for the same entity arriving in different
chunks (labels in one, claims in another) must deep-merge.

Determinism: the reference folds chunks in ``unordered_set`` iteration
order — nondeterministic across runs.  Here the fold order is an
explicit ``order_cols`` sort (the engine's hard determinism invariant),
so conflicting scalar leaves resolve to the *last* chunk in that total
order, stably.

Spark-first shape: chunk payloads group per entity (one shuffle of
chunk-sized rows), sort JVM-side via ``array_sort`` over
(order, payload) structs, and fold through ONE vectorized pandas UDF
applying the pure-Python RFC 7386 merge — Arrow-batched, no
row-at-a-time Python, payload parsing touched exactly once per entity.
Chunk counts per entity are bounded by the reference's own batching
(<= 50 ids per chunk ⇒ one chunk per entity per source), so the
per-group list never approaches executor memory.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def merge_patch(target, patch):
    """Pure-Python RFC 7386: returns target patched by patch."""
    if not isinstance(patch, dict):
        return patch
    if not isinstance(target, dict):
        target = {}
    out = dict(target)
    for k, v in patch.items():
        if v is None:
            out.pop(k, None)
        else:
            out[k] = merge_patch(out.get(k), v)
    return out


def _fold_chunks():
    """Arrow-batched fold of ordered JSON chunk lists by RFC 7386.
    Built lazily: the pandas_udf decorator resolves its return type
    against the active session, so it cannot run at import time."""

    @pandas_udf("string")
    def fold_udf(chunks: pd.Series) -> pd.Series:
        def fold(lst) -> str:
            acc: dict = {}
            for c in lst:
                if c is None:
                    continue
                acc = merge_patch(acc, json.loads(c))
            return json.dumps(acc, sort_keys=True, separators=(",", ":"))

        return chunks.apply(fold)

    return fold_udf


def merge_payloads(
    df: DataFrame,
    entity_col: str = "qid",
    payload_col: str = "payload",
    order_cols: tuple[str, ...] = ("chunk_id",),
) -> DataFrame:
    """(entity, merged): RFC 7386 deep merge of each entity's payload
    chunks in deterministic (order_cols) order.  ``merged`` is
    canonical JSON (sorted keys, compact separators)."""
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                *[F.col(c) for c in order_cols], F.col(payload_col)
            )
        )
    )
    per_entity = df.groupBy(F.col(entity_col).alias("entity")).agg(
        ordered.alias("chunks")
    )
    jsons = F.expr(f"transform(chunks, c -> c.{payload_col})")
    return per_entity.select(
        F.col("entity").alias(entity_col),
        _fold_chunks()(jsons).alias("merged"),
    )
