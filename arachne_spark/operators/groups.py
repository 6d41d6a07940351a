"""Groups — named co-reference sets with deterministic anonymous ids.

The reference's ``new_group``/``select_group``
(/root/reference/src/arachne.cpp:31-40,184-192) names anonymous groups
``g_<8 hex>`` from a process-wide mt19937_64 seeded by
``std::random_device`` (src/rng.cpp:28-31) — nondeterministic across
runs.  Determinism is a hard requirement here (byte-stable reruns,
P/R reproducibility), so anonymous ids derive from content:
``g_`` + first 16 hex (64 bits) of md5(seed columns).  Same seed ⇒
same group id on any executor, any run, any parallelism.

Width matters: the reference re-rolls on collision
(src/arachne.cpp:31-40 loops until the name is unused); a
deterministic content-derived id cannot re-roll, so the id itself must
make collisions negligible.  8 hex (32 bits) hits birthday collisions
at ~80k anonymous groups — guaranteed at corpus scale — silently
merging unrelated groups.  64 bits pushes the 50%-collision point to
~5e9 groups; the regression test in tests/test_ids.py checks 2e5
distinct seeds map to 2e5 distinct ids (which the 32-bit form fails
in expectation).

Membership is a DataFrame relation (group, entity_id) with set
semantics (``dropDuplicates``), mirroring the reference's
``unordered_map<string, unordered_set<string>>``
(include/arachne.hpp:276-277).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ANON_PREFIX = "g_"
ANON_HEX = 16


def anonymous_group_id(*seed_cols: Column | str) -> Column:
    """Deterministic ``g_<16 hex>`` from the seed columns."""
    seed = F.concat_ws("\x1f", *[F.col(c) if isinstance(c, str) else c
                                 for c in seed_cols])
    return F.concat(
        F.lit(ANON_PREFIX), F.substring(F.md5(seed), 1, ANON_HEX)
    )


def with_group_ids(
    df: DataFrame,
    name_col: str,
    seed_cols: list[str],
) -> DataFrame:
    """Fill NULL group names with deterministic anonymous ids."""
    return df.withColumn(
        "group",
        F.coalesce(F.col(name_col), anonymous_group_id(*seed_cols)),
    )


def group_membership(
    df: DataFrame,
    group_col: str = "group",
    entity_col: str = "entity_id",
) -> DataFrame:
    """Set-semantics membership relation (group, entity_id)."""
    return df.select(
        F.col(group_col).alias("group"),
        F.col(entity_col).alias("entity_id"),
    ).dropDuplicates()
