"""Per-kind fetch routing — the endpoint/action/title selection of the
reference's dictionary fetch, restated as enrichment-source routing.

Reference semantics (/root/reference/src/pheidippides.cpp:36-54):

* **endpoint**: ``commons.wikimedia.org/w/api.php`` for mediainfo (M)
  entities, ``www.wikidata.org/w/api.php`` for everything else;
* **action**: ``query`` for entity_schema (E) entities — fetched as
  wiki *titles* with an ``EntitySchema:`` prefix — ``wbgetentities``
  (fetched as ids) otherwise;
* **props**: E requests ask ``prop = info|revisions``; id requests ask
  the full ``props`` list (include/utils.hpp:90-96);
* chunks drop ids whose ``identify`` kind disagrees with the chunk's
  kind (pheidippides.cpp:60-62) — here kinds are computed per row, so
  the disagreement case cannot arise by construction.

In a Spark engine there is no HTTP client; the routing decides which
*enrichment source* (dictionary table) a given entity joins against.
``routed_enrich`` is that join: each kind partition broadcast-joins its
own source and the union restores one relation.  The reference's
``flush(any)`` round-robin doc promise (include/arachne.hpp:114-123) is
modeled by ``flush_order``: a dispatch-order key that interleaves one
batch per kind per round — the documented contract, even though the
reference's own flush body ignores it (src/arachne.cpp:99-105).  A
declarative engine drains every queue regardless; the key matters only
when a downstream consumer throttles dispatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arachne_spark.functions.ids import identify

WIKIDATA_API = "www.wikidata.org/w/api.php"
COMMONS_API = "commons.wikimedia.org/w/api.php"
PROPS_IDS = "aliases|claims|datatype|descriptions|info|labels|sitelinks/urls"
PROPS_TITLES = "info|revisions"
SCHEMA_PREFIX = "EntitySchema:"


def fetch_routing(ids: DataFrame, id_col: str = "qid") -> DataFrame:
    """(qid, kind, endpoint, action, request_id, props): the call that
    WOULD be made for each entity, as declarative columns."""
    kind = identify(F.col(id_col))
    is_m = kind == "mediainfo"
    is_e = kind == "entity_schema"
    return ids.select(
        F.col(id_col).alias("qid"),
        kind.alias("kind"),
        F.when(is_m, F.lit(COMMONS_API))
        .otherwise(F.lit(WIKIDATA_API))
        .alias("endpoint"),
        F.when(is_e, F.lit("query"))
        .otherwise(F.lit("wbgetentities"))
        .alias("action"),
        F.when(is_e, F.concat(F.lit(SCHEMA_PREFIX), F.col(id_col)))
        .otherwise(F.col(id_col))
        .alias("request_id"),
        F.when(is_e, F.lit(PROPS_TITLES))
        .otherwise(F.lit(PROPS_IDS))
        .alias("props"),
    )


def routed_enrich(
    routed: DataFrame,
    wikidata_labels: DataFrame,
    commons_labels: DataFrame,
    schema_labels: DataFrame,
) -> DataFrame:
    """Join each routing partition against its own source:

    * Q/P/L → ``wikidata_labels`` (qid, label), by id;
    * M     → ``commons_labels`` (qid, label), by id;
    * E     → ``schema_labels`` (title, label), by the prefixed
      request title — the ``action=query`` path.

    No broadcast hints: the label sources grow with the knowledge base
    (a full Wikidata labels table is ~10^8 rows, past the broadcast
    ceiling), so AQE picks broadcast while a source fits and falls
    back to a shuffled join when it doesn't — the same treatment as
    the pipeline's enrichment join.  Returns routed columns +
    ``label`` (NULL when the source has no entry — the enqueue-again
    case).
    """
    wd = (
        routed.where(~F.col("kind").isin("mediainfo", "entity_schema"))
        .join(wikidata_labels, "qid", "left")
    )
    cm = (
        routed.where(F.col("kind") == "mediainfo")
        .join(commons_labels, "qid", "left")
    )
    es = (
        routed.where(F.col("kind") == "entity_schema")
        .join(
            schema_labels,
            routed["request_id"] == schema_labels["title"],
            "left",
        )
        .drop("title")
    )
    return wd.unionByName(cm).unionByName(es)


def flush_order(
    batches: DataFrame,
    kind_col: str = "kind",
    batch_col: str = "batch_id",
) -> DataFrame:
    """The ``flush(any)`` round-robin (include/arachne.hpp:114-123) as
    a declarative dispatch order: distinct (kind, batch) pairs gain an
    ``rr_round`` — batch #r of every kind dispatches before batch
    #r+1 of any kind; within a round, kinds dispatch in name order.
    Sort by (rr_round, kind) to obtain the reference's documented
    interleaving.  No global row_number: the order key is composite,
    so nothing funnels through a single window partition — the only
    window is per kind over the BATCH relation (|queue| / 50 rows,
    not data-scale).  The reference's own flush body ignores its
    round-robin promise (src/arachne.cpp:99-105); this models the
    documented contract."""
    from pyspark.sql.window import Window

    # order each kind's batches by their NUMERIC ordinal when the id
    # carries one ('item:10' after 'item:2', not before), falling back
    # to raw string order for ids with no trailing digits — raw string
    # ordering diverges from enqueue order past 9 batches otherwise
    ordinal = F.expr(
        f"try_cast(regexp_extract({batch_col}, '([0-9]+)$', 1)"
        " as bigint)"
    )
    w = Window.partitionBy(kind_col).orderBy(
        ordinal.asc_nulls_first(), F.col(batch_col)
    )
    return (
        batches.select(kind_col, batch_col)
        .dropDuplicates([kind_col, batch_col])
        .withColumn(
            "rr_round",
            (F.row_number().over(w) - 1).cast("bigint"),
        )
    )
