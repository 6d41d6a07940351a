"""URL canonicalization and per-domain corpus shaping.

Web-crawl curation needs three URL-keyed primitives the reference's
page surface assumes but never provides:

* ``canonical_url`` — a pure column expression folding the equivalent
  spellings of one resource (case, default ports, fragments, tracking
  params, trailing slash) into one key, so URL-level dedup catches
  recrawls the raw string would miss;
* ``registrable_domain`` — the grouping key for per-site statistics
  and caps (eTLD+1, approximated with the common two-level public
  suffixes — a full PSL is data, not code, and slots in as a
  broadcast join without changing callers);
* ``domain_cap`` — "at most k documents per domain", the standard
  anti-SEO-farm corpus rule, implemented skew-safely: a hot domain
  with 10^8 pages must not serialize one reducer, so the cap runs as
  salted two-phase top-k (per-(domain, salt) top-k bounds phase two
  to ``n_salts * k`` rows per domain regardless of domain size — the
  same shape as operators/skew.py's promotion count).

Everything is JVM-side column expressions; determinism: the default
keep-order is a content hash (operators/sampling.py), never input
order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from arachne_spark.operators.sampling import hash_unit

# query params that identify a campaign, not a resource.  Only the
# unambiguous set: 'ref' is deliberately NOT here — on many sites it
# names a resource (e.g. ?ref=<branch> on code hosts), and stripping
# it under canonical_url_dedup silently collapses distinct pages.
# Pass extra params explicitly if a deployment wants them dropped.
TRACKING_PARAMS = (
    "utm_source utm_medium utm_campaign utm_term utm_content "
    "gclid fbclid msclkid mc_cid mc_eid"
).split()

# common second-level public suffixes; the full PSL is a data file a
# deployment broadcasts in — this built-in core covers the bulk of
# crawl traffic and keeps the operator dependency-free
_TWO_LEVEL_SUFFIXES = (
    "co.uk org.uk ac.uk gov.uk com.au net.au org.au co.jp or.jp "
    "ne.jp com.br com.cn com.mx co.in co.kr com.tw com.sg com.hk"
).split()

def _norm_query(url: Column) -> Column:
    """Sorted query string with tracking params removed; '' if none
    survive."""
    q = F.try_parse_url(url, F.lit("QUERY"))
    drop = ", ".join(f"'{p}'" for p in TRACKING_PARAMS)
    return F.when(q.isNull() | (q == ""), F.lit("")).otherwise(
        F.array_join(
            F.array_sort(
                F.expr(
                    f"filter(split(try_parse_url(__u, 'QUERY'), '&'),"
                    f" p -> p != '' and not array_contains("
                    f"array({drop}), split(p, '=')[0]))"
                )
            ),
            "&",
        )
    )


def _canonical_expr() -> Column:
    """Canonical form of the bound ``__u`` column; NULL when the URL
    has no parseable scheme+host.  Rules: lowercase scheme and host,
    strip ``www.``, drop default ports and fragments, drop tracking
    params and sort the rest, strip one trailing slash from a
    non-root path.  The expression references the helper columns
    ``__u``/``__host0``/``__path0`` by name, so the public entry is
    :func:`with_canonical`, which binds then drops them."""
    u = F.col("__u")
    scheme = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host0 = F.lower(F.try_parse_url(u, F.lit("HOST")))
    host = F.when(
        host0.startswith("www."), F.expr("substring(__host0, 5)")
    ).otherwise(host0)
    auth = F.try_parse_url(u, F.lit("AUTHORITY"))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    default_port = (
        F.when(scheme == "http", F.lit("80"))
        .when(scheme == "https", F.lit("443"))
        .otherwise(F.lit(""))
    )
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path0 = F.try_parse_url(u, F.lit("PATH"))
    # strip ALL trailing slashes (one pass of stripping just one is
    # not idempotent: /a// -> /a/ -> /a across recrawl runs — caught
    # by test_canonical_is_idempotent), then restore root to "/"
    stripped = F.regexp_replace(path0, "/+$", "")
    path = F.when(
        path0.isNull() | (stripped == ""), F.lit("/")
    ).otherwise(stripped)
    query = _norm_query(u)
    q_part = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), query)
    )
    return F.when(
        scheme.isNull() | host0.isNull() | (host0 == ""), F.lit(None)
    ).otherwise(
        F.concat(scheme, F.lit("://"), host, port_part, path, q_part)
    )


def with_canonical(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """``df`` plus the canonical-URL column (helper columns are bound
    then dropped so the expression tree stays readable)."""
    step = (
        df.withColumn("__u", F.col(url_col))
        .withColumn("__host0", F.lower(F.try_parse_url(F.col("__u"), F.lit("HOST"))))
        .withColumn("__path0", F.try_parse_url(F.col("__u"), F.lit("PATH")))
    )
    return step.withColumn(out_col, _canonical_expr()).drop(
        "__u", "__host0", "__path0"
    )


def registrable_domain(url_col: str = "url") -> Column:
    """eTLD+1 approximation: last two host labels, or last three when
    the last two are a known two-level public suffix."""
    host = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.array_join(F.slice(parts, -2, 2), ".")
    suf = ", ".join(f"'{s}'" for s in _TWO_LEVEL_SUFFIXES)
    take3 = F.expr(f"array_contains(array({suf}), __last2)")
    return (
        F.when(host.isNull() | (n <= 2), host)
        .when(take3, F.array_join(F.slice(parts, -3, 3), "."))
        .otherwise(last2)
    )


def with_domain(
    df: DataFrame, url_col: str = "url", out_col: str = "domain"
) -> DataFrame:
    step = df.withColumn(
        "__last2",
        F.array_join(
            F.slice(
                F.split(
                    F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST"))),
                    r"\.",
                ),
                -2,
                2,
            ),
            ".",
        ),
    )
    return step.withColumn(out_col, registrable_domain(url_col)).drop(
        "__last2"
    )


def domain_cap(
    df: DataFrame,
    key_col: str,
    k: int,
    id_col: str,
    order_by: list[Column] | None = None,
    n_salts: int = 32,
) -> DataFrame:
    """Keep at most ``k`` rows per ``key_col``, skew-safely.

    Phase 1 ranks within (key, salt) — ``n_salts`` reducers share a
    hot key — keeping ≤ k per salt; phase 2 ranks the ≤ n_salts*k
    survivors per key exactly.  Output equals a single-window
    ``row_number() <= k`` (the differential test pins this) at a
    bounded per-task cost.

    ``order_by`` decides WHICH k survive (ascending; first wins).  The
    content-hash of ``id_col`` is always appended as the final
    tie-break so the result is deterministic and, with no ``order_by``
    at all, a uniform deterministic k-subsample of each domain."""
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    tie = hash_unit(F.col(id_col), "domain_cap")
    order = list(order_by or []) + [tie, F.col(id_col)]
    salt = F.pmod(F.xxhash64(F.col(id_col), F.lit("salt")), F.lit(n_salts))
    w1 = Window.partitionBy(F.col(key_col), salt).orderBy(*order)
    survivors = (
        df.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (
        survivors.withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
