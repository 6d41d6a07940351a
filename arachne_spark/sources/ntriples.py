"""N-Triples sink/source — the graph-materialize surface.

The reference emits (subj, pred, obj) tuples and aspires to a
perpetually-stitched knowledge graph (/root/reference/readme.md:20-26;
triple assertions in tests/sparql_tests.cpp).  The standard
interchange form for that graph is RDF N-Triples; this module
serializes the engine's triples table to spec-shaped lines and parses
them back, entirely with column expressions (whole-stage codegen — no
Python in either direction):

* Q/P/L entity ids map to Wikidata entity/property IRIs (the public
  namespaces the reference's SPARQL tests use);
* subjects/objects that are already absolute IRIs (page urls) pass
  through as IRIs;
* everything else becomes an escaped string literal per the N-Triples
  grammar (backslash, quote, LF, CR, TAB).  (Subjects in this engine
  are always urls or entity ids, so the literal branch only ever fires
  for objects; a free-text subject would serialize as a literal, which
  round-trips through this parser but is outside the strict RDF
  grammar — callers feeding arbitrary subjects should mint IRIs.)

Parsing CANONICALIZES known-namespace IRIs to bare entity ids: a
column value that is already the full ``http://www.wikidata.org/
entity/Q42`` IRI serializes to the same line as ``Q42`` and parses
back as ``Q42``.  That is deliberate RDF semantics (the IRI is the
identity, ids are this engine's canonical spelling of it) — serialize
∘ parse is idempotent on canonical values, and non-canonical spellings
normalize on the first pass rather than round-tripping verbatim.

Escaping uses ``F.replace`` (literal string replace, codegen'd) — not
``regexp_replace`` — so backslash semantics are exact and the DuckDB
oracle can mirror each step with ``replace()``.

Scale posture: a line is a projection (narrow, embarrassingly
parallel); the text sink writes one shard per partition, so the
serialization inherits whatever partitioning the triples table has
(e.g. partitioned-by-predicate from the pipeline's triples stage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ENTITY_NS = "http://www.wikidata.org/entity/"
PROP_NS = "http://www.wikidata.org/prop/direct/"
VOCAB_NS = "http://example.org/vocab/"

_ID_RE = r"^[QPLME](0|[1-9][0-9]*)$"
_PROP_RE = r"^P(0|[1-9][0-9]*)$"


def escape_literal(col: Column) -> Column:
    """N-Triples ECHAR escaping: backslash first, then quote, LF, CR,
    TAB — each a literal (non-regex) replace.  NUL additionally
    escapes to the UCHAR form ``\\u0000`` so serialized text is
    NUL-free, which is what lets :func:`unescape_literal` use NUL as
    its collision-free placeholder."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    out = F.replace(out, F.lit("\t"), F.lit("\\t"))
    out = F.replace(out, F.lit("\x00"), F.lit("\\u0000"))
    return out


def unescape_literal(col: Column) -> Column:
    """Inverse of :func:`escape_literal`.

    Chained global replaces cannot parse escape sequences (any
    single-character placeholder for ``\\\\`` can collide with some
    literal content — a NUL literal vs a NUL placeholder, etc.), so
    this uses the split construction instead: splitting on the
    two-character sequence ``\\\\`` leaves parts in which EVERY
    remaining backslash begins a true single-character escape, the
    simple escapes restore unambiguously inside each part, and the
    join seam re-inserts the literal backslashes.  ``transform`` runs
    interpreted, which is fine on the reader path (serialization, the
    hot direction, stays pure codegen)."""
    parts = F.split(col, r"\\\\")

    def fix(p: Column) -> Column:
        out = F.replace(p, F.lit('\\"'), F.lit('"'))
        out = F.replace(out, F.lit("\\n"), F.lit("\n"))
        out = F.replace(out, F.lit("\\r"), F.lit("\r"))
        out = F.replace(out, F.lit("\\t"), F.lit("\t"))
        return F.replace(out, F.lit("\\u0000"), F.lit("\x00"))

    return F.array_join(F.transform(parts, fix), "\\")


def _term(col: Column, ns: str) -> Column:
    """Entity id → namespaced IRI; absolute IRI → as-is; else literal."""
    return (
        F.when(
            col.rlike(_ID_RE),
            F.concat(F.lit("<" + ns), col, F.lit(">")),
        )
        .when(
            col.rlike("^[a-z][a-z0-9+.-]*://"),
            F.concat(F.lit("<"), col, F.lit(">")),
        )
        .otherwise(
            F.concat(F.lit('"'), escape_literal(col), F.lit('"'))
        )
    )


def to_ntriples_lines(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """(line): one N-Triples statement per input row."""
    pred_term = F.when(
        F.col(pred).rlike(_PROP_RE),
        F.concat(F.lit("<" + PROP_NS), F.col(pred), F.lit(">")),
    ).otherwise(
        F.concat(F.lit("<" + VOCAB_NS), F.col(pred), F.lit(">"))
    )
    return triples.select(
        F.concat_ws(
            " ",
            _term(F.col(subj), ENTITY_NS),
            pred_term,
            _term(F.col(obj), ENTITY_NS),
            F.lit("."),
        ).alias("line")
    )


def write_ntriples(triples: DataFrame, path: str) -> None:
    to_ntriples_lines(triples).write.mode("overwrite").text(path)


def _strip(col: Column, pre: int, suf: int = 1) -> Column:
    """Drop ``pre`` leading and ``suf`` trailing characters."""
    return col.substr(F.lit(pre + 1), F.length(col) - pre - suf)


def _decode(col: Column) -> Column:
    """IRI → entity id (known namespaces stripped) or raw IRI;
    quoted literal → unescaped text."""
    return (
        F.when(
            col.startswith("<" + ENTITY_NS),
            _strip(col, 1 + len(ENTITY_NS)),
        )
        .when(col.startswith("<" + PROP_NS), _strip(col, 1 + len(PROP_NS)))
        .when(
            col.startswith("<" + VOCAB_NS), _strip(col, 1 + len(VOCAB_NS))
        )
        .when(col.startswith("<"), _strip(col, 1))
        .otherwise(unescape_literal(_strip(col, 1)))
    )


_LINE_RE = r'^(<[^>]*>|"(?:[^"\\]|\\.)*") (<[^>]*>) (<[^>]*>|"(?:[^"\\]|\\.)*") \.$'


def parse_ntriples_lines(lines: DataFrame, col: str = "line") -> DataFrame:
    """(subj, pred, obj) from N-Triples statement lines; malformed
    lines (failing the grammar regex) are dropped, tolerant-reader
    style, matching the WARC connector's posture."""
    m = lines.select(
        F.regexp_extract(F.col(col), _LINE_RE, 1).alias("s"),
        F.regexp_extract(F.col(col), _LINE_RE, 2).alias("p"),
        F.regexp_extract(F.col(col), _LINE_RE, 3).alias("o"),
    ).where((F.col("s") != "") & (F.col("p") != "") & (F.col("o") != ""))
    return m.select(
        _decode(F.col("s")).alias("subj"),
        _decode(F.col("p")).alias("pred"),
        _decode(F.col("o")).alias("obj"),
    )


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    return parse_ntriples_lines(
        spark.read.text(path).withColumnRenamed("value", "line")
    )
