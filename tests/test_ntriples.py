"""Graph materialization: N-Triples serialization must round-trip the
triples table exactly (ids ↔ IRIs, literals with every ECHAR escape),
and the parser must drop malformed lines instead of failing the job —
the same tolerant-reader posture as the WARC connector."""

from __future__ import annotations

from arachne_spark.sources.ntriples import (
    parse_ntriples_lines,
    read_ntriples,
    to_ntriples_lines,
    write_ntriples,
)

ROWS = [
    ("Q42", "P31", "Q5"),
    ("https://example.org/p/1", "mentions", "Q42"),
    ("Q1", "label", 'tricky "quoted" \\ backslash\nnewline\ttab'),
    ("L7", "sameAs", "Q7"),
]


def test_ntriples_line_shape(spark):
    df = spark.createDataFrame(
        [ROWS[0]], "subj string, pred string, obj string"
    )
    [r] = to_ntriples_lines(df).collect()
    assert r["line"] == (
        "<http://www.wikidata.org/entity/Q42> "
        "<http://www.wikidata.org/prop/direct/P31> "
        "<http://www.wikidata.org/entity/Q5> ."
    )


def test_ntriples_roundtrip_through_files(spark, tmp_path):
    df = spark.createDataFrame(ROWS, "subj string, pred string, obj string")
    path = str(tmp_path / "graph_nt")
    write_ntriples(df, path)
    back = read_ntriples(spark, path)
    assert {
        (r["subj"], r["pred"], r["obj"]) for r in back.collect()
    } == set(ROWS)


def test_pipeline_materializes_rdf(spark, tmp_path):
    """End-to-end graph materialization: the pipeline's triples table
    serialized as N-Triples must parse back to exactly the same
    (subj, pred, obj) set."""
    from arachne_spark.pipeline import PipelineConfig, run_pipeline

    wh = str(tmp_path / "wh")
    out = run_pipeline(
        spark,
        PipelineConfig(
            warehouse=wh, n_pages=300, run_id="nt",
            materialize_rdf=True,
        ),
    )
    nt = read_ntriples(spark, wh + "/triples_nt")
    assert nt.count() == out["triples"] > 0
    want = {
        (r["subj"], r["pred"], r["obj"])
        for r in spark.read.parquet(wh + "/triples").collect()
    }
    got = {(r["subj"], r["pred"], r["obj"]) for r in nt.collect()}
    assert got == want


def test_ntriples_roundtrip_hypothesis(spark):
    """Property: ANY object string (unicode, control chars, quotes,
    trailing ' .', lone backslashes) survives serialize → parse.  One
    Spark job over the whole generated batch — hypothesis drives the
    data generation, not the job count."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # exclude unassigned/surrogate codepoints (cannot transit parquet/
    # UTF-8), keep everything else including controls
    text = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), max_codepoint=0x10FFFF
        ),
        min_size=0,
        max_size=40,
    )

    @settings(max_examples=1, deadline=None)
    @given(st.lists(text, min_size=30, max_size=30, unique=True))
    def run(objs):
        rows = [(f"Q{i}", "label", o) for i, o in enumerate(objs)]
        df = spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )
        back = {
            (r["subj"], r["pred"], r["obj"])
            for r in parse_ntriples_lines(
                to_ntriples_lines(df)
            ).collect()
        }
        # objects that LOOK like entity ids / IRIs legitimately decode
        # to themselves through the IRI branch; everything round-trips
        assert back == set(rows)

    run()


def test_ntriples_malformed_lines_dropped(spark):
    good = (
        '<http://www.wikidata.org/entity/Q1> '
        '<http://example.org/vocab/label> "ok" .'
    )
    raw = spark.createDataFrame(
        [
            (good,),
            ("not a triple at all",),
            ("<subj-only> .",),
            ('<a> <b> "unterminated .',),
            ("",),
        ],
        "line string",
    )
    rows = parse_ntriples_lines(raw).collect()
    assert [(r["subj"], r["pred"], r["obj"]) for r in rows] == [
        ("Q1", "label", "ok")
    ]
