"""RFC 7386 merge-patch semantics: the published test vectors from the
RFC's appendix, applied to the pure-Python merge and to the Spark
fold (merge_payloads), which must agree with each other and with the
deterministic chunk order."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from arachne_spark.operators.merge_patch import merge_patch, merge_payloads

# RFC 7386 appendix A test cases (target, patch, expected)
RFC_VECTORS = [
    ({"a": "b"}, {"a": "c"}, {"a": "c"}),
    ({"a": "b"}, {"b": "c"}, {"a": "b", "b": "c"}),
    ({"a": "b"}, {"a": None}, {}),
    ({"a": "b", "b": "c"}, {"a": None}, {"b": "c"}),
    ({"a": ["b"]}, {"a": "c"}, {"a": "c"}),
    ({"a": "c"}, {"a": ["b"]}, {"a": ["b"]}),
    ({"a": {"b": "c"}}, {"a": {"b": "d", "c": None}}, {"a": {"b": "d"}}),
    ({"a": [{"b": "c"}]}, {"a": [1]}, {"a": [1]}),
    (["a", "b"], ["c", "d"], ["c", "d"]),
    ({"a": "b"}, ["c"], ["c"]),
    ({"a": "foo"}, None, None),
    ({"a": "foo"}, "bar", "bar"),
    ({"e": None}, {"a": 1}, {"e": None, "a": 1}),
    ([1, 2], {"a": "b", "c": None}, {"a": "b"}),
    ({}, {"a": {"bb": {"ccc": None}}}, {"a": {"bb": {}}}),
]


def test_rfc7386_vectors():
    for target, patch, expected in RFC_VECTORS:
        assert merge_patch(target, patch) == expected, (target, patch)


def test_rfc7386_differential_vs_duckdb():
    """Property test: the pure-Python merge must agree with DuckDB's
    independent json_merge_patch implementation on random JSON trees
    (ints, strings, nulls, lists, nested objects).

    Scope: targets are constrained to OBJECTS.  For a non-object
    target RFC 7386 replaces it with {} and then applies the patch's
    null-deletions ([1,2] + {"a":"b","c":null} = {"a":"b"}, appendix
    vector), but DuckDB returns the object patch verbatim
    ({"a":"b","c":null}) — a measured DuckDB deviation from the RFC.
    This repo's implementation follows the RFC (the appendix vectors
    in test_rfc7386_vectors cover the non-object-target cases); real
    entity payloads are always objects, so the q39 oracle chain never
    hits the deviation."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scalars = st.one_of(
        st.integers(-99, 99),
        st.text(alphabet="abxyz", max_size=4),
        st.none(),
        st.booleans(),
    )
    json_vals = st.recursive(
        scalars,
        lambda inner: st.one_of(
            st.lists(inner, max_size=3),
            st.dictionaries(
                st.sampled_from(["k1", "k2", "k3", "k4"]), inner,
                max_size=3,
            ),
        ),
        max_leaves=8,
    )
    json_objects = st.dictionaries(
        st.sampled_from(["k1", "k2", "k3", "k4"]), json_vals, max_size=3
    )
    con = duckdb.connect()

    @settings(max_examples=120, deadline=None)
    @given(target=json_objects, patch=json_vals)
    def check(target, patch):
        got = merge_patch(target, patch)
        want_s = con.execute(
            "select json_merge_patch(?::json, ?::json)",
            [json.dumps(target), json.dumps(patch)],
        ).fetchone()[0]
        want = None if want_s is None else json.loads(want_s)
        assert got == want, (target, patch, got, want)

    check()


def test_merge_payloads_fold_order_and_depth(spark):
    """Three-level-deep merge folded in chunk_id order: later scalar
    leaves win, nulls delete, sibling branches survive."""
    rows = [
        ("Q1", 1, '{"claims":{"P31":{"v":"old","keep":1}},"x":{"y":1}}'),
        ("Q1", 2, '{"claims":{"P31":{"v":"new"},"P279":{"v":2}}}'),
        ("Q1", 3, '{"x":{"y":null,"z":3}}'),
        ("Q2", 1, '{"labels":{"en":"two"}}'),
    ]
    df = spark.createDataFrame(
        rows, "qid string, chunk_id int, payload string"
    )
    got = {
        r["qid"]: json.loads(r["merged"])
        for r in merge_payloads(df).collect()
    }
    assert got["Q1"] == {
        "claims": {"P31": {"v": "new", "keep": 1}, "P279": {"v": 2}},
        "x": {"z": 3},
    }
    assert got["Q2"] == {"labels": {"en": "two"}}

    # fold order is chunk_id, not arrival order: reversed input rows
    # must give the identical result
    df_rev = spark.createDataFrame(
        list(reversed(rows)), "qid string, chunk_id int, payload string"
    ).repartition(4)
    got_rev = {
        r["qid"]: json.loads(r["merged"])
        for r in merge_payloads(df_rev).collect()
    }
    assert got_rev == got


def test_merge_payloads_is_arrow_batched(spark):
    df = spark.createDataFrame(
        [("Q1", 1, "{}")], "qid string, chunk_id int, payload string"
    )
    plan = merge_payloads(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_merge_payloads_partial_chunks(spark):
    """The reference's real shape: labels in one chunk, claims in
    another — a last-wins whole-value merge would drop one of them."""
    df = spark.createDataFrame(
        [
            ("Q5", 1, '{"labels":{"en":"human"}}'),
            ("Q5", 2, '{"claims":{"P31":["Q55983715"]}}'),
        ],
        "qid string, chunk_id int, payload string",
    )
    merged = json.loads(merge_payloads(df).collect()[0]["merged"])
    assert merged == {
        "labels": {"en": "human"},
        "claims": {"P31": ["Q55983715"]},
    }


def test_q39_null_deletion(spark):
    import __spark_entry__ as em

    out = em.q39_merge_patch(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == 25
    for r in rows:
        assert r["label_xx"] is None  # chunk 1's null deleted it
        assert r["label_en"] is not None  # chunk 0's label survived
        assert r["desc_en"].startswith("d2-")  # chunk 2 replaced
        assert F is not None
