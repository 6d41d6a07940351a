"""Multimodal plumbing tests: schema, fan-out shape, determinism, and
composition with the ANN operators.  The codec steps are documented
stubs; what these tests pin down is the Spark-side contract a real
codec would drop into."""

from __future__ import annotations

from pyspark.sql import functions as F

from arachne_spark.operators.multimodal import (
    binary_meta,
    extract_features,
    frame_sample,
    resize_meta,
)


def _payloads(spark):
    return spark.createDataFrame(
        [
            (1, b"x" * 100),
            (2, b"y" * 15),       # shorter than one frame stride
            (3, b"z" * 64),
            (4, None),            # null payload
        ],
        "doc_id bigint, payload binary",
    )


def test_frame_sample_fanout(spark):
    df = _payloads(spark)
    rows = frame_sample(df, "doc_id", every_n=2, stride=16).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 100 // 16 = 6 frames, every 2nd -> idx 0, 2, 4
    assert [r["frame_idx"] for r in sorted(
        by_doc[1], key=lambda r: r["frame_idx"]
    )] == [0, 2, 4]
    assert all(len(r["frame_bytes"]) == 16 for r in by_doc[1])
    assert 2 not in by_doc  # sub-stride payload yields no frames
    assert 4 not in by_doc  # null payload yields no frames
    assert [r["frame_idx"] for r in by_doc[3]] == [0, 2]


def test_resize_meta_aspect(spark):
    rows = resize_meta(_payloads(spark), "doc_id", max_side=256).collect()
    assert len(rows) == 4  # null payload still gets a row (0-dims stub)
    for r in rows:
        assert max(r["out_width"], r["out_height"]) <= 256
        # aspect preserved within integer truncation
        in_ratio = r["width"] / r["height"]
        out_ratio = r["out_width"] / r["out_height"]
        assert abs(in_ratio - out_ratio) < 0.05 * in_ratio + 0.2


def test_extract_features_feeds_ann(spark):
    """Binary column -> feature vector -> LSH bucket: the embedding
    output must satisfy the exact schema ann.with_buckets consumes."""
    from arachne_spark.operators.ann import with_buckets

    import __spark_entry__ as em

    feats = extract_features(
        _payloads(spark).where(F.col("payload").isNotNull()),
        "doc_id", dim=64,
    )
    assert feats.schema["embedding"].dataType.simpleString() == (
        "array<float>"
    )
    bucketed = with_buckets(
        feats, em.HYPERPLANES, id_col="doc_id", vec_col="embedding"
    )
    rows = bucketed.collect()
    assert len(rows) == 3
    assert all(0 <= r["bucket"] < 16 for r in rows)
    assert all(abs(r["nrm"]) > 0 for r in rows)


def test_multimodal_deterministic(spark):
    df = _payloads(spark)
    a = sorted(map(tuple, extract_features(df, "doc_id").collect()))
    b = sorted(map(tuple, extract_features(
        df.repartition(7), "doc_id"
    ).collect()))
    assert a == b


def test_multimodal_arrow_only(spark):
    df = _payloads(spark)
    for out in (
        binary_meta(df, "doc_id"),
        frame_sample(df, "doc_id"),
        resize_meta(df, "doc_id"),
        extract_features(df, "doc_id"),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
