"""Multimodal binary-column plumbing.

Treats image/audio/video payloads as opaque ``binary`` columns with
typed metadata, following the mediainfo (M-entity) capability of the
reference (commons endpoint selection, /root/reference/src/
pheidippides.cpp:36-39).  The decode step is a clearly-marked STUB
(codec libraries are not in this container); everything Spark-side —
schema, Arrow batch shape, ``mapInPandas`` iterator signature,
partition-preserving plumbing — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def fake_decode(payload: bytes) -> dict:
    """STUB decoder: deterministic metadata, no real codec.

    A real deployment replaces this with PIL/ffmpeg/soundfile decode;
    the function contract (bytes → metadata dict) and the surrounding
    Spark plumbing stay identical.
    """
    if payload is None:
        return {"n_bytes": 0, "first_byte": 0, "is_decodable": False}
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else 0,
        "is_decodable": True,
    }


def binary_meta(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """(id, n_bytes, first_byte, is_decodable) via Arrow-batched decode."""
    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("n_bytes", LongType()),
            StructField("first_byte", IntegerType()),
            StructField("is_decodable", BooleanType()),
        ]
    )

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf[payload_col].map(fake_decode)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": metas.map(lambda m: m["n_bytes"]).astype(
                        "int64"
                    ),
                    "first_byte": metas.map(
                        lambda m: m["first_byte"]
                    ).astype("int32"),
                    "is_decodable": metas.map(
                        lambda m: m["is_decodable"]
                    ),
                }
            )

    return df.mapInPandas(decode_batches, schema)
