"""Custom stateful streaming operator: perpetual touch-count promotion.

The reference promotes a "curiosity" candidate once its touch counter
reaches 50 (/root/reference/src/arachne.cpp:224-233, threshold at
include/arachne.hpp:285-286) — inherently *stateful across batches* in
a perpetual run.  ``applyInPandasWithState`` keeps the per-QID running
count in Spark's state store (checkpointed, recoverable) and emits each
QID exactly once, in the micro-batch where its cumulative count crosses
the threshold.

State is one (count, promoted) pair per QID — bounded by dictionary
size, not corpus size — so a 10^12-page stream carries state
proportional to the entity vocabulary only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "qid string, cnt long"
STATE_SCHEMA = "cnt long, promoted boolean"


def streaming_touch_promotion(
    mentions: DataFrame, threshold: int = 50
) -> DataFrame:
    """mentions(qid, ...) stream → (qid, cnt) emitted once at crossing.

    Unlike the batch path (operators/skew.salted_count), the stream
    state store already partitions by group key, so skew salting is
    unnecessary here; the per-batch pre-aggregation Spark performs
    before the stateful operator plays the partial-aggregate role.
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (qid,) = key
        cnt, promoted = state.get if state.exists else (0, False)
        for pdf in pdfs:
            cnt += len(pdf)
        newly = (not promoted) and cnt >= threshold
        state.update((cnt, promoted or newly))
        if newly:
            yield pd.DataFrame({"qid": [qid], "cnt": [cnt]})

    return mentions.groupBy("qid").applyInPandasWithState(
        update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
