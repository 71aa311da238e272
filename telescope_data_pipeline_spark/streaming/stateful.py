"""Custom stateful streaming operator: incremental per-key statistics.

SURVEY.md §2.9: the reference's light-curve is accumulated per star
across epochs (batch); the streaming form keeps per-key running state
(count, mean, M2 — Welford's online algorithm, numerically stable) and
emits the updated statistic on every micro-batch. This is the
``applyInPandasWithState`` pattern for operators that need state richer
than windowed aggs: running robust statistics, change detection,
per-source quotas.

State shape: (count long, mean double, m2 double). The update merges
each micro-batch's partial moments into the state (Chan et al. parallel
variance merge — the same math Spark's own stddev uses), so results are
identical no matter how rows split across micro-batches — the property
tests/test_streaming_stateful.py asserts against a single-batch run.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([
    T.StructField("count", T.LongType()),
    T.StructField("mean", T.DoubleType()),
    T.StructField("m2", T.DoubleType()),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("count", T.LongType()),
    T.StructField("mean", T.DoubleType()),
    T.StructField("std", T.DoubleType()),
])


def _merge(n1: int, mean1: float, m21: float,
           n2: int, mean2: float, m22: float) -> tuple[int, float, float]:
    if n1 == 0:
        return n2, mean2, m22
    if n2 == 0:
        return n1, mean1, m21
    n = n1 + n2
    delta = mean2 - mean1
    mean = mean1 + delta * n2 / n
    m2 = m21 + m22 + delta * delta * n1 * n2 / n
    return n, mean, m2


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    n1, mean1, m21 = state.get if state.exists else (0, 0.0, 0.0)
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        n2 = int(len(vals))
        if n2:
            mean2 = float(vals.mean())
            m22 = float(((vals - mean2) ** 2).sum())
            n1, mean1, m21 = _merge(n1, mean1, m21, n2, mean2, m22)
    state.update((n1, mean1, m21))
    std = (m21 / (n1 - 1)) ** 0.5 if n1 > 1 else None
    yield pd.DataFrame([{"user_id": key[0], "count": n1, "mean": mean1,
                         "std": std}])


def running_stats(stream: DataFrame) -> DataFrame:
    """Per-user running (count, mean, std) over a stream of events —
    state persists across micro-batches, 'update' output mode emits the
    refreshed row for every key seen in the batch."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
