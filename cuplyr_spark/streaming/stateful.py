"""Custom stateful streaming operators via applyInPandasWithState.

These cover what windowed/session aggregation can't express: state
that must persist per key across triggers with custom transition
logic. State lives in Spark's checkpointed state store — restart-safe,
watermark-evicted.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def streaming_dedup(
    stream: DataFrame,
    key_col: str,
    id_col: str,
) -> DataFrame:
    """Exactly-once-per-key emission across the whole stream: the
    first row per key passes, every later arrival is dropped. The
    per-key state is a single seen-flag — constant bytes per key.

    (Batch dedup can use dropDuplicates; this is the unbounded-stream
    version with durable state.)
    """
    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("first_id", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            # key already emitted in an earlier trigger: drop all rows
            for _ in batches:
                pass
            return
        first_id = None
        for pdf in batches:
            if len(pdf) and first_id is None:
                first_id = int(pdf[id_col].iloc[0])
        if first_id is not None:
            state.update((True,))
            yield pd.DataFrame({"key": [key[0]], "first_id": [first_id]})

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_running_total(
    stream: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key running total maintained in the state store and emitted
    once per trigger — the canonical custom-stateful shape (counters,
    rate limiters, anomaly baselines all specialize this)."""
    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("total", T.DoubleType()), T.StructField("n", T.LongType())]
    )

    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total, n = state.get if state.exists else (0.0, 0)
        for pdf in batches:
            total += float(pdf[value_col].sum())
            n += len(pdf)
        state.update((total, n))
        yield pd.DataFrame({"key": [key[0]], "total": [total], "n": [n]})

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
