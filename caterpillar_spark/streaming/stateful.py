"""Custom stateful streaming operator: per-key LSN high-watermark filter
via ``applyInPandasWithState`` (Arrow-batched, never per-row Python).

Drops any event whose LSN is ≤ the highest LSN already seen for its key —
cross-micro-batch dedup/stale-event suppression WITHOUT consulting the
table. Useful in front of the merge when the transport can re-deliver or
reorder (the reference's at-least-once Kafka path re-delivers on crash,
``task/kafka/kafka.go:288-293``); the merge stays idempotent anyway, this
just stops stale traffic earlier.

State = one int64 per key, so 10^8 live keys ≈ a few GB across the
cluster, bounded and partitioned by the group key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([T.StructField("max_lsn", T.LongType())])


def lsn_highwater_filter(events: DataFrame, key=("conv_id", "turn_idx")) -> DataFrame:
    """Streaming transform: keep only events that advance their key's LSN."""
    out_schema = events.schema

    def fn(
        key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        hw = state.get[0] if state.exists else -1
        for pdf in pdfs:
            fresh = pdf[pdf["lsn"] > hw]
            if len(fresh):
                hw = int(fresh["lsn"].max())
                yield fresh
        state.update((hw,))

    return events.groupBy(*key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
