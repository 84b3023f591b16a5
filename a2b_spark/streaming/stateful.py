"""Custom stateful streaming operators via ``applyInPandasWithState``
(Arrow-batched per-key state — Spark's public API for operators its
built-in streaming aggregations can't express).

Nothing like this exists in the reference (row-at-a-time batch ETL);
this is the training-data-pipeline surface: deduplicating an unbounded
document/event stream requires remembering which keys have been seen
across micro-batches, which is exactly per-key state.

Scale notes: state lives in the state store partitioned by key (one
shuffle on the key columns per micro-batch); memory per key is a
single boolean here, so 10^9 seen keys ≈ tens of GB across the
cluster — bound it with ``ttl_minutes`` (event streams rarely need
exact-forever dedup; content streams can run unbounded and rely on
state-store RocksDB spilling).
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup_first_seen(
    df: DataFrame,
    key_cols: Sequence[str],
    ttl_minutes: Optional[int] = None,
) -> DataFrame:
    """Emit only the FIRST row ever seen for each key tuple, across all
    micro-batches — streaming exact dedup.

    Within one micro-batch, "first" is the first row Spark delivers for
    the key (upstream order); across batches, state remembers the key
    and suppresses every later occurrence. With ``ttl_minutes`` the
    key's state expires after that much processing time without
    arrivals, after which the key is treated as new again (bounded
    state; the standard at-scale trade).

    Works on a streaming DataFrame in ``update`` output mode; on a
    batch DataFrame Spark rejects stateful APIs — use
    ``operators.dedup.exact_dedup`` there.
    """
    keys = list(key_cols)
    out_schema = df.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )

    def dedup(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        already = state.exists
        if not already:
            state.update((True,))
            if ttl_minutes is not None:
                state.setTimeoutDuration(ttl_minutes * 60 * 1000)
            for pdf in pdfs:
                if len(pdf):
                    yield pdf.iloc[:1]
                    break
        else:
            if ttl_minutes is not None:
                state.setTimeoutDuration(ttl_minutes * 60 * 1000)
            for _ in pdfs:  # drain (protocol requires consuming the iterator)
                pass

    return df.groupBy(*keys).applyInPandasWithState(
        dedup, out_schema, state_schema, "update", timeout
    )
